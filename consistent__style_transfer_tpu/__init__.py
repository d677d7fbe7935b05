"""TPU-native unsupervised text style transfer framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``iptmt/consistent__style_transfer`` reference (PyTorch, single GPU):

- three training stages (pretrain scoring models -> warmup denoising seq2seq
  generator -> adversarial style-transfer optimization), see
  reference ``src/main_{pretrain,warmup,optimize}.py``;
- the full STI / CP / NT automatic evaluation harness, see reference
  ``evaluate/``;
- text components (BPE tokenizer, word2vec + WMD, fasttext-style classifier)
  natively, see reference ``src/vocab.py``, ``src/wmd.py``.

Everything on the compute path is jitted XLA with static shapes; the
autoregressive decode is a ``lax.scan`` (optionally a fused Pallas kernel);
scaling is expressed through ``jax.sharding`` meshes (data axis now, model
axis for the stretch backbone), never hand-written collectives.
"""

__version__ = "0.1.0"

PAD_ID = 0
BOS_ID = 1
EOS_ID = 2
UNK_ID = 3

PAD = "<pad>"
BOS = "<s>"
EOS = "</s>"
UNK = "<unk>"

SPECIAL_TOKENS = (PAD, BOS, EOS, UNK)
