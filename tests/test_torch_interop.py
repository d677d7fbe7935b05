"""Checkpoint-format parity: export our params to reference-shaped torch
state dicts, load them with strict=True into torch modules built with the
reference's architecture and submodule names, and check the two frameworks
produce the same forward outputs. This is the executable proof that our
``.pth`` interop matches the reference's checkpoint contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from consistent__style_transfer_tpu.models import (  # noqa: E402
    DenoiseSeq2Seq,
    PairMatcher,
    RelGANDiscriminator,
    TextCNN,
    TransformerLM,
)
from consistent__style_transfer_tpu.utils import torch_interop as ti  # noqa: E402

V, B, L = 60, 3, 7


def _np(x):
    return np.asarray(jax.device_get(x))


# ---- torch mirrors with the reference's exact submodule names -------------
class TorchTextCNN(tnn.Module):
    def __init__(self):
        super().__init__()
        self.embedding = tnn.Embedding(V, 128)
        self.convs = tnn.ModuleList(
            [tnn.Conv2d(1, 128, (k, 128), padding=(k - 1, 0)) for k in (3, 4, 5)]
        )
        self.out = tnn.Linear(384, 2)

    def forward(self, x):
        e = self.embedding(x).unsqueeze(1)
        hs = [tF.relu(c(e)).squeeze(3) for c in self.convs]
        hs = [tF.max_pool1d(h, h.size(2)).squeeze(2) for h in hs]
        return self.out(torch.cat(hs, 1))


class TorchMLM(tnn.Module):
    def __init__(self):
        super().__init__()
        self.token_embedding = tnn.Embedding(V, 512)
        self.posit_embedding = tnn.Embedding(100, 512)
        self.lm = tnn.TransformerEncoder(
            tnn.TransformerEncoderLayer(512, 8), 6
        )
        self.fwd = tnn.Linear(512, V)

    def forward(self, x):
        idx = torch.arange(x.size(1)).unsqueeze(0).expand(x.size(0), -1)
        e = self.token_embedding(x) + self.posit_embedding(idx)
        h = self.lm(e.transpose(0, 1)).transpose(0, 1)
        return self.fwd(h)


class TorchMatcher(tnn.Module):
    def __init__(self):
        super().__init__()
        self.token_embedding = tnn.Embedding(V, 512)
        self.segment_embedding = tnn.Embedding(2, 512)
        self.posit_embedding = tnn.Embedding(100, 512)
        self.matcher = tnn.TransformerEncoder(
            tnn.TransformerEncoderLayer(512, 8), 6
        )
        self.hidden2logits = tnn.Linear(512, 1)

    def embed(self, x, seg):
        idx = torch.arange(x.size(1)).unsqueeze(0).expand(x.size(0), -1)
        s = self.segment_embedding(torch.full((x.size(0),), seg).long()).unsqueeze(1)
        return self.token_embedding(x) + self.posit_embedding(idx) + s

    def forward(self, x1, x2):
        h = torch.cat([self.embed(x1, 0), self.embed(x2, 1)], 1)
        h = self.matcher(h.transpose(0, 1)).transpose(0, 1)
        return self.hidden2logits(h.max(1).values).squeeze(1)


class TorchDisc(tnn.Module):
    def __init__(self):
        super().__init__()
        self.embeddings = tnn.Linear(V, 128, bias=False)
        self.convs = tnn.ModuleList(
            [tnn.Conv2d(1, 300, (f, 8), stride=(1, 8)) for f in (2, 3, 4, 5)]
        )
        self.highway = tnn.Linear(1200, 1200)
        self.feature2out = tnn.Linear(1200, 100)
        self.out2logits = tnn.Linear(100, 1)

    def forward(self, p):
        e = self.embeddings(p).unsqueeze(1)
        hs = [tF.relu(c(e)) for c in self.convs]
        hs = [tF.max_pool2d(h, (h.size(2), 1)).squeeze(2) for h in hs]
        pred = torch.cat(hs, 1).permute(0, 2, 1).reshape(-1, 1200)
        hw = self.highway(pred)
        pred = torch.sigmoid(hw) * tF.relu(hw) + (1 - torch.sigmoid(hw)) * pred
        return self.out2logits(self.feature2out(pred)).squeeze(1)


class TorchGenerator(tnn.Module):
    def __init__(self, max_len):
        super().__init__()
        self.max_len = max_len
        self.start_embedding = tnn.Embedding(1, 128)
        self.token_embedding = tnn.Embedding(V, 128)
        self.enc_style_embedding = tnn.Embedding(2, 512)
        self.style_embedding = tnn.Embedding(2, 512)
        self.encoder = tnn.LSTM(128, 256, batch_first=True, bidirectional=True)
        self.decoder = tnn.LSTM(128, 512, batch_first=True)
        self.transfer = tnn.Linear(512, 512, bias=False)
        self.fn_1 = tnn.Linear(1024, 512)
        self.fn_2 = tnn.Linear(512, V, bias=False)
        self.act = tnn.LeakyReLU(0.1)

    def forward(self, ids, src, tgt):
        h0 = self.enc_style_embedding(src).reshape(-1, 2, 256).transpose(0, 1).contiguous()
        memory, (_, c_end) = self.encoder(
            self.token_embedding(ids), (h0, torch.zeros_like(h0))
        )
        Bc = ids.size(0)
        h = self.style_embedding(tgt).unsqueeze(0)
        c = self.act(self.transfer(c_end.transpose(0, 1).reshape(1, Bc, -1)))
        x_t = self.start_embedding(torch.zeros(Bc, 1).long())
        outs = []
        for _ in range(self.max_len):
            o, (h, c) = self.decoder(x_t, (h, c))
            a = tF.softmax(o.bmm(memory.transpose(1, 2)) / memory.size(-1) ** 0.5, -1)
            ctx = a.bmm(memory)
            logit = self.fn_2(self.act(self.fn_1(torch.cat([o, ctx], -1))))
            x_t = self.token_embedding(logit.argmax(-1))
            outs.append(logit)
        return torch.cat(outs, 1)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    x = rng.integers(0, V, (B, L)).astype(np.int32)
    labels = rng.integers(0, 2, (B,)).astype(np.int32)
    return x, labels


def test_textcnn_forward_parity(batch):
    x, _ = batch
    model = TextCNN(n_vocab=V, n_class=2)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tm = TorchTextCNN()
    tm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in ti.classifier_to_state_dict(params).items()},
                       strict=True)
    tm.eval()
    ours = _np(model.apply(params, jnp.asarray(x)))
    theirs = tm(torch.from_numpy(x).long()).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_lm_forward_parity(batch):
    x, _ = batch
    model = TransformerLM(n_vocab=V)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tm = TorchMLM()
    tm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in ti.lm_to_state_dict(params).items()},
                       strict=True)
    tm.eval()
    ours = _np(model.apply(params, jnp.asarray(x)))
    theirs = tm(torch.from_numpy(x).long()).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-3)


def test_matcher_forward_parity(batch):
    x, _ = batch
    model = PairMatcher(n_vocab=V)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(x))
    tm = TorchMatcher()
    tm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in ti.matcher_to_state_dict(params).items()},
                       strict=True)
    tm.eval()
    ours = _np(model.apply(params, jnp.asarray(x), jnp.asarray(x)))
    theirs = tm(torch.from_numpy(x).long(), torch.from_numpy(x).long()).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-3)


def test_discriminator_forward_parity(batch):
    x, _ = batch
    probs = np.asarray(jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (B, L, V))))
    model = RelGANDiscriminator(n_vocab=V)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tm = TorchDisc()
    tm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in ti.discriminator_to_state_dict(params).items()},
                       strict=True)
    tm.eval()
    ours = _np(model.apply(params, jnp.asarray(probs)))
    theirs = tm(torch.from_numpy(probs)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_generator_forward_parity(batch):
    """Greedy decode (deterministic argmax feedback) must match the torch
    mirror step for step."""
    x, labels = batch
    model = DenoiseSeq2Seq(n_vocab=V, n_class=2, max_len=L)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(labels),
                        None, jnp.asarray(labels), deterministic=True)
    tm = TorchGenerator(max_len=L)
    tm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in ti.generator_to_state_dict(params).items()},
                       strict=True)
    tm.eval()
    ours = _np(model.apply(params, jnp.asarray(x), jnp.asarray(labels), None,
                           jnp.asarray(1 - labels), mode="sched", deterministic=True))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x).long(), torch.from_numpy(labels).long(),
                    torch.from_numpy(1 - labels).long()).numpy()
    # greedy feedback can only diverge if an argmax flips; with random init the
    # logit gaps are comfortable, so outputs match closely
    np.testing.assert_allclose(ours, theirs, atol=2e-3)


def test_pth_roundtrip(batch, tmp_path):
    x, labels = batch
    model = DenoiseSeq2Seq(n_vocab=V, n_class=2, max_len=L)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(labels),
                        None, jnp.asarray(labels), deterministic=True)
    path = str(tmp_path / "G.pth")
    ti.save_pth(params, "generator", path)
    restored = ti.load_pth(path, params, "generator")
    flat_a = sorted(jax.tree_util.tree_flatten_with_path(params)[0], key=lambda kv: str(kv[0]))
    flat_b = sorted(jax.tree_util.tree_flatten_with_path(restored)[0], key=lambda kv: str(kv[0]))
    assert [str(k) for k, _ in flat_a] == [str(k) for k, _ in flat_b]
    for (ka, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=str(ka))
