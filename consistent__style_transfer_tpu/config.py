"""Configuration tree for all stages — one dataclass instead of the
reference's argparse + scattered hardcoded overrides (``src/arguments.py``,
``src/main_warmup.py:115-122``). Knob names match the reference flags
(w_s, w_c, w_adv, w_bt, tau, gap, epochs, ...) so ablation recipes carry over
(``src/job.sh:9-18``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field


@dataclass
class MeshConfig:
    """Device-mesh shape. data * model must divide len(jax.devices());
    n_data=None uses every device on the data axis."""

    n_data: int | None = None
    n_model: int = 1


@dataclass
class Config:
    dataset: str = "yelp"
    ver: str = "v0"
    mode: str = "train"  # train | test

    # filesystem layout (same contract as the reference: everything talks
    # through these directories)
    data_dir: str = "data"
    dump_dir: str = "dump"
    log_dir: str = "log"
    out_dir: str = "output"

    # model / data
    n_class: int = 2
    p_drop: float = 0.1
    vocab_size: int = 10000
    max_len: int = 18
    batch_size: int = 256

    # optimize-stage loss weights (reference defaults, src/arguments.py:24-30)
    w_s: float = 0.1
    w_c: float = 0.5
    w_adv: float = 1.0
    w_bt: float = 1.0
    tau: float = 0.1
    gap: float = 0.0

    # schedules
    epochs: int = 10
    pretrain_lr: float = 1e-4
    warmup_lr: float = 1e-3
    optimize_lr: float = 1e-5
    warmup_epochs: int = 1
    warmup_batch_size: int = 512
    d_update_every: int = 4  # D steps every Nth batch (main_optimize.py:85-88)

    # early stopping patience per stage (reference trainer configs)
    pretrain_patience: int = 1
    warmup_patience: int = 1
    optimize_patience: int = 3

    # grad-clip (global norm) per stage
    pretrain_clip: float = 5.0
    warmup_clip: float = 1.0
    optimize_clip: float = 1.0

    # TPU-native knobs (no reference equivalent)
    backbone: str = "lstm"  # generator family: lstm (reference parity) | transformer (T5-small-like)
    beam_size: int = 1  # >1 enables beam decode at inference (transformer backbone)
    resume: bool = False  # restore full optimize train state (orbax) if present
    seed: int = 0
    rng_impl: str = "rbg"  # PRNG behind dropout/sampling keys:
    # "rbg" (default) = the TPU's hardware RngBitGenerator — same-quality
    # masks from a different stream; threefry's xor/shift bit-mixing chains
    # otherwise fuse into every layernorm/reduce fusion of the dropout-active
    # scorer towers (profiled: fused optimize step 38.7 -> ~29 ms device).
    # Quality-neutral by A/B: 270k/style rehearsal STI 0.992 / ACC 0.971 /
    # self-BLEU 26.5 (threefry row: 0.994 / 0.976 / 24.8) and 16k smoke
    # equal-or-better on all six metrics (RESULTS.md "RNG impl A/B").
    # "threefry" = JAX's counter-based software PRNG, bit-reproducible with
    # pre-round-4 artifacts.
    dtype: str = "bfloat16"  # compute dtype: bfloat16 (default) | float32.
    # bfloat16 is the headline configuration every benched number uses
    # (BENCH_r04, RESULTS.md) and was A/B'd quality-neutral twice (RESULTS.md
    # item 5 and rcm03_bf16: all six eval metrics within noise of float32 at
    # 270k scale) — same evidence standard that flipped rng_impl. float32
    # remains one flag away for bit-comparisons with older artifacts.
    mesh: MeshConfig = field(default_factory=MeshConfig)
    fuse_gan_steps: bool = False  # reuse the G-step's fake decode for the D
    # step (saves ~1/3 of optimize compute; reference recomputes it under
    # no_grad each batch, so default stays faithful)
    sinkhorn_wmd: bool = True  # on-device WMD labels (False = exact host path)
    remat_decode: bool = True  # nn.remat the decoder scan step: recomputing
    # the step in backward is cheaper than its residual traffic (fused
    # optimize step 39.8 -> 38.7 ms device, RESULTS round 3b) and numerically
    # identical; False keeps XLA's default residual saving
    remat_scorers: bool = False  # nn.remat the matcher/LM encoder layers:
    # recompute each layer in backward instead of saving its activations.
    # Measured noise-level on the fused optimize step (28.71 -> 28.61 ms,
    # copy bucket unchanged at 4.02 ms — the copies are decoder-scan
    # backward traffic, not scorer attention probs; RESULTS.md "remat
    # scorers A/B"). Kept as a memory lever for larger scorer towers;
    # benchmarks/profile_breakdown.py --remat-scorers measures the trade.
    time_major_probs: bool = True  # keep the G-step's soft decode stacks in
    # the scan's native (L, B, V) layout end-to-end: the scorers fuse the
    # batch-major relayout after their V->d projection (33-77x less copied
    # data than transposing the probs). Measured on-chip round 5: fused
    # optimize step 29.0 -> 28.2 ms (-2.9%), decode/val unchanged
    # (artifacts/round5/tm_{off,on}.json) — flipped on that evidence.
    # Losses are layout-invariant (tests/test_optimize_losses.py); LSTM
    # backbone only (the transformer decodes batch-major natively).
    megastep_k: int = 1  # optimize-stage batches per device dispatch: >1
    # scans k prefetched training batches inside ONE jitted dispatch
    # (train/optimize.py megastep; trajectory-identical to the per-batch
    # loop — tests/test_megastep.py). Amortizes per-dispatch latency, which
    # dominates sustained throughput on tunneled hosts (~33 ms round-trip:
    # RESULTS.md round-3 attribution; benched 8,710 vs sustained 7,118
    # sent/s in BENCH_r04). 1 = per-batch dispatch.
    rep_penalty: float = 0.0  # greedy-decode repetition penalty (alpha >= 0);
    # subtracts alpha*count(token emitted so far) from the logits of content
    # tokens at inference. 0 = off (reference-faithful decode)
    w_rec: float = 0.0  # optimize-stage self-reconstruction CE weight
    # (copy bias: CE(G(x, s, teacher=x, s), x) added to the G loss; no
    # reference equivalent — content-preservation lever for weak-DAE regimes)
    w_copy: float = 0.0  # copy-regularization on the FREE-RUNNING transfer:
    # -log p(x_t) under the straight-through transfer distribution. Unlike
    # w_rec (teacher-forced) this directly biases the transfer decode toward
    # emitting source tokens; style CE still flips the style-word positions.
    # No reference equivalent — content-preservation lever.
    w_copy_decay: float = 1.0  # per-epoch multiplier on w_copy (fused step's
    # copy_scale): start with a strong copy anchor, decay so the style CE
    # takes over late. 1.0 = constant.
    copy_mask: bool = True  # style-aware w_copy: weight each position by the
    # source token's style-neutrality (data/style_weights.py) so copy
    # pressure skips style-bearing words. Uniform copy measurably collapses
    # transfer accuracy (RESULTS.md cp_copy03: ACC 0.97 -> 0.47).

    # scorer (Matcher/LM) size overrides — None keeps the reference dims
    # (6L/8H/512, src/model/{match,mlm}.py constants). CI and the driver's
    # multichip gate shrink these: TP sharding rules only need dims divisible
    # by the model axis, not the full 6-layer towers.
    scorer_layers: int | None = None
    scorer_d_model: int | None = None
    scorer_heads: int | None = None

    # derived paths
    @property
    def ds_data_dir(self) -> str:
        return f"{self.data_dir}/{self.dataset}"

    @property
    def ds_dump_dir(self) -> str:
        return f"{self.dump_dir}/{self.dataset}"

    @property
    def vocab_paths(self) -> tuple[str, str]:
        return (
            f"{self.ds_dump_dir}/{self.dataset}-vocab.json",
            f"{self.ds_dump_dir}/{self.dataset}-merges.txt",
        )

    @property
    def w2v_path(self) -> str:
        return f"{self.ds_dump_dir}/{self.dataset}-w2v.npz"

    @property
    def run_out_dir(self) -> str:
        return f"{self.out_dir}/{self.dataset}-{self.ver}"

    def train_files(self) -> list[str]:
        return [f"{self.ds_data_dir}/style.train.0", f"{self.ds_data_dir}/style.train.1"]

    def split_files(self, split: str) -> list[str]:
        return [f"{self.ds_data_dir}/style.{split}.0", f"{self.ds_data_dir}/style.{split}.1"]


DATASET_PRESETS = {
    # reference src/arguments.py:39-46
    "yelp": {"max_len": 18, "batch_size": 256},
    "book": {"max_len": 30, "batch_size": 128},
}

# Named operating-point presets (applied on top of the dataset preset,
# before explicit overrides). `ref_band` is the measured recipe that lands
# inside the reference's published operating band (results.md:3-8) on the
# 540k control corpus: NT 0.302 / ACC 0.876 / self-BLEU 40.6 / CP 0.332
# (RESULTS.md "NT-band control", artifacts/round4/ntctl_d.json). The plain
# default keeps the reference's w_s=0.1 (src/arguments.py:24), which
# saturates transfer (ACC~0.98, NT~0.20); this preset is the shipped
# band-matching configuration. Reproduce end-to-end with one command:
#   python tools/dress_rehearsal.py --preset ref_band --mult 135 \
#          --recombine 0.5 --epochs 6
# (--recombine is a corpus-synthesis knob, not a Config field.)
PRESETS = {
    "ref_band": {
        "w_s": 0.0075,
        "w_copy": 0.4,
        "w_copy_decay": 0.6,
        "warmup_epochs": 2,
    },
}


def make_config(dataset: str = "yelp", preset: str | None = None,
                **overrides) -> Config:
    cfg = Config(dataset=dataset)
    named = {}
    if preset:
        if preset not in PRESETS:
            raise ValueError(f"unknown preset {preset!r} (have {sorted(PRESETS)})")
        named = PRESETS[preset]
    for k, v in {**DATASET_PRESETS.get(dataset, {}), **named, **overrides}.items():
        if not hasattr(cfg, k):
            raise ValueError(f"unknown config field {k!r}")
        setattr(cfg, k, v)
    return cfg


def config_from_args(argv=None) -> Config:
    """CLI flag parsing with the reference's knob names."""
    import argparse

    parser = argparse.ArgumentParser(description="tpu-st configuration")
    for f in dataclasses.fields(Config):
        if f.name == "mesh":
            continue
        ftype = f.type if isinstance(f.type, type) else str
        if ftype is bool or (isinstance(f.type, str) and f.type == "bool"):
            parser.add_argument(f"--{f.name}", type=lambda s: s.lower() in ("1", "true", "yes"))
        else:
            typemap = {"str": str, "int": int, "float": float}
            t = typemap.get(str(f.type).replace(" | None", ""), str)
            parser.add_argument(f"--{f.name}", type=t)
    parser.add_argument("--n_data", type=int)
    parser.add_argument("--n_model", type=int)
    parser.add_argument("--preset", choices=sorted(PRESETS),
                        help="named operating-point preset (e.g. ref_band); "
                        "explicit flags still win")
    args = vars(parser.parse_args(argv))
    dataset = args.pop("dataset", None) or "yelp"
    n_data = args.pop("n_data", None)
    n_model = args.pop("n_model", None)
    preset = args.pop("preset", None)
    overrides = {k: v for k, v in args.items() if v is not None}
    cfg = make_config(dataset, preset=preset, **overrides)
    if n_data is not None:
        cfg.mesh.n_data = n_data
    if n_model is not None:
        cfg.mesh.n_model = n_model
    return cfg
