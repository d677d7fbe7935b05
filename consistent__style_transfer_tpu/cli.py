"""Single CLI entry replacing the reference's four shell scripts + per-stage
``__main__`` blocks (``run.sh``, ``prepare.sh``, ``src/job.sh``,
``src/book.sh``, ``src/vocab.py:50``, ``src/wmd.py:58``):

    python -m consistent__style_transfer_tpu <command> [--flags]

Commands:
  vocab         train/load the BPE tokenizer dump
  w2v           train/load the WMD word2vec dump
  pretrain      stage 1: scoring models
  warmup        stage 2: generator denoising warmup
  optimize      stage 3: adversarial style transfer (--mode=test for inference)
  infer         transfer train+test splits to .tsf with the current best G
  eval-prepare  train eval models (idempotent)
  eval          print STI / CP / NT
  run           full pipeline: optimize train -> test -> eval-prepare -> eval
                (the reference's run.sh; assumes pretrain+warmup dumps exist,
                exactly like the reference)
  ablate        the reference's job.sh sweep: warmup once, then optimize
                train+test for ver in {full, wo_s, wo_c, wo_adv, wo_bt,
                wo_allc}, then eval-prepare each
  serve         stdin->stdout batch transfer with the current best G
  bench         run the throughput benchmark (see bench.py)
"""

from __future__ import annotations

import sys

from .config import Config, config_from_args


def _eval_dir(cfg: Config) -> str:
    return f"{cfg.out_dir}/../evaluate_runtime"


def cmd_vocab(cfg: Config) -> None:
    from .train.common import get_tokenizer

    tok = get_tokenizer(cfg)
    print(f"vocab size: {len(tok)} -> {cfg.vocab_paths[0]}")


def cmd_w2v(cfg: Config) -> None:
    from .train.common import get_tokenizer, get_w2v

    w2v = get_w2v(cfg, get_tokenizer(cfg))
    print(f"w2v vocab: {len(w2v.vocab)} -> {cfg.w2v_path}")


def cmd_pretrain(cfg: Config) -> None:
    from .train.pretrain import run_pretrain

    paths = run_pretrain(cfg)
    print("pretrain artifacts:", paths)


def cmd_warmup(cfg: Config) -> None:
    from .train.warmup import run_warmup

    print("warmup G:", run_warmup(cfg))


def cmd_optimize(cfg: Config) -> None:
    from .train.optimize import run_optimize, run_test

    if cfg.mode == "test":
        print("wrote:", run_test(cfg))
    else:
        print("best G:", run_optimize(cfg))


def cmd_infer(cfg: Config) -> None:
    cfg.mode = "test"
    cmd_optimize(cfg)


def cmd_eval_prepare(cfg: Config) -> None:
    from .evaluate.prepare import run_prepare

    run_prepare(cfg.ds_data_dir, cfg.run_out_dir, _eval_dir(cfg), cfg.dataset,
                ver=cfg.ver, seed=cfg.seed)


def cmd_eval(cfg: Config) -> None:
    from .evaluate.run_eval import run_eval

    run_eval(cfg.ds_data_dir, cfg.run_out_dir, _eval_dir(cfg), cfg.dataset, cfg.ver)


def cmd_run(cfg: Config) -> None:
    """run.sh: optimize train -> optimize test -> eval prepare -> eval
    (``run.sh:9-23``); results also appended to output/<ds>-<ver>.txt."""
    import contextlib
    import io
    import os

    cfg.mode = "train"
    cmd_optimize(cfg)
    cfg.mode = "test"
    cmd_optimize(cfg)
    cmd_eval_prepare(cfg)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cmd_eval(cfg)
    text = buf.getvalue()
    print(text, end="")
    os.makedirs(cfg.out_dir, exist_ok=True)
    with open(f"{cfg.out_dir}/{cfg.dataset}-{cfg.ver}.txt", "w") as f:
        f.write(text)


ABLATIONS = {
    # reference src/job.sh:9-18
    "full": {},
    "wo_s": {"w_s": 0.0},
    "wo_c": {"w_c": 0.0},
    "wo_adv": {"w_adv": 0.0},
    "wo_bt": {"w_bt": 0.0},
    "wo_allc": {"w_c": 0.0, "w_bt": 0.0},
}


def cmd_ablate(cfg: Config) -> None:
    import dataclasses

    from .train.warmup import run_warmup

    run_warmup(cfg)
    for ver, overrides in ABLATIONS.items():
        sub = dataclasses.replace(cfg, ver=ver, mode="train", **overrides)
        cmd_optimize(sub)
        sub.mode = "test"
        cmd_optimize(sub)
        cmd_eval_prepare(sub)
        cmd_eval(sub)


def cmd_serve(cfg: Config) -> None:
    """Interactive/batch serving: read `<style>\\t<text>` lines from stdin,
    print the transferred text. Uses the newest optimize checkpoint (else the
    warmup G); the decode step compiles once and is reused for every batch."""
    import numpy as np

    from .data.noise import align
    from .parallel.sharding import replicate
    from .train.common import get_mesh, get_tokenizer
    from .train.infer import make_transfer_step
    from .train.optimize import OptimizeModels, load_generator_params
    import jax

    cfg.mode = "test"
    tokenizer = get_tokenizer(cfg)
    models = OptimizeModels(cfg, len(tokenizer))
    # device-resident params: checkpoint loading returns HOST arrays, and
    # host arrays passed per call re-upload the full weight set on every
    # request batch (tens of MB through a tunneled link)
    params = replicate(
        load_generator_params(cfg, models, jax.random.PRNGKey(cfg.seed)),
        get_mesh(cfg))
    step = make_transfer_step(models.generator, cfg.beam_size)

    def flush(styles, texts):
        if not texts:
            return
        enc = [tokenizer.encode(t)[: cfg.max_len] for t in texts]
        n = len(enc)
        styles = list(styles)
        while len(enc) < cfg.batch_size:  # pad to the compiled batch shape
            enc.append([])
            styles.append(0)
        x, _ = align(enc, 0, cfg.max_len)
        ids = np.asarray(step(params, x, np.asarray(styles, np.int32)))
        for i in range(n):
            print(tokenizer.decode(ids[i].tolist()), flush=True)

    styles, texts = [], []
    for line in sys.stdin:
        line = line.rstrip("\n")
        if not line:
            continue
        if "\t" in line:
            s, text = line.split("\t", 1)
            styles.append(int(s))
        else:
            styles.append(0)
            text = line
        texts.append(text)
        if len(texts) == cfg.batch_size:
            flush(styles, texts)
            styles, texts = [], []
    flush(styles, texts)


def cmd_bench(cfg: Config) -> None:
    import os
    import runpy

    bench = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "bench.py")
    sys.argv = [bench]
    runpy.run_path(bench, run_name="__main__")


COMMANDS = {
    "vocab": cmd_vocab,
    "w2v": cmd_w2v,
    "pretrain": cmd_pretrain,
    "warmup": cmd_warmup,
    "optimize": cmd_optimize,
    "infer": cmd_infer,
    "eval-prepare": cmd_eval_prepare,
    "eval": cmd_eval,
    "run": cmd_run,
    "ablate": cmd_ablate,
    "serve": cmd_serve,
    "bench": cmd_bench,
}


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return
    command = argv[0]
    if command not in COMMANDS:
        print(f"unknown command {command!r}; one of {sorted(COMMANDS)}")
        raise SystemExit(2)
    cfg = config_from_args(argv[1:])
    COMMANDS[command](cfg)


if __name__ == "__main__":
    main()
