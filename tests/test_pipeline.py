"""Full three-stage pipeline integration test on the tiny corpus + CPU mesh:
pretrain -> warmup -> optimize -> test-mode .tsf inference (the reference's
run.sh contract)."""

import os

import pytest

from consistent__style_transfer_tpu.config import make_config


@pytest.fixture(scope="module")
def cfg(tiny_corpus, tmp_path_factory):
    root = tmp_path_factory.mktemp("work")
    cfg = make_config("tiny")
    cfg.data_dir = os.path.dirname(tiny_corpus)
    cfg.dump_dir = str(root / "dump")
    cfg.log_dir = str(root / "log")
    cfg.out_dir = str(root / "out")
    cfg.max_len = 10
    cfg.vocab_size = 150
    cfg.batch_size = 4
    cfg.warmup_batch_size = 4
    cfg.warmup_epochs = 1
    cfg.epochs = 1
    cfg.mesh.n_data = 2
    # exercise the style-aware masked copy regularizer in the full pipeline
    # (weights computed from the train corpus in run_optimize)
    cfg.w_copy = 0.1
    # exercise the megastep production path (stacked super-batches over the
    # 2-device data mesh, incl. the partial tail group)
    cfg.megastep_k = 2
    return cfg


@pytest.mark.slow
def test_full_pipeline(cfg):
    from consistent__style_transfer_tpu.train.optimize import run_optimize, run_test
    from consistent__style_transfer_tpu.train.pretrain import run_pretrain
    from consistent__style_transfer_tpu.train.warmup import run_warmup

    paths = run_pretrain(cfg, progress=False)
    for t, p in paths.items():
        assert os.path.exists(p), t

    g_path = run_warmup(cfg, progress=False)
    assert os.path.exists(g_path)

    cfg.resume = True  # also exercise orbax full-state checkpointing
    best = run_optimize(cfg, progress=False)
    # 1 epoch -> first validation always improves on inf -> checkpoint exists
    assert best is not None and os.path.exists(best)

    # crash-recovery: a rerun restores the full state and skips the finished
    # epoch (start_epoch = saved epoch + 1 == cfg.epochs -> trains nothing)
    full_state = f"{cfg.ds_dump_dir}/optimize-{cfg.ver}/full_state"
    assert os.path.isdir(full_state)
    assert run_optimize(cfg, progress=False) is None  # no epochs re-run
    assert os.path.exists(best)  # prior best checkpoint untouched

    cfg.mode = "test"
    out_paths = run_test(cfg)
    assert len(out_paths) == 4  # {train, test} x {0, 1}
    for p in out_paths:
        assert os.path.exists(p)
    # .tsf line counts match source corpus line counts
    for split, n in (("train", 6), ("test", 2)):
        for label in (0, 1):
            lines = open(f"{cfg.run_out_dir}/style.{split}.{label}.tsf").read().splitlines()
            assert len(lines) == n, (split, label)
