"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding paths are exercised without TPU hardware.

Note: this environment pre-imports jax at interpreter startup (site hook for
the TPU tunnel), so JAX_PLATFORMS env tweaks are too late here — we must go
through ``jax.config.update``. XLA_FLAGS is still read lazily at first
backend init, which has not happened yet at conftest import time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # 8 virtual devices time-share 1 core: XLA CPU's default 40 s collective
    # rendezvous termination limit aborts (SIGABRT) on thread starvation
    flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=600"
              " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    """Two tiny style corpora on disk (train/dev/test x style 0/1)."""
    root = tmp_path_factory.mktemp("data") / "tiny"
    root.mkdir()
    neg = [
        "the food was terrible and cold .",
        "service was slow and rude .",
        "i hated the dirty room .",
        "worst pizza i have ever had .",
        "the staff was awful and mean .",
        "this place is a total mess .",
    ]
    pos = [
        "the food was amazing and warm .",
        "service was quick and friendly .",
        "i loved the clean room .",
        "best pizza i have ever had .",
        "the staff was great and kind .",
        "this place is a total gem .",
    ]
    for split, k in (("train", 6), ("dev", 4), ("test", 2)):
        (root / f"style.{split}.0").write_text("\n".join(neg[:k]) + "\n")
        (root / f"style.{split}.1").write_text("\n".join(pos[:k]) + "\n")
    return str(root)
