"""Real 2-process `jax.distributed` correctness gate (VERDICT r4 item 4).

Proves the process-boundary path that `tests/test_parallel.py` could only
simulate in one process: two OS processes, each owning 4 virtual CPU
devices, `jax.distributed.initialize` on a local coordinator, gloo CPU
collectives, a global 4x2 data-x-model `Mesh` spanning both processes, and
`shard_batch_multihost` (`parallel/sharding.py`) feeding each process's
LOCAL rows of a seed-deterministic global batch into the production fused
optimize GAN step (`parallel/exercise.py::optimize_step_on_mesh`).

Correctness criterion: the multi-process run's G/D/val losses must match a
single-process 8-device run of the identical program bit-for-bit-close in
f32 (rtol 1e-5) — same global batch, same seeds, same mesh shape, only the
controller topology differs. The reference has no analogue (single GPU,
`/root/reference/job.yaml:30`); SURVEY §2.6 names per-host data sharding and
the DCN seam as first-class build obligations.

Usage:
    python tools/multiprocess_gate.py            # parent: runs all 3 children
    python tools/multiprocess_gate.py --inner I N PORT   # child (internal)

Writes `artifacts/round5/multiprocess_gate.json` when run from the repo root.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_STEPS = 5  # covers two D-applies (step 0 and 4) + accumulator-reset asserts
MESH = (4, 2)  # data x model: TP pairs stay intra-process, DP crosses the boundary


def _inner(proc_id: int, n_procs: int, port: int) -> None:
    """Child: bring up (8 // n_procs) local CPU devices, join the global
    mesh, run the fused-step exercise, print one RESULT json line."""
    local_devices = 8 // n_procs
    flags = os.environ.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={local_devices}"
        " --xla_cpu_collective_call_terminate_timeout_seconds=600"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
    ).strip()
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    cache = os.path.join(REPO, "workdir", "xla_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    if n_procs > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(f"localhost:{port}",
                                   num_processes=n_procs, process_id=proc_id)
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == local_devices

    from consistent__style_transfer_tpu.parallel.exercise import (
        optimize_step_on_mesh,
    )

    out = optimize_step_on_mesh(MESH[0], MESH[1], n_steps=N_STEPS,
                                dtype="float32", verbose=True)
    out["process_id"] = proc_id
    out["process_count"] = n_procs
    print("RESULT " + json.dumps(
        {k: out[k] for k in ("g_loss", "d_loss", "val", "n_steps", "mesh",
                             "wall_s", "process_id", "process_count")}),
        flush=True)


def _spawn(proc_id: int, n_procs: int, port: int) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, "-u", os.path.abspath(__file__),
         "--inner", str(proc_id), str(n_procs), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, cwd=REPO)


def _collect(proc: subprocess.Popen, tag: str, deadline: float) -> dict:
    lines = []
    for line in proc.stdout:
        sys.stdout.write(f"[{tag}] {line}")
        sys.stdout.flush()
        lines.append(line)
        if time.time() > deadline:
            proc.kill()
            raise TimeoutError(f"{tag} exceeded deadline")
    rc = proc.wait(timeout=60)
    if rc != 0:
        raise RuntimeError(f"{tag} failed rc={rc}\n{''.join(lines[-20:])}")
    for line in reversed(lines):
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"{tag}: no RESULT line")


def run_gate(port: int = 59631, timeout_s: float = 1500.0) -> dict:
    t0 = time.time()
    deadline = t0 + timeout_s
    # 1) single-process 8-device reference run
    ref = _collect(_spawn(0, 1, port), "1proc", deadline)
    # 2) two distributed processes sharing the same global mesh
    procs = [_spawn(i, 2, port) for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        try:
            outs.append(_collect(p, f"2proc/p{i}", deadline))
        except Exception:
            for q in procs:
                if q.poll() is None:
                    q.kill()
            raise
    record = {"single_process": ref, "multi_process": outs,
              "wall_s": round(time.time() - t0, 1)}
    for mp in outs:
        for k in ("g_loss", "d_loss", "val"):
            rel = abs(mp[k] - ref[k]) / max(abs(ref[k]), 1e-9)
            record.setdefault("max_rel_err", 0.0)
            record["max_rel_err"] = max(record["max_rel_err"], rel)
            assert rel < 1e-5, (
                f"{k} diverges across controller topologies: "
                f"1proc={ref[k]} 2proc={mp[k]} rel={rel:.2e}")
    record["ok"] = True
    return record


if __name__ == "__main__":
    if len(sys.argv) >= 5 and sys.argv[1] == "--inner":
        _inner(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    else:
        rec = run_gate()
        art = os.path.join(REPO, "artifacts", "round5")
        os.makedirs(art, exist_ok=True)
        with open(os.path.join(art, "multiprocess_gate.json"), "w") as f:
            json.dump(rec, f, indent=1)
        print(json.dumps({k: rec[k] for k in ("ok", "max_rel_err", "wall_s")}))
