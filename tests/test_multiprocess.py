"""Multi-host (multi-process) data parallelism — real-process verification.

Spawns 2 actual worker processes (tests/_mp_worker.py) joined through
``jax.distributed`` with gloo CPU collectives, each feeding HALF of a
deterministic global batch into the fused adaptation step over a mesh that
spans both processes, and checks:

- both processes observe identical (replicated) losses and updated params;
- the multi-process result matches the same global batch run single-process
  (the GSPMD program is identical; only collective order differs -> f32
  tolerance).

This is the strongest multi-host evidence available without multi-host
hardware: the exact production code path (``shard_batch`` ->
``make_array_from_process_local_data``, replicated state, cross-process
all-reduce in the step) executes across real process boundaries.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import _mp_worker as W

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn_workers(n):
    port = _free_port()
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    # don't inherit the 8-virtual-device flag some runners export: each
    # worker must contribute exactly 1 CPU device to the global mesh
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # each worker gets 1 CPU device; compile cache shared via conftest's dir
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(TESTS_DIR, "_mp_worker.py"),
         f"localhost:{port}", str(n), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=os.path.dirname(TESTS_DIR), env=env) for pid in range(n)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    results = {}
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        assert line, out[-4000:]
        vals = line[-1].split()
        results[int(vals[1])] = [float(v) for v in vals[2:]]
    return results


def test_two_process_adapt_step_matches_single_process():
    results = _spawn_workers(2)
    assert set(results) == {0, 1}
    # replicated outputs: every process sees the identical global result
    np.testing.assert_array_equal(results[0], results[1])

    # single-process oracle on the full global batch (2-device mesh for the
    # same per-device shard shapes; GSPMD semantics are mesh-size invariant)
    from uda_poseestimation_tpu.parallel import make_mesh

    m, checksum = W.run_step(make_mesh(2), slice(None))
    got_loss, got_checksum = results[0][0], results[0][3]
    assert np.isfinite(got_loss)
    np.testing.assert_allclose(got_loss, m["loss_all"], rtol=2e-4)
    np.testing.assert_allclose(got_checksum, checksum, rtol=2e-4)
