"""Benchmark: fused mean-teacher adaptation train step, images/sec/chip.

Measures the steady-state throughput of the FULL adaptation iteration
(train_human.py:305-458 equivalents): s2t+t2s AdaIN style transfer, k=1
teacher forward, batched inverse-affine heatmap reconstruction, adaptive
occlusion, two student forwards + backward, rectify + kth-value confidence
masking, Adam update, teacher EMA — on the flagship config (PoseResNet-101,
256x256 -> 64x64, b=32, bf16 compute), dispatched the way the trainers
deploy it: N_SCAN iterations scanned per XLA dispatch (--steps-per-dispatch
/ AdaptStepBundler), which amortizes the per-dispatch host overhead
(~2.7 ms/step on this tunneled testbed) and measures true device-step
throughput. Set UDA_BENCH_SCAN=1 for the legacy one-dispatch-per-step
measurement.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Robustness (round 5): the driver's round-4 run timed out with no number
because the axon tunnel's backend init can stall (threads parked in
futex_wait; CLAUDE.md). bench.py now runs the measurement in a child
process under a phase-aware watchdog: the child reports phase transitions
on stderr, the parent kills it BY PID if a phase exceeds its budget and
retries — falling back to the smaller-compile unbundled step on the last
attempt. The persistent XLA compile cache is enabled unconditionally so
repeat runs skip the scan compile entirely.

Baseline note: the reference repo publishes no numbers (BASELINE.md). The
``vs_baseline`` ratio is computed against a DOCUMENTED ENGINEERING ESTIMATE
(not a measurement) of the PyTorch reference on a V100: its adaptation step
is dominated by per-sample Python loops (3-affine warp chains per sample per
view, train_human.py:359-372/418-423, a B*K-iteration rectify loop,
utils.py:77-109, and per-sample occlusion :376-413) on top of the fwd/bwd —
measured reference logs are unavailable offline, so we assume ~50 img/s
(b=32, 1 GPU). Replace REF_IMGS_PER_SEC when a measured baseline exists; the
metric string labels the ratio "vs estimated baseline" accordingly.
"""

import json
import os
import signal
import subprocess
import sys
import threading
import time

# Persistent compile cache BEFORE any jax import (same recipe as
# __graft_entry__.py): repeat runs skip the ~minutes-long scan compile.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

REF_IMGS_PER_SEC = 50.0  # documented estimate — see module docstring

BATCH = 32
K_VIEWS = 1
NUM_KPTS = 21
N_SCAN = int(os.environ.get("UDA_BENCH_SCAN", "20"))  # steps per dispatch

_CHILD_ENV = "_UDA_BENCH_CHILD"

# Per-phase stall budgets (seconds). A phase that makes no transition within
# its budget means the tunnel/backend is wedged -> kill child, retry. These
# are deliberately ~3-4x the observed COLD durations on the tunneled testbed
# (the watchdog exists for the futex_wait wedge, where nothing progresses at
# all — not to race healthy cold compiles; a 150s setup budget false-killed
# a healthy cold run during calibration).
_PHASE_BUDGET = {
    "start": 120.0,         # imports
    "backend": 300.0,       # jax.devices() — the futex_wait stall lives here
    "state-init": 600.0,    # create_state jit (cold remote compile)
    "style-init": 600.0,    # StyleNet init jit
    "data-prep": 700.0,     # host batch build + bundle H2D (233s observed cold)
    "warmup": 900.0,        # first dispatch = the big XLA scan compile
    "measure": 300.0,       # timed reps
}


_T0 = time.monotonic()


def _phase(name):
    # elapsed stamp lets post-hoc calibration of _PHASE_BUDGET from logs
    print(f"[bench phase] {name} (t={time.monotonic() - _T0:.0f}s)",
          file=sys.stderr, flush=True)


def _measure(n_scan):
    """Child: run the measurement, print the JSON line on stdout."""
    _phase("start")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uda_poseestimation_tpu.models import StyleNet, pose_resnet101
    from uda_poseestimation_tpu.ops import generate_target_batch
    from uda_poseestimation_tpu.parallel import (
        StepConfig, cast_floating, create_state, make_adapt_step, make_mesh,
        replicate, shard_batch)

    # Heartbeat so a watcher (and the driver log) sees liveness during the
    # long silent compile phases.
    stop_hb = threading.Event()

    def _heartbeat():
        t0 = time.monotonic()
        while not stop_hb.wait(20.0):
            print(f"[bench hb] t={time.monotonic() - t0:.0f}s",
                  file=sys.stderr, flush=True)

    threading.Thread(target=_heartbeat, daemon=True).start()

    _phase("backend")
    n_chips = len(jax.devices())  # forces backend init — the stall point
    del n_chips

    _phase("state-init")
    # gather_exact=False: models run bf16, so the single-dot occlusion gather
    # is bit-equivalent (see StepConfig.gather_exact)
    cfg = StepConfig(k=K_VIEWS, gather_exact=False, style_io_dtype="bfloat16")
    mesh = make_mesh()
    n_chips = len(mesh.devices.flatten())
    model = pose_resnet101(num_keypoints=NUM_KPTS, dtype=jnp.bfloat16)
    style = StyleNet(dtype=jnp.bfloat16)

    state = create_state(model, jax.random.PRNGKey(0), cfg, batch_size=2)
    state = replicate(state, mesh)

    _phase("style-init")
    dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    # frozen at runtime -> bf16 storage, as the trainers deploy it
    style_params = replicate(cast_floating(
        jax.jit(lambda r: style.init(r, dummy, dummy))(
            jax.random.PRNGKey(1))["params"], jnp.bfloat16), mesh)

    _phase("data-prep")
    rng = np.random.RandomState(0)
    kp = rng.uniform(20, 230, size=(BATCH, NUM_KPTS, 2)).astype(np.float32)
    vis = np.ones((BATCH, NUM_KPTS), np.float32)
    target, weight = generate_target_batch(kp, vis, (64, 64), cfg.sigma, (256, 256))
    aug = np.stack([
        rng.uniform(-60, 60, BATCH), np.round(rng.uniform(-12, 12, BATCH)),
        np.round(rng.uniform(-12, 12, BATCH)), rng.uniform(-30, 30, BATCH),
        rng.uniform(-30, 30, BATCH), rng.uniform(0.6, 1.3, BATCH)], -1).astype(np.float32)
    host_batch = {
        "image_s": rng.rand(BATCH, 256, 256, 3).astype(np.float32),
        "target_s": np.asarray(target),
        "weight_s": np.asarray(weight),
        "image_t_stu": rng.rand(BATCH, 256, 256, 3).astype(np.float32),
        "images_t_tea": rng.rand(K_VIEWS, BATCH, 256, 256, 3).astype(np.float32),
        "aug_param_stu": aug,
        "aug_params_tea": np.stack([aug] * K_VIEWS),
    }
    batch = shard_batch(host_batch, mesh)

    if n_scan > 1:
        # the deployed --steps-per-dispatch mode: one scanned dispatch of
        # n_scan full iterations (state/EMA/optimizer chain through the scan)
        from uda_poseestimation_tpu.parallel.train_step import AdaptStepBundler

        bundler = AdaptStepBundler(model, cfg, style_model=style, mesh=mesh)
        bbatch = shard_batch(
            jax.tree_util.tree_map(lambda x: np.stack([x] * n_scan), host_batch),
            mesh, lead_axes=1)
        keys = jnp.stack([jax.random.PRNGKey(i) for i in range(n_scan)])
        gates = jnp.ones((n_scan,), bool)
        alphas = jnp.full((n_scan,), 0.5, jnp.float32)

        def run(state, _i):
            return bundler(state, style_params, bbatch, jnp.float32(1e-4),
                           keys, gates, alphas, gates, alphas)

        reps, iters_per_rep = 3, n_scan
    else:
        step = make_adapt_step(model, cfg, style_model=style, mesh=mesh)

        def run(state, i):
            return step(state, style_params, batch, jnp.float32(1e-4),
                        jax.random.PRNGKey(i),
                        jnp.bool_(True), jnp.float32(0.5),
                        jnp.bool_(True), jnp.float32(0.5))

        reps, iters_per_rep = 20, 1

    _phase("warmup")
    state, metrics, _ = run(state, 0)
    jax.block_until_ready(metrics["loss_all"])

    _phase("measure")
    t0 = time.perf_counter()
    for i in range(1, reps + 1):
        state, metrics, _ = run(state, i)
    jax.block_until_ready(metrics["loss_all"])
    dt = (time.perf_counter() - t0) / (reps * iters_per_rep)
    stop_hb.set()

    imgs_per_sec_per_chip = BATCH / dt / n_chips
    mode = (f"{n_scan} steps/dispatch" if n_scan > 1
            else "1 step/dispatch")
    _phase("done")
    print(json.dumps({
        "metric": "train images/sec/chip (student+teacher+AdaIN fused "
                  "adaptation step, pose_resnet101 b=32 bf16, "
                  f"{mode}); vs estimated 50 img/s torch-V100 baseline",
        "value": round(imgs_per_sec_per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec_per_chip / REF_IMGS_PER_SEC, 3),
    }), flush=True)


def _run_attempt(n_scan, deadline):
    """Launch one watched child. Returns the JSON line str or None."""
    env = dict(os.environ)
    env[_CHILD_ENV] = "1"
    env["UDA_BENCH_SCAN"] = str(n_scan)
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)], env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        start_new_session=True)

    state = {"phase": "start", "since": time.monotonic(), "out": None}

    def _drain_stdout():
        for line in proc.stdout:
            line = line.strip()
            if line.startswith("{"):
                state["out"] = line
            else:
                print(f"[bench child] {line}", file=sys.stderr, flush=True)

    def _drain_stderr():
        for line in proc.stderr:
            line = line.rstrip()
            print(line, file=sys.stderr, flush=True)
            if line.startswith("[bench phase] "):
                state["phase"] = line.split("] ", 1)[1].split()[0]
                state["since"] = time.monotonic()

    t_out = threading.Thread(target=_drain_stdout, daemon=True)
    t_err = threading.Thread(target=_drain_stderr, daemon=True)
    t_out.start(); t_err.start()

    why = None
    while proc.poll() is None:
        now = time.monotonic()
        budget = _PHASE_BUDGET.get(state["phase"], 240.0)
        if now - state["since"] > budget:
            why = f"phase '{state['phase']}' stalled >{budget:.0f}s"
        elif now > deadline:
            why = "global deadline reached"
        if why:
            print(f"[bench watchdog] {why}; killing child pid {proc.pid}",
                  file=sys.stderr, flush=True)
            try:  # kill the whole child session (child + any helpers), BY PID
                os.killpg(proc.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                proc.kill()
            break
        time.sleep(2.0)
    proc.wait()
    t_out.join(timeout=10)
    t_err.join(timeout=10)
    if proc.returncode == 0 and state["out"]:
        return state["out"]
    print(f"[bench watchdog] attempt failed (rc={proc.returncode}, "
          f"reason={why or 'child error'})", file=sys.stderr, flush=True)
    return None


def main():
    if os.environ.get(_CHILD_ENV) == "1":
        _measure(N_SCAN)
        return
    # Our own scheduling budget for retries — the caller's `timeout` is the
    # real bound; this only decides when to stop launching fresh attempts.
    budget = float(os.environ.get("UDA_BENCH_BUDGET_SECS", "3000"))
    deadline = time.monotonic() + budget
    # Two tries at the deployed scanned mode (stalls are transient tunnel
    # wedges), then the unbundled step whose compile is much smaller.
    for attempt, n_scan in enumerate([N_SCAN, N_SCAN, 1], 1):
        remaining = deadline - time.monotonic()
        if remaining < 90 and attempt > 1:
            break
        print(f"[bench] attempt {attempt}: n_scan={n_scan}, "
              f"{remaining:.0f}s remaining", file=sys.stderr, flush=True)
        out = _run_attempt(n_scan, deadline)
        if out:
            print(out, flush=True)
            return
    print("[bench] all attempts failed", file=sys.stderr, flush=True)
    sys.exit(1)


if __name__ == "__main__":
    main()
