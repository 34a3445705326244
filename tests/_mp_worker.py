"""Worker process for tests/test_multiprocess.py.

Runs ONE fused adaptation step as one of N processes over a device mesh
spanning processes (gloo CPU collectives), feeding only this process's rows
of a deterministic global batch, and prints loss/param checksums for the
parent to compare against the single-process result.

Run: python tests/_mp_worker.py <coordinator> <num_processes> <process_id>
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

B, K, SIZE, HM = 4, 3, 32, 8


def free_port() -> int:
    from uda_poseestimation_tpu.parallel.distributed import free_port as fp
    return fp()


def spawn_workers(n: int, timeout: int = 900):
    """Spawn n ranks of this script joined via jax.distributed (gloo CPU
    collectives, 1 device each) and return {rank: [floats]} parsed from
    their RESULT lines; kills the set on timeout/failure. Shared by
    tests/test_multiprocess.py and __graft_entry__ dryrun sub-check 6."""
    import subprocess

    port = free_port()
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    # each rank must contribute exactly 1 CPU device to the global mesh —
    # never inherit a forced virtual device count
    env.pop("XLA_FLAGS", None)
    env.pop("_UDA_DRYRUN_CHILD", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    script = os.path.abspath(__file__)
    procs = [subprocess.Popen(
        [sys.executable, script, f"localhost:{port}", str(n), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env=env) for pid in range(n)]
    outs = []
    try:
        for p in procs:
            outs.append(p.communicate(timeout=timeout)[0])
    finally:
        # a hung gloo rendezvous must not orphan the set (see CLAUDE.md)
        for p in procs:
            if p.poll() is None:
                p.kill()
    results = {}
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        assert lines, out[-4000:]
        vals = lines[-1].split()
        results[int(vals[1])] = [float(v) for v in vals[2:]]
    return results


def make_model_cfg():
    from uda_poseestimation_tpu.models import resnet as resnet_lib
    from uda_poseestimation_tpu.models.pose_resnet import PoseResNet
    from uda_poseestimation_tpu.parallel import StepConfig

    cfg = StepConfig(image_size=SIZE, heatmap_size=HM, sigma=1.0, k=1)
    # 4-stage backbone => stride 32, so 32-px images give the canonical
    # heatmap = image/4 (1x1 feature map -> three 2x deconvs -> 8x8)
    model = PoseResNet(backbone=resnet_lib.ResNet(block=resnet_lib.BasicBlock,
                                                  stage_sizes=[1, 1, 1, 1]),
                       num_keypoints=K)
    return model, cfg


def global_batch():
    from uda_poseestimation_tpu.ops import generate_target_batch

    rng = np.random.RandomState(0)
    kp = rng.uniform(4, SIZE - 4, size=(B, K, 2)).astype(np.float32)
    vis = np.ones((B, K), np.float32)
    target, weight = generate_target_batch(kp, vis, (HM, HM), 1.0, (SIZE, SIZE))

    def aug(n):
        return np.stack([
            rng.uniform(-30, 30, n), np.round(rng.uniform(-2, 2, n)),
            np.round(rng.uniform(-2, 2, n)), rng.uniform(-10, 10, n),
            rng.uniform(-10, 10, n), rng.uniform(0.8, 1.2, n)], -1).astype(np.float32)

    return {
        "image_s": rng.rand(B, SIZE, SIZE, 3).astype(np.float32),
        "target_s": np.asarray(target),
        "weight_s": np.asarray(weight),
        "image_t_stu": rng.rand(B, SIZE, SIZE, 3).astype(np.float32),
        "images_t_tea": rng.rand(1, B, SIZE, SIZE, 3).astype(np.float32),
        "aug_param_stu": aug(B),
        "aug_params_tea": aug(B)[None],
    }


def run_step(mesh, local):
    """Build state, run one adaptation step. ``local`` = this process's row
    slice of the global batch (slice(None) for single-process)."""
    import jax
    import jax.numpy as jnp

    from uda_poseestimation_tpu.parallel import (
        create_state,
        make_adapt_step,
        replicate,
        shard_batch,
    )

    model, cfg = make_model_cfg()
    state = replicate(create_state(model, jax.random.PRNGKey(0), cfg,
                                   batch_size=2), mesh)
    batch = {k: (v[:, local] if k in ("images_t_tea", "aug_params_tea")
                 else v[local])
             for k, v in global_batch().items()}
    sb = shard_batch(batch, mesh)
    step = make_adapt_step(model, cfg, mesh=mesh)
    # engine-style inputs (run_adapt_epoch:658-664): jnp scalars + folded key
    step_args = (state, None, sb, jnp.float32(1e-3),
                 jax.random.fold_in(jax.random.PRNGKey(5), 0),
                 jnp.bool_(False), jnp.float32(0.5),
                 jnp.bool_(False), jnp.float32(0.5))
    # AOT-compile first, then rendezvous at the coordination service: on a
    # contended 1-core testbed a cold-cache compile can skew workers by
    # minutes, blowing the gloo collective timeout if one worker enters the
    # step's all-reduce while the other is still compiling. (Real multi-host
    # fleets compile in lockstep; this is test-harness hygiene, not a
    # production requirement.)
    compiled = step.lower(*step_args).compile()
    if jax.process_count() > 1:
        try:  # private API (jax 0.9): degrade to no barrier if it moves —
            # the run then merely risks the gloo timeout on cold caches
            from jax._src.distributed import global_state
            global_state.client.wait_at_barrier("mp_step_compiled", 600_000)
        except (ImportError, AttributeError):
            pass
    state, metrics, _y_s = compiled(*step_args)
    m = {k: float(v) for k, v in jax.device_get(metrics).items()}
    leaves = jax.tree_util.tree_leaves(jax.device_get(state.student_params))
    checksum = float(sum(np.abs(np.asarray(l, np.float64)).sum() for l in leaves))
    return m, checksum


def main():
    coordinator, num_processes, process_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
    import jax

    from uda_poseestimation_tpu.parallel import distributed as dist

    dist.initialize(coordinator, num_processes, process_id, platform="cpu")
    from uda_poseestimation_tpu.parallel import local_rows, make_mesh

    mesh = make_mesh()
    assert jax.device_count() == num_processes, jax.devices()
    m, checksum = run_step(mesh, local_rows(B))
    print("RESULT", process_id, m["loss_all"], m["loss_s"], m["loss_c"],
          checksum, flush=True)


if __name__ == "__main__":
    main()
