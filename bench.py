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

Baseline note: the reference repo publishes no numbers (BASELINE.md). The
``vs_baseline`` ratio is computed against a documented engineering estimate
of the PyTorch reference on a V100: its adaptation step is dominated by
per-sample Python loops (3-affine warp chains per sample per view,
train_human.py:359-372/418-423, a B*K-iteration rectify loop, utils.py:77-109,
and per-sample occlusion :376-413) on top of the fwd/bwd — measured reference
logs are unavailable offline, so we assume ~50 img/s (b=32, 1 GPU). Replace
REF_IMGS_PER_SEC when a measured baseline exists.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

REF_IMGS_PER_SEC = 50.0

BATCH = 32
K_VIEWS = 1
NUM_KPTS = 21
N_SCAN = int(os.environ.get("UDA_BENCH_SCAN", "20"))  # steps per dispatch


def main():
    from uda_poseestimation_tpu.models import StyleNet, pose_resnet101
    from uda_poseestimation_tpu.ops import generate_target_batch
    from uda_poseestimation_tpu.parallel import (
        StepConfig, cast_floating, create_state, make_adapt_step, make_mesh,
        replicate, shard_batch)

    # gather_exact=False: models run bf16, so the single-dot occlusion gather
    # is bit-equivalent (see StepConfig.gather_exact)
    cfg = StepConfig(k=K_VIEWS, gather_exact=False, style_io_dtype="bfloat16")
    mesh = make_mesh()
    n_chips = len(mesh.devices.flatten())
    model = pose_resnet101(num_keypoints=NUM_KPTS, dtype=jnp.bfloat16)
    style = StyleNet(dtype=jnp.bfloat16)

    state = create_state(model, jax.random.PRNGKey(0), cfg, batch_size=2)
    state = replicate(state, mesh)
    dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    # frozen at runtime -> bf16 storage, as the trainers deploy it
    style_params = replicate(cast_floating(
        jax.jit(lambda r: style.init(r, dummy, dummy))(
            jax.random.PRNGKey(1))["params"], jnp.bfloat16), mesh)

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

    if N_SCAN > 1:
        # the deployed --steps-per-dispatch mode: one scanned dispatch of
        # N_SCAN full iterations (state/EMA/optimizer chain through the scan)
        from uda_poseestimation_tpu.parallel.train_step import AdaptStepBundler

        bundler = AdaptStepBundler(model, cfg, style_model=style, mesh=mesh)
        bbatch = shard_batch(
            jax.tree_util.tree_map(lambda x: np.stack([x] * N_SCAN), host_batch),
            mesh, lead_axes=1)
        keys = jnp.stack([jax.random.PRNGKey(i) for i in range(N_SCAN)])
        gates = jnp.ones((N_SCAN,), bool)
        alphas = jnp.full((N_SCAN,), 0.5, jnp.float32)

        def run(state, _i):
            return bundler(state, style_params, bbatch, jnp.float32(1e-4),
                           keys, gates, alphas, gates, alphas)

        reps, iters_per_rep = 3, N_SCAN
    else:
        step = make_adapt_step(model, cfg, style_model=style, mesh=mesh)

        def run(state, i):
            return step(state, style_params, batch, jnp.float32(1e-4),
                        jax.random.PRNGKey(i),
                        jnp.bool_(True), jnp.float32(0.5),
                        jnp.bool_(True), jnp.float32(0.5))

        reps, iters_per_rep = 20, 1

    # warmup/compile
    state, metrics, _ = run(state, 0)
    jax.block_until_ready(metrics["loss_all"])

    t0 = time.perf_counter()
    for i in range(1, reps + 1):
        state, metrics, _ = run(state, i)
    jax.block_until_ready(metrics["loss_all"])
    dt = (time.perf_counter() - t0) / (reps * iters_per_rep)

    imgs_per_sec_per_chip = BATCH / dt / n_chips
    mode = (f"{N_SCAN} steps/dispatch" if N_SCAN > 1
            else "1 step/dispatch")
    print(json.dumps({
        "metric": "train images/sec/chip (student+teacher+AdaIN fused "
                  "adaptation step, pose_resnet101 b=32 bf16, "
                  f"{mode})",
        "value": round(imgs_per_sec_per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec_per_chip / REF_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
