"""Profile the fused adaptation step on the live device and attribute time.

Runs the same flagship configuration as bench.py (PoseResNet-101, b=32,
k=1, bf16, both style directions firing), captures a jax.profiler trace of
a few chained steps, then parses the XSpace protobuf directly (tensorflow's
xplane_pb2 — no TensorBoard UI needed on this headless testbed) and prints
the top device ops by total self-time.

Usage:
    python tools/profile_step.py [--steps N] [--out /tmp/uda_profile]
    python tools/profile_step.py --parse-only --out /tmp/uda_profile

The op table is the evidence base for PERF.md's hotspot sections.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_trace(out_dir: str, n_steps: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uda_poseestimation_tpu.models import StyleNet, pose_resnet101
    from uda_poseestimation_tpu.ops import generate_target_batch
    from uda_poseestimation_tpu.parallel import (
        StepConfig, cast_floating, create_state, make_adapt_step, make_mesh,
        replicate, shard_batch)

    BATCH, K_VIEWS, NUM_KPTS = 32, 1, 21
    cfg = StepConfig(k=K_VIEWS, gather_exact=False, style_io_dtype="bfloat16")
    mesh = make_mesh()
    model = pose_resnet101(num_keypoints=NUM_KPTS, dtype=jnp.bfloat16)
    style = StyleNet(dtype=jnp.bfloat16)

    state = create_state(model, jax.random.PRNGKey(0), cfg, batch_size=2)
    state = replicate(state, mesh)
    dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
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
    batch = shard_batch({
        "image_s": rng.rand(BATCH, 256, 256, 3).astype(np.float32),
        "target_s": np.asarray(target),
        "weight_s": np.asarray(weight),
        "image_t_stu": rng.rand(BATCH, 256, 256, 3).astype(np.float32),
        "images_t_tea": rng.rand(K_VIEWS, BATCH, 256, 256, 3).astype(np.float32),
        "aug_param_stu": aug,
        "aug_params_tea": np.stack([aug] * K_VIEWS),
    }, mesh)

    step = make_adapt_step(model, cfg, style_model=style, mesh=mesh)

    def run(state, i):
        return step(state, style_params, batch, jnp.float32(1e-4),
                    jax.random.PRNGKey(i),
                    jnp.bool_(True), jnp.float32(0.5),
                    jnp.bool_(True), jnp.float32(0.5))

    state, metrics, _ = run(state, 0)  # compile + warm
    jax.block_until_ready(metrics["loss_all"])

    with jax.profiler.trace(out_dir):
        for i in range(1, n_steps + 1):
            state, metrics, _ = run(state, i)
        jax.block_until_ready(metrics["loss_all"])
    print(f"trace written to {out_dir}", flush=True)


_ASYNC_PREFIXES = ("copy-start", "copy-done", "slice-start", "slice-done",
                   "all-reduce-start", "all-gather-start", "fusion-start",
                   "fusion-done", "collective-permute-start")


def parse_trace(out_dir: str, n_steps: int, top: int = 45) -> None:
    """Print the top SYNC device ops by self-time, individually and grouped.

    Async in-flight ops (copy-start/slice-start weight prefetches) are
    skipped: their durations span whatever compute they overlap, so summing
    them wildly overstates the step (the r3 trace 'measured' 797 ms of op
    time inside a 125 ms step before this filter). Conditionals still
    double-count their body ops — read the body fusions for attribution.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {out_dir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    print("planes:", [p.name for p in space.planes])
    device_planes = [p for p in space.planes
                     if "TPU" in p.name or "/device" in p.name.lower()]
    if not device_planes:
        device_planes = [p for p in space.planes if p.lines]

    import re

    for plane in device_planes:
        ev_meta = {m.id: m for m in plane.event_metadata.values()}
        totals = collections.Counter()
        counts = collections.Counter()
        total_ns = 0
        for line in plane.lines:
            if line.name != "XLA Ops":  # sync op line only
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                if name.startswith(_ASYNC_PREFIXES):
                    continue
                totals[name] += ev.duration_ps
                counts[name] += 1
                total_ns += ev.duration_ps
        if not totals:
            continue
        print(f"\n=== plane: {plane.name} (sync XLA ops) ===")
        print(f"total sync op time: {total_ns / 1e9 / n_steps:.3f} ms/step "
              f"over {n_steps} steps (conditional bodies double-counted)")
        print(f"{'ms/step':>9}  {'calls':>6}  op")
        for name, ps in totals.most_common(top):
            print(f"{ps / 1e9 / n_steps:9.3f}  {counts[name] // n_steps:6d}  {name[:160]}")

        # grouped: strip the %op.N counter and the operand list
        groups = collections.Counter()
        for name, ps in totals.items():
            head = name.split(" = ", 1)
            sig = re.sub(r"\.\d+$", "", head[0])
            shape = ""
            if len(head) > 1:
                m = re.match(r"\(?([a-z0-9]+\[[0-9,]*\])", head[1])
                shape = f" {m.group(1)}" if m else ""
            groups[sig + shape] += ps
        print(f"\n{'ms/step':>9}  op group")
        for name, ps in groups.most_common(top):
            print(f"{ps / 1e9 / n_steps:9.3f}  {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--out", default="/tmp/uda_profile")
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--top", type=int, default=45)
    args = ap.parse_args()
    if not args.parse_only:
        run_trace(args.out, args.steps)
    parse_trace(args.out, args.steps, args.top)


if __name__ == "__main__":
    main()
