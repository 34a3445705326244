"""Serving-path throughput benchmark: the exported StableHLO artifact.

The training side has ``bench.py``; this measures the DEPLOYED inference
surface — a ``tools/export_inference.py`` artifact (closed-over bf16
weights, symbolic batch, no library import needed at serving time) — in
images/sec/chip at a given batch size. The reference repo has no serving
path at all (its ``--phase test`` re-runs the full trainer CLI over the val
loader, train_human.py:316-323), so there is no upstream number to match;
this documents what the TPU-native export sustains.

MEASUREMENT CAVEAT (PERF.md): on the axon tunnel, timing loops of
INDEPENDENT dispatches lie — each iteration's input must depend on the
previous iteration's output. A tiny jitted mixer rebuilds the input as
``x0 + 1e-12 * maxvals.sum()`` (a real data dependency XLA cannot fold
away; one elementwise pass over the batch, <1% of a forward), so the
timed loop is a genuine serial chain.

Usage:
    python tools/serve_benchmark.py [--arch pose_resnet101] [--batch 64]
        [--image-size 256] [--reps 30] [--checkpoint CKPT]
        [--artifact OUT.jaxexp]  # benchmark a pre-exported artifact as-is
        [--platform cpu|tpu]  # default: whatever jax picks (axon=TPU here)

With ``--artifact`` the file is deserialized and driven directly (nothing
is rebuilt or re-exported — exactly what a serving process loads);
``--arch``/``--checkpoint`` are ignored and the batch/image-size must be
compatible with the artifact's input spec (batch is symbolic by default).

Prints one JSON line: {"metric", "value", "unit", "batch", "ms_per_batch"}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Throughput of the exported jax.export inference artifact")
    p.add_argument("--arch", default="pose_resnet101")
    p.add_argument("--num-keypoints", type=int, default=21)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--reps", type=int, default=30)
    p.add_argument("--checkpoint", default=None,
                   help="optional trained checkpoint (ours or reference "
                        "torch); omitted -> random init (throughput is "
                        "weight-independent)")
    p.add_argument("--which", default="teacher")
    p.add_argument("--artifact", default=None,
                   help="pre-exported .jaxexp file to benchmark as-is "
                        "(skips model build + export; --arch/--checkpoint "
                        "are ignored)")
    p.add_argument("--platform", default=None,
                   help="force the jax platform (e.g. 'cpu' for the test "
                        "lane); default lets jax pick (axon -> real TPU)")
    args = p.parse_args(argv)

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from tools.export_inference import export_model, load_variables

    t0 = time.monotonic()

    def say(msg):
        print(f"[serve-bench] {msg} (t={time.monotonic() - t0:.0f}s)",
              file=sys.stderr, flush=True)

    say(f"backend={jax.default_backend()} devices={len(jax.devices())}")
    S, K = args.image_size, args.num_keypoints

    if args.artifact:
        blob = open(args.artifact, "rb").read()
        re_exported = jax.export.deserialize(blob)
        label = os.path.basename(args.artifact)
        say(f"artifact {label} ({len(blob) / 1e6:.1f} MB)")
    elif args.checkpoint:
        model, variables = load_variables(args.checkpoint, args.arch, K, S,
                                          args.which)
    else:
        from uda_poseestimation_tpu import models as model_registry

        model = model_registry.__dict__[args.arch](num_keypoints=K,
                                                   dtype=jnp.bfloat16)
        xi = jnp.zeros((1, S, S, 3), jnp.float32)
        variables = jax.jit(lambda r: model.init(r, xi, train=False))(
            jax.random.PRNGKey(0))

    if not args.artifact:
        # lower only for the platform we will run on: the artifact is what
        # a serving process would deserialize for this chip type
        platform = {"axon": "tpu"}.get(jax.default_backend(),
                                       jax.default_backend())
        say(f"exporting ({platform})")
        exported = export_model(model, variables, S, [platform])
        blob = exported.serialize()
        re_exported = jax.export.deserialize(blob)
        label = args.arch
        say(f"artifact {len(blob) / 1e6:.1f} MB")

    x0 = jnp.asarray(np.random.RandomState(0).rand(args.batch, S, S, 3),
                     jnp.float32)
    # serial-chain mixer (see module docstring): eps keeps the dependency
    # un-foldable while leaving the input numerically unchanged
    mix = jax.jit(lambda mv: x0 + 1e-12 * mv.sum())

    say("warmup/compile")
    hm, preds, maxvals = re_exported.call(x0)
    jax.block_until_ready(hm)
    hm, preds, maxvals = re_exported.call(mix(maxvals))
    jax.block_until_ready(hm)

    say(f"measuring {args.reps} chained dispatches")
    t1 = time.perf_counter()
    for _ in range(args.reps):
        hm, preds, maxvals = re_exported.call(mix(maxvals))
    jax.block_until_ready(hm)
    dt = (time.perf_counter() - t1) / args.reps

    # the artifact executes on ONE device (serving replicates whole
    # artifacts across chips rather than sharding one call), so per-chip
    # throughput is simply batch/dt regardless of how many devices exist
    print(json.dumps({
        "metric": f"serving images/sec/chip (jax.export artifact, "
                  f"{label} b={args.batch} {S}px bf16, argmax decode "
                  f"included)",
        "value": round(args.batch / dt, 2),
        "unit": "images/sec/chip",
        "batch": args.batch,
        "ms_per_batch": round(dt * 1e3, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
