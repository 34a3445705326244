"""Export a trained PoseResNet to a portable serving artifact (StableHLO).

``jax.export`` AOT-lowers the jitted inference function — normalized images
-> heatmaps + decoded keypoint predictions (``ops.heatmap.get_max_preds``,
the reference's ``utils.get_max_preds`` decode, utils.py:54-75) — with a
SYMBOLIC batch dimension, and serializes it into a self-contained binary
blob. A serving process deserializes and calls it with plain ``jax`` only:
no model code, no checkpoint parsing, no this-library import — the
TPU-native analog of TorchScript export. The reference repo has no serving
path at all (its ``--phase test`` re-runs the full trainer CLI).

The artifact embeds the trained weights as closed-over constants and is
exported for BOTH cpu and tpu lowering platforms by default, so the same
file serves on a TPU pod and on a CPU canary.

Usage:
    python tools/export_inference.py CKPT OUT.jaxexp \
        [--arch pose_resnet101] [--num-keypoints 21] [--image-size 256] \
        [--which teacher] [--platforms cpu,tpu] [--selfcheck]

Serving side:

    import jax, jax.numpy as jnp
    exported = jax.export.deserialize(open("OUT.jaxexp", "rb").read())
    heatmaps, preds, maxvals = exported.call(images)   # (B,256,256,3) f32
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_inference_fn(model):
    """images (b, S, S, 3) f32 -> (heatmaps, preds, maxvals).

    ``preds``/``maxvals`` follow the reference's argmax decode contract
    (zeroed where maxval <= 0); heatmaps come back f32 regardless of the
    model compute dtype.
    """
    import jax.numpy as jnp

    from uda_poseestimation_tpu.ops.heatmap import get_max_preds

    def fn(params, stats, images):
        y = model.apply({"params": params, "batch_stats": stats},
                        images, train=False)
        y = y.astype(jnp.float32)
        preds, maxvals = get_max_preds(y)
        return y, preds, maxvals

    return fn


def export_model(model, variables, image_size: int, platforms):
    """jax.export the closed-over-weights inference fn, symbolic batch."""
    import jax
    import jax.numpy as jnp

    fn = build_inference_fn(model)
    params, stats = variables["params"], variables.get("batch_stats", {})
    closed = jax.jit(lambda images: fn(params, stats, images))
    (b,) = jax.export.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, image_size, image_size, 3), jnp.float32)
    return jax.export.export(closed, platforms=list(platforms))(spec)


def load_variables(ckpt_path: str, arch: str, num_keypoints: int,
                   image_size: int, which: str = "teacher", dtype=None):
    """Checkpoint (ours or reference torch) -> model + merged variables."""
    import jax
    import jax.numpy as jnp

    from uda_poseestimation_tpu import models as model_registry
    from uda_poseestimation_tpu.utils.checkpoint import (
        filtered_update,
        load_checkpoint,
    )

    model = model_registry.__dict__[arch](
        num_keypoints=num_keypoints, dtype=dtype or jnp.bfloat16)
    x = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, x, train=False))(
        jax.random.PRNGKey(0))
    ckpt = load_checkpoint(ckpt_path)
    entry = ckpt.get(which) or ckpt.get("student") or ckpt
    merged = {
        "params": filtered_update(variables["params"], entry["params"]),
        "batch_stats": filtered_update(variables["batch_stats"],
                                       entry.get("batch_stats", {})),
    }
    return model, merged


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Export a PoseResNet checkpoint to a jax.export artifact")
    p.add_argument("checkpoint")
    p.add_argument("out")
    p.add_argument("--arch", default="pose_resnet101")
    p.add_argument("--num-keypoints", type=int, default=21)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--which", default="teacher",
                   choices=["teacher", "student"],
                   help="which net to export (the reference validates the "
                        "teacher after the pretrain phase)")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering platforms baked into the "
                        "artifact")
    p.add_argument("--selfcheck", action="store_true",
                   help="deserialize the written artifact and compare "
                        "against a direct forward on random inputs")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    model, variables = load_variables(args.checkpoint, args.arch,
                                      args.num_keypoints, args.image_size,
                                      args.which)
    exported = export_model(model, variables, args.image_size,
                            args.platforms.split(","))
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {args.which} {args.arch} (K={args.num_keypoints}, "
          f"{args.image_size}px, platforms={args.platforms}) -> {args.out} "
          f"({len(blob) / 1e6:.1f} MB)")

    if args.selfcheck:
        import jax.numpy as jnp

        re = jax.export.deserialize(open(args.out, "rb").read())
        x = np.random.RandomState(0).rand(
            2, args.image_size, args.image_size, 3).astype(np.float32)
        hm, preds, maxvals = re.call(x)
        fn = build_inference_fn(model)
        ref_hm, ref_preds, _ = jax.jit(fn)(variables["params"],
                                           variables["batch_stats"], x)
        # The deserialized StableHLO program and the fresh jit are SEPARATE
        # compilations: XLA fuses them differently, so a bf16 model agrees
        # to bf16 precision, not bitwise (measured ~1e-4 abs on TPU).
        # f32 models keep the tight tolerance.
        tight = getattr(model, "dtype", jnp.bfloat16) == jnp.float32
        # (atol: a few bf16 ulps at heatmap magnitude — measured max 2.6e-3
        # single-element outlier on a TPU export of a trained rn101)
        np.testing.assert_allclose(
            np.asarray(hm), np.asarray(ref_hm),
            rtol=0 if tight else 2e-2, atol=1e-5 if tight else 4e-3)
        # The argmax decode can legitimately flip between the two
        # compilations wherever two peaks sit within the bf16 noise floor
        # (on these random selfcheck inputs near-flat heatmaps make ties
        # common). Require exact agreement only where the reference top-2
        # margin clearly exceeds the heatmap tolerance...
        ref = np.asarray(ref_hm)
        flat = ref.reshape(ref.shape[0], ref.shape[1], -1)
        top2 = np.partition(flat, -2, axis=-1)[..., -2:]
        decisive = (top2[..., 1] - top2[..., 0]) > (2e-5 if tight else 8e-3)
        eq = (np.asarray(preds) == np.asarray(ref_preds)).all(axis=-1)
        if (decisive & ~eq).any():
            raise AssertionError(
                f"exported preds disagree on {(decisive & ~eq).sum()} "
                f"decisively-peaked keypoints")
        # ...and that the artifact's decode is self-consistent: its preds
        # must equal the reference argmax decode of its own heatmaps
        # (ties break to the lowest index on every platform).
        from uda_poseestimation_tpu.ops.heatmap import get_max_preds
        own_preds, _ = jax.jit(get_max_preds)(jnp.asarray(np.asarray(hm)))
        np.testing.assert_array_equal(np.asarray(preds),
                                      np.asarray(own_preds))
        same = float(eq.mean())
        print(f"selfcheck ok: heatmaps {tuple(hm.shape)}, preds "
              f"self-consistent, {same:.1%} equal "
              f"({int(decisive.sum())} decisive, all equal)")


if __name__ == "__main__":
    main()
