"""Tests for the on-device augmentation fast path."""

import jax
import jax.numpy as jnp
import numpy as np

from uda_poseestimation_tpu.ops.device_aug import (
    DeviceAugConfig,
    augment_batch,
    augment_view,
)


def _dot_image(size, x, y):
    img = np.zeros((size, size, 3), np.float32)
    img[y - 2:y + 3, x - 2:x + 3] = 1.0
    return img


def test_keypoints_follow_image():
    """A bright dot at a keypoint must land at the transformed keypoint."""
    cfg = DeviceAugConfig(image_size=128, heatmap_size=32, sigma=2.0,
                          resize_scale=(0.7, 1.0), rotation=40.0,
                          shear=(-15.0, 15.0), translate=(0.05, 0.05),
                          scale=(0.85, 1.2), color=0.0)
    hits = total = 0
    for seed in range(8):
        x, y = 50 + seed * 3, 70 - seed * 2
        img = jnp.asarray(_dot_image(128, x, y))
        kp = jnp.asarray([[float(x), float(y)]])
        vis = jnp.ones((1,))
        out = jax.jit(lambda r, im, k, v: augment_view(r, im, k, v, cfg))(
            jax.random.PRNGKey(seed), img, kp, vis)
        arr = np.asarray(out["image"])[:, :, 0]
        if arr.max() < 0.5:
            continue  # dot left the frame
        yy, xx = np.unravel_index(arr.argmax(), arr.shape)
        kx, ky = np.asarray(out["keypoint2d"])[0]
        if not (0 <= kx < 128 and 0 <= ky < 128):
            continue
        total += 1
        if np.hypot(xx - kx, yy - ky) < 5.0:
            hits += 1
    assert total >= 4 and hits == total, (hits, total)


def test_aug_param_inverts_view():
    """inverse_warp with the emitted aug_param recovers the pre-affine argmax."""
    from uda_poseestimation_tpu.ops import inverse_warp_heatmaps
    cfg = DeviceAugConfig(image_size=64, heatmap_size=16, sigma=2.0,
                          rotation=30.0, shear=(-10.0, 10.0),
                          translate=(0.05, 0.05), scale=(0.9, 1.1),
                          color=0.0, use_rrc=False)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32))
    kps = jnp.asarray(rng.uniform(20, 44, (4, 5, 2)).astype(np.float32))
    vis = jnp.ones((4, 5))
    out = jax.jit(lambda r: augment_batch(r, images, kps, vis, cfg, n_views=1))(
        jax.random.PRNGKey(3))
    target = out["target"][0]  # (B, K, h, w)
    aug = out["aug_param"][0]
    recon = inverse_warp_heatmaps(target, aug, 4.0)
    flat = np.asarray(recon).reshape(4, 5, -1)
    got = np.stack([flat.argmax(-1) % 16, flat.argmax(-1) // 16], -1)
    expect = np.asarray(kps) / 4.0
    valid = flat.max(-1) > 0.5
    assert valid.mean() > 0.6
    err = np.abs(got - expect).max(-1)[valid]
    assert np.percentile(err, 90) <= 2.0


def test_multi_view_batch_shapes():
    cfg = DeviceAugConfig(image_size=64, heatmap_size=16, color=0.25)
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(6, 64, 64, 3).astype(np.float32))
    kps = jnp.asarray(rng.uniform(10, 54, (6, 21, 2)).astype(np.float32))
    vis = jnp.ones((6, 21))
    out = jax.jit(lambda r: augment_batch(
        r, images, kps, vis, cfg, n_views=2,
        mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225]))(
        jax.random.PRNGKey(0))
    assert out["image"].shape == (2, 6, 64, 64, 3)
    assert out["target"].shape == (2, 6, 21, 16, 16)
    assert out["target_weight"].shape == (2, 6, 21, 1)
    assert out["aug_param"].shape == (2, 6, 6)
    # normalized images go negative
    assert float(out["image"].min()) < 0
    # two views differ
    assert not np.allclose(np.asarray(out["image"][0]), np.asarray(out["image"][1]))
