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


def test_animal_device_twins_match_host():
    """mpii_transform_points / draw_labelmap match the host (reference-parity
    tested) implementations exactly."""
    from uda_poseestimation_tpu.data.util import (
        draw_labelmap_ori, transform as host_transform)
    from uda_poseestimation_tpu.ops.device_aug import (
        draw_labelmap, mpii_transform_points)

    rng = np.random.RandomState(0)
    for _ in range(20):
        c = rng.uniform(50, 350, 2)
        s = float(rng.uniform(0.5, 2.5))
        pts = rng.uniform(-50, 450, (7, 2)).astype(np.float32)
        dev = np.asarray(mpii_transform_points(jnp.asarray(pts), jnp.asarray(c),
                                               jnp.asarray(s), 16))
        for i in range(7):
            host = host_transform(pts[i], c, s, [16, 16])
            np.testing.assert_array_equal(dev[i], host)

    for label_type in ("Gaussian", "Cauchy"):
        for _ in range(20):
            pt = rng.randint(-5, 20, 2)
            host_map, host_vis = draw_labelmap_ori(np.zeros((16, 16), np.float32),
                                                   pt.astype(np.float32), 1,
                                                   label_type=label_type)
            dev_map, dev_vis = draw_labelmap(jnp.asarray(pt), 1.0, 16, label_type)
            assert float(dev_vis) == host_vis
            np.testing.assert_allclose(np.asarray(dev_map), host_map, atol=2e-6)


def test_animal_augment_batch_shapes():
    from uda_poseestimation_tpu.ops.device_aug import animal_augment_batch
    cfg = DeviceAugConfig(image_size=64, heatmap_size=16, sigma=1.0,
                          rotation=60.0, shear=(-30.0, 30.0),
                          translate=(0.05, 0.05), scale=(0.6, 1.3), color=0.0)
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32))
    kp = jnp.asarray(rng.uniform(50, 350, (4, 18, 2)).astype(np.float32))
    vis = jnp.ones((4, 18))
    centers = jnp.asarray(rng.uniform(100, 300, (4, 2)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.8, 2.0, (4,)).astype(np.float32))
    out = jax.jit(lambda r: animal_augment_batch(
        r, images, kp, vis, centers, scales, cfg, n_views=2,
        mean=[0.3999, 0.3909, 0.3871]))(jax.random.PRNGKey(2))
    assert out["image"].shape == (2, 4, 64, 64, 3)
    assert out["target"].shape == (2, 4, 18, 16, 16)
    assert out["target_weight"].shape == (2, 4, 18, 1)
    assert out["aug_param"].shape == (2, 4, 6)
    assert np.isfinite(np.asarray(out["image"])).all()
