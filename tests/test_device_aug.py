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

    # sigma=1.5: the fractional-sigma paste (--sigma is a float flag in
    # train_animal) — e.g. pt=4 is visible with its center shifted to 5
    for sigma in (1.0, 1.5):
        for label_type in ("Gaussian", "Cauchy"):
            for _ in range(20):
                pt = rng.randint(-5, 20, 2)
                host_map, host_vis = draw_labelmap_ori(
                    np.zeros((16, 16), np.float32), pt.astype(np.float32),
                    sigma, label_type=label_type)
                dev_map, dev_vis = draw_labelmap(jnp.asarray(pt), sigma, 16,
                                                 label_type)
                assert float(dev_vis) == host_vis
                np.testing.assert_allclose(np.asarray(dev_map), host_map,
                                           atol=2e-6)
    # pin the σ=1.5 pt=4 shifted-center quirk explicitly (matches reference)
    qmap, qvis = draw_labelmap(jnp.asarray(np.array([4, 8])), 1.5, 16)
    assert float(qvis) == 1.0 and int(np.asarray(qmap)[8].argmax()) == 5


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


def test_gaussian_blur_matches_scipy():
    """Device separable blur == scipy.ndimage.gaussian_filter with the same
    truncated support and replicate-edge handling."""
    import scipy.ndimage as ndi

    from uda_poseestimation_tpu.ops.device_aug import gaussian_blur

    rng = np.random.RandomState(3)
    img = rng.rand(48, 48, 3).astype(np.float32)
    max_sigma = 2.0
    r = int(np.ceil(3.0 * max_sigma))
    for sigma in (0.4, 1.0, 1.9):
        got = np.asarray(jax.jit(gaussian_blur, static_argnums=2)(
            jnp.asarray(img), jnp.float32(sigma), max_sigma))
        # scipy normalizes the truncated kernel the same way; truncate is in
        # units of sigma, so pass r/sigma to pin the same static support
        want = np.stack([
            ndi.gaussian_filter(img[..., c], sigma, mode="nearest",
                                truncate=r / sigma)
            for c in range(3)], -1)
        np.testing.assert_allclose(got, want, atol=2e-5), sigma


def test_gaussian_blur_zero_sigma_is_identity():
    from uda_poseestimation_tpu.ops.device_aug import gaussian_blur

    img = np.random.RandomState(4).rand(32, 32, 3).astype(np.float32)
    out = np.asarray(gaussian_blur(jnp.asarray(img), jnp.float32(0.0), 1.5))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_gaussian_blur_close_to_pil():
    """Distributional sanity vs the host/reference PIL GaussianBlur (PIL
    approximates the Gaussian with box blurs; agreement within ~1.5/255)."""
    from PIL import Image, ImageFilter

    from uda_poseestimation_tpu.ops.device_aug import gaussian_blur

    rng = np.random.RandomState(5)
    # smooth-ish test image: blurred noise upsampled
    base = rng.rand(16, 16, 3)
    img_u8 = np.kron(base, np.ones((4, 4, 1)))  # 64x64 blocky
    img_u8 = (img_u8 * 255).astype(np.uint8)
    sigma = 1.2
    pil = Image.fromarray(img_u8).filter(ImageFilter.GaussianBlur(sigma))
    want = np.asarray(pil, np.float32) / 255.0
    got = np.asarray(gaussian_blur(
        jnp.asarray(img_u8.astype(np.float32) / 255.0),
        jnp.float32(sigma), 2.0))
    assert np.abs(got - want).mean() < 1.5 / 255.0
    assert np.abs(got - want).max() < 8.0 / 255.0


def test_augment_view_blur_flag_honored():
    """cfg.blur > 0 must change the image (round-1 bug: silently dropped),
    while keypoints/targets stay identical (blur is photometric only)."""
    cfg0 = DeviceAugConfig(image_size=64, heatmap_size=16, sigma=2.0,
                           color=0.0, blur=0.0, use_rrc=False)
    cfg1 = DeviceAugConfig(image_size=64, heatmap_size=16, sigma=2.0,
                           color=0.0, blur=1.5, use_rrc=False)
    img = jnp.asarray(np.random.RandomState(6).rand(64, 64, 3).astype(np.float32))
    kp = jnp.asarray([[20.0, 30.0], [40.0, 12.0]])
    vis = jnp.ones((2,))
    key = jax.random.PRNGKey(9)
    out0 = augment_view(key, img, kp, vis, cfg0)
    out1 = augment_view(key, img, kp, vis, cfg1)
    assert not np.allclose(np.asarray(out0["image"]), np.asarray(out1["image"]))
    np.testing.assert_allclose(np.asarray(out0["keypoint2d"]),
                               np.asarray(out1["keypoint2d"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out0["target"]),
                               np.asarray(out1["target"]), atol=1e-6)
