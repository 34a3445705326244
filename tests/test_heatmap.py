"""Golden tests for the vectorized heatmap ops against loop oracles.

The oracles below are independent re-derivations of the reference semantics
(lib/datasets/util.py:12-70 generate_target; utils.py:54-109 get_max_preds /
rectify), written as explicit per-joint loops the way the reference computes
them, so the fused JAX versions are checked element-for-element.
"""

import numpy as np
import jax.numpy as jnp

from uda_poseestimation_tpu.ops import (
    generate_target,
    generate_target_batch,
    get_max_preds,
    rectify,
)


def oracle_generate_target(joints, joints_vis, heatmap_size, sigma, image_size):
    num_joints = joints.shape[0]
    target_weight = np.ones((num_joints, 1), dtype=np.float32)
    target_weight[:, 0] = joints_vis[:, 0]
    W, H = heatmap_size
    target = np.zeros((num_joints, H, W), dtype=np.float32)
    tmp_size = sigma * 3
    for j in range(num_joints):
        stride = np.array(image_size, float) / np.array(heatmap_size, float)
        mu_x = int(joints[j][0] / stride[0] + 0.5)
        mu_y = int(joints[j][1] / stride[1] + 0.5)
        ul = [int(mu_x - tmp_size), int(mu_y - tmp_size)]
        br = [int(mu_x + tmp_size + 1), int(mu_y + tmp_size + 1)]
        if mu_x >= W or mu_y >= H or mu_x < 0 or mu_y < 0:
            target_weight[j] = 0
            continue
        size = 2 * tmp_size + 1
        x = np.arange(0, size, 1, np.float32)
        y = x[:, np.newaxis]
        x0 = y0 = size // 2
        g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma ** 2))
        g_x = max(0, -ul[0]), min(br[0], W) - ul[0]
        g_y = max(0, -ul[1]), min(br[1], H) - ul[1]
        img_x = max(0, ul[0]), min(br[0], W)
        img_y = max(0, ul[1]), min(br[1], H)
        if target_weight[j] > 0.5:
            target[j][img_y[0]:img_y[1], img_x[0]:img_x[1]] = g[g_y[0]:g_y[1], g_x[0]:g_x[1]]
    return target, target_weight


def oracle_rectify(hm, sigma):
    b, c, h, w = hm.shape
    rec = np.zeros_like(hm)
    flat = hm.reshape(b, c, -1)
    idx = np.argmax(flat, axis=2)
    maxv = np.amax(flat, axis=2)
    px = (idx % w).astype(np.float32)
    py = np.floor(idx / w).astype(np.float32)
    px = px * (maxv > 0)
    py = py * (maxv > 0)
    tmp = 3 * sigma
    for bi in range(b):
        for ci in range(c):
            mu_x, mu_y = px[bi, ci], py[bi, ci]
            ul = [int(mu_x - tmp), int(mu_y - tmp)]
            br = [int(mu_x + tmp + 1), int(mu_y + tmp + 1)]
            if mu_x >= h or mu_y >= w or mu_x < 0 or mu_y < 0:
                continue
            size = 2 * tmp + 1
            x = np.arange(0, size, 1, np.float32)
            y = x[:, np.newaxis]
            x0 = y0 = size // 2
            g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma ** 2))
            g_x = max(0, -ul[0]), min(br[0], h) - ul[0]
            g_y = max(0, -ul[1]), min(br[1], w) - ul[1]
            img_x = max(0, ul[0]), min(br[0], h)
            img_y = max(0, ul[1]), min(br[1], w)
            rec[bi, ci, img_y[0]:img_y[1], img_x[0]:img_x[1]] = g[g_y[0]:g_y[1], g_x[0]:g_x[1]]
    return rec


def test_generate_target_matches_oracle():
    rng = np.random.RandomState(0)
    # fractional sigma exercises the trunc-based paste-window quirks
    # (10-wide window for sigma=1.5, center shifted near the low border)
    for sigma, img, hm in [(2, (256, 256), (64, 64)), (1, (256, 256), (64, 64)),
                           (2, (256, 256), (8, 8)), (1.5, (256, 256), (64, 64)),
                           (1.5, (64, 64), (16, 16))]:
        kp = rng.uniform(-60, 320, size=(21, 2)).astype(np.float32)
        vis = (rng.rand(21, 1) > 0.3).astype(np.float32)
        ref_t, ref_w = oracle_generate_target(kp, vis, hm, sigma, img)
        got_t, got_w = generate_target(kp, vis, hm, sigma, img)
        np.testing.assert_allclose(np.asarray(got_t), ref_t, atol=5e-6)
        np.testing.assert_allclose(np.asarray(got_w), ref_w, atol=0)


def test_generate_target_batch():
    rng = np.random.RandomState(1)
    kp = rng.uniform(-20, 300, size=(4, 16, 2)).astype(np.float32)
    vis = (rng.rand(4, 16) > 0.2).astype(np.float32)
    t, w = generate_target_batch(kp, vis, (64, 64), 2, (256, 256))
    assert t.shape == (4, 16, 64, 64) and w.shape == (4, 16, 1)
    for i in range(4):
        ref_t, ref_w = oracle_generate_target(kp[i], vis[i][:, None], (64, 64), 2, (256, 256))
        np.testing.assert_allclose(np.asarray(t[i]), ref_t, atol=5e-6)
        np.testing.assert_allclose(np.asarray(w[i]), ref_w, atol=0)


def test_get_max_preds():
    rng = np.random.RandomState(2)
    hm = rng.randn(3, 5, 16, 24).astype(np.float32)
    hm[1, 2] = -np.abs(hm[1, 2])  # all-negative channel -> masked pred
    preds, maxv = get_max_preds(jnp.asarray(hm))
    flat = hm.reshape(3, 5, -1)
    idx = flat.argmax(2)
    np.testing.assert_allclose(np.asarray(maxv)[..., 0], flat.max(2), atol=1e-7)
    exp_x = (idx % 24) * (flat.max(2) > 0)
    exp_y = (idx // 24) * (flat.max(2) > 0)
    np.testing.assert_allclose(np.asarray(preds)[..., 0], exp_x, atol=0)
    np.testing.assert_allclose(np.asarray(preds)[..., 1], exp_y, atol=0)


def test_rectify_matches_oracle():
    rng = np.random.RandomState(3)
    for sigma in (1, 2, 1.5):
        hm = rng.rand(2, 6, 64, 64).astype(np.float32)
        hm[0, 1] *= -1.0  # all-negative channel
        ref = oracle_rectify(hm, sigma)
        got = rectify(jnp.asarray(hm), sigma)
        np.testing.assert_allclose(np.asarray(got), ref, atol=5e-6)
