"""Tests for PCK accuracy (numpy + jit twins agree, oracle parity) and AdaIN."""

import numpy as np
import jax.numpy as jnp
import torch

from uda_poseestimation_tpu.ops import (
    accuracy,
    keypoint_pck_accuracy,
    calc_mean_std,
    adain,
    gram_matrix,
    generate_target_batch,
)


def test_accuracy_numpy_vs_jit():
    rng = np.random.RandomState(0)
    kp = rng.uniform(0, 250, size=(16, 21, 2)).astype(np.float32)
    vis = np.ones((16, 21), np.float32)
    target = np.asarray(generate_target_batch(kp, vis, (64, 64), 2, (256, 256))[0])
    noise_kp = kp + rng.randn(16, 21, 2) * 12
    output = np.asarray(generate_target_batch(noise_kp, vis, (64, 64), 2, (256, 256))[0])

    acc_np, avg_np, cnt_np, pred_np = accuracy(output, target)
    acc_j, avg_j, cnt_j, pred_j = keypoint_pck_accuracy(jnp.asarray(output), jnp.asarray(target))
    np.testing.assert_allclose(acc_np, np.asarray(acc_j), atol=1e-6)
    assert abs(avg_np - float(avg_j)) < 1e-6
    assert cnt_np == int(cnt_j)
    np.testing.assert_allclose(pred_np, np.asarray(pred_j), atol=0)


def test_accuracy_excludes_low_gt():
    """GT keypoints with both coords <= 1 are excluded (dist -1)."""
    output = np.zeros((2, 3, 64, 64), np.float32)
    target = np.zeros((2, 3, 64, 64), np.float32)
    # channel 0: GT at (0,0)-ish -> excluded entirely
    target[:, 0, 0, 0] = 1.0
    output[:, 0, 10, 10] = 1.0
    # channel 1: GT at (30,30), pred 1px away -> hit
    target[:, 1, 30, 30] = 1.0
    output[:, 1, 30, 31] = 1.0
    # channel 2: GT at (30,30), pred 40px away -> miss
    target[:, 2, 30, 30] = 1.0
    output[:, 2, 60, 60] = 1.0
    acc, avg, cnt, _ = accuracy(output, target)
    assert acc[0] == -1
    assert acc[1] == 1.0 and acc[2] == 0.0
    assert cnt == 2 and abs(avg - 0.5) < 1e-9


def torch_mean_std(x, eps=1e-5):
    n, c = x.shape[:2]
    var = x.reshape(n, c, -1).var(dim=2) + eps
    std = var.sqrt().reshape(n, c, 1, 1)
    mean = x.reshape(n, c, -1).mean(dim=2).reshape(n, c, 1, 1)
    return mean, std


def test_calc_mean_std_and_adain_match_torch():
    rng = np.random.RandomState(1)
    content = rng.randn(2, 8, 13, 17).astype(np.float32)
    style = rng.randn(2, 8, 13, 17).astype(np.float32)
    tm, ts = torch_mean_std(torch.tensor(style))
    m, s = calc_mean_std(jnp.asarray(style))
    np.testing.assert_allclose(np.asarray(m), tm.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s), ts.numpy(), atol=1e-5)

    cm, cs = torch_mean_std(torch.tensor(content))
    ref = ((torch.tensor(content) - cm) / cs) * ts + tm
    got = adain(jnp.asarray(content), jnp.asarray(style))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-4)

    # NHWC path agrees with NCHW
    got_nhwc = adain(jnp.asarray(content.transpose(0, 2, 3, 1)),
                     jnp.asarray(style.transpose(0, 2, 3, 1)), data_format="NHWC")
    np.testing.assert_allclose(np.asarray(got_nhwc).transpose(0, 3, 1, 2), ref.numpy(), atol=1e-4)


def test_gram_matrix():
    rng = np.random.RandomState(2)
    x = rng.randn(3, 6, 5, 7).astype(np.float32)
    t = torch.tensor(x)
    feats = t.view(3, 6, -1)
    ref = feats.bmm(feats.transpose(1, 2)) / (6 * 5 * 7)
    np.testing.assert_allclose(np.asarray(gram_matrix(jnp.asarray(x))), ref.numpy(), atol=1e-5)
    got_nhwc = gram_matrix(jnp.asarray(x.transpose(0, 2, 3, 1)), data_format="NHWC")
    np.testing.assert_allclose(np.asarray(got_nhwc), ref.numpy(), atol=1e-5)
