"""PCK@0.05 keypoint accuracy — numpy host API + jittable device twin.

Reproduces reference lib/keypoint_detection.py:9-94 exactly:

- predictions/targets decoded by heatmap argmax (maxval>0 masked);
- normalized distance with norm = [H, W] / 10 (so threshold 0.5 means
  PCK@0.05 of the heatmap extent, 6.4px on 64x64 when 3.2px... strictly
  0.5 * 6.4 = 3.2 normalized units -> 0.5 * heatmap/10);
- ground-truth keypoints with both coords <= 1 are excluded (dist = -1);
- per-keypoint accuracy is -1 when no valid samples; the average skips
  negative entries (zero entries *are* counted).

The numpy ``accuracy`` mirrors the reference's exact signature/returns for
trainer/validator parity; ``keypoint_pck_accuracy`` is the fully-vectorized
jittable version used for on-device metrics inside the train step.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def get_max_preds_np(batch_heatmaps: np.ndarray):
    """Vectorized numpy argmax decode, same contract as the reference."""
    assert isinstance(batch_heatmaps, np.ndarray) and batch_heatmaps.ndim == 4
    b, k, h, w = batch_heatmaps.shape
    flat = batch_heatmaps.reshape(b, k, -1)
    idx = np.argmax(flat, axis=2)
    maxvals = np.amax(flat, axis=2).reshape(b, k, 1)
    preds = np.stack([(idx % w).astype(np.float32),
                      np.floor(idx.astype(np.float32) / w)], axis=-1)
    preds *= (maxvals > 0.0).astype(np.float32)
    return preds, maxvals


def _dists_np(preds, target, norm):
    """(B, K, 2) x2 + (B, 2) -> (K, B) normalized distances, -1 where GT<=1."""
    valid = (target[..., 0] > 1) & (target[..., 1] > 1)  # (B, K)
    diff = (preds - target) / norm[:, None, :]
    d = np.linalg.norm(diff, axis=-1)  # (B, K)
    return np.where(valid, d, -1.0).T.astype(np.float32)


def _dist_acc_np(dists_k, thr=0.5):
    cal = dists_k != -1
    n = cal.sum()
    if n > 0:
        return float((dists_k[cal] < thr).sum()) / n
    return -1


def accuracy(output: np.ndarray, target: np.ndarray, hm_type: str = "gaussian", thr: float = 0.5):
    """Reference-compatible PCK accuracy (lib/keypoint_detection.py:65-94).

    Args:
        output, target: (B, K, H, W) numpy heatmaps.

    Returns:
        (per-keypoint acc array (K,), avg over valid keypoints, count of
        valid keypoints, decoded preds (B, K, 2)).
    """
    k = output.shape[1]
    pred, _ = get_max_preds_np(output)
    if hm_type == "gaussian":
        tgt, _ = get_max_preds_np(target)
        h, w = output.shape[2], output.shape[3]
        norm = np.ones((pred.shape[0], 2)) * np.array([h, w]) / 10
    else:  # pragma: no cover - reference only defines gaussian
        tgt = target
        norm = np.ones((pred.shape[0], 2))
    dists = _dists_np(pred, tgt, norm)

    acc = np.zeros(k)
    avg_acc = 0.0
    cnt = 0
    for i in range(k):
        acc[i] = _dist_acc_np(dists[i], thr)
        if acc[i] >= 0:
            avg_acc += acc[i]
            cnt += 1
    avg_acc = avg_acc / cnt if cnt != 0 else 0
    return acc, avg_acc, cnt, pred


def keypoint_pck_accuracy(output, target, thr: float = 0.5):
    """Jittable PCK: same math as ``accuracy`` without host loops.

    Args:
        output, target: (B, K, H, W) jnp heatmaps.

    Returns:
        per_kpt: (K,) accuracy, -1 where no valid sample;
        avg: scalar average over keypoints with acc >= 0;
        cnt: number of keypoints with acc >= 0;
        preds: (B, K, 2).
    """
    from .heatmap import get_max_preds

    b, k, h, w = output.shape
    pred, _ = get_max_preds(output)
    tgt, _ = get_max_preds(target)
    norm = jnp.array([h, w], jnp.float32) / 10.0
    valid = (tgt[..., 0] > 1) & (tgt[..., 1] > 1)  # (B, K)
    d = jnp.linalg.norm((pred - tgt) / norm, axis=-1)  # (B, K)
    hits = ((d < thr) & valid).sum(axis=0).astype(jnp.float32)  # (K,)
    n_valid = valid.sum(axis=0).astype(jnp.float32)
    per_kpt = jnp.where(n_valid > 0, hits / jnp.maximum(n_valid, 1.0), -1.0)
    counted = per_kpt >= 0
    cnt = counted.sum()
    avg = jnp.where(cnt > 0, jnp.where(counted, per_kpt, 0.0).sum() / jnp.maximum(cnt, 1), 0.0)
    return per_kpt, avg, cnt, pred
