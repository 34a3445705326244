"""Functional keypoint losses — JAX twins of reference lib/models/loss.py.

All losses take NCHW (B, K, H, W) heatmaps (the reference tensor contract).
Exact-semantics notes:

- joints_mse_loss (:11-49): elementwise 0.5*MSE over flattened heatmaps,
  per-joint weights broadcast as (B, K, 1); 'mean' reduces over B*K*HW
  (weights do NOT renormalize the denominator), 'none' -> (B, K);
- cons_loss (:119-132): diff multiplied by tea_mask (B, K) broadcast over
  pixels, squared, averaged over channels then over everything;
- joints_kl_loss (:52-95): KL(log_softmax(pred) || target / target.sum());
- ent_loss (:97-117): normalized per-joint entropy with optional threshold
  filtering (threshold filtering requires a concrete boolean take, so the
  jittable version implements it as masked mean);
- coral_loss (:176-208): covariance alignment with the reference's exact
  (x^T x - (1x)^T(1x)/n)/(n-1) covariance and frobenius normalization.

The unused-but-exported variants (KL/Ent/Softmax/CORAL) are provided for API
parity per SURVEY.md §2.2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def joints_mse_loss(output, target, target_weight=None, reduction: str = "mean"):
    b, k = output.shape[:2]
    pred = output.reshape(b, k, -1)
    gt = target.reshape(b, k, -1)
    loss = 0.5 * (pred - gt) ** 2
    if target_weight is not None:
        loss = loss * target_weight.reshape(b, k, 1)
    if reduction == "mean":
        return loss.mean()
    return loss.mean(axis=-1)  # 'none' -> (B, K)


def joints_kl_loss(output, target, target_weight=None, reduction: str = "mean",
                   epsilon: float = 0.0):
    b, k = output.shape[:2]
    pred = jax.nn.log_softmax(output.reshape(b, k, -1), axis=-1)
    gt = target.reshape(b, k, -1) + epsilon
    gt = gt / gt.sum(axis=-1, keepdims=True)
    # torch KLDivLoss(log_input, target) = target * (log(target) - log_input),
    # with 0 log 0 := 0
    log_gt = jnp.where(gt > 0, jnp.log(jnp.maximum(gt, 1e-38)), 0.0)
    loss = (gt * (log_gt - pred)).sum(axis=-1)  # (B, K)
    if target_weight is not None:
        loss = loss * target_weight.reshape(b, k)
    if reduction == "mean":
        return loss.mean()
    return loss.mean(axis=-1)


def ent_loss(x, threshold: float = -1.0, reduction: str = "mean"):
    n, c = x.shape[:2]
    h, w = x.shape[2], x.shape[3]
    flat = x.reshape(n, c, -1)
    p = jax.nn.softmax(flat, axis=2)
    logp = jax.nn.log_softmax(flat, axis=2)
    ent = -(p * logp).sum(axis=2) / jnp.log(float(h * w))  # (N, C)
    if threshold > 0:
        mask = ent < threshold
        denom = jnp.maximum(mask.sum(), 1)
        return jnp.where(mask, ent, 0.0).sum() / denom
    if reduction == "mean":
        return ent.mean()
    return ent.mean(axis=-1)


def cons_loss(stu_out, tea_out, valid_mask=None, tea_mask=None):
    diff = stu_out - tea_out
    if tea_mask is not None:
        diff = diff * tea_mask[:, :, None, None].astype(diff.dtype)
    loss_map = jnp.mean(diff ** 2, axis=1)  # (B, H, W)
    if valid_mask is not None:
        denom = jnp.maximum(valid_mask.sum() * loss_map.shape[-1] * loss_map.shape[-2], 1)
        return jnp.where(valid_mask[:, None, None], loss_map, 0.0).sum() / denom
    return loss_map.mean()


def cons_softmax_loss(stu_out, tea_out, valid_mask=None, tea_mask=None):
    b, k, h, w = stu_out.shape
    stu = jax.nn.softmax(stu_out.reshape(b, k, -1), axis=-1).reshape(b, k, h, w)
    tea = jax.nn.softmax(tea_out.reshape(b, k, -1), axis=-1).reshape(b, k, h, w)
    return cons_loss(stu, tea, valid_mask, tea_mask)


def cons_kl_loss(stu_out, tea_out, valid_mask=None, tea_mask=None):
    b, k, h, w = stu_out.shape
    stu = jax.nn.log_softmax(stu_out.reshape(b, k, -1), axis=-1)
    tea_log = jax.nn.log_softmax(tea_out.reshape(b, k, -1), axis=-1)
    tea = jnp.exp(tea_log)
    # The reference passes LOG-probs as the KLDivLoss target (loss.py:165-166)
    # — a bug upstream: torch evaluates target*log(target) via xlogy, which is
    # NaN for the (always negative) log-prob targets, so the reference's
    # ConsKLLoss is NaN whenever used (it never is; ConsLoss is the only
    # consistency criterion the trainers select). DELIBERATE DEVIATION: keep
    # the same broken log-prob target but guard log(t) for t<=0, yielding the
    # finite value -t*stu instead of NaN. Structure preserved, poison removed.
    t = tea_log
    log_t = jnp.where(t > 0, jnp.log(jnp.maximum(t, 1e-38)), 0.0)
    loss_map = (t * (log_t - stu)).reshape(b, k, h, w)
    if tea_mask is not None:
        loss_map = loss_map * tea_mask[:, :, None, None].astype(loss_map.dtype)
    loss_map = jnp.mean(loss_map, axis=1)
    if valid_mask is not None:
        denom = jnp.maximum(valid_mask.sum() * h * w, 1)
        return jnp.where(valid_mask[:, None, None], loss_map, 0.0).sum() / denom
    return loss_map.mean()


def coral_loss(src_out, tgt_out, coral_downsample: int = 1, prior=None):
    if coral_downsample > 1:
        tgt_out = _bilinear_downsample(tgt_out, coral_downsample)
    n, c, h, w = tgt_out.shape
    tgt = tgt_out.reshape(n, -1)

    def cov(x):
        # parity-critical matmuls: JAX's default TPU matmul precision
        # truncates operands to bf16; the covariance difference below
        # subtracts two nearly-equal large matrices, so full f32 is required
        # to stay within the torch oracle's tolerance (see CLAUDE.md)
        mm = functools.partial(jnp.matmul, precision="float32")
        tmp = mm(jnp.ones((1, n), x.dtype), x)
        return (mm(x.T, x) - mm(tmp.T, tmp) / n) / (n - 1)

    if prior is not None:
        cs = prior
    else:
        if coral_downsample > 1:
            src_out = _bilinear_downsample(src_out, coral_downsample)
        cs = cov(src_out.reshape(n, -1))
    ct = cov(tgt)
    loss = jnp.sqrt(((cs - ct) ** 2).sum())
    return loss / (4.0 * (c * h * w) ** 2)


def _bilinear_downsample(x, factor: int):
    n, c, h, w = x.shape
    new_h, new_w = int(h / factor), int(w / factor)
    img = jnp.transpose(x, (0, 2, 3, 1))
    # antialias=False: torch F.interpolate(mode='bilinear') point-samples a
    # 2x2 neighborhood at half-pixel centers; jax's default antialias=True
    # would widen the filter on downsampling and diverge from the reference
    img = jax.image.resize(img, (n, new_h, new_w, c), method="bilinear",
                           antialias=False)
    return jnp.transpose(img, (0, 3, 1, 2))
