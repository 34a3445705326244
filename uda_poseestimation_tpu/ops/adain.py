"""Adaptive instance normalization statistics (AdaIN) and Gram matrices.

JAX twins of reference lib/models/Style_net.py:4-29 and adain/function.py:
per-(sample, channel) spatial mean/std transfer. Parity notes:

- the reference uses torch ``.var(dim=2)`` which is the *unbiased* (n-1)
  estimator; eps=1e-5 is added to the variance before sqrt;
- gram_matrix normalizes by (C * H * W).

These work on channel-leading (N, C, H, W) arrays to match the reference's
contract; the Flax style network calls them on NHWC via the axis argument.
"""

from __future__ import annotations

import jax.numpy as jnp


def calc_mean_std(feat, eps: float = 1e-5, data_format: str = "NCHW"):
    """Per-(N, C) spatial mean and std (unbiased variance + eps, then sqrt).

    Returns mean/std shaped for broadcasting against ``feat``.
    """
    if data_format == "NCHW":
        n, c = feat.shape[:2]
        x = feat.reshape(n, c, -1)
        m = x.mean(axis=2)
        var = x.var(axis=2, ddof=1) + eps
        shape = (n, c, 1, 1)
    else:  # NHWC
        n = feat.shape[0]
        c = feat.shape[-1]
        x = feat.reshape(n, -1, c)
        m = x.mean(axis=1)
        var = x.var(axis=1, ddof=1) + eps
        shape = (n, 1, 1, c)
    return m.reshape(shape), jnp.sqrt(var).reshape(shape)


def adain(content_feat, style_feat, eps: float = 1e-5, data_format: str = "NCHW"):
    """Adaptive instance normalization (Style_net.py:21-29)."""
    style_mean, style_std = calc_mean_std(style_feat, eps, data_format)
    content_mean, content_std = calc_mean_std(content_feat, eps, data_format)
    normalized = (content_feat - content_mean) / content_std
    return normalized * style_std + style_mean


def gram_matrix(feat, data_format: str = "NCHW"):
    """Batched Gram matrix normalized by C*H*W (Style_net.py:14-19)."""
    if data_format == "NCHW":
        b, c, h, w = feat.shape
        x = feat.reshape(b, c, h * w)
    else:
        b, h, w, c = feat.shape
        x = feat.reshape(b, h * w, c).transpose(0, 2, 1)
    # style-loss statistics are parity-critical: keep the contraction in f32
    # (JAX's default matmul precision truncates operands to bf16 on TPU)
    return jnp.einsum("bcx,bdx->bcd", x, x, precision="float32") / (c * h * w)
