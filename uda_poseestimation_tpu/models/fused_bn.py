"""Flax modules wiring the fused 1x1-conv + BN-stats probe (ops/bn_fuse.py)
into ResNet bottlenecks WITHOUT changing the variable tree.

``Conv1x1Stats`` creates the same ``<name>/kernel`` parameter as
``nn.Conv(features, (1, 1), use_bias=False, name=<name>)``; ``StatsBatchNorm``
creates the same ``scale``/``bias`` params and ``batch_stats`` ``mean``/``var``
as ``nn.BatchNorm`` — so checkpoints, torch ports and the EMA teacher are
bit-compatible whether the probe flag is on or off.

``StatsBatchNorm`` mirrors flax 0.12 ``nn.BatchNorm`` numerics exactly
(flax/linen/normalization.py): f32 statistics, one-pass
``var = max(0, E[y^2] - E[y]^2)``, running update
``ra = m*ra + (1-m)*batch`` skipped during init, and the same
``(x - mean) * (rsqrt(var + eps) * scale) + bias`` op order with the final
cast to ``dtype``. The only difference vs the unfused pair is WHERE the
sums come from: the conv's Pallas epilogue instead of a separate XLA
reduction over the conv output (float reduction order, ~1e-3 relative on
bf16 activations).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from ..ops.bn_fuse import conv1x1_bn_stats


class Conv1x1Stats(nn.Module):
    """1x1 conv via the fused matmul+stats kernel; returns (y, mean, var).

    Parameter-compatible with ``nn.Conv(features, (1, 1), use_bias=False)``:
    one ``kernel`` of shape (1, 1, Cin, features), f32, lecun_normal init.
    """

    features: int
    strides: int = 1
    dtype: Any = jnp.float32
    impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, c, self.features), jnp.float32)
        x = x.astype(self.dtype)
        y, s1, s2 = conv1x1_bn_stats(x, kernel.astype(self.dtype),
                                     strides=self.strides, impl=self.impl)
        n = y.shape[0] * y.shape[1] * y.shape[2]
        mean = s1 / n
        # flax _compute_stats: one-pass variance, clipped at 0
        var = jnp.maximum(0.0, s2 / n - mean * mean)
        return y, mean, var


class StatsBatchNorm(nn.Module):
    """``nn.BatchNorm`` twin that takes precomputed batch statistics.

    Only the train path (``use_running_average=False``) is ever routed here
    (the Bottleneck keeps plain ``nn.BatchNorm`` for eval), but the running-
    average branch is implemented for completeness/tests.
    """

    use_running_average: bool = False
    momentum: float = 0.99
    epsilon: float = 1e-5
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mean=None, var=None):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (c,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (c,))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        elif not self.is_initializing():
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1 - self.momentum) * mean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1 - self.momentum) * var)
        scale = self.param("scale", nn.initializers.ones, (c,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,),
                          self.param_dtype)
        shape = (1,) * (x.ndim - 1) + (c,)
        y = x - mean.reshape(shape)
        mul = lax.rsqrt(var.reshape(shape) + self.epsilon) \
            * scale.reshape(shape)
        y = y * mul + bias.reshape(shape)
        if self.dtype is None:
            out_dt = jnp.promote_types(x.dtype, self.param_dtype)
        else:
            out_dt = self.dtype
        return y.astype(out_dt)
