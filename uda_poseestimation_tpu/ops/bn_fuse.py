"""Pallas TPU probe: 1x1 conv (MXU matmul) with a fused BatchNorm-stats
epilogue.

Motivation (PERF.md round-3 op-level profile): the ResNet slab of the fused
adaptation step spends ~25 ms in the convs themselves (~124 TFLOP/s, near
peak) and ~31 ms in ``convert_reduce_fusion`` groups — the BatchNorm
statistics / dgamma-dbeta reductions that re-READ every conv output from HBM.
For a training-mode BN the statistics pass is a full extra HBM read of the
conv output; fusing the per-channel ``sum`` / ``sum-of-squares`` into the
conv's MXU epilogue (while the output tile is still in VMEM) deletes that
pass for the 2/3 of bottleneck convs that are 1x1 contractions (conv1,
conv3, downsample — a strided 1x1 conv is an exact subsample + matmul).

This is the VERDICT r4 item-3 measurement probe: exact-math, equivalence-
tested, wired behind ``UDA_BN_FUSE=1`` into the Bottleneck blocks
(models/fused_bn.py) and A/B-measured on the full-step bench. The default
stays whatever PERF.md records as the measured winner.

Reference parity: the reference's torch models use cudnn BatchNorm
(lib/models/pose_resnet.py) — there is no reference-side equivalent of this
fusion; it only reorders a reduction (same E[y]/E[y^2] one-pass statistics
flax BatchNorm computes, f32 accumulation either way), so trainer semantics
are unchanged up to float reduction order.

Sharding note: ``pl.pallas_call`` does not auto-partition under GSPMD. The
probe targets the single-chip bench/trainer path (mesh size 1); multi-chip
runs keep the default unfused path (the flag is read per-process and
defaults off).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:  # pltpu is import-safe on CPU; guard anyway for exotic builds
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _mm_stats_kernel(out_dtype, x_ref, w_ref, y_ref, s1_ref, s2_ref,
                     acc1, acc2):
    """One (j, i) program: y[i-tile, j-tile] = x[i-tile, :] @ w[:, j-tile],
    accumulating per-channel sum / sum-of-squares of the CAST output across
    the i (row) grid dimension in VMEM scratch.

    Grid is (nj, ni) with i minor (TPU iterates the last dim fastest), so for
    a fixed channel tile j the accumulators see all row tiles back to back:
    zeroed at i == 0, flushed to the stats outputs at i == ni - 1.
    """
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    y = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    yc = y.astype(out_dtype)
    y_ref[:] = yc
    # statistics from the CAST values: the unfused path computes BN stats
    # from the conv's (bf16) output, so the fused stats must see the same
    # rounded numbers
    yf = yc.astype(jnp.float32)

    @pl.when(i == 0)
    def _():
        acc1[:] = jnp.zeros_like(acc1)
        acc2[:] = jnp.zeros_like(acc2)

    acc1[:] += jnp.sum(yf, axis=0, keepdims=True)
    acc2[:] += jnp.sum(yf * yf, axis=0, keepdims=True)

    @pl.when(i == ni - 1)
    def _():
        s1_ref[:] = acc1[:]
        s2_ref[:] = acc2[:]


def _mm_stats_pallas(x, w, out_dtype, interpret=False):
    """(M, K) @ (K, N) -> (y: (M, N) out_dtype, s1: (N,) f32, s2: (N,) f32).

    Zero-padding keeps the math exact: padded x rows produce all-zero y rows
    (no bias), contributing nothing to the sums; padded w columns are sliced
    off along with their stats.
    """
    m, k = x.shape
    _, n = w.shape
    # sublane multiples: bf16 inputs need 16, f32 8; use 16 unconditionally
    tm = min(512, _round_up(m, 16))
    tn = min(256, _round_up(n, 128))
    kp = _round_up(k, 128)
    mp, np_ = _round_up(m, tm), _round_up(n, tn)
    if (mp, kp) != (m, k):
        x = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    if (kp, np_) != (k, n):
        w = jnp.pad(w, ((0, kp - k), (0, np_ - n)))
    grid = (np_ // tn, mp // tm)
    y, s1, s2 = pl.pallas_call(
        functools.partial(_mm_stats_kernel, out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, kp), lambda j, i: (i, 0)),
            pl.BlockSpec((kp, tn), lambda j, i: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((tm, tn), lambda j, i: (i, j)),
            pl.BlockSpec((1, tn), lambda j, i: (0, j)),
            pl.BlockSpec((1, tn), lambda j, i: (0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, np_), out_dtype),
            jax.ShapeDtypeStruct((1, np_), jnp.float32),
            jax.ShapeDtypeStruct((1, np_), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tn), jnp.float32),
            pltpu.VMEM((1, tn), jnp.float32),
        ],
        interpret=interpret,
    )(x, w)
    return y[:m, :n], s1[0, :n], s2[0, :n]


def _mm_stats_xla(x, w, out_dtype):
    """Plain-XLA twin (CPU fallback + equivalence oracle)."""
    y = lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32).astype(out_dtype)
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=0), jnp.sum(yf * yf, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def matmul_stats(x, w, out_dtype, impl="auto", interpret=False):
    """y = cast(x @ w); s1 = sum(y, rows); s2 = sum(y*y, rows).

    The fused forward runs as ONE Pallas kernel (stats accumulated in the
    matmul epilogue — no second HBM read of y); the backward is the analytic
    gradient in plain XLA (Pallas kernels are not autodiff-able):

        dL/dy_total = dy + ds1 + 2*y*ds2      (broadcast per channel)
        dx = dy_total @ w^T ;  dw = x^T @ dy_total

    which is exactly the VJP of the unfused composition.
    """
    return _mm_impl(x, w, out_dtype, impl, interpret)


def _mm_impl(x, w, out_dtype, impl, interpret):
    if impl == "auto":
        impl = ("pallas" if jax.default_backend() not in ("cpu",) or interpret
                else "xla")
    if impl == "pallas":
        return _mm_stats_pallas(x, w, out_dtype, interpret=interpret)
    return _mm_stats_xla(x, w, out_dtype)


def _mm_fwd(x, w, out_dtype, impl, interpret):
    y, s1, s2 = _mm_impl(x, w, out_dtype, impl, interpret)
    # y is needed downstream (the BN apply) regardless, so saving it adds no
    # activation memory over the unfused path
    return (y, s1, s2), (x, w, y)


def _mm_bwd(out_dtype, impl, interpret, res, cts):
    x, w, y = res
    dy, ds1, ds2 = cts
    yf = y.astype(jnp.float32)
    g = dy.astype(jnp.float32) + ds1[None, :] + 2.0 * ds2[None, :] * yf
    gc = g.astype(out_dtype)  # match the unfused bf16 conv-backward operands
    dx = lax.dot_general(gc, w, (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32).astype(x.dtype)
    dw = lax.dot_general(x, gc, (((0,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32).astype(w.dtype)
    return dx, dw


matmul_stats.defvjp(_mm_fwd, _mm_bwd)


def conv1x1_bn_stats(x, kernel, strides=1, impl="auto", interpret=False):
    """NHWC 1x1 conv + BN statistics in one pass.

    Args:
        x: (B, H, W, Cin), any float dtype (the compute dtype).
        kernel: (1, 1, Cin, Cout), same dtype as x (cast by the caller, like
            flax ``nn.Conv`` promotes its kernel).
        strides: int; a strided 1x1 SAME conv reads input positions
            ``s*i`` only, so it is exactly a subsample + matmul.

    Returns:
        y: (B, H', W', Cout) in x.dtype; s1, s2: (Cout,) f32 per-channel
        sum / sum-of-squares of y over (B, H', W') — divide by
        ``B*H'*W'`` for flax's E[y] / E[y^2].
    """
    if strides != 1:
        x = x[:, ::strides, ::strides, :]
    b, h, w_, c = x.shape
    n = kernel.shape[-1]
    y2, s1, s2 = matmul_stats(x.reshape(b * h * w_, c),
                              kernel.reshape(c, n).astype(x.dtype),
                              x.dtype, impl, interpret)
    return y2.reshape(b, h, w_, n), s1, s2
