"""Pallas TPU kernel: nearest-warp gather as a one-hot MXU matmul.

XLA's general gather on TPU is scalar-bound (~15.7 ms for a (32,3,256,256)
warp, ~1.9 ms for (32,21,64,64) — see PERF.md). For heatmap-sized warps the
gather re-expresses as two one-hot contractions that run on the MXU:

    out[k, p] = hm[k, iy_p, ix_p]
              = sum_r row1h[r, p] * ( sum_c hm[k, r, c] * col1h[c, p] )

with col1h/row1h built in-kernel from iota comparisons. The column
contraction is a (K*H, W) @ (W, TILE) matmul; the row selection is a cheap
VPU masked reduction. All arithmetic is f32 with exact 0/1 one-hots, so the
result is bit-identical to the take-based gather (values are copied, never
blended).

Usable from ops.affine for maps up to ~128x128; images (256^2) stay on the
XLA gather (the one-hot trick costs H x output FLOPs, which only pays off at
small H — analysis in PERF.md).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _warp_kernel(tile: int, exact: bool, hm_ref, ix_ref, iy_ref, valid_ref, out_ref):
    # hm_ref: (1, K, H, W); ix/iy/valid: (1, 1, HW); out_ref: (1, K, HW);
    # one (batch, tile) program handles out columns [j*tile, (j+1)*tile).
    _, k, h, w = hm_ref.shape
    j = pl.program_id(1)
    sl = pl.ds(j * tile, tile)
    a = hm_ref[0].reshape(k * h, w)
    ix_t = ix_ref[0, :, sl]  # (1, TILE)
    iy_t = iy_ref[0, :, sl]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (w, tile), 0)
    col1h = (col_iota == ix_t).astype(jnp.float32)  # (W, TILE)
    if exact:
        # The MXU truncates f32 operands to bf16; since each output column
        # picks exactly ONE source element (one-hot), split the values hi/lo
        # into two bf16 dots and re-add — recovers ~16 mantissa bits
        # (~1e-5 rel. error).
        a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
        a_lo = a - a_hi
        g = (jnp.dot(a_hi, col1h, preferred_element_type=jnp.float32)
             + jnp.dot(a_lo, col1h, preferred_element_type=jnp.float32))
    else:
        # Single bf16 dot: returns bf16(a)'s values exactly (the one-hot is
        # exact in bf16 and each output sums a single product). When the
        # consumer casts its inputs to bf16 anyway (the bf16 student/teacher
        # models), gather(bf16(a)) == bf16(gather(a)) — bit-equivalent
        # end-to-end at HALF the MXU FLOPs of the hi/lo split.
        g = jnp.dot(a.astype(jnp.bfloat16), col1h.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    g = g.reshape(k, h, tile)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (h, tile), 0)
    row1h = (row_iota == iy_t).astype(jnp.float32)  # (H, TILE)
    out = jnp.sum(g * row1h[None], axis=1)  # (K, TILE)
    out_ref[0, :, sl] = jnp.where(valid_ref[0, :, sl] != 0, out, 0.0)


def _chain_indices(tile, h, w, j, coeffs, rect):
    """In-kernel twin of train_step's staged occlusion index math.

    Computes, for output columns [j*tile, (j+1)*tile), the source coords of
    backward(paste-rectangle(forward-chain)) with the SAME per-stage
    rounding/clipping as ops.affine.compose_nearest_indices (evaluated on
    (1, tile) vectors in registers instead of full (B, H*W) HBM arrays —
    the index math dominated the XLA formulation's cost, ~13 ms/step vs
    ~4 ms for the gather itself at b=32/256^2; PERF.md).

    coeffs: (4, 6) f32 rows [cb, c1, c2, c3]; rect: (6,) i32
    [left, right, upper, bottom, left_src, upper_src] (left/right bound
    ROWS, upper/bottom bound COLS — the reference's swapped-naming quirk,
    train_human.py:376-413).
    """
    half_w = (w - 1) / 2.0
    half_h = (h - 1) / 2.0
    p = j * tile + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    # w is a power of two for all supported sizes -> shift/mask row/col split
    shift = int(math.log2(w))
    col = (p & (w - 1)).astype(jnp.float32)
    row = (p >> shift).astype(jnp.float32)
    xs = col - half_w
    ys = row - half_h
    valid = jnp.ones((1, tile), jnp.bool_)

    def stage(mi, xs, ys, valid):
        # same op order/associativity as compose_nearest_indices
        x_in = coeffs[mi, 0] * xs + coeffs[mi, 1] * ys + coeffs[mi, 2] + half_w
        y_in = coeffs[mi, 3] * xs + coeffs[mi, 4] * ys + coeffs[mi, 5] + half_h
        ix = jnp.round(x_in).astype(jnp.int32)
        iy = jnp.round(y_in).astype(jnp.int32)
        valid = valid & (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        xs = jnp.clip(ix, 0, w - 1).astype(jnp.float32) - half_w
        ys = jnp.clip(iy, 0, h - 1).astype(jnp.float32) - half_h
        return xs, ys, valid

    xs, ys, valid = stage(0, xs, ys, valid)  # backward warp (last applied)
    qr = (ys + half_h).astype(jnp.int32)
    qc = (xs + half_w).astype(jnp.int32)
    lt, rb, up, bb, ls, us = [rect[t] for t in range(6)]
    inside = (qr >= lt) & (qr < rb) & (qc >= up) & (qc < bb)
    rr = jnp.where(inside, qr - lt + ls, qr)
    rc = jnp.where(inside, qc - up + us, qc)
    xs = rc.astype(jnp.float32) - half_w
    ys = rr.astype(jnp.float32) - half_h
    for mi in (3, 2, 1):  # forward chain c1,c2,c3 composed backwards
        xs, ys, valid = stage(mi, xs, ys, valid)
    ixf = (xs + half_w).astype(jnp.int32)
    iyf = (ys + half_h).astype(jnp.int32)
    return ixf, iyf, valid


def _warp_chain_kernel(tile: int, exact: bool, hm_ref, coeffs_ref, rect_ref,
                       out_ref):
    _, k, h, w = hm_ref.shape
    j = pl.program_id(1)
    sl = pl.ds(j * tile, tile)
    ixf, iyf, valid = _chain_indices(tile, h, w, j, coeffs_ref[0],
                                     rect_ref[0, 0])
    a = hm_ref[0].reshape(k * h, w)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (w, tile), 0)
    col1h = (col_iota == ixf).astype(jnp.float32)
    if exact:
        a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
        a_lo = a - a_hi
        g = (jnp.dot(a_hi, col1h, preferred_element_type=jnp.float32)
             + jnp.dot(a_lo, col1h, preferred_element_type=jnp.float32))
    else:
        g = jnp.dot(a.astype(jnp.bfloat16), col1h.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    g = g.reshape(k, h, tile)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (h, tile), 0)
    row1h = (row_iota == iyf).astype(jnp.float32)
    out = jnp.sum(g * row1h[None], axis=1)  # (K, TILE)
    out_ref[0, :, sl] = jnp.where(valid, out, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret", "exact"))
def occlusion_warp_onehot(imgs, coeffs, rect, interpret: bool = False,
                          exact: bool = True):
    """Fused occlusion warp: staged index chain + one-hot gather in ONE
    Pallas kernel.

    Args:
        imgs: (B, C, H, W) float32, H == W a power of two.
        coeffs: (B, 4, 6) float32 — [cb, c1, c2, c3] inverse-map rows.
        rect: (B, 6) int32 — [left, right, upper, bottom, left_src,
            upper_src] paste rectangle (rows/cols per the reference quirk).

    Returns (B, C, H, W) float32, bit-equal to the staged XLA index path +
    exact gather (exact=True) or to its bf16-cast values (exact=False).
    """
    b, c, h, w = imgs.shape
    if h != w or (w & (w - 1)) != 0:
        raise ValueError(
            f"occlusion_warp_onehot needs a square power-of-two image size "
            f"(shift/mask row-col split); got {h}x{w} — use the XLA path "
            f"(StepConfig.gather_impl='xla') for other sizes")
    hw = h * w
    tile = min(hw, 2048)
    assert hw % tile == 0
    grid = (b, hw // tile)
    kernel = functools.partial(_warp_chain_kernel, tile, exact)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, 4, 6), lambda i, j: (i, 0, 0)),
            # (B, 1, 6): Mosaic requires the last two block dims to equal the
            # array dims (or be (8, 128)-divisible)
            pl.BlockSpec((1, 1, 6), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c, hw), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, c, hw), jnp.float32),
        interpret=interpret,
    )(imgs, coeffs.astype(jnp.float32), rect.astype(jnp.int32).reshape(b, 1, 6))
    return out.reshape(b, c, h, w)


def occlusion_warp_onehot_sharded(imgs, coeffs, rect, mesh,
                                  axis_name: str = "data",
                                  interpret: bool = False, exact: bool = True):
    """occlusion_warp_onehot under shard_map over the batch axis (pallas_call
    does not auto-partition under GSPMD)."""
    from jax.sharding import PartitionSpec as P

    spec = P(axis_name)

    def local(im, co, re):
        return occlusion_warp_onehot(im, co, re, interpret=interpret,
                                     exact=exact)

    return jax.shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, check_vma=False)(imgs, coeffs, rect)


def warp_gather_onehot_sharded(hms, ix, iy, valid, mesh, axis_name: str = "data",
                               interpret: bool = False, exact: bool = True):
    """Run the one-hot gather under shard_map over the batch axis.

    pallas_call does not auto-partition under GSPMD; this wrapper maps the
    kernel over per-device batch shards (the gather is embarrassingly
    parallel over the batch), making it usable inside multi-chip jitted
    steps.
    """
    from jax.sharding import PartitionSpec as P

    spec = P(axis_name)

    def local(h, x_, y_, v_):
        return warp_gather_onehot(h, x_, y_, v_, interpret=interpret, exact=exact)

    # check_vma=False: pallas_call outputs don't carry varying-mesh-axis
    # metadata, which the default strict check requires
    return jax.shard_map(local, mesh=mesh,
                         in_specs=(spec, spec, spec, spec),
                         out_specs=spec, check_vma=False)(hms, ix, iy, valid)


@functools.partial(jax.jit, static_argnames=("interpret", "exact"))
def warp_gather_onehot(hms, ix, iy, valid, interpret: bool = False,
                       exact: bool = True):
    """Gather hms[b, k, iy[b,p], ix[b,p]] via the one-hot MXU kernel.

    Args:
        hms: (B, K, H, W) float32.
        ix, iy: (B, H*W) int32 source coords (already clipped in-bounds).
        valid: (B, H*W) bool/int mask; invalid positions produce 0.
        exact: True -> hi/lo bf16-split dots (~1e-5 rel. error vs f32);
            False -> one bf16 dot: exactly gathers bf16(hms) (half the MXU
            FLOPs; bit-equivalent downstream of any bf16 cast).

    Returns:
        (B, K, H, W) float32.
    """
    b, k, h, w = hms.shape
    hw = h * w
    tile = min(hw, 2048)
    assert hw % tile == 0
    grid = (b, hw // tile)
    kernel = functools.partial(_warp_kernel, tile, exact)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, k, h, w), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, hw), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, hw), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, hw), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, k, hw), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, k, hw), jnp.float32),
        interpret=interpret,
    )(hms, ix.astype(jnp.int32).reshape(b, 1, hw),
      iy.astype(jnp.int32).reshape(b, 1, hw),
      valid.astype(jnp.int32).reshape(b, 1, hw))
    return out.reshape(b, k, h, w)
