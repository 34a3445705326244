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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _warp_kernel(tile: int, hm_ref, ix_ref, iy_ref, valid_ref, out_ref):
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
    # The MXU truncates f32 operands to bf16; since each output column picks
    # exactly ONE source element (one-hot), split the values hi/lo into two
    # bf16 dots and re-add — recovers ~16 mantissa bits (~1e-5 rel. error).
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = a - a_hi
    g = (jnp.dot(a_hi, col1h, preferred_element_type=jnp.float32)
         + jnp.dot(a_lo, col1h, preferred_element_type=jnp.float32))
    g = g.reshape(k, h, tile)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (h, tile), 0)
    row1h = (row_iota == iy_t).astype(jnp.float32)  # (H, TILE)
    out = jnp.sum(g * row1h[None], axis=1)  # (K, TILE)
    out_ref[0, :, sl] = jnp.where(valid_ref[0, :, sl] != 0, out, 0.0)


def warp_gather_onehot_sharded(hms, ix, iy, valid, mesh, axis_name: str = "data",
                               interpret: bool = False):
    """Run the one-hot gather under shard_map over the batch axis.

    pallas_call does not auto-partition under GSPMD; this wrapper maps the
    kernel over per-device batch shards (the gather is embarrassingly
    parallel over the batch), making it usable inside multi-chip jitted
    steps.
    """
    from jax.sharding import PartitionSpec as P

    spec = P(axis_name)

    def local(h, x_, y_, v_):
        return warp_gather_onehot(h, x_, y_, v_, interpret=interpret)

    # check_vma=False: pallas_call outputs don't carry varying-mesh-axis
    # metadata, which the default strict check requires
    return jax.shard_map(local, mesh=mesh,
                         in_specs=(spec, spec, spec, spec),
                         out_specs=spec, check_vma=False)(hms, ix, iy, valid)


@functools.partial(jax.jit, static_argnames=("interpret",))
def warp_gather_onehot(hms, ix, iy, valid, interpret: bool = False):
    """Gather hms[b, k, iy[b,p], ix[b,p]] via the one-hot MXU kernel.

    Args:
        hms: (B, K, H, W) float32.
        ix, iy: (B, H*W) int32 source coords (already clipped in-bounds).
        valid: (B, H*W) bool/int mask; invalid positions produce 0.

    Returns:
        (B, K, H, W) float32.
    """
    b, k, h, w = hms.shape
    hw = h * w
    tile = min(hw, 2048)
    assert hw % tile == 0
    grid = (b, hw // tile)
    kernel = functools.partial(_warp_kernel, tile)
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
