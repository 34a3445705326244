"""Subpixel (phase-decomposed) evaluation of upsample->conv and deconv.

STATUS (PERF.md round 3): implemented, exactness-tested, and MEASURED SLOWER
than XLA's own emitter on the v5e bench — phase-deconv −10 img/s (the TPU
conv emitter evaluates lhs-dilated convs algebraically, skipping the
structural zeros, while the phase interleave here costs an extra full-size
HBM round trip), subpixel decoder −1 img/s, both off by default
(UDA_PHASE_DECONV / UDA_SUBPIXEL_DECODER opt in). Kept as documented
measured alternatives; the derivations below remain correct.

The idea: 2x-upsample->3x3-conv chains (StyleNet decoder, reference
Style_net.py:32-62) and 4x4/stride-2 ConvTranspose (PoseResNet head,
reference pose_resnet.py:11-56) are exactly expressible as ONE 2x2/stride-1
convolution at LOW resolution with 4x the output channels — one channel
block per output phase (a, b) in {0,1}^2 — followed by a phase interleave
(depth-to-space):

- upsample->reflect-pad->3x3 conv: each output pixel's 3x3 window over the
  2x-upsampled image covers <= 2x2 DISTINCT source pixels, so the 9 taps
  collapse to 4 phase-specific sums of the original weights. Cuts window
  FLOPs 36 -> 16 per low-res pixel AND never materializes the upsampled
  tensor (4x HBM).
- ConvTranspose(k=4, s=2, p=1): output phase (a, b) reads exactly 2x2 source
  pixels through 4 of the 16 taps — the phase form does the minimal 4
  MAC/output instead of the dilated-conv formulation's 16 (75% of whose
  window is structural zeros).

Both rewrites consume the models' ORIGINAL parameters (3x3 / 4x4 kernels)
and rearrange them at trace time, so checkpoints, torch ports and inits are
unchanged; equivalence is exact up to f32 summation order (golden-tested in
tests/test_models.py).

Boundary handling: reflect-pad(1) AFTER 2x upsample maps pad row -1 to
upsampled row 1 = source row 0 (and 2H to 2H-2 = H-1), i.e. EDGE padding of
the source; ConvTranspose's implicit zero borders are zero padding.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from jax import lax


def _interleave_phases(out, h: int, w: int, features: int):
    """(B, H+1, W+1, 4F) phase-conv output -> (B, 2H, 2W, F).

    Phase (a, b)'s valid window origin is offset by (a, b): slice then
    depth-to-space so output pixel (2i+a, 2j+b) takes phase (a, b) at (i, j).
    """
    b = out.shape[0]
    f = features
    phases = [out[:, a:a + h, c:c + w, (a * 2 + c) * f:(a * 2 + c + 1) * f]
              for a in (0, 1) for c in (0, 1)]
    stacked = jnp.stack(phases, axis=-1)  # (B, H, W, F, 4) — idx = a*2 + b
    y = stacked.reshape(b, h, w, f, 2, 2)
    return y.transpose(0, 1, 4, 2, 5, 3).reshape(b, 2 * h, 2 * w, f)


def _phase_conv(x_pad, k2, bias, dtype, h: int, w: int, features: int):
    y = lax.conv_general_dilated(
        x_pad.astype(dtype), k2.astype(dtype), window_strides=(1, 1),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + jnp.tile(bias, 4).astype(dtype)
    return _interleave_phases(y, h, w, features)


def upsample_conv3x3(x, kernel, bias, dtype: Any = jnp.float32):
    """nearest-2x-upsample -> ReflectionPad(1) -> Conv3x3(valid) [-> +bias].

    Args:
        x: (B, H, W, C).
        kernel: (3, 3, C, F) — the ORIGINAL conv parameters.
        bias: (F,) or None.

    Returns (B, 2H, 2W, F), identical to the reference chain.

    Phase weights: for output row 2i+a, window rows over the padded upsample
    are {2i+a-1, 2i+a, 2i+a+1}; their source rows span edge-padded positions
    {i+a, i+a+1} with tap sums
        a=0: [W0, W1+W2]      a=1: [W0+W1, W2]
    (same decomposition along columns with b).
    """
    b, h, w, c = x.shape
    f = kernel.shape[-1]

    def sums(wk, a):  # along leading axis
        if a == 0:
            return jnp.stack([wk[0], wk[1] + wk[2]])
        return jnp.stack([wk[0] + wk[1], wk[2]])

    blocks = []
    for a in (0, 1):
        ra = sums(kernel, a)  # (2, 3, C, F) — row sums; ra[dr] leads with kw
        for bb in (0, 1):
            kab = jnp.stack([sums(ra[dr], bb) for dr in (0, 1)])  # (2, 2, C, F)
            blocks.append(kab)
    k2 = jnp.concatenate(blocks, axis=-1)  # (2, 2, C, 4F)
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    return _phase_conv(x_pad, k2, bias, dtype, h, w, f)


def deconv4x4_s2(x, kernel, bias: Optional[Any], dtype: Any = jnp.float32):
    """ConvTranspose2d(k=4, stride=2, padding=1), torch-exact, phase form.

    Args:
        x: (B, H, W, C).
        kernel: (4, 4, C, F) in the (kh, kw, in, out) layout of
            models/pose_resnet.py's Deconv param (torch convT orientation).
        bias: (F,) or None.

    Returns (B, 2H, 2W, F). Tap selection: output phase a at position m reads
    zero-padded source rows {m-1+a, m+a} through kernel rows kh = 3-2*dr-a
    (dr = window row), and likewise along columns.
    """
    b, h, w, c = x.shape
    f = kernel.shape[-1]
    blocks = []
    for a in (0, 1):
        for bb in (0, 1):
            kab = jnp.stack([
                jnp.stack([kernel[3 - 2 * dr - a, 3 - 2 * dc - bb]
                           for dc in (0, 1)])
                for dr in (0, 1)])  # (2, 2, C, F)
            blocks.append(kab)
    k2 = jnp.concatenate(blocks, axis=-1)
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return _phase_conv(x_pad, k2, bias, dtype, h, w, f)
