"""AdaIN style-transfer network (VGG19-normalised encoder + learned decoder).

Flax twin of reference lib/models/Style_net.py (runtime style net) and
adain/net.py (decoder-pretraining twin). Both share the same architecture and
differ only in the style loss:

- Style_net.py:156-161 uses Gram-matrix MSE;
- adain/net.py:137-146 uses AdaIN mean/std MSE (the AdaIN paper loss).

Here one module covers both via ``style_loss_kind`` ('gram' | 'meanstd').

Architecture parity (NHWC):
- encoder = first 31 layers of the 'vgg_normalised' Sequential
  (Style_net.py:64-118 truncated at relu4_1), split into 4 stages at
  relu1_1/relu2_1/relu3_1/relu4_1 exactly as Net.__init__ does (:124-128);
  all convs are 3x3 valid over reflection-padded inputs, preceded by the
  learnable 1x1 RGB recentering conv; maxpools are 2x2/2 with ceil_mode;
- decoder = 9 convs + 3 nearest 2x upsamples (Style_net.py:32-62).

The encoder is frozen at train time (params treated as constants by the
caller; no BatchNorm so there is no mutable state).
"""

from __future__ import annotations

import os
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from ..ops.adain import adain, calc_mean_std, gram_matrix

# perf-debug kill switches for A/B measurement (PERF.md)
_SUBPIXEL_DECODER = os.environ.get("UDA_SUBPIXEL_DECODER", "0") == "1"
# evaluate the 3->64 vgg stem conv as patches + one dense matmul (exact,
# same params) — the C=3 conv input wastes 125/128 MXU lanes otherwise
_VGG_IM2COL = os.environ.get("UDA_VGG_IM2COL", "0") == "1"


def _reflect_pad(x):
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")


def _max_pool_ceil(x):
    """2x2/2 max pool with ceil_mode=True (pads bottom/right when odd)."""
    h, w = x.shape[1], x.shape[2]
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), constant_values=-jnp.inf)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class _ConvBlock(nn.Module):
    """ReflectionPad(1) + Conv3x3(valid) [+ ReLU].

    ``im2col=True`` evaluates the same parameters as 3x3-patch extraction +
    one dense (C*9)->F matmul — exact up to summation order; used for the
    low-input-channel layers where a C=3 conv wastes the MXU lanes.
    """

    features: int
    relu: bool = True
    dtype: Any = jnp.float32
    im2col: bool = False

    @nn.compact
    def __call__(self, x):
        if not self.im2col:
            x = _reflect_pad(x)
            x = nn.Conv(self.features, (3, 3), padding="VALID", dtype=self.dtype)(x)
            return nn.relu(x) if self.relu else x
        kernel, bias = _Conv3x3Params(self.features, name="Conv_0")(x.shape[-1])
        xp = _reflect_pad(x.astype(self.dtype))
        p = lax.conv_general_dilated_patches(
            xp, (3, 3), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        wp = jnp.transpose(kernel, (2, 0, 1, 3)).reshape(
            -1, self.features).astype(self.dtype)
        y = jnp.einsum("bhwk,ko->bhwo", p, wp) + bias.astype(self.dtype)
        return nn.relu(y) if self.relu else y


class _Conv3x3Params(nn.Module):
    """Bare 3x3 conv parameters with nn.Conv's exact names/inits — owned by
    blocks that evaluate the conv themselves (the subpixel path)."""

    features: int

    @nn.compact
    def __call__(self, c_in: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, c_in, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return kernel, bias


class _UpConvBlock(nn.Module):
    """nearest-2x-upsample + ReflectionPad(1) + Conv3x3(valid) [+ ReLU],
    evaluated as ONE low-resolution 2x2 phase conv (ops/subpixel.py): exact,
    2.25x fewer window FLOPs, and the 2x-upsampled tensor is never
    materialized. Parameters live under the same ``Conv_0`` child with the
    same (3,3,C,F) kernel as _ConvBlock, so ports/checkpoints are unchanged.

    MEASURED (PERF.md round 3): despite the FLOP cut this is ~0.5% slower
    end to end than the upsample+conv chain on the v5e (249.9 vs 250.9
    img/s) — the phase interleave re-reads/re-writes the full-resolution
    output that the baseline conv writes once, and the odd (H+1, W+1)
    intermediate tiles badly. Opt-in via UDA_SUBPIXEL_DECODER=1.
    """

    features: int
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.subpixel import upsample_conv3x3

        kernel, bias = _Conv3x3Params(self.features, name="Conv_0")(x.shape[-1])
        y = upsample_conv3x3(x, kernel, bias, dtype=self.dtype)
        return nn.relu(y) if self.relu else y


class VGGEncoder(nn.Module):
    """vgg_normalised truncated at relu4_1, exposing the 4 AdaIN stages."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_intermediate: bool = False):
        x = x.astype(self.dtype)
        # stage 1: 1x1 recentering conv + conv(3->64) -> relu1_1
        x = nn.Conv(3, (1, 1), padding="VALID", dtype=self.dtype, name="conv0")(x)
        x = _ConvBlock(64, dtype=self.dtype, name="conv1_1",
                       im2col=_VGG_IM2COL)(x)
        feats = [x]
        # stage 2: conv1_2, pool, conv2_1 -> relu2_1
        x = _ConvBlock(64, dtype=self.dtype, name="conv1_2")(x)
        x = _max_pool_ceil(x)
        x = _ConvBlock(128, dtype=self.dtype, name="conv2_1")(x)
        feats.append(x)
        # stage 3: conv2_2, pool, conv3_1 -> relu3_1
        x = _ConvBlock(128, dtype=self.dtype, name="conv2_2")(x)
        x = _max_pool_ceil(x)
        x = _ConvBlock(256, dtype=self.dtype, name="conv3_1")(x)
        feats.append(x)
        # stage 4: conv3_2..conv3_4, pool, conv4_1 -> relu4_1
        x = _ConvBlock(256, dtype=self.dtype, name="conv3_2")(x)
        x = _ConvBlock(256, dtype=self.dtype, name="conv3_3")(x)
        x = _ConvBlock(256, dtype=self.dtype, name="conv3_4")(x)
        x = _max_pool_ceil(x)
        x = _ConvBlock(512, dtype=self.dtype, name="conv4_1")(x)
        feats.append(x)
        if return_intermediate:
            return feats
        return x


def _upsample_nearest2x(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class Decoder(nn.Module):
    """AdaIN decoder (Style_net.py:32-62)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # each upsample->conv pair runs as a fused subpixel phase conv
        # (_UpConvBlock) — exact, and the dominant style-path FLOP saver;
        # both paths share the same parameter tree
        if _SUBPIXEL_DECODER:
            def up(feats, name):
                return _UpConvBlock(feats, dtype=self.dtype, name=name)
        else:
            def up(feats, name):
                blk = _ConvBlock(feats, dtype=self.dtype, name=name)
                return lambda x: blk(_upsample_nearest2x(x))
        x = x.astype(self.dtype)
        x = _ConvBlock(256, dtype=self.dtype, name="conv0")(x)
        x = up(256, "conv1")(x)
        x = _ConvBlock(256, dtype=self.dtype, name="conv2")(x)
        x = _ConvBlock(256, dtype=self.dtype, name="conv3")(x)
        x = _ConvBlock(128, dtype=self.dtype, name="conv4")(x)
        x = up(128, "conv5")(x)
        x = _ConvBlock(64, dtype=self.dtype, name="conv6")(x)
        x = up(64, "conv7")(x)
        x = _ConvBlock(3, relu=False, dtype=self.dtype, name="conv8")(x)
        return x


class StyleNet(nn.Module):
    """AdaIN Net (Style_net.py:121-177 / adain/net.py:102-162), NHWC.

    __call__(content, style, alpha) -> (loss_c, loss_s, g_t); g_t is the
    stylized image (what the trainers consume, train_human.py:350).
    """

    style_loss_kind: str = "gram"  # 'gram' (Style_net.py) | 'meanstd' (adain/net.py)
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = VGGEncoder(dtype=self.dtype)
        self.decoder = Decoder(dtype=self.dtype)

    def encode(self, x):
        return self.encoder(x)

    def encode_with_intermediate(self, x):
        return self.encoder(x, return_intermediate=True)

    def decode(self, t):
        return self.decoder(t)

    def stylize(self, content, style, alpha=1.0):
        """AdaIN transfer only (no losses) — the runtime fast path."""
        style_feat = self.encoder(style)
        content_feat = self.encoder(content)
        t = adain(content_feat.astype(jnp.float32), style_feat.astype(jnp.float32),
                  data_format="NHWC")
        t = alpha * t + (1.0 - alpha) * content_feat.astype(jnp.float32)
        return self.decoder(t).astype(jnp.float32)

    def _style_loss(self, x, target):
        x = x.astype(jnp.float32)
        target = target.astype(jnp.float32)
        if self.style_loss_kind == "gram":
            return jnp.mean((gram_matrix(x, "NHWC") - gram_matrix(target, "NHWC")) ** 2)
        m_x, s_x = calc_mean_std(x, data_format="NHWC")
        m_t, s_t = calc_mean_std(target, data_format="NHWC")
        return jnp.mean((m_x - m_t) ** 2) + jnp.mean((s_x - s_t) ** 2)

    def __call__(self, content, style, alpha=1.0) -> Tuple[Any, Any, Any]:
        style_feats = self.encoder(style, return_intermediate=True)
        content_feat = self.encoder(content)
        t = adain(content_feat.astype(jnp.float32), style_feats[-1].astype(jnp.float32),
                  data_format="NHWC")
        t = alpha * t + (1.0 - alpha) * content_feat.astype(jnp.float32)
        g_t = self.decoder(t)
        g_t_feats = self.encoder(g_t, return_intermediate=True)
        loss_c = jnp.mean((g_t_feats[-1].astype(jnp.float32) - t) ** 2)
        loss_s = self._style_loss(g_t_feats[0], style_feats[0])
        for i in range(1, 4):
            loss_s = loss_s + self._style_loss(g_t_feats[i], style_feats[i])
        return loss_c, loss_s, g_t.astype(jnp.float32)
