"""Headless ResNet backbones in Flax (NHWC, bf16-friendly).

TPU-native twin of the reference's torchvision-derived backbone
(lib/models/resnet.py:18-62): the classifier head is dropped and ``__call__``
returns the stride-32 layer4 feature map. Architecture numerics (bottleneck
layout, stride placement on the 3x3 conv, BN eps/momentum, downsample
projections) follow torchvision's ResNet V1 so ImageNet weights ported from
torchvision load bit-exact (see tools/port_torch_weights.py).

Design notes (TPU-first):
- NHWC layout end to end — XLA's preferred conv layout on TPU;
- compute dtype is configurable (bf16 by default in the train step) with
  float32 parameters and BN statistics;
- no Python-level control flow on data; the whole network is one traced
  graph that XLA fuses and tiles onto the MXU.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

ModuleDef = Any

# Stem evaluation mode (PERF.md round 3 A/B): "direct" (plain 7x7/s2 conv),
# "s2d" (space-to-depth), "im2col" (patches + matmul). All exact
# reformulations of the same parameter; the default is the measured-fastest.
_STEM_MODE = os.environ.get("UDA_STEM_MODE",
                            "s2d" if os.environ.get("UDA_STEM_S2D") == "1"
                            else "direct")

# Fused 1x1-conv + BN-stats probe (ops/bn_fuse.py, VERDICT r4 item 3):
# train-mode bottleneck 1x1 convs compute their BatchNorm batch statistics
# in the matmul's Pallas epilogue instead of a separate reduction pass.
# Single-chip probe (pallas_call does not partition under GSPMD); default
# per the PERF.md full-step A/B.
_BN_FUSE = os.environ.get("UDA_BN_FUSE") == "1"


class StemConv(nn.Module):
    """The 7x7/stride-2 stem conv, with three exact evaluation modes.

    A 3-channel 7x7 conv is the worst MXU shape in the network (the
    contraction dim is 3 vs the 128-wide systolic array). Modes (all the
    SAME parameter, equivalence-tested in tests/test_models.py; defaults per
    the PERF.md round-3 A/B on the v5e bench, selectable via UDA_STEM_MODE):

    - ``direct``: plain conv;
    - ``s2d`` (MLPerf-style): space-to-depth by 2 ((B,H,W,3) ->
      (B,H/2,W/2,12)) + an equivalent 4x4/s1 conv of the rearranged kernel —
      measured ~1% slower than direct (248.9 vs 250.9 img/s; s2d carries
      +30% stem FLOPs and current XLA already copes with the C=3 stem);
    - ``im2col``: extract 7x7 patches, ONE dense (C*49)->F matmul —
      sidesteps the C=3 lane waste entirely.

    The parameter keeps the (7,7,C,F) layout/name of ``nn.Conv(name='conv1')``
    so torch ports and old checkpoints load unchanged.

    Derivation: output row i reads input rows 2i+kh-3, kh in [0,7). Writing
    kh-3 = 2u+v (v in {0,1}, u in [-2,1]) gives s2d row i+u at sub-row v, so
    the rearranged kernel is (4,4,2*2*C,F) applied with padding ((2,1),(2,1));
    the s2d channel layout is (v, v_w, c).
    """

    features: int = 64
    dtype: Any = jnp.float32
    mode: str = "direct"  # "direct" | "s2d" | "im2col"

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, c, self.features), jnp.float32)
        b, h, w = x.shape[:3]
        mode = self.mode
        if mode == "s2d" and (h % 2 or w % 2):
            mode = "direct"
        if mode == "s2d":
            x2 = x.reshape(b, h // 2, 2, w // 2, 2, c)
            x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
            # kernel index kh+1 = 2*iu + v with iu = (kh+1)//2: pad one
            # leading zero row/col, then split (8,8) -> (4,2,4,2)
            w_pad = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
            w2 = w_pad.reshape(4, 2, 4, 2, c, self.features)
            w2 = w2.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, self.features)
            return lax.conv_general_dilated(
                x2.astype(self.dtype), w2.astype(self.dtype),
                window_strides=(1, 1), padding=((2, 1), (2, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if mode == "im2col":
            # patches + matmul: materializes the (B, H/2, W/2, C*49) window
            # tensor once, then one dense MXU contraction — sidesteps the
            # terrible lane utilization of C=3 conv inputs entirely
            xb = jnp.pad(x.astype(self.dtype), ((0, 0), (3, 3), (3, 3), (0, 0)))
            p = lax.conv_general_dilated_patches(
                xb, (7, 7), (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            wp = jnp.transpose(kernel, (2, 0, 1, 3)).reshape(
                c * 49, self.features).astype(self.dtype)
            return jnp.einsum("bhwk,ko->bhwo", p, wp)
        return lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(2, 2), padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    downsample: bool = False
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm
    expansion: int = 1
    groups: int = 1
    base_width: int = 64
    fuse_bn: bool = False  # accepted for ctor uniformity; 3x3-only block

    @nn.compact
    def __call__(self, x):
        identity = x
        y = self.conv(self.filters, (3, 3), strides=(self.strides, self.strides),
                      padding=((1, 1), (1, 1)), use_bias=False, name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        if self.downsample:
            identity = self.conv(self.filters * self.expansion, (1, 1),
                                 strides=(self.strides, self.strides),
                                 use_bias=False, name="downsample_conv")(x)
            identity = self.norm(name="downsample_bn")(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1
    downsample: bool = False
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm
    expansion: int = 4
    groups: int = 1
    base_width: int = 64
    # fused 1x1-conv+BN-stats probe (see _BN_FUSE); only the TRAIN path is
    # rerouted — the variable tree is identical either way
    fuse_bn: bool = False

    def _conv_bn_1x1(self, z, feats, cname, bname, strides=1):
        """conv1x1(name=cname) -> BN(name=bname), fused or plain."""
        nkw = getattr(self.norm, "keywords", {})
        if self.fuse_bn and nkw.get("use_running_average") is False:
            from .fused_bn import Conv1x1Stats, StatsBatchNorm
            ckw = getattr(self.conv, "keywords", {})
            y, mean, var = Conv1x1Stats(
                feats, strides=strides, dtype=ckw.get("dtype", jnp.float32),
                name=cname)(z)
            return StatsBatchNorm(
                use_running_average=False,
                momentum=nkw.get("momentum", 0.99),
                epsilon=nkw.get("epsilon", 1e-5),
                dtype=nkw.get("dtype"), name=bname)(y, mean, var)
        y = self.conv(feats, (1, 1), strides=(strides, strides),
                      use_bias=False, name=cname)(z)
        return self.norm(name=bname)(y)

    @nn.compact
    def __call__(self, x):
        # torchvision v1: width = filters * base_width/64 * groups; stride on 3x3
        width = int(self.filters * (self.base_width / 64.0)) * self.groups
        identity = x
        y = self._conv_bn_1x1(x, width, "conv1", "bn1")
        y = nn.relu(y)
        y = self.conv(width, (3, 3), strides=(self.strides, self.strides),
                      padding=((1, 1), (1, 1)), feature_group_count=self.groups,
                      use_bias=False, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = self._conv_bn_1x1(y, self.filters * self.expansion, "conv3", "bn3")
        if self.downsample:
            identity = self._conv_bn_1x1(
                x, self.filters * self.expansion, "downsample_conv",
                "downsample_bn", strides=self.strides)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """Headless ResNet: NHWC in, stride-32 NHWC feature map out."""

    block: ModuleDef
    stage_sizes: Sequence[int]
    groups: int = 1
    width_per_group: int = 64
    dtype: Any = jnp.float32
    # stem evaluation mode (exact reformulations; see StemConv)
    stem_mode: str = _STEM_MODE
    # fused 1x1-conv+BN-stats probe (see _BN_FUSE / ops/bn_fuse.py)
    fuse_bn: bool = _BN_FUSE

    @property
    def out_features(self) -> int:
        return 512 * self.block.expansion

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, dtype=self.dtype)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        x = x.astype(self.dtype)
        x = StemConv(features=64, dtype=self.dtype, mode=self.stem_mode,
                     name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        filters = 64
        for stage, num_blocks in enumerate(self.stage_sizes):
            for i in range(num_blocks):
                strides = 2 if (stage > 0 and i == 0) else 1
                # projection shortcut when spatial or channel dims change
                # (torchvision: stage0 BasicBlock has none, Bottleneck does)
                downsample = i == 0 and (strides != 1 or self.block.expansion != 1)
                x = self.block(filters=filters, strides=strides, downsample=downsample,
                               conv=conv, norm=norm, groups=self.groups,
                               base_width=self.width_per_group,
                               fuse_bn=self.fuse_bn,
                               name=f"layer{stage + 1}_{i}")(x)
            filters *= 2
        return x


def _make(block, stage_sizes, **kwargs) -> Callable[..., ResNet]:
    def ctor(dtype=jnp.float32, **extra):
        return ResNet(block=block, stage_sizes=stage_sizes, dtype=dtype, **kwargs, **extra)
    return ctor


resnet18 = _make(BasicBlock, [2, 2, 2, 2])
resnet34 = _make(BasicBlock, [3, 4, 6, 3])
resnet50 = _make(Bottleneck, [3, 4, 6, 3])
resnet101 = _make(Bottleneck, [3, 4, 23, 3])
resnet152 = _make(Bottleneck, [3, 8, 36, 3])
resnext50_32x4d = _make(Bottleneck, [3, 4, 6, 3], groups=32, width_per_group=4)
resnext101_32x8d = _make(Bottleneck, [3, 4, 23, 3], groups=32, width_per_group=8)
wide_resnet50_2 = _make(Bottleneck, [3, 4, 6, 3], width_per_group=128)
wide_resnet101_2 = _make(Bottleneck, [3, 4, 23, 3], width_per_group=128)
