"""PoseResNet (Simple Baseline) in Flax: ResNet backbone + deconv heatmap head.

TPU-native twin of reference lib/models/pose_resnet.py:11-126:

- ``Upsampling``: 3 ConvTranspose(k=4, s=2, p=1, bias=False) 2048->256->256->256,
  each followed by BatchNorm + ReLU, kernels init N(0, 0.001) (Simple Baseline);
- ``head``: 1x1 conv to num_keypoints, kernel N(0, 0.001), bias 0;
- input 256x256 -> heatmaps 64x64.

Deconvs are implemented directly as ``lax.conv_general_dilated`` with
lhs_dilation=2 and padding k-1-p=2 on the dilated input — verified bit-equal
(fp32) to torch ConvTranspose2d(k4,s2,p1), so torch checkpoints port exactly.
Layout is NHWC internally (TPU-preferred); ``__call__`` accepts NHWC images
and returns NCHW (B, K, h, w) heatmaps to match the reference's tensor
contract used by losses/warps/PCK.
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from . import resnet as resnet_lib

# perf-debug kill switch for A/B measurement (PERF.md)
_PHASE_DECONV = os.environ.get("UDA_PHASE_DECONV", "0") == "1"


class Deconv(nn.Module):
    """ConvTranspose2d(k, s=2) with torch-exact geometry, NHWC.

    Two equivalent evaluations of the k=4/p=1 case (bit-equal taps, same
    parameters, both torch-parity-tested):

    - default: conv over the 2x-dilated input (lhs_dilation) — XLA's TPU
      conv emitter handles the dilation algebraically and this MEASURES
      FASTER end to end (248.4 vs 238.5 img/s on the v5e bench, PERF.md
      round 3);
    - UDA_PHASE_DECONV=1: subpixel phase form (ops/subpixel.py) — one 2x2
      conv with 4x output channels + interleave, the tap-minimal
      formulation; loses to the emitter because the phase interleave costs
      an extra HBM round trip over the full-size output. Kept as a measured
      alternative / A-B probe.
    """

    features: int
    kernel_size: int = 4
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        if k == 4:
            pad = 1
        elif k == 3:
            pad = 1  # with output_padding=1 (see below)
        elif k == 2:
            pad = 0
        else:
            raise NotImplementedError(f"kernel_size {k}")
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.normal(stddev=0.001),
            (k, k, in_features, self.features),
            jnp.float32,
        )
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        if k == 4 and _PHASE_DECONV:
            from ..ops.subpixel import deconv4x4_s2
            return deconv4x4_s2(x, kernel, bias, dtype=self.dtype)
        # torch convT(k,s=2,p) == conv(dilate(x,2), flip(W), pad=k-1-p), plus
        # output_padding extra rows/cols at the end (only k=3 uses op=1).
        p = k - 1 - pad
        out_pad = 1 if k == 3 else 0
        y = lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel[::-1, ::-1, :, :].astype(self.dtype),
            window_strides=(1, 1),
            padding=((p, p + out_pad), (p, p + out_pad)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class Upsampling(nn.Module):
    """3-layer deconv stack from Simple Baseline (pose_resnet.py:11-56)."""

    hidden_dims: Sequence[int] = (256, 256, 256)
    kernel_sizes: Sequence[int] = (4, 4, 4)
    bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert len(self.hidden_dims) == len(self.kernel_sizes)
        for i, (dim, k) in enumerate(zip(self.hidden_dims, self.kernel_sizes)):
            x = Deconv(dim, k, use_bias=self.bias, dtype=self.dtype, name=f"deconv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class PoseResNet(nn.Module):
    """Simple Baseline keypoint detector (pose_resnet.py:59-91).

    __call__: NHWC image batch -> (B, K, h, w) heatmaps.
    """

    backbone: nn.Module
    num_keypoints: int
    feature_dim: int = 256
    deconv_with_bias: bool = False
    finetune: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = self.backbone(x, train=train)
        x = Upsampling(bias=self.deconv_with_bias, dtype=self.dtype, name="upsampling")(x, train=train)
        x = nn.Conv(self.num_keypoints, (1, 1),
                    kernel_init=nn.initializers.normal(stddev=0.001),
                    bias_init=nn.initializers.zeros,
                    dtype=self.dtype, name="head")(x)
        # NHWC -> NCHW heatmap contract (losses/warps/PCK parity)
        return jnp.transpose(x.astype(jnp.float32), (0, 3, 1, 2))


def _pose_resnet(backbone_ctor, num_keypoints: int, deconv_with_bias: bool,
                 finetune: bool, dtype=jnp.float32, **kwargs) -> PoseResNet:
    backbone = backbone_ctor(dtype=dtype, **kwargs)
    return PoseResNet(backbone=backbone, num_keypoints=num_keypoints,
                      deconv_with_bias=deconv_with_bias, finetune=finetune, dtype=dtype)


def pose_resnet101(num_keypoints: int, pretrained_backbone: bool = True,
                   deconv_with_bias: bool = False, finetune: bool = False,
                   progress: bool = True, dtype=jnp.float32, **kwargs) -> PoseResNet:
    """Simple Baseline with ResNet-101 (reference pose_resnet.py:102-112).

    ``pretrained_backbone``/``progress`` are accepted for registry parity;
    ImageNet weights are loaded separately via tools/port_torch_weights.py
    (no network access on this host).
    """
    del pretrained_backbone, progress
    return _pose_resnet(resnet_lib.resnet101, num_keypoints, deconv_with_bias, finetune,
                        dtype=dtype, **kwargs)


def pose_resnet50(num_keypoints: int, pretrained_backbone: bool = True,
                  deconv_with_bias: bool = False, finetune: bool = False,
                  progress: bool = True, dtype=jnp.float32, **kwargs) -> PoseResNet:
    """Simple Baseline with ResNet-50 (reference pose_resnet.py:116-126)."""
    del pretrained_backbone, progress
    return _pose_resnet(resnet_lib.resnet50, num_keypoints, deconv_with_bias, finetune,
                        dtype=dtype, **kwargs)


def trans_pose_resnet(num_keypoints, arch=None, **kwargs):  # pragma: no cover
    """Registry parity stub: the reference's trans_pose_resnet
    (pose_resnet.py:130-146) imports a module that does not exist upstream
    (`.transpose_default`) and cannot be constructed there either."""
    raise NotImplementedError(
        "trans_pose_resnet is broken/dead code in the reference "
        "(missing transpose_default module); kept only for registry parity")


def trans_pose_resnet50(num_keypoints, arch=None, **kwargs):  # pragma: no cover
    """Registry parity stub; see trans_pose_resnet."""
    raise NotImplementedError(
        "trans_pose_resnet50 is broken/dead code in the reference; "
        "kept only for registry parity")


def backbone_param_mask(params) -> Any:
    """Pytree mask: True for backbone params (for the reference's 0.1x
    finetune LR, pose_resnet.py:86-91), False elsewhere."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def is_backbone(path):
        return any(getattr(p, "key", None) == "backbone" for p in path)

    leaves = {jax.tree_util.keystr(p): is_backbone(p) for p, _ in flat}
    return jax.tree_util.tree_map_with_path(lambda p, _: leaves[jax.tree_util.keystr(p)], params)
