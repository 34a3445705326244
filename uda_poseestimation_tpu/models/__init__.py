"""Model registry — name-based lookup parity with reference lib/models.

The reference resolves architectures by ``models.__dict__[args.arch]``
(train_human.py:117); this module exposes the same names.
"""

from . import loss
from . import style_net as Style_net  # noqa: N812 — reference submodule name
from .ema import ema_init, ema_update
from .pose_resnet import (
    PoseResNet,
    Upsampling,
    backbone_param_mask,
    pose_resnet50,
    pose_resnet101,
    trans_pose_resnet,
    trans_pose_resnet50,
)
from .resnet import (
    ResNet,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
    resnext50_32x4d,
    resnext101_32x8d,
    wide_resnet50_2,
    wide_resnet101_2,
)
from .style_net import Decoder, StyleNet, VGGEncoder

__all__ = ["pose_resnet50", "pose_resnet101", "PoseResNet", "Upsampling",
           "StyleNet", "VGGEncoder", "Decoder", "loss", "Style_net",
           "ema_init", "ema_update", "backbone_param_mask"]
