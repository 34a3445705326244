"""Ramp schedules and MultiStep LR — twins of utils.py:28-52 + torch MultiStepLR.

The reference steps MultiStepLR once per epoch *before* training that epoch
(train_human.py:200-202), so the factor for epoch ``e`` counts milestones
``m <= e`` — reproduced by ``multistep_lr``.
"""

from __future__ import annotations

import numpy as np


def sigmoid_rampup(current: float, rampup_length: float) -> float:
    """Exponential rampup (https://arxiv.org/abs/1610.02242), utils.py:28-35."""
    if rampup_length == 0:
        return 1.0
    current = np.clip(current, 0.0, rampup_length)
    phase = 1.0 - current / rampup_length
    return float(np.exp(-5.0 * phase * phase))


def cosine_rampdown(current: float, rampdown_length: float) -> float:
    """Cosine rampdown (https://arxiv.org/abs/1608.03983), utils.py:38-42."""
    current = np.clip(current, 0.0, rampdown_length)
    return float(0.5 * (np.cos(np.pi * current / rampdown_length) + 1))


def rev_sigmoid(progress: float) -> float:
    progress = np.clip(progress, 0, 1)
    return float(1.0 / (1 + np.exp(10 * progress - 5)))


def sigmoid(progress: float) -> float:
    progress = np.clip(progress, 0, 1)
    return float(1.0 / (1 + np.exp(5 - 10 * progress)))


def multistep_lr(base_lr: float, epoch: int, milestones, gamma: float = 0.1) -> float:
    """LR used while training 0-indexed ``epoch``, reference convention.

    torch MultiStepLR decays when its internal counter reaches a milestone;
    the reference calls step() at the *start* of every epoch
    (train_human.py:200-202), so when epoch e trains, step() has run e+1
    times and the counter is e+1: milestone m first affects epoch m-1.
    (This is the torch "step before optimizer.step" quirk, preserved.)
    """
    n = sum(1 for m in milestones if int(m) <= int(epoch) + 1)
    return base_lr * (gamma ** n)
