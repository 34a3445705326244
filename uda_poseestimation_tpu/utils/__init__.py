"""Meters, logger, schedules, checkpoint helpers."""

from .logger import CompleteLogger, TextLogger
from .meter import AverageMeter, AverageMeterDict, AverageMeterList, Meter, ProgressMeter
from .schedules import cosine_rampdown, multistep_lr, rev_sigmoid, sigmoid, sigmoid_rampup

__all__ = [
    "CompleteLogger", "TextLogger",
    "AverageMeter", "AverageMeterDict", "AverageMeterList", "Meter", "ProgressMeter",
    "cosine_rampdown", "multistep_lr", "rev_sigmoid", "sigmoid", "sigmoid_rampup",
]
