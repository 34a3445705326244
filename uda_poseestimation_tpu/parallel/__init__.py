"""Mesh + fused sharded train/eval steps (data parallelism over ICI)."""

from .mesh import (
    batch_sharding,
    cast_floating,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from .train_step import (
    StepConfig,
    UDAState,
    create_state,
    make_adapt_step,
    make_eval_step,
    make_pretrain_step,
    make_tx,
)

__all__ = [
    "make_mesh", "shard_batch", "replicate", "replicated", "batch_sharding",
    "cast_floating",
    "StepConfig", "UDAState", "create_state", "make_tx",
    "make_pretrain_step", "make_adapt_step", "make_eval_step",
]
