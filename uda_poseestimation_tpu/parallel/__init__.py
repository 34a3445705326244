"""Mesh + fused sharded train/eval steps (data parallelism over ICI)."""

from .distributed import (
    barrier,
    initialize,
    is_multiprocess,
    is_primary,
    local_batch_size,
    local_rows,
    maybe_initialize_from_args,
    process_count,
    process_index,
)
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
    "initialize", "maybe_initialize_from_args", "is_primary",
    "is_multiprocess", "process_count", "process_index",
    "local_batch_size", "local_rows", "barrier",
    "StepConfig", "UDAState", "create_state", "make_tx",
    "make_pretrain_step", "make_adapt_step", "make_eval_step",
]
