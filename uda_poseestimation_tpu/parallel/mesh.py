"""Device mesh + sharding helpers (data parallelism over the batch axis).

The reference's only distribution strategy is single-process
``torch.nn.DataParallel`` over local GPUs (train_human.py:145-148). The
TPU-native first-class replacement (SURVEY.md §2.5) is GSPMD data
parallelism: one jitted train step with the batch sharded over a 1-D
``('data',)`` mesh, parameters replicated, and gradient/metric reductions
emitted by XLA as ICI collectives — no hand-written NCCL-style code.

The mesh axis layout leaves room for model axes later (the models here are
45-60M-param CNNs; batch is the only scalable axis, as upstream).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, ndim: int, axis_name: str = "data") -> NamedSharding:
    """Leading-axis sharding for an ndim array."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


STACKED_VIEW_KEYS = ("images_t_tea", "aug_params_tea", "targets_tea", "weights_tea")


@functools.lru_cache(maxsize=None)
def _mesh_spans_processes(mesh: Mesh) -> bool:
    return len({d.process_index for d in mesh.devices.flat}) > 1


def _spans_processes(mesh: Mesh) -> bool:
    """True when the mesh holds devices of more than one process — host
    arrays must then be assembled as global jax.Arrays from process-local
    shards (see parallel/distributed.py for the multi-process contract).
    Cached per mesh: shard_batch calls this per pytree leaf per iteration."""
    if jax.process_count() == 1:
        return False
    return _mesh_spans_processes(mesh)


def _put_global(x, sharding: NamedSharding):
    """Single- and multi-process device placement of one host array.

    Multi-process: ``x`` is this process's LOCAL portion along any sharded
    axis (and the full, identical value for replicated axes);
    ``make_array_from_process_local_data`` assembles the global Array.
    Arrays already carrying the target sharding pass through untouched
    (re-replicating restored state must not round-trip ~200 MB of params
    through host numpy per process).
    """
    if getattr(x, "sharding", None) == sharding:
        return x
    if _spans_processes(sharding.mesh):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    return jax.device_put(x, sharding)


def shard_batch(batch, mesh: Mesh, axis_name: str = "data",
                stacked_keys=STACKED_VIEW_KEYS, lead_axes: int = 0):
    """device_put a pytree of host arrays with the batch axis sharded.

    Dict keys in ``stacked_keys`` hold per-view stacks shaped (k, B, ...) —
    mirroring the reference's k teacher views — and are sharded on axis 1.
    ``lead_axes`` shifts the batch axis right by that many leading axes
    (the --steps-per-dispatch bundle stacks n iterations in front).

    When ``mesh`` spans processes, each process passes its LOCAL batch rows
    and the result is the assembled global array (batch axis size =
    local x process_count).
    """
    def put(key_path, x):
        is_stacked = any(getattr(p, "key", None) in stacked_keys for p in key_path)
        bax = lead_axes + (1 if is_stacked and np.ndim(x) >= lead_axes + 2 else 0)
        if np.ndim(x) <= bax:
            spec = P()
        else:
            spec = P(*([None] * bax), axis_name,
                     *([None] * (np.ndim(x) - bax - 1)))
        return _put_global(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, batch)


def replicate(tree, mesh: Mesh):
    """device_put a pytree fully replicated (params, optimizer state).

    Multi-process: every process must hold the identical host value
    (deterministic seeded init / checkpoint reads guarantee this)."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: _put_global(x, sharding), tree)


def cast_floating(tree, dtype):
    """Cast every floating leaf of a pytree to ``dtype``.

    Used to store the FROZEN runtime StyleNet parameters in bf16: the
    bf16-dtype Flax modules promote f32 params to bf16 at every apply
    anyway (same round-to-nearest cast), so pre-casting is bit-identical
    while halving the weights' HBM footprint and the per-step async
    weight-slice traffic the profiler shows on the f32 copies. Do NOT use
    on trainable params (optimizers need f32 master weights)."""
    import jax.numpy as jnp

    def cast(x):
        x = jnp.asarray(x)
        return x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x

    return jax.tree_util.tree_map(cast, tree)
