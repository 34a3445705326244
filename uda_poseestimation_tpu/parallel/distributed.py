"""Multi-host (multi-process) data parallelism.

The reference scales only within one process (``torch.nn.DataParallel``,
train_human.py:145-148). The TPU-native scaling story goes further: the same
GSPMD programs run unchanged over a mesh that spans hosts — each process
feeds its local shard of the global batch, XLA emits gradient/metric
collectives over ICI within a slice and DCN across slices, and the jitted
step code is byte-identical to the single-host path.

Design (the multi-process contract):

- every array entering a jitted step is a GLOBAL ``jax.Array``; host data is
  assembled with ``jax.make_array_from_process_local_data`` (each process
  contributes its addressable rows of the batch axis) — see
  ``mesh.shard_batch`` / ``mesh.replicate``, which switch automatically;
- per-iteration *control* randomness (s2t/t2s gates, alpha draws, the step
  PRNG) must be IDENTICAL across processes — the engine swaps the
  reference's global-np.random draws for a seed-derived private stream when
  ``jax.process_count() > 1`` (same draw structure, process-synchronized);
- *data* sampling follows torch-DistributedSampler semantics: the train
  loaders draw one synchronized per-epoch permutation (seed-derived,
  identical on every rank — DataLoader(partition=(rank, world))) and each
  rank keeps its disjoint strided slice, so every sample is seen exactly
  once per epoch globally; per-sample host-transform augmentation stays
  process-distinct (the trainers offset the global random/np.random seeds
  per rank: seed + rank*10007; dataset split construction re-seeds itself
  to fixed constants, so splits stay identical across ranks);
- checkpoints/logs/visualization are written by process 0 only; the
  pretrain->adapt ``best_pt`` reload point barriers first and assumes a
  shared filesystem (the standard multi-host TPU setup).

On CPU (tests, this testbed) cross-process collectives use gloo:
run with ``jax_cpu_collectives_implementation=gloo`` — ``initialize()``
sets it. Verified end-to-end by tests/test_multiprocess.py, which spawns
real worker processes and checks loss/grad parity against the
single-process step.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

_INITIALIZED = None


def free_port() -> int:
    """A free localhost TCP port (coordinator-address convenience for
    single-host multi-process launches: tools/launch_distributed.py and the
    multi-process tests)."""
    import socket
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def initialize(coordinator: str, num_processes: int, process_id: int,
               platform: Optional[str] = None):
    """Join the distributed runtime. Call before first JAX backend use.

    Args:
        coordinator: ``host:port`` of process 0.
        num_processes: total process count.
        process_id: this process's rank.
        platform: optional platform override ("cpu" enables gloo
            cross-process collectives — also applied automatically when
            JAX_PLATFORMS=cpu).
    """
    global _INITIALIZED
    if _INITIALIZED:  # idempotent — but a topology mismatch must fail fast
        if _INITIALIZED != (coordinator, num_processes, process_id):
            raise RuntimeError(
                f"jax.distributed already initialized as {_INITIALIZED}; "
                f"got {(coordinator, num_processes, process_id)}")
        return
    if platform:
        jax.config.update("jax_platforms", platform)
    # cross-process collectives on the CPU backend need gloo. Platform
    # selection here is fluid (env var, jax.config, auto-detection — see
    # CLAUDE.md), so set it unconditionally: it only configures the CPU
    # client and is inert when the compute backend is TPU.
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _INITIALIZED = (coordinator, num_processes, process_id)


def add_distributed_args(parser):
    """Install the shared --dist-* trainer flags (all trainers accept the
    same multi-host surface; see maybe_initialize_from_args)."""
    parser.add_argument("--dist-coordinator", type=str, default=None,
                        help="host:port of process 0 — enables multi-host "
                             "data parallelism: the mesh spans every "
                             "process's devices, each process feeds "
                             "batch-size/num-processes samples, process 0 "
                             "writes logs/checkpoints (shared filesystem)")
    parser.add_argument("--dist-num-processes", type=int, default=1,
                        help="total process count (with --dist-coordinator)")
    parser.add_argument("--dist-process-id", type=int, default=0,
                        help="this process's rank (with --dist-coordinator)")
    return parser


def maybe_initialize_from_args(args) -> bool:
    """Trainer hook: join the distributed runtime if --dist-* flags are set.

    Returns True when running multi-process. Forces a seed (multi-process
    training requires synchronized control RNG) and leaves per-process data
    sampling unseeded/distinct, mirroring the reference's RNG split
    (seeded trainer, unseeded workers — SURVEY.md §5 seeding note).
    """
    spec = getattr(args, "dist_coordinator", None)
    if not spec:
        return False
    if getattr(args, "seed", None) is None:
        import warnings
        warnings.warn("multi-process training requires a seed for "
                      "process-synchronized control RNG; using --seed 0")
        args.seed = 0
    initialize(spec, args.dist_num_processes, args.dist_process_id)
    return True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    return jax.process_index() == 0


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def control_rng(seed: int, epoch: int = 0) -> np.random.RandomState:
    """Process-synchronized stream for per-iteration control draws (style
    gates, step PRNG seeds). Same derivation on every process; distinct per
    epoch so resume at epoch k replays epoch k's draws."""
    return np.random.RandomState((int(seed) * 1000003 + epoch) % (2 ** 31 - 1))


def local_batch_size(global_batch: int) -> int:
    """This process's share of a global batch (must divide evenly)."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by {n} processes")
    return global_batch // n


def local_rows(n: int, mesh=None) -> slice:
    """This process's contiguous row range of a size-n global batch axis.

    Used by validation: every process iterates the full (deterministic)
    val loader and contributes only its slice of each padded batch.
    With ``mesh``, the split follows the mesh's device order (rows map to
    devices in order, so this process's rows are the span of its devices'
    positions); without, an even split over ``jax.process_count()``.
    """
    if mesh is not None:
        devices = list(mesh.devices.flat)
        if n % len(devices):
            raise ValueError(f"batch {n} not divisible by mesh size "
                             f"{len(devices)}")
        per = n // len(devices)
        p = jax.process_index()
        mine = [i for i, d in enumerate(devices) if d.process_index == p]
        if not mine:
            return slice(0, 0)  # this process holds no mesh devices
        if mine[-1] - mine[0] + 1 != len(mine):
            raise ValueError("this process's devices are not contiguous in "
                             "the mesh; cannot form a contiguous row slice")
        return slice(mine[0] * per, (mine[-1] + 1) * per)
    count = jax.process_count()
    if n % count:
        raise ValueError(f"batch {n} not divisible by {count} processes")
    per = n // count
    p = jax.process_index()
    return slice(p * per, (p + 1) * per)


def host_local(arr) -> np.ndarray:
    """Fetch this process's addressable rows of a (possibly) global array.

    Single-process / fully-addressable / fully-replicated arrays come back
    whole; batch-sharded multi-process arrays come back as this process's
    contiguous local rows (process 0's row 0 == global row 0) — enough for
    the engine's row-0 visualization hooks without a cross-host gather.
    """
    if jax.process_count() == 1 or getattr(arr, "is_fully_addressable", True) \
            or getattr(arr, "is_fully_replicated", False):
        return np.asarray(arr)
    shards = sorted(arr.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def broadcast_str(value: str, max_len: int = 256) -> str:
    """Agree on a string across processes (process 0's value wins). Used for
    the checkpoint-directory timestamp so every process derives the same
    ``checkpoints_<ts>`` path on the shared filesystem."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils

    buf = np.zeros((max_len,), np.uint8)
    raw = value.encode()[:max_len]
    buf[: len(raw)] = np.frombuffer(raw, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return bytes(out[out != 0]).decode()


def barrier(name: str = "barrier"):
    """Cross-process sync point (e.g. before reading a checkpoint another
    process just wrote)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
