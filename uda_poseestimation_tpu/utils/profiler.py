"""Profiling hooks (aux subsystem, SURVEY.md §5).

The reference has no tracing beyond wall-clock meters; the TPU-native
replacement is jax.profiler traces gated by an env var or explicit calls:

- set ``UDA_PROFILE_DIR=/path`` to capture a device trace of any bench or
  trainer run (the trainers/bench wrap their hot loops in ``maybe_trace``);
- ``step_timer`` provides the same batch_time/data_time numbers the
  reference's meters print, with a blocking device sync.
"""

from __future__ import annotations

import contextlib
import os
import time

import jax


@contextlib.contextmanager
def maybe_trace(label: str = "train"):
    """jax.profiler trace if UDA_PROFILE_DIR is set; no-op otherwise."""
    trace_dir = os.environ.get("UDA_PROFILE_DIR")
    if not trace_dir:
        yield
        return
    path = os.path.join(trace_dir, label)
    os.makedirs(path, exist_ok=True)
    with jax.profiler.trace(path):
        yield


@contextlib.contextmanager
def step_timer(results: dict, key: str, sync=None):
    """Wall-clock a block; if ``sync`` is a jax array, block on it first."""
    t0 = time.perf_counter()
    yield
    if sync is not None:
        jax.block_until_ready(sync)
    results[key] = results.get(key, 0.0) + time.perf_counter() - t0
