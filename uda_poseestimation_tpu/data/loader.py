"""Torch-free data loader with background prefetch + ForeverDataIterator.

Replaces torch ``DataLoader(num_workers, pin_memory)`` + lib/data.py:40-61.
Samples are materialized by a thread pool (this host is single-core; threads
exist to overlap PIL/numpy work with TPU steps, and PIL releases the GIL for
decode/resize), collated into stacked numpy arrays, and handed to the jitted
step which device_puts them with the proper sharding.

The collate mirrors torch's default: numpy arrays stack along a new batch
axis; dicts/lists/tuples recurse; scalars become arrays; strings stay lists.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Optional

import numpy as np


def default_collate(items):
    first = items[0]
    if isinstance(first, np.ndarray):
        return np.stack(items)
    if isinstance(first, (np.floating, np.integer, float, int, bool)):
        return np.asarray(items)
    if isinstance(first, dict):
        return {k: default_collate([it[k] for it in items]) for k in first}
    if isinstance(first, (list, tuple)) and first and isinstance(
            first[0], (np.ndarray, dict, list, tuple, float, int)):
        transposed = list(zip(*items))
        return type(first)(default_collate(list(group)) for group in transposed)
    return list(items)


class DataLoader:
    """Minimal map-style loader: shuffle, batch, drop_last, prefetch."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 0, drop_last: bool = False,
                 collate_fn: Optional[Callable] = None, seed: Optional[int] = None,
                 prefetch_batches: int = 2, pin_memory: bool = False,
                 partition: Optional[tuple] = None):
        """``partition=(rank, world)`` gives torch-DistributedSampler
        semantics for multi-process data parallelism: every rank draws the
        IDENTICAL per-epoch permutation from a seed-derived stream (``seed``
        required) and keeps the disjoint strided slice ``order[rank::world]``
        truncated to ``len(dataset) // world`` — every rank yields the SAME
        batch count per pass (ranks advance epochs in lockstep through
        ForeverDataIterator; unequal counts would desynchronize the shared
        permutation), at the cost of dropping up to world-1 samples per
        epoch (torch pads instead). Each kept sample is seen exactly once
        per epoch across ranks."""
        del pin_memory  # accepted for call-site parity; meaningless here
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.collate_fn = collate_fn or default_collate
        self.prefetch_batches = max(1, prefetch_batches)
        self._rng = np.random.default_rng(seed)
        self._seed = seed
        self._epoch = 0
        if partition is not None:
            rank, world = partition
            if not (0 <= rank < world):
                raise ValueError(f"bad partition {partition}")
            if shuffle and seed is None:
                raise ValueError("partitioned shuffling needs a seed (the "
                                 "permutation must match across ranks)")
        self.partition = partition

    def _local_count(self):
        n = len(self.dataset)
        if self.partition is None:
            return n
        return n // self.partition[1]  # identical on every rank

    def __len__(self):
        n = self._local_count()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.partition is not None:
            rank, world = self.partition
            if self.shuffle:
                # identical permutation on every rank, advanced per epoch
                rng = np.random.default_rng(
                    int(self._seed or 0) * 1000003 + self._epoch)
                rng.shuffle(order)
            self._epoch += 1
            order = order[rank::world][:n // world]
        elif self.shuffle:
            self._rng.shuffle(order)
        n = len(order)
        end = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, end, self.batch_size):
            yield order[start:start + self.batch_size]

    def _load_batch(self, idxs):
        return self.collate_fn([self.dataset[int(i)] for i in idxs])

    def __iter__(self):
        if self.num_workers <= 0:
            for idxs in self._batches():
                yield self._load_batch(idxs)
            return
        if self.num_workers == 1:
            yield from self._iter_single_producer()
            return
        yield from self._iter_pool()

    def _iter_single_producer(self):
        q: "queue.Queue[Any]" = queue.Queue(maxsize=self.prefetch_batches)
        sentinel = object()

        def producer():
            try:
                for idxs in self._batches():
                    q.put(self._load_batch(idxs))
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item

    def _iter_pool(self):
        """N-worker ordered prefetch — the torch ``num_workers`` analog.

        Workers are THREADS, not processes: the expensive per-sample work
        (PIL decode/resize, numpy stacking) releases the GIL, so a pool
        scales on many-core hosts, while worker processes would have to
        re-pickle datasets and are fork-unsafe once a JAX backend client
        exists in the parent. Batch order is deterministic (an in-order
        window of futures); as with torch's multi-worker loaders, datasets
        whose transforms draw from global host RNG see an interleaved draw
        order across concurrent batches — the canonical --device-aug
        pipelines are deterministic per index and unaffected.
        """
        import itertools
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        window = self.num_workers + self.prefetch_batches
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            batches = self._batches()
            pending = deque(pool.submit(self._load_batch, idxs)
                            for idxs in itertools.islice(batches, window))
            for idxs in batches:
                out = pending.popleft().result()
                pending.append(pool.submit(self._load_batch, idxs))
                yield out
            while pending:
                yield pending.popleft().result()


class _U8Canvas:
    """Marker wrapper: a float canvas stored losslessly as uint8*255."""

    __slots__ = ("arr",)

    def __init__(self, arr):
        self.arr = arr


def _compress(obj):
    """Image-sized float32 arrays compress for cache storage: LOSSLESSLY to
    uint8 when exactly on the uint8/255 grid (every PIL-decoded canonical
    canvas — keeps the engine's packed uint8 host->device transport exact),
    else to float16 (2^-11 rounding, far below augmentation noise). Small
    arrays (keypoints, weights) stay exact."""
    if isinstance(obj, np.ndarray):
        if obj.dtype == np.float32 and obj.ndim >= 3:
            q = np.round(obj * 255.0)
            if obj.size and np.max(np.abs(q / 255.0 - obj)) < 1e-6 \
                    and q.min() >= 0 and q.max() <= 255:
                return _U8Canvas(q.astype(np.uint8))
            return obj.astype(np.float16)
        return obj
    if isinstance(obj, dict):
        return {k: _compress(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_compress(v) for v in obj)
    return obj


def _restore(obj):
    if isinstance(obj, _U8Canvas):
        return obj.arr.astype(np.float32) / 255.0
    if isinstance(obj, np.ndarray):
        return obj.astype(np.float32) if obj.dtype == np.float16 else obj
    if isinstance(obj, dict):
        return {k: _restore(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_restore(v) for v in obj)
    return obj


def _nbytes(obj):
    if isinstance(obj, _U8Canvas):
        return obj.arr.nbytes
    if isinstance(obj, np.ndarray):
        return obj.nbytes
    if isinstance(obj, dict):
        return sum(_nbytes(v) for v in obj.values())
    if isinstance(obj, (list, tuple)):
        return sum(_nbytes(v) for v in obj)
    return 64


class CachedDataset:
    """Memoize a dataset's __getitem__ — the decoded-canvas cache.

    Training revisits the same images every epoch (e.g. canonical human runs:
    500 iters x b=32 over ~8k-40k images); on a single-core host the ~30 ms
    PIL decode+resize per sample dominates end-to-end throughput (PERF.md).
    The reference leans on DataLoader worker parallelism + the OS page cache
    instead (train_human.py:90-105).

    ONLY wrap datasets whose transform pipeline is deterministic (the
    --device-aug canonical-canvas path): caching would freeze host-side
    random augmentations. The trainers enforce this. Storage is bounded by
    ``max_bytes``; once full, further items pass through uncached. Float
    canvases are stored fp16 and restored to f32.
    """

    def __init__(self, dataset, max_bytes: float = 2e9):
        self.dataset = dataset
        self.max_bytes = max_bytes
        self._cache = {}
        self._bytes = 0
        self._cap_logged = False
        self._lock = threading.Lock()

    def __len__(self):
        return len(self.dataset)

    def __getattr__(self, name):  # num_keypoints, visualize, group_accuracy...
        return getattr(self.dataset, name)

    def __getitem__(self, idx):
        with self._lock:
            hit = self._cache.get(idx)
        if hit is not None:
            return _restore(hit)
        item = self.dataset[idx]
        if self._bytes < self.max_bytes:
            packed = _compress(item)
            with self._lock:
                if self._bytes < self.max_bytes and idx not in self._cache:
                    self._cache[idx] = packed
                    self._bytes += _nbytes(packed)
                    if self._bytes >= self.max_bytes:
                        self._log_cap_hit()
        return item

    def _log_cap_hit(self):
        """One visible line when the byte budget fills mid-dataset: without
        it, a slightly-undersized --decode-cache shows up only as a silent
        permanently-bimodal iteration time (cached vs decode-every-epoch)."""
        if self._cap_logged:
            return
        self._cap_logged = True
        print("CachedDataset: cache budget full after "
              f"{len(self._cache)}/{len(self.dataset)} items "
              f"({self._bytes / 1e9:.2f} GB); remaining items will be "
              "decoded every epoch (raise --decode-cache to cache all)",
              flush=True)


class ForeverDataIterator:
    """Infinite iterator over a loader (lib/data.py:40-61)."""

    def __init__(self, data_loader, device=None):
        del device  # device placement happens in the jitted step
        self.data_loader = data_loader
        self.iter = iter(self.data_loader)

    def __next__(self):
        try:
            return next(self.iter)
        except StopIteration:
            if len(self.data_loader) == 0:
                raise RuntimeError(
                    "ForeverDataIterator wraps an empty loader (dataset "
                    "smaller than batch_size with drop_last=True?)") from None
            self.iter = iter(self.data_loader)
            return next(self.iter)

    def __len__(self):
        return len(self.data_loader)
