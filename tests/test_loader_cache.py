"""CachedDataset: decoded-canvas memoization for deterministic pipelines."""

import numpy as np

from uda_poseestimation_tpu.data.loader import CachedDataset, DataLoader


class CountingDataset:
    num_keypoints = 4

    def __init__(self, n=6):
        self.n = n
        self.calls = 0
        rng = np.random.RandomState(0)
        self.canvases = rng.rand(n, 32, 32, 3).astype(np.float32) * 5 - 2.5
        self.kps = rng.rand(n, 4, 2).astype(np.float32) * 32

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        self.calls += 1
        return (self.canvases[i], self.kps[i],
                {"keypoint2d": self.kps[i], "index": i})


def test_cache_hits_and_values():
    base = CountingDataset()
    ds = CachedDataset(base)
    first = [ds[i] for i in range(len(ds))]
    assert base.calls == len(base)
    second = [ds[i] for i in range(len(ds))]
    assert base.calls == len(base)  # no re-decode on the second epoch

    for (c1, k1, m1), (c2, k2, m2) in zip(first, second):
        # canvases round-trip through fp16 storage; small arrays stay exact
        np.testing.assert_allclose(c2, c1, atol=2e-3)
        assert c2.dtype == np.float32
        np.testing.assert_array_equal(k2, k1)
        np.testing.assert_array_equal(m2["keypoint2d"], m1["keypoint2d"])
        assert m2["index"] == m1["index"]

    # attribute passthrough (num_keypoints, etc.)
    assert ds.num_keypoints == 4
    assert len(ds) == len(base)


def test_cache_byte_bound():
    base = CountingDataset()
    item_bytes = 32 * 32 * 3 * 2  # fp16 canvas dominates
    ds = CachedDataset(base, max_bytes=item_bytes * 2.5)
    for i in range(len(ds)):
        ds[i]
    cached = len(ds._cache)
    assert 0 < cached < len(base)  # bounded, not unbounded
    base.calls = 0
    for i in range(len(ds)):
        ds[i]
    assert base.calls == len(base) - cached  # uncached items pass through


def test_cache_composes_with_loader():
    base = CountingDataset()
    ds = CachedDataset(base)
    loader = DataLoader(ds, batch_size=3, shuffle=False)
    b1 = next(iter(loader))
    b2 = next(iter(loader))
    np.testing.assert_allclose(b2[0], b1[0], atol=2e-3)
    assert base.calls == 3
