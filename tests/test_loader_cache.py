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


def test_cache_u8_grid_canvases_lossless():
    """Canvases exactly on the uint8/255 grid (PIL-decoded canonical
    canvases) must round-trip the cache BIT-EXACTLY (uint8 storage), so the
    engine's packed uint8 transport stays enabled downstream of the cache."""

    class U8Dataset(CountingDataset):
        def __init__(self):
            super().__init__()
            rng = np.random.RandomState(1)
            self.canvases = (rng.randint(0, 256, (self.n, 32, 32, 3))
                             .astype(np.float32) / 255.0)

    ds = CachedDataset(U8Dataset())
    first = [ds[i][0].copy() for i in range(len(ds))]
    second = [ds[i][0] for i in range(len(ds))]
    for c1, c2 in zip(first, second):
        np.testing.assert_array_equal(c2, c1)
        assert c2.dtype == np.float32


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


def test_cache_cap_hit_logged_once(capsys):
    """Crossing the byte budget must emit ONE visible line (items cached /
    dataset size); before this, an undersized --decode-cache was a silent
    permanently-bimodal iteration time (VERDICT r2 weak #6)."""
    base = CountingDataset()
    item_bytes = 32 * 32 * 3 * 2
    ds = CachedDataset(base, max_bytes=item_bytes * 2.5)
    for _ in range(2):  # two epochs: the line must not repeat
        for i in range(len(ds)):
            ds[i]
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if "cache budget full" in l]
    assert len(lines) == 1
    assert f"{len(ds._cache)}/{len(base)} items" in lines[0]

    # an under-budget cache never logs
    ds_big = CachedDataset(CountingDataset(), max_bytes=1e9)
    for i in range(len(ds_big)):
        ds_big[i]
    assert "cache budget full" not in capsys.readouterr().out


def test_engine_u8_canvas_transport_exact():
    """DeviceAugPipeline packs uint8-grid canvases as uint8 for H2D (4x less
    tunnel traffic); the device-side /255 reproduces the f32 pipeline to
    within 1 ulp (XLA lowers the division to a reciprocal multiply), and
    off-grid canvases must fall back to f32."""
    import jax

    from uda_poseestimation_tpu.engine import DeviceAugPipeline
    from uda_poseestimation_tpu.ops.device_aug import DeviceAugConfig

    cfg = DeviceAugConfig(image_size=32, heatmap_size=8, sigma=1.0,
                          rotation=30, shear=(-10, 10), translate=(0.05, 0.05),
                          scale=(0.9, 1.1), color=0.0, use_rrc=True)
    mean = [0.485, 0.456, 0.406]
    std = [0.229, 0.224, 0.225]
    pipe = DeviceAugPipeline(cfg, cfg, cfg, k=1, mean=mean, std=std)

    rng = np.random.RandomState(0)
    canvas = rng.randint(0, 256, (2, 32, 32, 3)).astype(np.float32) / 255.0
    kp = rng.uniform(4, 28, (2, 4, 2)).astype(np.float32)
    w = np.ones((2, 4, 1), np.float32)
    meta = {"keypoint2d": kp}

    packed = pipe._pack_canvas(canvas)
    assert packed.dtype == np.uint8

    key = jax.random.PRNGKey(3)
    out_u8 = pipe.prep_source(key, np.asarray(packed), kp, w[..., 0])
    out_f32 = pipe.prep_source(key, canvas, kp, w[..., 0])
    for a, b in zip(out_u8, out_f32):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)

    # off-grid canvases must NOT be quantized
    pipe2 = DeviceAugPipeline(cfg, cfg, cfg, k=1, mean=mean, std=std)
    off = canvas + 7e-4
    assert pipe2._pack_canvas(off).dtype == np.float32


def test_frame_cache_lossless_and_bounded(tmp_path):
    """FrameCache: cached loads are bit-identical to fresh loads (uint8
    round-trip), the byte bound holds, and max_bytes=0 disables caching."""
    from PIL import Image

    from uda_poseestimation_tpu.data.util import FrameCache, load_image_ori

    rng = np.random.RandomState(0)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"f{i}.png")
        Image.fromarray(rng.randint(0, 256, (20, 24, 3)).astype(np.uint8)).save(p)
        paths.append(p)

    fc = FrameCache(max_bytes=2 * 20 * 24 * 3)  # room for exactly 2 frames
    fresh = [load_image_ori(p) for p in paths]
    first = [fc.load(p) for p in paths]
    again = [fc.load(p) for p in paths]
    for f, a, b in zip(fresh, first, again):
        np.testing.assert_array_equal(a, f)
        np.testing.assert_array_equal(b, f)
    assert len(fc._cache) == 2  # bounded

    off = FrameCache(max_bytes=0)
    np.testing.assert_array_equal(off.load(paths[0]), fresh[0])
    assert not off._cache

    # uint8 variant
    calls = []

    def decode(p):
        calls.append(p)
        return np.asarray(Image.open(p))

    fc2 = FrameCache(max_bytes=1e6)
    a = fc2.load_u8(paths[0], decode)
    b = fc2.load_u8(paths[0], decode)
    np.testing.assert_array_equal(a, b)
    assert len(calls) == 1


def test_cache_composes_with_loader():
    base = CountingDataset()
    ds = CachedDataset(base)
    loader = DataLoader(ds, batch_size=3, shuffle=False)
    b1 = next(iter(loader))
    b2 = next(iter(loader))
    np.testing.assert_allclose(b2[0], b1[0], atol=2e-3)
    assert base.calls == 3


def _materialize(loader):
    out = []
    for batch in loader:
        out.append(batch)
    return out


def test_pool_loader_matches_sequential():
    """num_workers>1 (ordered thread pool) yields the EXACT batch stream of
    the sequential loader: same seeded shuffle order, same batch contents,
    partial final batch included."""
    base = CountingDataset(n=10)
    seq = DataLoader(base, batch_size=3, shuffle=True, seed=7, num_workers=0)
    pool = DataLoader(base, batch_size=3, shuffle=True, seed=7, num_workers=3)
    ref = _materialize(seq)
    got = _materialize(pool)
    assert len(got) == len(ref) == 4
    for (c1, k1, m1), (c2, k2, m2) in zip(ref, got):
        np.testing.assert_array_equal(c2, c1)
        np.testing.assert_array_equal(k2, k1)
        np.testing.assert_array_equal(m2["index"], m1["index"])


def test_pool_loader_partitioned_ranks_disjoint():
    """Pool workers + partition=(rank, world): both ranks shuffle with the
    shared permutation, keep disjoint strided slices, and the pool preserves
    the rank's batch order across epochs (the ForeverDataIterator lockstep
    contract)."""
    base = CountingDataset(n=9)
    loaders = [DataLoader(base, batch_size=2, shuffle=True, seed=3,
                          num_workers=2, partition=(r, 2)) for r in (0, 1)]
    epoch = [_materialize(ld) for ld in loaders]
    idx = [np.concatenate([b[2]["index"] for b in e]) for e in epoch]
    assert len(idx[0]) == len(idx[1]) == 4  # 9 // 2 per rank
    assert not set(idx[0]) & set(idx[1])  # disjoint
    # second pass advances the shared permutation identically on both ranks
    epoch2 = [_materialize(ld) for ld in loaders]
    idx2 = [np.concatenate([b[2]["index"] for b in e]) for e in epoch2]
    assert not set(idx2[0]) & set(idx2[1])


def test_pool_loader_propagates_worker_errors():
    class Exploding(CountingDataset):
        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError("decode failed")
            return super().__getitem__(i)

    loader = DataLoader(Exploding(n=8), batch_size=2, shuffle=False,
                        num_workers=3)
    import pytest
    with pytest.raises(RuntimeError, match="decode failed"):
        _materialize(loader)
