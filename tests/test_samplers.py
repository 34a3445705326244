"""Sampler/dataset-combination utilities (lib/data.py:64-179 twins).

Unused by the reference trainers but exported API surface; these pin the
behavioral contract: K-instances-per-identity blocks, element-wise dataset
splicing, and recursive batch concatenation.
"""

import random

import numpy as np

from uda_poseestimation_tpu.data.samplers import (
    CombineDataset,
    RandomMultipleGallerySampler,
    concatenate,
)


def _reid_dataset():
    # (payload, pid, cid) triples: 3 identities x 3 cameras
    data = []
    for pid in range(3):
        for cid in range(3):
            data.append((f"img_{pid}_{cid}", pid, cid))
    return data


def test_random_multiple_gallery_sampler_blocks():
    random.seed(0)
    np.random.seed(0)
    ds = _reid_dataset()
    k = 3
    sampler = RandomMultipleGallerySampler(ds, num_instances=k)
    assert len(sampler) == 3 * k  # num identities * K

    idxes = list(iter(sampler))
    assert all(0 <= i < len(ds) for i in idxes)
    assert len(idxes) == 3 * k
    # each K-block belongs to one identity, anchored at the block head with
    # followers drawn from OTHER cameras of that identity (lib/data.py:110-127)
    for start in range(0, len(idxes), k):
        block = idxes[start:start + k]
        pids = {ds[i][1] for i in block}
        assert len(pids) == 1
        anchor_cid = ds[block[0]][2]
        assert all(ds[i][2] != anchor_cid for i in block[1:])


def test_random_multiple_gallery_sampler_single_camera():
    """Identities seen by one camera fall back to same-camera resampling."""
    random.seed(1)
    np.random.seed(1)
    ds = [("a", 0, 0), ("b", 0, 0), ("c", 0, 0)]
    sampler = RandomMultipleGallerySampler(ds, num_instances=2)
    idxes = list(iter(sampler))
    assert len(idxes) == 2
    assert ds[idxes[1]][1] == 0 and idxes[1] != idxes[0]


def test_combine_dataset_splices():
    a = [("xa", 1), ("ya", 2), ("za", 3)]
    b = [("xb",), ("yb",)]
    combined = CombineDataset([a, b])
    assert len(combined) == 2  # min of the lengths
    assert combined[1] == ["ya", 2, "yb"]


def test_concatenate_recurses():
    t1 = {"x": np.ones((2, 3)), "y": [np.zeros((2,)), np.arange(2)]}
    t2 = {"x": np.zeros((1, 3)), "y": [np.ones((1,)), np.arange(1)]}
    out = concatenate([t1, t2])
    assert out["x"].shape == (3, 3)
    assert out["y"][0].shape == (3,)
    np.testing.assert_array_equal(out["y"][1], [0, 1, 0])
