"""Data-layer tests: transforms math, legacy resampling quirks, loaders, and
end-to-end dataset contracts over tiny synthetic on-disk fixtures."""

import os
import pickle
import random

import numpy as np
import pytest
import scipy.io as scio
from PIL import Image

from uda_poseestimation_tpu.data import (
    DataLoader,
    ForeverDataIterator,
    LSP,
    RenderedHandPose,
    RenderedHandPose_mt,
    default_collate,
)
from uda_poseestimation_tpu.data import transforms as T
from uda_poseestimation_tpu.data.util import (
    draw_labelmap_ori,
    generate_target as generate_target_np,
    imresize,
    crop_ori,
    transform as mpii_transform,
)
from uda_poseestimation_tpu.ops import generate_target as generate_target_jax


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------

def test_affine_moves_keypoints_with_image():
    """A bright dot at a keypoint must follow the keypoint under affine."""
    random.seed(0)
    rng = np.random.RandomState(0)
    for _ in range(5):
        kp = rng.uniform(80, 170, size=(1, 2)).astype(np.float32)
        img = Image.fromarray(np.zeros((256, 256, 3), np.uint8))
        arr = np.array(img)
        x, y = int(kp[0, 0]), int(kp[0, 1])
        arr[y - 2:y + 3, x - 2:x + 3] = 255
        img = Image.fromarray(arr)

        angle = rng.uniform(-40, 40)
        shx, shy = rng.uniform(-15, 15, 2)
        tx, ty = int(rng.uniform(-10, 10)), int(rng.uniform(-10, 10))
        scale = rng.uniform(0.8, 1.2)
        out_img, out_kp, aug = T.affine(img, angle, shx, shy, tx, ty, scale, kp)
        arr_out = np.array(out_img)[:, :, 0]
        if arr_out.max() == 0:
            continue  # dot warped out of frame
        yy, xx = np.unravel_index(arr_out.argmax(), arr_out.shape)
        err = np.hypot(xx - out_kp[0, 0], yy - out_kp[0, 1])
        assert err < 4.0, (err, angle, shx, shy, tx, ty, scale)
        # aug_param stores the inverse parameters, flattened
        np.testing.assert_allclose(
            aug, [-angle, -tx, -ty, -shx, -shy, 1.0 / scale], rtol=1e-6)


def test_resize_pad_keypoints():
    img = Image.fromarray(np.zeros((100, 50, 3), np.uint8))  # h=100, w=50
    kp = np.array([[25.0, 50.0]])
    out, kp_out = T.resize_pad(img, kp, 200)
    assert out.size == (200, 200)
    # w<h: scale by 200/100=2, pad left (200-100)/2=50
    np.testing.assert_allclose(kp_out, [[25 * 2 + 50, 100.0]], atol=1e-6)


def test_compose_threads_kwargs():
    random.seed(1)
    tr = T.Compose([
        T.RandomResizedCrop(size=64, scale=(0.8, 1.0)),
        T.RandomAffineRotation(30, (-10, 10), (0.05, 0.05), (0.9, 1.1)),
        T.ColorJitter(0.25, 0.25, 0.25),
        T.GaussianBlur(high=0.5),
        T.ToTensor(),
        T.Normalize([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
    ])
    img = Image.fromarray((np.random.RandomState(0).rand(128, 128, 3) * 255).astype(np.uint8))
    kp = np.random.RandomState(1).uniform(20, 100, (21, 2))
    out, data = tr(img, keypoint2d=kp, intrinsic_matrix=np.eye(3))
    assert out.shape == (64, 64, 3) and out.dtype == np.float32
    assert data["keypoint2d"].shape == (21, 2)
    assert data["aug_param"].shape == (6,)


def test_host_and_device_generate_target_agree():
    rng = np.random.RandomState(2)
    kp = rng.uniform(-30, 280, (21, 2)).astype(np.float32)
    vis = (rng.rand(21, 1) > 0.3).astype(np.float32)
    t_np, w_np = generate_target_np(kp, vis, (64, 64), 2, (256, 256))
    t_j, w_j = generate_target_jax(kp, vis, (64, 64), 2, (256, 256))
    np.testing.assert_allclose(t_np, np.asarray(t_j), atol=5e-6)
    np.testing.assert_allclose(w_np, np.asarray(w_j), atol=0)


# ---------------------------------------------------------------------------
# legacy scipy.misc resampling quirks
# ---------------------------------------------------------------------------

def test_imresize_bytescales_floats():
    arr = np.zeros((10, 10, 3), np.float32)
    arr[5, 5] = 0.5  # max 0.5 -> stretched to 255
    out = imresize(arr, (10, 10), interp="nearest")
    assert out.dtype == np.uint8
    assert out.max() == 255  # min-max stretch, not *255

    u8 = (np.ones((4, 4, 3)) * 100).astype(np.uint8)
    out2 = imresize(u8, (8, 8), interp="nearest")
    assert out2.max() == 100  # uint8 passes through unscaled


def test_crop_ori_shapes_and_range():
    rng = np.random.RandomState(3)
    img = rng.rand(225, 400, 3).astype(np.float32)
    c = np.array([200.0, 112.0])
    s = 1.5
    out = crop_ori(img, c, s, [256, 256])
    assert out.shape == (256, 256, 3)
    assert out.dtype == np.float32
    assert 0 <= out.min() and out.max() <= 1.0


def test_mpii_transform_roundtrip():
    c = np.array([200.0, 112.0])
    s = 1.5
    pt = np.array([180.0, 100.0])
    fwd = mpii_transform(pt, c, s, [256, 256])
    back = mpii_transform(fwd, c, s, [256, 256], invert=1)
    assert np.abs(np.asarray(back) - pt).max() <= 3  # int rounding both ways


def test_draw_labelmap_window_rule():
    img = np.zeros((64, 64), np.float32)
    # window fully inside -> drawn, vis=1
    out, vis = draw_labelmap_ori(img, np.array([30, 30]), 2)
    assert vis == 1 and abs(out[30, 30] - 1.0) < 1e-6
    # window clipping the border -> untouched, vis=0 (window-based rule)
    out2, vis2 = draw_labelmap_ori(img, np.array([2, 30]), 2)
    assert vis2 == 0 and out2.sum() == 0
    # Cauchy type
    out3, vis3 = draw_labelmap_ori(img, np.array([30, 30]), 2, label_type="Cauchy")
    assert vis3 == 1 and abs(out3[30, 30] - 2 / (2 ** 3)) < 1e-6


# ---------------------------------------------------------------------------
# loader
# ---------------------------------------------------------------------------

class _ToyDataset:
    def __len__(self):
        return 10

    def __getitem__(self, i):
        meta = {"idx": np.array(i), "name": f"img{i}", "pair": [np.ones(2) * i, np.zeros(1)]}
        return np.full((3, 4), i, np.float32), meta


def test_to_uint8_canvas_bit_identical_to_packed_totensor():
    """ToUint8Canvas (the --device-aug canvas transform) must emit exactly
    the uint8 array the bundled staging would reconstruct from ToTensor's
    f32 output (engine._pack_canvas round(x*255)) — the transform only
    deletes host float round-trips, never changes shipped bytes. Non-uint8
    sources fall back to ToTensor semantics."""
    import uda_poseestimation_tpu.data.transforms as T
    from uda_poseestimation_tpu.engine import DeviceAugPipeline

    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, (41, 37, 3), np.uint8)
    pil = Image.fromarray(arr)

    u8, kw = T.ToUint8Canvas()(pil, aug_param=np.zeros(6))
    assert u8.dtype == np.uint8 and "aug_param" in kw
    f32, _ = T.ToTensor()(pil)
    packed = DeviceAugPipeline._pack_canvas(None, f32)
    assert packed.dtype == np.uint8
    np.testing.assert_array_equal(u8, packed)

    # grayscale gains a channel axis; float sources fall back to ToTensor
    gray, _ = T.ToUint8Canvas()(Image.fromarray(arr[..., 0]))
    assert gray.shape == (41, 37, 1) and gray.dtype == np.uint8
    fsrc = rng.rand(8, 8, 3).astype(np.float32)
    out, _ = T.ToUint8Canvas()(fsrc)
    ref, _ = T.ToTensor()(fsrc)
    np.testing.assert_array_equal(out, ref)


def test_loader_collate_and_forever():
    ds = _ToyDataset()
    loader = DataLoader(ds, batch_size=4, shuffle=False, drop_last=True)
    assert len(loader) == 2
    batches = list(loader)
    assert batches[0][0].shape == (4, 3, 4)
    assert batches[0][1]["idx"].shape == (4,)
    assert batches[0][1]["name"] == ["img0", "img1", "img2", "img3"]
    assert batches[0][1]["pair"][0].shape == (4, 2)

    forever = ForeverDataIterator(loader)
    for _ in range(5):  # wraps around 2-batch loader
        x, meta = next(forever)
        assert x.shape == (4, 3, 4)

    # threaded path produces the same batches
    loader_t = DataLoader(ds, batch_size=4, shuffle=False, drop_last=True, num_workers=2)
    batches_t = list(loader_t)
    np.testing.assert_array_equal(batches_t[0][0], batches[0][0])


# ---------------------------------------------------------------------------
# dataset fixtures
# ---------------------------------------------------------------------------

@pytest.fixture
def fake_rhd(tmp_path):
    root = tmp_path / "rhd"
    base = root / "RHD_published_v2"
    for set_name in ("training", "evaluation"):
        (base / set_name / "color").mkdir(parents=True)
        (base / set_name / "mask").mkdir(parents=True)
        anno = {}
        rng = np.random.RandomState(0 if set_name == "training" else 1)
        n = 6 if set_name == "training" else 3
        for i in range(n):
            img = (rng.rand(320, 320, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(base / set_name / "color" / ("%.5d.png" % i))
            uv = np.zeros((42, 3))
            # left hand keypoints spread out, right far away & invisible
            uv[:21, :2] = rng.uniform(60, 260, (21, 2))
            uv[:21, 2] = 1
            uv[21:, :2] = 5.0
            anno[i] = {
                "uv_vis": uv,
                "xyz": rng.rand(42, 3) + 1.0,
                "K": np.array([[320.0, 0, 160], [0, 320.0, 160], [0, 0, 1]]),
            }
        with open(base / set_name / ("anno_%s.pickle" % set_name), "wb") as f:
            pickle.dump(anno, f)
    return str(root)


def test_rendered_hand_pose_dataset(fake_rhd):
    val_tr = T.Compose([T.Resize(64), T.ToTensor(),
                        T.Normalize([0.485, 0.456, 0.406], [0.229, 0.224, 0.225])])
    ds = RenderedHandPose(fake_rhd, split="train", download=False, transforms=val_tr,
                          image_size=(64, 64), heatmap_size=(16, 16))
    assert len(ds) > 0
    image, target, weight, meta = ds[0]
    assert image.shape == (64, 64, 3)
    assert target.shape == (21, 16, 16)
    assert weight.shape == (21, 1)
    assert meta["keypoint2d"].shape == (21, 2)

    batch = default_collate([ds[i] for i in range(min(2, len(ds)))])
    assert batch[0].shape[0] == 2


def test_rendered_hand_pose_mt_dataset(fake_rhd):
    random.seed(3)
    base = T.Compose([T.RandomResizedCrop(size=64, scale=(0.8, 1.0))])
    stu = T.Compose([
        T.RandomAffineRotation(30, (-10, 10), (0.05, 0.05), (0.9, 1.1)),
        T.ToTensor(), T.Normalize([0.485, 0.456, 0.406], [0.229, 0.224, 0.225])])
    ds = RenderedHandPose_mt(fake_rhd, split="train", download=False, k=2,
                             transforms_base=base, transforms_stu=stu, transforms_tea=stu,
                             image_size=(64, 64), heatmap_size=(16, 16))
    out = ds[0]
    assert len(out) == 8
    image_stu, target_stu, weight_stu, meta_stu, images_tea, targets_tea, weights_tea, metas_tea = out
    assert image_stu.shape == (64, 64, 3)
    assert len(images_tea) == 2
    assert meta_stu["aug_param_stu"].shape == (6,)
    assert metas_tea[0]["aug_param_tea"].shape == (6,)
    assert meta_stu["target_ori"].shape == (21, 16, 16)

    # collate into trainer batch layout
    batch = default_collate([ds[i] for i in range(2)])
    assert batch[0].shape == (2, 64, 64, 3)
    assert batch[4][0].shape == (2, 64, 64, 3)  # k teacher views: list of (B,...)
    assert batch[3]["aug_param_stu"].shape == (2, 6)


def test_lsp_dataset(tmp_path):
    root = tmp_path / "lsp"
    (root / "images").mkdir(parents=True)
    # reference quirk: download=False checks for a root/"lsp" subdir (lsp.py:47)
    (root / "lsp").mkdir()
    rng = np.random.RandomState(0)
    joints = np.zeros((3, 14, 2000))
    joints[0] = rng.uniform(10, 180, (14, 2000))  # x
    joints[1] = rng.uniform(10, 120, (14, 2000))  # y
    joints[2] = 0.0  # not occluded
    scio.savemat(root / "joints.mat", {"joints": joints})
    for i in range(3):
        img = (rng.rand(128, 192, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / ("im%04d.jpg" % (i + 1)))
    ds = LSP(str(root), download=False, image_size=(64, 64), heatmap_size=(16, 16))
    assert len(ds) == 2000
    image, target, weight, meta = ds[0]
    assert image.shape == (64, 64, 3)
    assert target.shape == (16, 16, 16)
    # joints 6/7 are never visible in LSP's 16-joint mapping
    assert weight[6] == 0 and weight[7] == 0
    acc = ds.group_accuracy(list(np.linspace(0, 1, 16)))
    assert "all" in acc and "head" in acc


def test_loader_rank_partition():
    """DataLoader(partition=(rank, world)): torch-DistributedSampler
    semantics for multi-host training (parallel/distributed.py) — every
    rank draws the identical seed-derived per-epoch permutation and keeps a
    disjoint strided slice, so each sample is seen exactly once per epoch
    globally and permutations change across epochs."""
    import pytest

    from uda_poseestimation_tpu.data.loader import DataLoader

    class Ints:
        def __len__(self):
            return 20

        def __getitem__(self, i):
            return np.asarray(i)

    def epoch_indices(loader):
        return [int(v) for batch in loader for v in batch]

    loaders = [DataLoader(Ints(), batch_size=2, shuffle=True, seed=7,
                          partition=(rank, 2)) for rank in range(2)]
    e0 = [epoch_indices(ld) for ld in loaders]
    assert len(e0[0]) == len(e0[1]) == 10 == len(loaders[0]) * 2
    assert not (set(e0[0]) & set(e0[1]))          # disjoint across ranks
    assert set(e0[0]) | set(e0[1]) == set(range(20))  # full coverage
    # next epoch: same cross-rank contract, different permutation
    e1 = [epoch_indices(ld) for ld in loaders]
    assert set(e1[0]) | set(e1[1]) == set(range(20))
    assert not (set(e1[0]) & set(e1[1]))
    assert e1[0] != e0[0]
    # unshuffled partition: deterministic strided split, no seed needed
    plain = DataLoader(Ints(), batch_size=5, partition=(1, 2))
    assert epoch_indices(plain) == list(range(1, 20, 2))
    # guardrails
    with pytest.raises(ValueError, match="seed"):
        DataLoader(Ints(), batch_size=2, shuffle=True, partition=(0, 2))
    with pytest.raises(ValueError, match="partition"):
        DataLoader(Ints(), batch_size=2, partition=(2, 2))

    # ragged dataset length: every rank must yield the SAME batch count per
    # pass (unequal counts would desynchronize the shared permutation via
    # ForeverDataIterator wrap-around), truncating the odd sample out
    class Ints23(Ints):
        def __len__(self):
            return 23

    ragged = [DataLoader(Ints23(), batch_size=2, shuffle=True, seed=3,
                         partition=(rank, 2), drop_last=True)
              for rank in range(2)]
    r0, r1 = (epoch_indices(ld) for ld in ragged)
    assert len(r0) == len(r1) == 10 == len(ragged[0]) * 2
    assert not (set(r0) & set(r1))
