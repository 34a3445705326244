"""Animal-family dataset tests over synthetic fixtures (clean_data JSON +
cached_data idx/mean files + generated images)."""

import json
import os
import random

import numpy as np
import pytest
import torch
from PIL import Image

from uda_poseestimation_tpu.data import synthetic_animal_sp_all, animal_pose_mt
from uda_poseestimation_tpu.data import transforms as T
from uda_poseestimation_tpu.data.animal_aug import AnimalAugmentation


@pytest.fixture
def fake_synthetic_animal(tmp_path, monkeypatch):
    data_dir = tmp_path / "animal_data"
    cached = tmp_path / "cached_data"
    monkeypatch.setenv("UDA_CACHED_DATA_DIR", str(cached))
    rng = np.random.RandomState(0)
    data = {}
    for animal in ("horse", "tiger"):
        img_dir = data_dir / "synthetic_animal" / f"{animal}_combineds5r5_texture"
        img_dir.mkdir(parents=True)
        imgpaths, kpts_all, bbox_all = [], [], []
        for i in range(4):
            p = img_dir / f"{i:04d}_img.png"
            Image.fromarray((rng.rand(480, 640, 3) * 255).astype(np.uint8)).save(p)
            kpts = np.concatenate([rng.uniform(100, 500, (18, 2)),
                                   np.ones((18, 1))], axis=1)
            # reference stores CWD-relative 'animal_data/...' paths and maps
            # them onto image_path by string replace (load_animal)
            imgpaths.append(os.path.relpath(str(p), str(tmp_path)))
            kpts_all.append(kpts.tolist())
            bbox_all.append([float(kpts[:, 0].min()), float(kpts[:, 0].max()),
                             float(kpts[:, 1].min()), float(kpts[:, 1].max())])
        data[animal] = {"keypoints": kpts_all, "imgpath": imgpaths, "bbox": bbox_all,
                        "train_idxs": [0, 1, 2], "valid_idxs": [3]}
        cdir = cached / "synthetic_animal" / f"{animal}_combineds5r5_texture"
        cdir.mkdir(parents=True)
        torch.save({"mean": torch.tensor([0.4, 0.39, 0.38]),
                    "std": torch.tensor([0.25, 0.24, 0.23])}, cdir / "mean.pth.tar")
    alldir = cached / "synthetic_animal" / "all_combineds5r5_texture"
    alldir.mkdir(parents=True)
    torch.save({"mean": torch.tensor([0.3999, 0.3909, 0.3871]),
                "std": torch.tensor([0.2589, 0.2431, 0.2291])}, alldir / "mean.pth.tar")
    (data_dir / "clean_data").mkdir()
    with open(data_dir / "clean_data" / "keypoints_18.json", "w") as f:
        json.dump(data, f)
    return str(data_dir)


def _animal_kwargs(image_path):
    return dict(animal="all", image_path=image_path, inp_res=64, out_res=16,
                sigma=1, scale_factor=0.25, rot_factor=30, label_type="Gaussian",
                train_on_all_cat=True)


def test_synthetic_animal_dataset(fake_synthetic_animal):
    random.seed(0)
    np.random.seed(0)
    ds = synthetic_animal_sp_all(is_train=True, **_animal_kwargs(fake_synthetic_animal))
    assert len(ds) == 6  # 3 train x 2 animals
    inp, target, weight, meta = ds[0]
    assert inp.shape == (64, 64, 3)
    assert target.shape == (18, 16, 16)
    assert weight.shape == (18, 1)
    assert np.isfinite(inp).all()
    # at least some keypoints should render
    assert target.max() > 0.5

    ds_val = synthetic_animal_sp_all(is_train=False, **_animal_kwargs(fake_synthetic_animal))
    assert len(ds_val) == 2
    inp_v, target_v, weight_v, meta_v = ds_val[0]
    assert inp_v.shape == (64, 64, 3)
    acc = ds_val.group_accuracy(list(np.linspace(0, 1, 18)))
    assert set(acc) == {"eye", "chin", "hoof", "hip", "knee", "shoulder", "elbow", "all"}


def test_animal_augmentation_moves_keypoints():
    rng = np.random.RandomState(1)
    aug = AnimalAugmentation(p=1.0, rng=np.random.RandomState(2))
    img = np.zeros((100, 100, 3), np.uint8)
    img[48:53, 48:53] = 255
    kps = np.array([[50.0, 50.0]], np.float32)
    out_img, out_kps = aug(img, kps)
    assert out_img.shape == (100, 100, 3)
    assert out_kps.shape == (1, 2)


@pytest.fixture
def fake_animal_pose(tmp_path, monkeypatch):
    data_dir = tmp_path / "animal_data"
    cached = tmp_path / "cached_data"
    monkeypatch.setenv("UDA_CACHED_DATA_DIR", str(cached))
    rng = np.random.RandomState(0)
    images = {}
    (data_dir / "animal-pose" / "images").mkdir(parents=True)
    for animal in ("dog", "sheep"):
        annos = []
        for i in range(3):
            image_id = f"{animal}_{i}"
            name = f"{image_id}.jpg"
            Image.fromarray((rng.rand(240, 320, 3) * 255).astype(np.uint8)).save(
                data_dir / "animal-pose" / "images" / name)
            images[str(image_id)] = name
            kpts = np.concatenate([rng.uniform(40, 280, (20, 1)),
                                   rng.uniform(40, 200, (20, 1)),
                                   np.ones((20, 1))], axis=1)
            annos.append({"image_id": image_id, "bbox": [40, 40, 280, 200],
                          "keypoints": kpts.tolist(), "num_keypoints": 20,
                          "category_id": 5})
        cdir = cached / "real_animal_pose" / animal
        cdir.mkdir(parents=True)
        np.save(cdir / "train_anno.npy", np.array(annos[:2], dtype=object))
        np.save(cdir / "test_anno.npy", np.array(annos[2:], dtype=object))
    alldir = cached / "real_animal_pose" / "all"
    alldir.mkdir(parents=True)
    torch.save({"mean": torch.tensor([0.4042, 0.3977, 0.3974]),
                "std": torch.tensor([0.25, 0.24, 0.23])}, alldir / "mean.pth.tar")
    with open(data_dir / "animal-pose" / "keypoints.json", "w") as f:
        json.dump({"images": images}, f)
    return str(data_dir)


def test_animal_pose_mt_dataset(fake_animal_pose):
    random.seed(1)
    stu = T.Compose([
        T.RandomAffineRotation(30, (-10, 10), (0.05, 0.05), (0.9, 1.1)),
        T.ToTensor()])
    ds = animal_pose_mt(is_train=True, transforms_stu=stu, transforms_tea=stu, k=1,
                        **_animal_kwargs(fake_animal_pose))
    assert len(ds) == 4
    out = ds[0]
    assert len(out) == 8
    image_stu, target_stu, weight_stu, meta_stu = out[:4]
    assert image_stu.shape == (64, 64, 3)
    assert target_stu.shape == (14, 16, 16)
    assert meta_stu["aug_param_stu"].shape == (6,)
    assert meta_stu["target_ori"].shape == (14, 16, 16)
    assert out[4][0].shape == (64, 64, 3)
