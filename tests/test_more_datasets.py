"""Construction + __getitem__ coverage for the remaining dataset classes
(FreiHand, SURREAL, Human36M(+mt), Hand3DStudio(+All,+mt),
synthetic_animal_sp_all_other, animal_pose eval) over tiny fixtures."""

import json
import os
import random

import numpy as np
import pytest
import torch
from PIL import Image

import uda_poseestimation_tpu.data as datasets
from uda_poseestimation_tpu.data import transforms as T


def _val_tr(size=64):
    return T.Compose([T.Resize(size), T.ToTensor(),
                      T.Normalize([0.485, 0.456, 0.406], [0.229, 0.224, 0.225])])


def _mt_trs(size=64):
    base = T.Compose([T.RandomResizedCrop(size=size, scale=(0.8, 1.0))])
    view = T.Compose([T.RandomAffineRotation(30, (-10, 10), (0.05, 0.05), (0.9, 1.1)),
                      T.ToTensor()])
    return base, view


def test_freihand(tmp_path):
    root = tmp_path / "freihand"
    (root / "training" / "rgb").mkdir(parents=True)
    (root / "training" / "mask").mkdir(parents=True)
    (root / "evaluation").mkdir(parents=True)
    rng = np.random.RandomState(0)
    n = 32560  # hardcoded db size; annotations must cover it
    K = [[[300.0, 0, 112], [0, 300.0, 112], [0, 0, 1]]] * n
    xyz = rng.uniform(-0.05, 0.05, (n, 21, 3)) + np.array([0, 0, 0.5])
    with open(root / "training_K.json", "w") as f:
        json.dump(K, f)
    with open(root / "training_mano.json", "w") as f:
        json.dump([[0.0]] * n, f)
    with open(root / "training_xyz.json", "w") as f:
        json.dump(xyz.tolist(), f)
    # only a few images actually exist; we only index those samples
    from uda_poseestimation_tpu.data.freihand import sample_version
    wanted = []
    for i in range(3):
        for v in ("gs", "auto", "sample", "hom"):
            idx = sample_version.map_id(i, v)
            Image.fromarray((rng.rand(224, 224, 3) * 255).astype(np.uint8)).save(
                root / "training" / "rgb" / ("%08d.jpg" % idx))
            wanted.append(idx)
    ds = datasets.FreiHand(str(root), split="all", task="all", download=False,
                           transforms=_val_tr(), image_size=(64, 64),
                           heatmap_size=(16, 16))
    assert len(ds) == 4 * n
    by_name = {s["name"]: i for i, s in enumerate(ds.samples)}
    idx = by_name[os.path.join("training", "rgb", "%08d.jpg" % wanted[0])]
    image, target, weight, meta = ds[idx]
    assert image.shape == (64, 64, 3)
    assert target.shape == (21, 16, 16)


def test_surreal(tmp_path):
    root = tmp_path / "surreal"
    rng = np.random.RandomState(1)
    for part in (0, 1, 2):
        run_dir = root / "train" / f"run{part}"
        run_dir.mkdir(parents=True)
        samples = []
        for i in range(4):
            name = f"img{i}.jpg"
            # the canonical 'surreal_processed' images are square
            Image.fromarray((rng.rand(240, 240, 3) * 255).astype(np.uint8)).save(
                run_dir / name)
            samples.append({
                "name": name,
                "keypoint2d": rng.uniform(40, 200, (24, 2)).tolist(),
                "keypoint3d": (rng.uniform(-0.3, 0.3, (24, 3)) + [0, 0, 3.0]).tolist(),
                "intrinsic_matrix": [[600.0, 0, 160], [0, 600.0, 120], [0, 0, 1]],
            })
        with open(root / "train" / f"run{part}.json", "w") as f:
            json.dump(samples, f)
    (root / "val").mkdir()
    (root / "test").mkdir()
    ds = datasets.SURREAL(str(root), split="train", download=False,
                          transforms=_val_tr(), image_size=(64, 64),
                          heatmap_size=(16, 16))
    assert len(ds) > 0
    image, target, weight, meta = ds[0]
    assert image.shape == (64, 64, 3) and target.shape == (16, 16, 16)


def _h36m_fixture(tmp_path):
    root = tmp_path / "h36m"
    (root / "annotations").mkdir(parents=True)
    (root / "crop_images").mkdir()
    rng = np.random.RandomState(2)
    for part in (1, 5, 6, 7, 8, 9, 11):
        samples = []
        for i in range(3):
            name = f"p{part}_{i}.jpg"
            Image.fromarray((rng.rand(512, 512, 3) * 255).astype(np.uint8)).save(
                root / "crop_images" / name)
            samples.append({
                "name": name,
                "keypoint2d": rng.uniform(80, 400, (16, 2)).tolist(),
                "keypoint3d": (rng.uniform(-0.4, 0.4, (16, 3)) + [0, 0, 4.0]).tolist(),
                "intrinsic_matrix": [[1000.0, 0, 256], [0, 1000.0, 256], [0, 0, 1]],
            })
        with open(root / "annotations" / f"keypoints2d_{part}.json", "w") as f:
            json.dump(samples, f)
    return str(root)


def test_human36m(tmp_path):
    root = _h36m_fixture(tmp_path)
    ds = datasets.Human36M(root, split="test", transforms=_val_tr(),
                           image_size=(64, 64), heatmap_size=(16, 16))
    assert len(ds) == 3200  # random.choices(k=3200)
    image, target, weight, meta = ds[0]
    assert image.shape == (64, 64, 3) and target.shape == (16, 16, 16)

    base, view = _mt_trs()
    random.seed(0)
    ds_mt = datasets.Human36M_mt(root, split="train", k=1, transforms_base=base,
                                 transforms_stu=view, transforms_tea=view,
                                 image_size=(64, 64), heatmap_size=(16, 16))
    out = ds_mt[0]
    assert len(out) == 8
    assert out[3]["aug_param_stu"].shape == (6,)


def test_hand_3d_studio(tmp_path):
    root = tmp_path / "h3d"
    crop = root / "H3D_crop"
    crop.mkdir(parents=True)
    rng = np.random.RandomState(3)
    samples = []
    for i in range(12):
        name = f"part1/im{i}.jpg"
        (crop / "part1").mkdir(exist_ok=True)
        Image.fromarray((rng.rand(128, 128, 3) * 255).astype(np.uint8)).save(crop / name)
        samples.append({
            "name": name,
            "without_object": i % 2,
            "keypoint2d": rng.uniform(20, 100, (21, 2)).tolist(),
            "keypoint3d": (rng.uniform(-0.05, 0.05, (21, 3)) + [0, 0, 0.4]).tolist(),
            "intrinsic_matrix": [[300.0, 0, 64], [0, 300.0, 64], [0, 0, 1]],
        })
    with open(crop / "annotation.json", "w") as f:
        json.dump(samples, f)

    ds = datasets.Hand3DStudio(str(root), split="train", task="noobject",
                               download=False, transforms=_val_tr(),
                               image_size=(64, 64), heatmap_size=(16, 16))
    assert all(int(s["without_object"]) == 1 for s in ds.samples)
    image, target, weight, meta = ds[0]
    assert image.shape == (64, 64, 3) and target.shape == (21, 16, 16)

    ds_all = datasets.Hand3DStudioAll(str(root), split="train", download=False,
                                      transforms=_val_tr(), image_size=(64, 64),
                                      heatmap_size=(16, 16))
    assert len(ds_all) > len(ds)

    base, view = _mt_trs()
    random.seed(1)
    ds_mt = datasets.Hand3DStudioAll_mt(str(root), split="train", download=False,
                                        k=2, transforms_base=base,
                                        transforms_stu=view, transforms_tea=view,
                                        image_size=(64, 64), heatmap_size=(16, 16))
    out = ds_mt[0]
    assert len(out) == 8 and len(out[4]) == 2


def test_synthetic_animal_other(tmp_path, monkeypatch):
    data_dir = tmp_path / "animal_data"
    cached = tmp_path / "cached_data"
    monkeypatch.setenv("UDA_CACHED_DATA_DIR", str(cached))
    rng = np.random.RandomState(4)
    data = {}
    for animal in ("hound", "sheep"):
        img_dir = data_dir / "synthetic_animal" / f"{animal}_combineds5r5_texture"
        img_dir.mkdir(parents=True)
        imgpaths, kpts_all, bbox_all = [], [], []
        for i in range(3):
            p = img_dir / f"{i:04d}_img.png"
            Image.fromarray((rng.rand(480, 640, 3) * 255).astype(np.uint8)).save(p)
            kpts = np.concatenate([rng.uniform(100, 500, (14, 2)),
                                   np.ones((14, 1))], 1)
            imgpaths.append(os.path.relpath(str(p), str(tmp_path)))
            kpts_all.append(kpts.tolist())
            bbox_all.append([float(kpts[:, 0].min()), float(kpts[:, 0].max()),
                             float(kpts[:, 1].min()), float(kpts[:, 1].max())])
        data[animal] = {"keypoints": kpts_all, "imgpath": imgpaths, "bbox": bbox_all,
                        "train_idxs": [0, 1], "valid_idxs": [2]}
    alldir = cached / "synthetic_animal" / "all_combineds5r5_texture"
    alldir.mkdir(parents=True)
    torch.save({"mean": torch.tensor([0.4, 0.39, 0.38]),
                "std": torch.tensor([0.25, 0.24, 0.23])}, alldir / "mean.pth.tar")
    (data_dir / "clean_data").mkdir()
    with open(data_dir / "clean_data" / "keypoints_14.json", "w") as f:
        json.dump(data, f)

    random.seed(2)
    np.random.seed(2)
    kw = dict(animal="all", image_path=str(data_dir), inp_res=64, out_res=16,
              sigma=1, scale_factor=0.25, rot_factor=30, label_type="Gaussian",
              train_on_all_cat=True)
    ds = datasets.synthetic_animal_sp_all_other(is_train=True, **kw)
    assert len(ds) == 4 and ds.num_keypoints == 14
    inp, target, weight, meta = ds[0]
    assert inp.shape == (64, 64, 3) and target.shape == (14, 16, 16)


def test_animal_pose_eval(tmp_path, monkeypatch):
    # reuse the mt fixture from test_animal_data via direct construction
    from tests.test_animal_data import fake_animal_pose  # noqa: F401
    data_dir = tmp_path / "animal_data"
    cached = tmp_path / "cached_data"
    monkeypatch.setenv("UDA_CACHED_DATA_DIR", str(cached))
    rng = np.random.RandomState(5)
    images = {}
    (data_dir / "animal-pose" / "images").mkdir(parents=True)
    for animal in ("dog", "sheep"):
        annos = []
        for i in range(2):
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
        np.save(cdir / "train_anno.npy", np.array(annos[:1], dtype=object))
        np.save(cdir / "test_anno.npy", np.array(annos[1:], dtype=object))
    alldir = cached / "real_animal_pose" / "all"
    alldir.mkdir(parents=True)
    torch.save({"mean": torch.tensor([0.4042, 0.3977, 0.3974]),
                "std": torch.tensor([0.25, 0.24, 0.23])}, alldir / "mean.pth.tar")
    with open(data_dir / "animal-pose" / "keypoints.json", "w") as f:
        json.dump({"images": images}, f)

    kw = dict(animal="all", image_path=str(data_dir), inp_res=64, out_res=16,
              sigma=1, scale_factor=0.25, rot_factor=30, label_type="Cauchy",
              train_on_all_cat=True)
    ds = datasets.animal_pose(is_train=False, **kw)
    assert len(ds) == 2 and ds.num_keypoints == 14
    inp, target, weight, meta = ds[0]
    assert inp.shape == (64, 64, 3) and target.shape == (14, 16, 16)
    assert np.isfinite(inp).all()


def test_human36m_preprocess(tmp_path):
    """The official-annotation preprocessing path (crop/reproject/resize)."""
    root = tmp_path / "h36m_raw"
    (root / "annotations").mkdir(parents=True)
    (root / "images").mkdir()
    rng = np.random.RandomState(6)
    part = 9
    images_meta, joints = [], {}
    cam = {"1": {"R": np.eye(3).tolist(), "t": [0.0, 0.0, 4000.0],
                 "f": [1100.0, 1100.0], "c": [500.0, 500.0]}}
    for i in range(10):
        fname = f"s{part}/f{i}.jpg"
        (root / "images" / f"s{part}").mkdir(exist_ok=True)
        Image.fromarray((rng.rand(1000, 1000, 3) * 255).astype(np.uint8)).save(
            root / "images" / fname)
        images_meta.append({"file_name": fname, "action_idx": 2,
                            "subaction_idx": 1, "frame_idx": i, "cam_idx": 1})
        # 17 raw joints in world mm, near the camera axis
        joints.setdefault("2", {}).setdefault("1", {})[str(i)] = (
            rng.uniform(-300, 300, (17, 3))).tolist()
    with open(root / "annotations" / f"Human36M_subject{part}_camera.json", "w") as f:
        json.dump(cam, f)
    with open(root / "annotations" / f"Human36M_subject{part}_data.json", "w") as f:
        json.dump({"images": images_meta}, f)
    with open(root / "annotations" / f"Human36M_subject{part}_joint_3d.json", "w") as f:
        json.dump(joints, f)

    from uda_poseestimation_tpu.data.human36m import _preprocess
    _preprocess(part, str(root))
    out = root / "annotations" / f"keypoints2d_{part}.json"
    assert out.exists()
    with open(out) as f:
        data = json.load(f)
    assert len(data) == 2  # every 5th of 10 frames
    sample = data[0]
    assert len(sample["keypoint2d"]) == 16
    crop_img = root / "crop_images" / sample["name"]
    assert crop_img.exists()
    with Image.open(crop_img) as im:
        assert im.size == (512, 512)
    # keypoints must land inside the 512 crop
    kp = np.array(sample["keypoint2d"])
    assert (kp > -50).all() and (kp < 562).all()
