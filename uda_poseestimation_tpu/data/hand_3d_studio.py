"""Hand-3d-Studio dataset — twin of lib/datasets/hand_3d_studio.py (+_mt).

Parity: annotation.json under H3D_crop, task filter noobject/object/all,
seed-42 shuffle, test = first min(0.2*N, 3200), train = remainder,
train-val/val sub-splits (:66-82). Visibility is all-ones.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import random

import numpy as np
from PIL import Image, ImageFile

from ._util import check_exits, download as download_data
from .keypoint_dataset import Hand21KeypointDataset
from .util import generate_target, keypoint2d_to_3d

ImageFile.LOAD_TRUNCATED_IMAGES = True


def _load_samples(root, split, task):
    assert split in ["train", "test", "all", "train-val", "val"]
    assert task in ["noobject", "object", "all"]
    annotation_file = os.path.join(root, "annotation.json")
    print("loading from {}".format(annotation_file))
    with open(annotation_file) as f:
        samples = list(json.load(f))
    if task == "noobject":
        samples = [s for s in samples if int(s["without_object"]) == 1]
    elif task == "object":
        samples = [s for s in samples if int(s["without_object"]) == 0]

    random.seed(42)
    random.shuffle(samples)
    samples_split = min(int(len(samples) * 0.2), 3200)
    if split == "train":
        samples = samples[samples_split:]
    elif split == "test":
        samples = samples[:samples_split]
    elif split == "train-val":
        samples = samples[2 * samples_split:]
    elif split == "val":
        samples = samples[samples_split:2 * samples_split]
    return samples


def _normalize_3d(kp3d):
    kp = kp3d - kp3d[9:10, :]
    return kp / np.sqrt(np.sum(kp[0, :] ** 2))


class Hand3DStudio(Hand21KeypointDataset):
    """H3D eval/source dataset (4-tuple contract)."""

    def __init__(self, root, split="train", task="noobject", download=True, **kwargs):
        self.split = split
        self.task = task
        if download:
            download_data(root, "H3D_crop", "H3D_crop.tar",
                          "https://cloud.tsinghua.edu.cn/f/d4e612e44dc04d8eb01f/?dl=1")
        else:
            check_exits(root, "H3D_crop")
        root = osp.join(root, "H3D_crop")
        samples = _load_samples(root, split, task)
        super().__init__(root, samples, **kwargs)

    def __getitem__(self, index):
        sample = self.samples[index]
        image_name = sample["name"]
        image = Image.open(os.path.join(self.root, image_name))
        keypoint3d_camera = np.array(sample["keypoint3d"])
        keypoint2d = np.array(sample["keypoint2d"])
        intrinsic_matrix = np.array(sample["intrinsic_matrix"])
        Zc = keypoint3d_camera[:, 2]

        image, data = self.transforms(image, keypoint2d=keypoint2d,
                                      intrinsic_matrix=intrinsic_matrix)
        keypoint2d = data["keypoint2d"]
        intrinsic_matrix = data["intrinsic_matrix"]
        keypoint3d_camera = keypoint2d_to_3d(keypoint2d, intrinsic_matrix, Zc)

        visible = np.ones((self.num_keypoints, 1), dtype=np.float32)
        target, target_weight = generate_target(keypoint2d, visible, self.heatmap_size,
                                                self.sigma, self.image_size)
        keypoint3d_n = _normalize_3d(keypoint3d_camera)
        meta = {
            "image": image_name,
            "target_small": generate_target(keypoint2d, visible, (8, 8),
                                            self.sigma, self.image_size),
            "keypoint2d": keypoint2d,
            "keypoint3d": keypoint3d_n,
        }
        return image, target, target_weight, meta


class Hand3DStudioAll(Hand3DStudio):
    """H3D with task='all' (reference :124-130)."""

    def __init__(self, root, task="all", **kwargs):
        super().__init__(root, task=task, **kwargs)


class Hand3DStudio_mt(Hand21KeypointDataset):
    """H3D mean-teacher dataset (8-tuple contract, hand_3d_studio_mt.py)."""

    def __init__(self, root, split="train", task="noobject", download=True, k=1,
                 transforms_base=None, transforms_stu=None, transforms_tea=None, **kwargs):
        self.split = split
        self.task = task
        if download:
            download_data(root, "H3D_crop", "H3D_crop.tar",
                          "https://cloud.tsinghua.edu.cn/f/d4e612e44dc04d8eb01f/?dl=1")
        else:
            check_exits(root, "H3D_crop")
        root = osp.join(root, "H3D_crop")
        self.transforms_base = transforms_base
        self.transforms_stu = transforms_stu
        self.transforms_tea = transforms_tea
        self.k = k
        samples = _load_samples(root, split, task)
        super().__init__(root, samples, **kwargs)

    def __getitem__(self, index):
        sample = self.samples[index]
        image_name = sample["name"]
        image = Image.open(os.path.join(self.root, image_name))
        keypoint3d_camera = np.array(sample["keypoint3d"])
        keypoint2d = np.array(sample["keypoint2d"])
        intrinsic_matrix = np.array(sample["intrinsic_matrix"])
        Zc = keypoint3d_camera[:, 2]

        image, data = self.transforms_base(image, keypoint2d=keypoint2d,
                                           intrinsic_matrix=intrinsic_matrix)
        keypoint2d = data["keypoint2d"]
        intrinsic_matrix = data["intrinsic_matrix"]

        image_stu, data_stu = self.transforms_stu(image, keypoint2d=keypoint2d,
                                                  intrinsic_matrix=intrinsic_matrix)
        keypoint2d_stu = data_stu["keypoint2d"]
        intrinsic_matrix_stu = data_stu["intrinsic_matrix"]
        aug_param_stu = data_stu["aug_param"]
        keypoint3d_stu = keypoint2d_to_3d(keypoint2d_stu, intrinsic_matrix_stu, Zc)

        visible = np.ones((self.num_keypoints, 1), dtype=np.float32)
        target_stu, target_weight_stu = generate_target(
            keypoint2d_stu, visible, self.heatmap_size, self.sigma, self.image_size)
        target_ori, target_weight_ori = generate_target(
            keypoint2d, visible, self.heatmap_size, self.sigma, self.image_size)

        keypoint3d_n_stu = _normalize_3d(keypoint3d_stu)
        meta_stu = {
            "image": image_name,
            "target_small_stu": generate_target(keypoint2d_stu, visible, (8, 8),
                                                self.sigma, self.image_size),
            "keypoint2d_ori": keypoint2d,
            "target_ori": target_ori,
            "target_weight_ori": target_weight_ori,
            "keypoint2d_stu": keypoint2d_stu,
            "keypoint3d_stu": keypoint3d_n_stu,
            "aug_param_stu": aug_param_stu,
            "z_stu": keypoint3d_n_stu[:, 2],
        }

        images_tea, targets_tea, target_weights_tea, metas_tea = [], [], [], []
        for _ in range(self.k):
            image_tea, data_tea = self.transforms_tea(image, keypoint2d=keypoint2d,
                                                      intrinsic_matrix=intrinsic_matrix)
            keypoint2d_tea = data_tea["keypoint2d"]
            intrinsic_matrix_tea = data_tea["intrinsic_matrix"]
            aug_param_tea = data_tea["aug_param"]
            keypoint3d_tea = keypoint2d_to_3d(keypoint2d_tea, intrinsic_matrix_tea, Zc)

            target_tea, target_weight_tea = generate_target(
                keypoint2d_tea, visible, self.heatmap_size, self.sigma, self.image_size)
            keypoint3d_n_tea = _normalize_3d(keypoint3d_tea)
            metas_tea.append({
                "image": image_name,
                "target_small_tea": generate_target(keypoint2d_tea, visible, (8, 8),
                                                    self.sigma, self.image_size),
                "keypoint2d_tea": keypoint2d_tea,
                "keypoint3d_tea": keypoint3d_n_tea,
                "aug_param_tea": aug_param_tea,
                "z_tea": keypoint3d_n_tea[:, 2],
            })
            images_tea.append(image_tea)
            targets_tea.append(target_tea)
            target_weights_tea.append(target_weight_tea)

        return (image_stu, target_stu, target_weight_stu, meta_stu,
                images_tea, targets_tea, target_weights_tea, metas_tea)


class Hand3DStudioAll_mt(Hand3DStudio_mt):
    """H3D mean-teacher with task='all'."""

    def __init__(self, root, task="all", **kwargs):
        super().__init__(root, task=task, **kwargs)
