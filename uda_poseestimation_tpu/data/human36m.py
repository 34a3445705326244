"""Human3.6M dataset — twin of lib/datasets/human36m.py + human36m_mt.py.

Parity: preprocesses the official annotation JSONs into
annotations/keypoints2d_<part>.json + 512x512 crop_images (1.5x bbox crop of
every 5th frame, body reindex [3,2,1,4,5,6,0,11,8,10,16,15,14,11,12,13] with
joint 7 = midpoint of 12/13); train parts [1,5,6,7,8], test [9,11]; test
subsampled to 3200 via random.choices with seed 42 (:50-73, 111-190).
"""

from __future__ import annotations

import json
import os
import random

import numpy as np
import tqdm
from PIL import Image, ImageFile

from .keypoint_dataset import Body16KeypointDataset
from .transforms import crop
from .util import generate_target, get_bounding_box, keypoint2d_to_3d, scale_box

ImageFile.LOAD_TRUNCATED_IMAGES = True


def _preprocess(part, root):
    body_index = [3, 2, 1, 4, 5, 6, 0, 11, 8, 10, 16, 15, 14, 11, 12, 13]
    image_size = 512
    print("preprocessing part", part)
    with open(os.path.join(root, "annotations", f"Human36M_subject{part}_camera.json")) as f:
        cameras = json.load(f)
    with open(os.path.join(root, "annotations", f"Human36M_subject{part}_data.json")) as f:
        images = json.load(f)["images"]
    with open(os.path.join(root, "annotations", f"Human36M_subject{part}_joint_3d.json")) as f:
        joints_3d = json.load(f)

    data = []
    for i, image_data in enumerate(tqdm.tqdm(images)):
        if i % 5 != 0:  # every 5th frame
            continue
        keypoint3d = np.array(joints_3d[str(image_data["action_idx"])][
            str(image_data["subaction_idx"])][str(image_data["frame_idx"])])
        keypoint3d = keypoint3d[body_index, :]
        keypoint3d[7, :] = 0.5 * (keypoint3d[12, :] + keypoint3d[13, :])
        camera = cameras[str(image_data["cam_idx"])]
        R, T = np.array(camera["R"]), np.array(camera["t"])[:, np.newaxis]
        extrinsic_matrix = np.concatenate([R, T], axis=1)
        keypoint3d_camera = np.matmul(extrinsic_matrix, np.hstack(
            (keypoint3d, np.ones((keypoint3d.shape[0], 1)))).T)
        Z_c = keypoint3d_camera[2:3, :]

        f_, c = np.array(camera["f"]), np.array(camera["c"])
        intrinsic_matrix = np.zeros((3, 3))
        intrinsic_matrix[0, 0] = f_[0]
        intrinsic_matrix[1, 1] = f_[1]
        intrinsic_matrix[0, 2] = c[0]
        intrinsic_matrix[1, 2] = c[1]
        intrinsic_matrix[2, 2] = 1
        keypoint2d = np.matmul(intrinsic_matrix, keypoint3d_camera)
        keypoint2d = (keypoint2d[0:2, :] / Z_c).T

        src_image_path = os.path.join(root, "images", image_data["file_name"])
        tgt_image_path = os.path.join(root, "crop_images", image_data["file_name"])
        os.makedirs(os.path.dirname(tgt_image_path), exist_ok=True)
        image = Image.open(src_image_path)

        bounding_box = get_bounding_box(keypoint2d)
        w, h = image.size
        left, upper, right, lower = scale_box(bounding_box, w, h, 1.5)
        image, keypoint2d = crop(image, upper, left, lower - upper + 1,
                                 right - left + 1, keypoint2d)
        Z_c = Z_c.T

        uv1 = np.concatenate([np.copy(keypoint2d), np.ones((16, 1))], axis=1) * Z_c
        keypoint3d_camera = np.matmul(np.linalg.inv(intrinsic_matrix), uv1.T).T

        w, h = image.size
        image = image.resize((image_size, image_size))
        image.save(tgt_image_path)

        zoom_factor = float(w) / float(image_size)
        keypoint2d /= zoom_factor
        intrinsic_matrix[0, 0] /= zoom_factor
        intrinsic_matrix[1, 1] /= zoom_factor
        intrinsic_matrix[0, 2] /= zoom_factor
        intrinsic_matrix[1, 2] /= zoom_factor

        data.append({
            "name": image_data["file_name"],
            "keypoint2d": keypoint2d.tolist(),
            "keypoint3d": keypoint3d_camera.tolist(),
            "intrinsic_matrix": intrinsic_matrix.tolist(),
        })

    with open(os.path.join(root, "annotations", f"keypoints2d_{part}.json"), "w") as f:
        json.dump(data, f)


def _load_samples(root, split):
    assert split in ["train", "test", "all"]
    if split == "train":
        parts = [1, 5, 6, 7, 8]
    elif split == "test":
        parts = [9, 11]
    else:
        parts = [1, 5, 6, 7, 8, 9, 11]

    samples = []
    for part in parts:
        annotation_file = os.path.join(root, "annotations/keypoints2d_{}.json".format(part))
        if not os.path.exists(annotation_file):
            _preprocess(part, root)
        print("loading", annotation_file)
        with open(annotation_file) as f:
            samples.extend(json.load(f))
    random.seed(42)
    if split == "test":
        samples = random.choices(samples, k=3200)
    return samples


def _normalize_3d(kp3d):
    kp = kp3d - kp3d[9:10, :]
    return kp / np.sqrt(np.sum(kp[0, :] ** 2))


class Human36M(Body16KeypointDataset):
    """Human3.6M target eval dataset (4-tuple contract)."""

    def __init__(self, root, split="train", task="all", download=True, **kwargs):
        self.split = split
        samples = _load_samples(root, split)
        super().__init__(root, samples, **kwargs)

    def __getitem__(self, index):
        sample = self.samples[index]
        image_name = sample["name"]
        image = Image.open(os.path.join(self.root, "crop_images", image_name))
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
            "keypoint2d": keypoint2d,
            "keypoint3d": keypoint3d_n,
        }
        return image, target, target_weight, meta


class Human36M_mt(Body16KeypointDataset):
    """Human3.6M mean-teacher dataset (8-tuple contract, human36m_mt.py)."""

    def __init__(self, root, split="train", task="all", download=True, k=1,
                 transforms_base=None, transforms_stu=None, transforms_tea=None, **kwargs):
        self.split = split
        self.transforms_base = transforms_base
        self.transforms_stu = transforms_stu
        self.transforms_tea = transforms_tea
        self.k = k
        samples = _load_samples(root, split)
        super().__init__(root, samples, **kwargs)

    def __getitem__(self, index):
        sample = self.samples[index]
        image_name = sample["name"]
        image = Image.open(os.path.join(self.root, "crop_images", image_name))
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
