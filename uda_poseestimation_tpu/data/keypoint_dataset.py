"""Keypoint dataset base classes — twin of lib/datasets/keypoint_dataset.py.

Torch-free ``Dataset`` protocol: ``__len__`` + ``__getitem__``. Skeleton
topologies, keypoint groups, ``visualize`` (cv2 skeleton render) and
``group_accuracy`` (per-group PCK aggregation incl. 'all') match the
reference exactly (:42-77 and the Body16/Hand21/Animal18/Animal14 tables).
"""

from __future__ import annotations

from abc import ABC

import cv2
import numpy as np


class Dataset:
    def __len__(self):  # pragma: no cover - interface
        raise NotImplementedError

    def __getitem__(self, index):  # pragma: no cover - interface
        raise NotImplementedError


def _name_to_bgr(color):
    """webcolors name -> (r, g, b) tuple like the reference's name_to_rgb."""
    if not isinstance(color, str):
        return color
    from webcolors import name_to_rgb
    c = name_to_rgb(color)
    return (int(c.red), int(c.green), int(c.blue))


class KeypointDataset(Dataset, ABC):
    """Generic image keypoint detection dataset (reference :12-77)."""

    def __init__(self, root, num_keypoints, samples, transforms=None,
                 image_size=(256, 256), heatmap_size=(64, 64), sigma=2,
                 keypoints_group=None, colored_skeleton=None):
        self.root = root
        self.num_keypoints = num_keypoints
        self.samples = samples
        self.transforms = transforms
        self.image_size = image_size
        self.heatmap_size = heatmap_size
        self.sigma = sigma
        self.keypoints_group = keypoints_group
        self.colored_skeleton = colored_skeleton

    def __len__(self):
        return len(self.samples)

    def visualize(self, image, keypoints, filename):
        """Render the colored skeleton over ``image`` and write to file."""
        assert self.colored_skeleton is not None
        image = cv2.cvtColor(np.asarray(image), cv2.COLOR_RGB2BGR).copy()
        if keypoints is not None:
            keypoints = np.asarray(keypoints)
            for (_, (line, color)) in self.colored_skeleton.items():
                color = _name_to_bgr(color)
                for i in range(len(line) - 1):
                    start, end = keypoints[line[i]], keypoints[line[i + 1]]
                    cv2.line(image, (int(start[0]), int(start[1])),
                             (int(end[0]), int(end[1])), color=color, thickness=3)
            for keypoint in keypoints:
                cv2.circle(image, (int(keypoint[0]), int(keypoint[1])), 3,
                           _name_to_bgr("black"), 1)
        cv2.imwrite(filename, image)

    def group_accuracy(self, accuracies):
        """Aggregate per-keypoint accuracy into named groups (:64-77)."""
        grouped = dict()
        for name, keypoints in self.keypoints_group.items():
            grouped[name] = sum([accuracies[idx] for idx in keypoints]) / len(keypoints)
        return grouped


class Body16KeypointDataset(KeypointDataset, ABC):
    """16 body keypoints (reference :80-118)."""

    head = (9,)
    shoulder = (12, 13)
    elbow = (11, 14)
    wrist = (10, 15)
    hip = (2, 3)
    knee = (1, 4)
    ankle = (0, 5)
    all = (12, 13, 11, 14, 10, 15, 2, 3, 1, 4, 0, 5)
    right_leg = (0, 1, 2, 8)
    left_leg = (5, 4, 3, 8)
    backbone = (8, 9)
    right_arm = (10, 11, 12, 8)
    left_arm = (15, 14, 13, 8)

    def __init__(self, root, samples, **kwargs):
        colored_skeleton = {
            "right_leg": (self.right_leg, "yellow"),
            "left_leg": (self.left_leg, "green"),
            "backbone": (self.backbone, "blue"),
            "right_arm": (self.right_arm, "purple"),
            "left_arm": (self.left_arm, "red"),
        }
        keypoints_group = {
            "head": self.head, "shoulder": self.shoulder, "elbow": self.elbow,
            "wrist": self.wrist, "hip": self.hip, "knee": self.knee,
            "ankle": self.ankle, "all": self.all,
        }
        super().__init__(root, 16, samples, keypoints_group=keypoints_group,
                         colored_skeleton=colored_skeleton, **kwargs)


class Hand21KeypointDataset(KeypointDataset, ABC):
    """21 hand keypoints (reference :121-153)."""

    MCP = (1, 5, 9, 13, 17)
    PIP = (2, 6, 10, 14, 18)
    DIP = (3, 7, 11, 15, 19)
    fingertip = (4, 8, 12, 16, 20)
    all = tuple(range(21))
    thumb = (0, 1, 2, 3, 4)
    index_finger = (0, 5, 6, 7, 8)
    middle_finger = (0, 9, 10, 11, 12)
    ring_finger = (0, 13, 14, 15, 16)
    little_finger = (0, 17, 18, 19, 20)

    def __init__(self, root, samples, **kwargs):
        colored_skeleton = {
            "thumb": (self.thumb, "yellow"),
            "index_finger": (self.index_finger, "green"),
            "middle_finger": (self.middle_finger, "blue"),
            "ring_finger": (self.ring_finger, "purple"),
            "little_finger": (self.little_finger, "red"),
        }
        keypoints_group = {
            "MCP": self.MCP, "PIP": self.PIP, "DIP": self.DIP,
            "fingertip": self.fingertip, "all": self.all,
        }
        super().__init__(root, 21, samples, keypoints_group=keypoints_group,
                         colored_skeleton=colored_skeleton, **kwargs)


class Animal18KeypointDataset(KeypointDataset, ABC):
    """18 animal keypoints — TigDog family (reference :156-201)."""

    eye = (0, 1)
    chin = (2,)
    hoof = (3, 4, 5, 6)
    hip = (7,)
    knee = (8, 9, 10, 11)
    shoulder = (12, 13)
    elbow = (14, 15, 16, 17)
    all = tuple(range(18))

    right_front_leg = (3, 8, 14)
    left_front_leg = (4, 9, 15)
    right_back_leg = (5, 10, 16)
    left_back_leg = (6, 11, 17)
    right_torso = (13, 7)
    right_face = (1, 2)
    left_torso = (12, 7)
    left_face = (0, 2)

    def __init__(self, root, samples, **kwargs):
        colored_skeleton = {
            "right_front_leg": (self.right_front_leg, [0, 0, 255]),
            "left_front_leg": (self.left_front_leg, [0, 127, 255]),
            "right_back_leg": (self.right_back_leg, [0, 255, 255]),
            "left_back_leg": (self.left_back_leg, [0, 255, 0]),
            "right_torso": (self.right_torso, [255, 0, 0]),
            "right_face": (self.right_face, [255, 0, 0]),
            "left_torso": (self.left_torso, [255, 0, 255]),
            "left_face": (self.left_face, [255, 0, 255]),
        }
        keypoints_group = {
            "eye": self.eye, "chin": self.chin, "hoof": self.hoof,
            "hip": self.hip, "knee": self.knee, "shoulder": self.shoulder,
            "elbow": self.elbow, "all": self.all,
        }
        super().__init__(root, 18, samples, keypoints_group=keypoints_group,
                         colored_skeleton=colored_skeleton, **kwargs)


class Animal14KeypointDataset(KeypointDataset, ABC):
    """14 animal keypoints — AnimalPose family (reference :203-236)."""

    eye = (0, 1)
    hoof = (2, 3, 4, 5)
    knee = (6, 7, 8, 9)
    elbow = (10, 11, 12, 13)
    all = tuple(range(14))

    right_front_leg = (2, 6, 10)
    left_front_leg = (3, 7, 11)
    right_back_leg = (4, 8, 12)
    left_back_leg = (5, 9, 13)
    eyes = (0, 1)

    def __init__(self, root, samples, **kwargs):
        colored_skeleton = {
            "eyes": (self.eyes, [255, 0, 255]),
            "right_front_leg": (self.right_front_leg, [0, 0, 255]),
            "left_front_leg": (self.left_front_leg, [0, 127, 255]),
            "right_back_leg": (self.right_back_leg, [0, 255, 255]),
            "left_back_leg": (self.left_back_leg, [0, 255, 0]),
        }
        keypoints_group = {
            "eye": self.eye, "hoof": self.hoof, "knee": self.knee,
            "elbow": self.elbow, "all": self.all,
        }
        super().__init__(root, 14, samples, keypoints_group=keypoints_group,
                         colored_skeleton=colored_skeleton, **kwargs)
