"""Host-side (numpy/PIL) dataset utilities — twin of lib/datasets/util.py.

Torch-free reimplementation of the reference's data-side numerics. Parity
notes:

- ``generate_target`` matches lib/datasets/util.py:12-70 (the on-device twin
  lives in ops.heatmap; this numpy version serves the host pipeline and the
  4-/8-tuple dataset contract);
- ``imresize`` reproduces scipy.misc.imresize's *legacy semantics* used by
  ``crop_ori`` (util.py:251,285): float inputs are min-max *bytescaled* to
  uint8 (a per-crop contrast stretch!) before a PIL bilinear resize — a real
  numeric quirk of the animal pipeline that affects pixel statistics, kept
  for parity;
- ``draw_labelmap_ori`` keeps the window-based (not center-based) visibility
  rule and the Gaussian/Cauchy variants (util.py:326-363);
- flip-pair tables for 'real_animal'/'animal_pose' etc. (util.py:186-224).

Images flow HWC float32 here (TPU-native layout); ``im_to_chw``/``im_from_chw``
bridge where the reference contract is channel-leading.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


# ---------------------------------------------------------------------------
# Heatmap target generation (family A)
# ---------------------------------------------------------------------------

def generate_target(joints, joints_vis, heatmap_size, sigma, image_size):
    """Gaussian heatmaps for one sample (numpy; see ops.heatmap for device twin).

    Args: joints (K, 2); joints_vis (K, 1) or (K,); heatmap_size (W, H);
    image_size (W, H). Returns target (K, H, W) float32, weight (K, 1).
    """
    joints = np.asarray(joints, np.float32)
    joints_vis = np.asarray(joints_vis, np.float32).reshape(-1)
    w, h = int(heatmap_size[0]), int(heatmap_size[1])
    stride_x = float(image_size[0]) / w
    stride_y = float(image_size[1]) / h
    mu_x = np.trunc(joints[:, 0] / stride_x + 0.5)
    mu_y = np.trunc(joints[:, 1] / stride_y + 0.5)
    in_bounds = (mu_x >= 0) & (mu_x < w) & (mu_y >= 0) & (mu_y < h)
    weight = np.where(in_bounds, joints_vis, 0.0).astype(np.float32)

    # Reference paste-window math (util.py:42-68), exact incl. fractional
    # sigma: ul = int(mu - 3σ), br = int(mu + 3σ + 1) (python int() truncates
    # toward zero), a (2*3σ+1)-sized patch whose peak sits at index size//2,
    # pasted over [max(0, ul), min(br, bound)). For integer sigma this
    # reduces to a |d| <= 3σ window centered at mu.
    tmp = 3.0 * sigma
    x0 = float((2.0 * tmp + 1.0) // 2)
    xs = np.arange(w, dtype=np.float32)[None, None, :]
    ys = np.arange(h, dtype=np.float32)[None, :, None]
    ul_x = np.trunc(mu_x - tmp)[:, None, None]
    ul_y = np.trunc(mu_y - tmp)[:, None, None]
    br_x = np.trunc(mu_x + tmp + 1.0)[:, None, None]
    br_y = np.trunc(mu_y + tmp + 1.0)[:, None, None]
    dx = xs - (ul_x + x0)
    dy = ys - (ul_y + x0)
    g = np.exp(-(dx * dx + dy * dy) / (2.0 * sigma ** 2))
    g *= ((xs >= ul_x) & (xs < np.minimum(br_x, w))
          & (ys >= ul_y) & (ys < np.minimum(br_y, h)))
    target = np.where((weight > 0.5)[:, None, None], g, 0.0).astype(np.float32)
    return target, weight[:, None]


def keypoint2d_to_3d(keypoint2d, intrinsic_matrix, Zc):
    uv1 = np.concatenate([np.copy(keypoint2d), np.ones((keypoint2d.shape[0], 1))],
                         axis=1).T * Zc
    return np.matmul(np.linalg.inv(intrinsic_matrix), uv1).T


def keypoint3d_to_2d(keypoint3d, intrinsic_matrix):
    kp = np.matmul(intrinsic_matrix, keypoint3d.T).T
    return kp[:, :2] / kp[:, 2:3]


# ---------------------------------------------------------------------------
# Boxes
# ---------------------------------------------------------------------------

def scale_box(box, image_width, image_height, scale, pad=False):
    """Square box of side scale*max(w,h), clamped to the image unless pad."""
    left, upper, right, lower = box
    center_x, center_y = (left + right) / 2, (upper + lower) / 2
    w, h = right - left, lower - upper
    side_with = min(round(scale * max(w, h)), min(image_width, image_height))
    left = round(center_x - side_with / 2)
    right = left + side_with - 1
    upper = round(center_y - side_with / 2)
    lower = upper + side_with - 1
    if not pad:
        if left < 0:
            left = 0
            right = side_with - 1
        if right >= image_width:
            right = image_width - 1
            left = image_width - side_with
        if upper < 0:
            upper = 0
            lower = side_with - 1
        if lower >= image_height:
            lower = image_height - 1
            upper = image_height - side_with
    return left, upper, right, lower


def get_bounding_box(keypoint2d):
    return (np.min(keypoint2d[:, 0]), np.min(keypoint2d[:, 1]),
            np.max(keypoint2d[:, 0]), np.max(keypoint2d[:, 1]))


def area(left, upper, right, lower):
    return max(right - left + 1, 0) * max(lower - upper + 1, 0)


def intersection(box_a, box_b):
    la, ua, ra, lo_a = box_a
    lb, ub, rb, lo_b = box_b
    return max(la, lb), max(ua, ub), min(ra, rb), min(lo_a, lo_b)


# ---------------------------------------------------------------------------
# Animal-family (Stacked-HG-style) helpers
# ---------------------------------------------------------------------------

def im_to_float(img):
    """HWC uint8/float -> HWC float32 in [0, 1] (im_to_torch twin minus layout)."""
    img = np.asarray(img, np.float32)
    if img.max() > 1:
        img = img / 255.0
    return img


def fliplr(x):
    """Horizontal flip of HWC (or NHWC) float image(s)."""
    return np.ascontiguousarray(x[..., :, ::-1, :]).astype(np.float32) \
        if x.ndim >= 3 else np.ascontiguousarray(np.fliplr(x))


FLIP_PAIRS = {
    "mpii": ([0, 5], [1, 4], [2, 3], [10, 15], [11, 14], [12, 13]),
    "real_animal": ([0, 1], [3, 4], [5, 6], [8, 9], [10, 11], [12, 13],
                    [14, 15], [16, 17]),
    "animal_pose": ([0, 1], [2, 3], [4, 5], [6, 7], [8, 9], [10, 11], [12, 13]),
}


def shufflelr_ori(x, width, dataset):
    """Flip keypoint x-coords and swap left/right pairs (util.py:186-224)."""
    x = np.array(x, np.float32, copy=True)
    matched = FLIP_PAIRS[dataset]
    x[:, 0] = width - x[:, 0]
    for a, b in matched:
        tmp = x[a].copy()
        x[a] = x[b]
        x[b] = tmp
    return x


def get_transform(center, scale, res, rot=0):
    """MPII center/scale(200px)/rot pixel-map matrix (util.py:289-316)."""
    h = 200 * scale
    t = np.zeros((3, 3))
    t[0, 0] = float(res[1]) / h
    t[1, 1] = float(res[0]) / h
    t[0, 2] = res[1] * (-float(center[0]) / h + 0.5)
    t[1, 2] = res[0] * (-float(center[1]) / h + 0.5)
    t[2, 2] = 1
    if rot != 0:
        rot = -rot
        rot_mat = np.zeros((3, 3))
        rot_rad = rot * np.pi / 180
        sn, cs = np.sin(rot_rad), np.cos(rot_rad)
        rot_mat[0, :2] = [cs, -sn]
        rot_mat[1, :2] = [sn, cs]
        rot_mat[2, 2] = 1
        t_mat = np.eye(3)
        t_mat[0, 2] = -res[1] / 2
        t_mat[1, 2] = -res[0] / 2
        t_inv = t_mat.copy()
        t_inv[:2, 2] *= -1
        t = np.dot(t_inv, np.dot(rot_mat, np.dot(t_mat, t)))
    return t


def transform(pt, center, scale, res, invert=0, rot=0):
    """Transform pixel location between original and crop frames (util.py:226-233)."""
    t = get_transform(center, scale, res, rot=rot)
    if invert:
        t = np.linalg.inv(t)
    new_pt = np.array([pt[0] - 1, pt[1] - 1, 1.0]).T
    new_pt = np.dot(t, new_pt)
    return new_pt[:2].astype(int) + 1


def _bytescale(data):
    """scipy.misc.bytescale with defaults: min-max stretch to [0, 255] uint8."""
    data = np.asarray(data)
    if data.dtype == np.uint8:
        return data
    cmin = float(data.min())
    cmax = float(data.max())
    cscale = cmax - cmin
    if cscale == 0:
        cscale = 1
    scale = 255.0 / cscale
    bytedata = (data - cmin) * scale
    return (bytedata.clip(0, 255) + 0.5).astype(np.uint8)


def imresize(arr, size, interp="bilinear"):
    """scipy.misc.imresize twin: bytescale + PIL resize, returns uint8 HWC.

    ``size`` is (H, W) like scipy. The min-max bytescale on float input is a
    deliberate parity quirk (see module docstring).
    """
    resample = {"nearest": Image.NEAREST, "bilinear": Image.BILINEAR,
                "bicubic": Image.BICUBIC}[interp]
    arr = np.asarray(arr)
    if arr.ndim == 3:
        img = Image.fromarray(_bytescale(arr), mode="RGB" if arr.shape[2] == 3 else None)
    else:
        img = Image.fromarray(_bytescale(arr), mode="L")
    img = img.resize((int(size[1]), int(size[0])), resample)
    return np.asarray(img)


def imrotate(arr, angle, interp="bilinear"):
    """scipy.misc.imrotate twin: bytescale + PIL rotate (no expand)."""
    resample = {"nearest": Image.NEAREST, "bilinear": Image.BILINEAR,
                "bicubic": Image.BICUBIC}[interp]
    img = Image.fromarray(_bytescale(np.asarray(arr)))
    return np.asarray(img.rotate(angle, resample))


def crop_ori(img, center, scale, res, rot=0):
    """Center/scale crop with the reference's legacy resampling (util.py:235-287).

    Args: img HWC float [0,1]; returns HWC float32 [0,1] of shape res.
    """
    img = np.asarray(img, np.float32)
    ht, wd = img.shape[0], img.shape[1]
    sf = scale * 200.0 / res[0]
    if sf < 2:
        sf = 1
    else:
        new_size = int(np.floor(max(ht, wd) / sf))
        new_ht = int(np.floor(ht / sf))
        new_wd = int(np.floor(wd / sf))
        if new_size < 2:
            return np.zeros((res[0], res[1], img.shape[2]) if img.ndim > 2
                            else (res[0], res[1]), np.float32)
        img = imresize(img, [new_ht, new_wd])
        center = np.asarray(center) * 1.0 / sf
        scale = scale / sf

    ul = np.array(transform([0, 0], center, scale, res, invert=1))
    br = np.array(transform(res, center, scale, res, invert=1))

    pad = int(np.linalg.norm(br - ul) / 2 - float(br[1] - ul[1]) / 2)
    if rot != 0:
        ul -= pad
        br += pad

    new_shape = [br[1] - ul[1], br[0] - ul[0]]
    if img.ndim > 2:
        new_shape += [img.shape[2]]
    new_img = np.zeros(new_shape, dtype=img.dtype)

    new_x = max(0, -ul[0]), min(br[0], img.shape[1]) - ul[0]
    new_y = max(0, -ul[1]), min(br[1], img.shape[0]) - ul[1]
    old_x = max(0, ul[0]), min(img.shape[1], br[0])
    old_y = max(0, ul[1]), min(img.shape[0], br[1])
    new_img[new_y[0]:new_y[1], new_x[0]:new_x[1]] = img[old_y[0]:old_y[1], old_x[0]:old_x[1]]

    if rot != 0:
        new_img = imrotate(new_img, rot)
        new_img = new_img[pad:-pad, pad:-pad]

    return im_to_float(imresize(new_img, res))


def color_normalize(x, mean, std=None):
    """Subtract per-channel mean (std unused upstream; util.py:318-324). HWC."""
    x = np.asarray(x, np.float32)
    if x.ndim == 2 or (x.ndim == 3 and x.shape[2] == 1):
        x = np.repeat(np.atleast_3d(x), 3, axis=2)
    return x - np.asarray(mean, np.float32)[None, None, :]


def draw_labelmap_ori(img, pt, sigma, label_type="Gaussian"):
    """Draw one Gaussian/Cauchy peak onto (H, W) map; returns (map, vis bit).

    Window-based border rule: visibility zeroed when the 3*sigma window
    crosses the map edge (util.py:337-340) — unlike generate_target's
    center-based rule.
    """
    img = np.asarray(img, np.float32).copy()
    pt = np.asarray(pt)
    pt = pt.astype(np.int32)
    ul = [int(pt[0] - 3 * sigma), int(pt[1] - 3 * sigma)]
    br = [int(pt[0] + 3 * sigma + 1), int(pt[1] + 3 * sigma + 1)]
    if (br[0] >= img.shape[1] or br[1] >= img.shape[0] or ul[0] < 0 or ul[1] < 0):
        return img, 0

    size = 6 * sigma + 1
    x = np.arange(0, size, 1, float)
    y = x[:, np.newaxis]
    x0 = y0 = size // 2
    if label_type == "Gaussian":
        g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma ** 2))
    else:  # Cauchy
        g = sigma / (((x - x0) ** 2 + (y - y0) ** 2 + sigma ** 2) ** 1.5)

    g_x = max(0, -ul[0]), min(br[0], img.shape[1]) - ul[0]
    g_y = max(0, -ul[1]), min(br[1], img.shape[0]) - ul[1]
    img_x = max(0, ul[0]), min(br[0], img.shape[1])
    img_y = max(0, ul[1]), min(br[1], img.shape[0])
    img[img_y[0]:img_y[1], img_x[0]:img_x[1]] = g[g_y[0]:g_y[1], g_x[0]:g_x[1]]
    return img, 1


def load_image_ori(img_path):
    """Load RGB image as HWC float32 [0,1] (util.py:365-368 minus layout)."""
    with Image.open(img_path) as im:
        return im_to_float(np.asarray(im.convert("RGB")))


class FrameCache:
    """Bounded decoded-frame cache for the animal datasets.

    Training revisits the same frames every epoch; on a single-core host the
    PIL decode dominates (PERF.md). Frames are stored as uint8 — the
    round-trip uint8 -> /255 is exact for PIL-decoded images, so cached and
    fresh loads are bit-identical. ``max_bytes <= 0`` disables caching (the
    reference relies on the OS page cache instead). Once full, further
    frames load uncached.
    """

    def __init__(self, max_bytes: float = 0.0):
        self.max_bytes = float(max_bytes or 0)
        self._cache = {}
        self._bytes = 0

    def load(self, path):
        if self.max_bytes <= 0:
            return load_image_ori(path)
        hit = self._cache.get(path)
        if hit is not None:
            return hit.astype(np.float32) / 255.0
        img = load_image_ori(path)
        if self._bytes < self.max_bytes:
            u8 = np.round(img * 255.0).astype(np.uint8)
            self._cache[path] = u8
            self._bytes += u8.nbytes
        return img

    def load_u8(self, path, decode_fn):
        """Cache arbitrary uint8 frames produced by ``decode_fn(path)``.
        Callers must treat the returned array as read-only."""
        if self.max_bytes <= 0:
            return decode_fn(path)
        hit = self._cache.get(path)
        if hit is not None:
            return hit
        u8 = decode_fn(path)
        if self._bytes < self.max_bytes:
            self._cache[path] = u8
            self._bytes += u8.nbytes
        return u8


def visualize_heatmap(image, heatmaps, filename):
    """Overlay per-keypoint heatmaps on an image (util.py:126-135)."""
    import cv2
    image = cv2.cvtColor(np.asarray(image), cv2.COLOR_RGB2BGR).copy()
    h, w = heatmaps.shape[1], heatmaps.shape[2]
    resized_image = cv2.resize(image, (int(w), int(h)))
    hm_u8 = np.clip(np.asarray(heatmaps) * 255, 0, 255).astype(np.uint8)
    for k in range(hm_u8.shape[0]):
        colored = cv2.applyColorMap(hm_u8[k], cv2.COLORMAP_JET)
        masked = colored * 0.3 + resized_image * 0.7
        cv2.imwrite(filename.format(k), masked)
