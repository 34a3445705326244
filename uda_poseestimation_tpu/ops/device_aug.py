"""On-device (jitted) keypoint-aware augmentation — the TPU-native fast path.

The reference runs its whole augmentation stack on the host with PIL
(RandomResizedCrop -> RandomAffineRotation -> ColorJitter -> Blur -> ToTensor
-> Normalize, lib/transforms/keypoint_detection.py). On this framework's
target hardware the host is the bottleneck (single-core: ~30 ms/image of PIL
work vs a ~160 ms fused step at b=32), so the trainers offer a
``--device-aug`` mode where the host only decodes + crops + resizes each
sample once, and all random views (student + k teacher) are generated
on-device inside one jitted program:

- RandomResizedCrop: same draw semantics (10 attempts of area-scale u, first
  u <= 1 wins, else full image — aspect fixed at 1) evaluated as a separable
  ``jax.image.scale_and_translate`` (bilinear, MXU-friendly), since on a
  pre-resized square canvas the crop is axis-aligned;
- RandomAffineRotation: same parameter draws; the image warp uses the exact
  nearest-resample gather from ops.affine; keypoints use the exact RSS math;
  ``aug_param`` is produced with the reference contract;
- ColorJitter: torchvision-equivalent factor draws; brightness/contrast/
  saturation implemented with the PIL enhance formulas (grayscale mean
  pivot), applied in a fixed b->c->s order (the reference shuffles the order
  per sample — documented deviation);
- Gaussian blur: separable conv when enabled (all canonical configs use
  blur=0);
- Normalize + Gaussian heatmap target generation (ops.heatmap, exact).

DEVIATION NOTE: this path trades PIL resampling bit-parity for throughput
(single bilinear resample instead of PIL's uint8-quantized chain). The
default host pipeline remains reference-exact; use --device-aug for
production training speed.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from .affine import affine_keypoints, inverse_affine_coeffs, warp_affine
from .heatmap import generate_target

_GRAY = jnp.array([0.299, 0.587, 0.114], jnp.float32)  # PIL "L" weights


@dataclasses.dataclass(frozen=True)
class DeviceAugConfig:
    image_size: int = 256
    heatmap_size: int = 64
    sigma: float = 2.0
    resize_scale: Tuple[float, float] = (0.6, 1.3)
    rotation: float = 180.0
    shear: Tuple[float, float] = (-30.0, 30.0)
    translate: Tuple[float, float] = (0.05, 0.05)
    scale: Tuple[float, float] = (0.6, 1.3)
    color: float = 0.25
    blur: float = 0.0
    use_rrc: bool = True  # source/base views use RandomResizedCrop


def _rrc_params(rng, cfg: DeviceAugConfig, canvas: int):
    """RandomResizedCrop draw: 10 attempts, first side<=canvas wins (:479-507)."""
    k_u, k_i, k_j = jax.random.split(rng, 3)
    us = jax.random.uniform(k_u, (10,), minval=cfg.resize_scale[0],
                            maxval=cfg.resize_scale[1])
    sides = jnp.round(jnp.sqrt(us * canvas * canvas))
    ok = (sides > 0) & (sides <= canvas)
    first = jnp.argmax(ok)  # first True; if none, handled below
    any_ok = ok.any()
    side = jnp.where(any_ok, sides[first], canvas).astype(jnp.float32)
    max_off = canvas - side
    u_i = jax.random.uniform(k_i)
    u_j = jax.random.uniform(k_j)
    # randint(0, max_off) inclusive
    i = jnp.floor(u_i * (max_off + 1))
    j = jnp.floor(u_j * (max_off + 1))
    return i, j, side


def _affine_params(rng, cfg: DeviceAugConfig, size: int):
    ks = jax.random.split(rng, 5)
    if isinstance(cfg.rotation, (tuple, list)):
        rot_lo, rot_hi = cfg.rotation
    else:
        rot_lo, rot_hi = -abs(cfg.rotation), abs(cfg.rotation)
    angle = jax.random.uniform(ks[0], minval=rot_lo, maxval=rot_hi)
    shear_x = jax.random.uniform(ks[1], minval=cfg.shear[0], maxval=cfg.shear[1])
    shear_y = jnp.float32(0.0)
    max_dx = cfg.translate[0] * size
    max_dy = cfg.translate[1] * size
    trans_x = jnp.round(jax.random.uniform(ks[2], minval=-max_dx, maxval=max_dx))
    trans_y = jnp.round(jax.random.uniform(ks[3], minval=-max_dy, maxval=max_dy))
    scale = jax.random.uniform(ks[4], minval=cfg.scale[0], maxval=cfg.scale[1])
    return angle, shear_x, shear_y, trans_x, trans_y, scale


def gaussian_blur(img, sigma, max_sigma: float):
    """Separable Gaussian blur with traced sigma and static support.

    Device twin of the reference's PIL GaussianBlur
    (lib/transforms/keypoint_detection.py:216-224): PIL's ``radius`` is the
    Gaussian standard deviation. Support is the static window
    ceil(3*max_sigma) taps each side (kernel size can't depend on the traced
    draw); edges are replicated like PIL. sigma -> 0 collapses to the
    identity (delta kernel). Deviation: PIL approximates the Gaussian with
    three box blurs; this is the exact truncated Gaussian.
    """
    r = max(1, int(math.ceil(3.0 * max_sigma)))
    xs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    w = jnp.exp(-0.5 * (xs / jnp.maximum(sigma, 1e-4)) ** 2)
    w = jnp.where(sigma > 1e-4, w, (xs == 0).astype(jnp.float32))
    w = w / w.sum()
    c = img.shape[-1]
    x = img[None]  # (1, H, W, C)
    k_row = jnp.tile(w.reshape(-1, 1, 1, 1), (1, 1, 1, c))
    k_col = jnp.tile(w.reshape(1, -1, 1, 1), (1, 1, 1, c))
    x = jnp.pad(x, ((0, 0), (r, r), (0, 0), (0, 0)), mode="edge")
    x = jax.lax.conv_general_dilated(
        x, k_row, (1, 1), "VALID", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = jnp.pad(x, ((0, 0), (0, 0), (r, r), (0, 0)), mode="edge")
    x = jax.lax.conv_general_dilated(
        x, k_col, (1, 1), "VALID", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return x[0]


def _maybe_blur(rng, img, cfg: DeviceAugConfig):
    """radius ~ U(0, cfg.blur), applied unconditionally (reference draws on
    every sample; blur=0 -> static no-op)."""
    if cfg.blur <= 0:
        return img
    sigma = jax.random.uniform(rng, minval=0.0, maxval=cfg.blur)
    return gaussian_blur(img, sigma, cfg.blur)


def _color_jitter(rng, img, color: float):
    """PIL-enhance-equivalent brightness/contrast/saturation (fixed order)."""
    if color <= 0:
        return img
    ks = jax.random.split(rng, 3)
    lo, hi = max(0.0, 1.0 - color), 1.0 + color
    fb = jax.random.uniform(ks[0], minval=lo, maxval=hi)
    fc = jax.random.uniform(ks[1], minval=lo, maxval=hi)
    fs = jax.random.uniform(ks[2], minval=lo, maxval=hi)
    img = jnp.clip(img * fb, 0.0, 1.0)  # Brightness: blend with black
    gray = jnp.tensordot(img, _GRAY, axes=[[-1], [0]])
    mean = jnp.mean(gray)  # Contrast: blend with mean-gray image
    img = jnp.clip((img - mean) * fc + mean, 0.0, 1.0)
    img = jnp.clip((img - gray[..., None]) * fs + gray[..., None], 0.0, 1.0)  # Color
    return img


def _rrc_image(img, i, j, side, out_size: int):
    """Axis-aligned crop+resize via separable bilinear scale_and_translate."""
    s = out_size / side
    # scale_and_translate: out(p) = in((p - t)/s); we want src = p/s + offset,
    # so t = -offset*s per axis
    tx = -j * s
    ty = -i * s
    return jax.image.scale_and_translate(
        img, (out_size, out_size, img.shape[-1]),
        spatial_dims=(0, 1),
        scale=jnp.array([s, s]), translation=jnp.array([ty, tx]),
        method="linear")


def augment_view(rng, image, keypoints, visible, cfg: DeviceAugConfig):
    """One augmented view of one sample.

    Args:
        image: (S, S, 3) float32 [0,1] canonical canvas (host decode+resize).
        keypoints: (K, 2) coords on the canvas.
        visible: (K,) or (K, 1).

    Returns dict(image (S,S,3) jittered+normalized-later, keypoint2d,
    target, target_weight, aug_param).
    """
    size = cfg.image_size
    k_rrc, k_aff, k_col = jax.random.split(rng, 3)
    kp = jnp.asarray(keypoints, jnp.float32)

    if cfg.use_rrc:
        i, j, side = _rrc_params(k_rrc, cfg, image.shape[0])
        image = _rrc_image(image, i, j, side, size)
        factor = size / side
        kp = (kp - jnp.stack([j, i])) * factor

    angle, shx, shy, tx, ty, scale = _affine_params(k_aff, cfg, size)
    coeffs = inverse_affine_coeffs(angle, tx, ty, shx, shy, scale)
    warped = warp_affine(jnp.transpose(image, (2, 0, 1))[None], coeffs[None],
                         mode="nearest")[0]
    image = jnp.transpose(warped, (1, 2, 0))
    kp = affine_keypoints(kp, angle, shx, shy, tx, ty, scale, (size, size))
    aug_param = jnp.stack([-angle, -tx, -ty, -shx, -shy, 1.0 / scale])

    image = _color_jitter(k_col, image, cfg.color)
    # blur key derived by fold_in so blur=0 configs keep the exact RNG
    # streams of the pre-blur implementation
    image = _maybe_blur(jax.random.fold_in(k_col, 1), image, cfg)

    target, weight = generate_target(kp, jnp.asarray(visible).reshape(-1),
                                     (cfg.heatmap_size, cfg.heatmap_size),
                                     cfg.sigma, (size, size))
    return {"image": image, "keypoint2d": kp, "target": target,
            "target_weight": weight, "aug_param": aug_param}


# ---------------------------------------------------------------------------
# Animal-family (Stacked-HG) device twins: MPII transform + window-rule labelmap
# ---------------------------------------------------------------------------

def mpii_transform_points(pts, center, scale, res: int):
    """Device twin of data.util.transform (rot=0): original-frame points to
    the res-sized crop frame, with the reference's exact -1/+1 offsets and
    truncation-to-int rounding."""
    h = 200.0 * scale
    t00 = res / h
    t02 = res * (-center[0] / h + 0.5)
    t12 = res * (-center[1] / h + 0.5)
    x = t00 * (pts[..., 0] - 1.0) + t02
    y = t00 * (pts[..., 1] - 1.0) + t12
    return jnp.stack([jnp.trunc(x), jnp.trunc(y)], -1).astype(jnp.int32) + 1


def draw_labelmap(pt, sigma: float, out_res: int, label_type: str = "Gaussian"):
    """Device twin of data.util.draw_labelmap_ori for one integer point.

    Returns (map (out_res, out_res), vis_bit). Window-based border rule: the
    whole paste window must fit inside the map.

    Exact for ANY sigma, reproducing the reference's fractional-sigma quirks
    (util.py:333-347): ``ul = int(pt - 3σ)`` / ``br = int(pt + 3σ + 1)``
    via python int() truncation-toward-zero, and a ``6σ+1``-sized patch
    whose peak sits at index ``size // 2`` — so the pasted center is
    ``ul + size//2``, which equals ``pt`` for integer sigma but shifts by
    the truncation asymmetry for fractional sigma (e.g. σ=1.5, pt=4:
    ul=trunc(-0.5)=0, center=5). --sigma is a float flag in train_animal
    (reference train_animal.py:558), so this path is user-reachable.
    """
    sig = float(sigma)
    tmp = 3.0 * sig
    # patch peak index: (6σ+1) // 2 with python float floor-div semantics
    x0 = float((6.0 * sig + 1.0) // 2)
    ptf = pt.astype(jnp.float32)
    ul_x = jnp.trunc(ptf[0] - tmp)  # python int(): trunc toward zero
    ul_y = jnp.trunc(ptf[1] - tmp)
    br_x = jnp.trunc(ptf[0] + tmp + 1.0)
    br_y = jnp.trunc(ptf[1] + tmp + 1.0)
    vis = jnp.logical_not((br_x >= out_res) | (br_y >= out_res)
                          | (ul_x < 0) | (ul_y < 0))
    ys = jax.lax.broadcasted_iota(jnp.int32, (out_res, out_res), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (out_res, out_res), 1)
    dx = xs.astype(jnp.float32) - (ul_x + x0)
    dy = ys.astype(jnp.float32) - (ul_y + x0)
    if label_type == "Gaussian":
        g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sig ** 2))
    else:  # Cauchy
        g = sig / ((dx * dx + dy * dy + sig ** 2) ** 1.5)
    window = ((xs >= ul_x) & (xs < br_x) & (ys >= ul_y) & (ys < br_y))
    g = jnp.where(window & vis, g, 0.0)
    return g.astype(jnp.float32), vis.astype(jnp.float32)


def animal_view(rng, image, kp_orig, vis, center, scale, cfg: DeviceAugConfig,
                label_type: str = "Gaussian"):
    """One animal mt view: affine on the crop canvas + original-frame keypoint
    math + MPII-transform targets (real_animal_all_mt.py:250-322 semantics)."""
    size = cfg.image_size
    out_res = cfg.heatmap_size
    k_aff = rng
    angle, shx, shy, tx, ty, sc = _affine_params(k_aff, cfg, size)
    coeffs = inverse_affine_coeffs(angle, tx, ty, shx, shy, sc)
    warped = warp_affine(jnp.transpose(image, (2, 0, 1))[None], coeffs[None],
                         mode="nearest")[0]
    image = jnp.transpose(warped, (1, 2, 0))
    # reference quirk: the affine keypoint math runs on ORIGINAL-frame coords
    # with the canvas center convention
    kp = affine_keypoints(jnp.asarray(kp_orig, jnp.float32), angle, shx, shy,
                          tx, ty, sc, (size, size))
    aug_param = jnp.stack([-angle, -tx, -ty, -shx, -shy, 1.0 / sc])

    gate = kp[:, 1] > 0  # reference renders only when tpts[i, 1] > 0
    tpts = mpii_transform_points(kp + 1.0, center, scale, out_res)

    def per_joint(pt, v, g):
        hm, win_vis = draw_labelmap(pt - 1, cfg.sigma, out_res, label_type)
        hm = jnp.where(g, hm, 0.0)
        weight = jnp.where(g, v * win_vis, v)
        return hm, weight

    target, weight = jax.vmap(per_joint)(tpts, jnp.asarray(vis, jnp.float32), gate)
    return {"image": image, "keypoint2d": kp, "target": target,
            "target_weight": weight[:, None], "aug_param": aug_param}


def animal_augment_batch(rng, images, kp_orig, vis, centers, scales,
                         cfg: DeviceAugConfig, n_views: int = 1, mean=None,
                         label_type: str = "Gaussian"):
    """Batched animal mt views: (n_views, B, ...) outputs; mean-only normalize."""
    b = images.shape[0]
    keys = jax.random.split(rng, n_views * b).reshape(n_views, b, -1)

    def per_view(view_keys):
        return jax.vmap(lambda k, im, kp, v, c, s: animal_view(
            k, im, kp, v, c, s, cfg, label_type))(view_keys, images, kp_orig,
                                                  vis, centers, scales)

    out = jax.vmap(per_view)(keys)
    if mean is not None:
        out["image"] = out["image"] - jnp.asarray(mean, jnp.float32)
    return out


# ---------------------------------------------------------------------------
# Synthetic-animal SOURCE device twin (imgaug seq + flip + crop_ori + targets)
# ---------------------------------------------------------------------------
#
# The reference source pipeline (synthetic_animal_sp_all.py:134-153 imgaug
# Sequential + :256-310 flip/crop/targets; our host twin: data/animal_aug.py
# + data/synthetic_animal.py:169-228) runs per sample on the host:
# imgaug [Affine, Noise, Blur, Contrast] each p=0.5 in random order on the
# 640x480 frame, p=0.5 hflip + shufflelr, MPII crop_ori to inp_res, mean
# normalize, per-keypoint transform + window-rule labelmaps.
#
# Device design: the three geometric stages (imgaug Affine -> hflip ->
# crop_ori) compose into ONE affine map, so the image is produced by a single
# nearest gather from the original frame straight to the inp_res crop — the
# gather cost scales with the OUTPUT size (256^2), not the 640x480 source.
# Keypoint/center math uses the host's exact formulas (skimage-style matrix,
# width-x flip, MPII transform trunc quirks). The elementwise ops
# (noise/blur/contrast) apply on the crop in their drawn order.
#
# DEVIATIONS (documented; geometry and targets stay exact): nearest
# resampling in one pass instead of imgaug-bilinear + scipy-imresize
# (bytescale quirk) chains; noise/blur/contrast act on the crop (blur sigma
# rescaled by the crop zoom, iid noise at crop rather than frame resolution,
# no uint8 re-quantization between ops); the affine always precedes the
# elementwise ops (their relative order among themselves keeps the drawn
# order).

def imgaug_affine_matrix(w, h, sx, sy, tx, ty, rot_rad, shear_rad):
    """jnp twin of data.animal_aug.AnimalAugmentation._affine_matrix for
    given draws: skimage-style scale/rotate/shear about the image center,
    plus the pixel translation. Returns (3, 3) float32."""
    cx, cy = w / 2.0 - 0.5, h / 2.0 - 0.5
    cos_r, sin_r = jnp.cos(rot_rad), jnp.sin(rot_rad)
    a00 = sx * cos_r
    a01 = -sy * jnp.sin(rot_rad + shear_rad)
    a10 = sx * sin_r
    a11 = sy * jnp.cos(rot_rad + shear_rad)
    # from_c @ A @ to_c, then += (tx, ty)
    m02 = -cx * a00 - cy * a01 + cx + tx
    m12 = -cx * a10 - cy * a11 + cy + ty
    return jnp.array([[a00, a01, m02], [a10, a11, m12], [0.0, 0.0, 1.0]],
                     jnp.float32)


def draw_animal_source_params(rng, cfg: "AnimalSourceAugConfig"):
    """Per-sample draws mirroring the host pipeline's parameter
    distributions (data/animal_aug.py; RNG stream differs by design)."""
    ks = jax.random.split(rng, 12)
    gates = jax.random.uniform(ks[0], (4,)) < cfg.p  # affine/noise/blur/contrast
    perm = jax.random.permutation(ks[1], 4)
    sx = jax.random.uniform(ks[2], minval=0.5, maxval=1.5)
    sy = jax.random.uniform(ks[3], minval=0.5, maxval=1.5)
    tx = jax.random.uniform(ks[4], minval=-0.05, maxval=0.05) * cfg.frame_w
    ty = jax.random.uniform(ks[5], minval=-0.05, maxval=0.05) * cfg.frame_h
    rot = jnp.deg2rad(jax.random.uniform(ks[6], minval=-30.0, maxval=30.0))
    shear = jnp.deg2rad(jax.random.uniform(ks[7], minval=-20.0, maxval=20.0))
    cval = jax.random.uniform(ks[8], minval=0.0, maxval=255.0)
    noise_pc = jax.random.uniform(ks[9]) < 0.5
    blur_sigma = jax.random.uniform(ks[10], minval=1.0, maxval=5.0)
    k_c1, k_c2, k_noise = jax.random.split(ks[11], 3)
    contrast_pc = jax.random.uniform(k_c1) < 0.5
    alphas = jax.random.uniform(k_c2, (3,), minval=0.5, maxval=2.0)
    alpha_shared = alphas[0]
    flip = jax.random.uniform(jax.random.fold_in(rng, 99)) < 0.5
    return {
        "gates": gates, "perm": perm,
        "sx": sx, "sy": sy, "tx": tx, "ty": ty, "rot": rot, "shear": shear,
        "cval": cval, "noise_pc": noise_pc, "noise_key": k_noise,
        "blur_sigma": blur_sigma, "contrast_pc": contrast_pc,
        "alphas": alphas, "alpha_shared": alpha_shared, "flip": flip,
    }


@dataclasses.dataclass(frozen=True)
class AnimalSourceAugConfig:
    inp_res: int = 256
    out_res: int = 64
    sigma: float = 1.0
    p: float = 0.5          # imgaug per-op probability
    frame_w: int = 640      # original frame (the reference hardcodes 640/480)
    frame_h: int = 480
    label_type: str = "Gaussian"
    max_blur_sigma: float = 5.0


def animal_source_apply(params, canvas, pts, center, scale, flip_perm,
                        cfg: AnimalSourceAugConfig, mean=None, std=None):
    """Apply one drawn source augmentation (params from
    draw_animal_source_params) to one sample.

    Args:
        canvas: (frame_h, frame_w, 3) float32 in [0, 255] (decoded frame).
        pts: (K, 3) original-frame keypoints+vis (vis forced 1 upstream).
        center, scale: MPII crop params from the bbox.
        flip_perm: (K,) int32 left/right swap table (FLIP_PAIRS as a
            permutation vector).

    Returns dict(image (inp,inp,3) normalized, target (K,out,out),
    target_weight (K,1), keypoint2d (K,2) crop-frame ints).
    """
    w, h = cfg.frame_w, cfg.frame_h
    inp = cfg.inp_res

    m = imgaug_affine_matrix(w, h, params["sx"], params["sy"], params["tx"],
                             params["ty"], params["rot"], params["shear"])
    affine_on = params["gates"][0]
    m = jnp.where(affine_on, m, jnp.eye(3, dtype=jnp.float32))

    # keypoints: affine (host formula), then zero out-of-frame rows
    # (synthetic_animal.py:198-199 — the reference hardcodes 640/480, which
    # IS its frame size; follow the configured frame so non-default frames
    # don't silently kill in-frame keypoints)
    pts = jnp.asarray(pts, jnp.float32)
    kp_h = jnp.concatenate([pts[:, :2], jnp.ones((pts.shape[0], 1))], axis=1)
    kp_aug = (m @ kp_h.T).T[:, :2]
    pts = pts.at[:, :2].set(kp_aug)
    oob = (pts[:, 0] < 0) | (pts[:, 1] < 0) | (pts[:, 0] > w) | (pts[:, 1] > h)
    pts = jnp.where(oob[:, None], 0.0, pts)

    # hflip: keypoints use the width-x convention + pair swap
    # (util.py shufflelr_ori), center mirrors (synthetic_animal.py:201-204)
    flip = params["flip"]
    kp_flip = pts.at[:, 0].set(w - pts[:, 0])[flip_perm]
    pts = jnp.where(flip, kp_flip, pts)
    center = jnp.asarray(center, jnp.float32)
    center = jnp.where(flip, center.at[0].set(w - center[0]), center)

    # ---- image: ONE composed gather out(inp^2) <- frame(640x480) ----------
    t_h = 200.0 * scale
    t00 = inp / t_h
    t02 = inp * (-center[0] / t_h + 0.5)
    t12 = inp * (-center[1] / t_h + 0.5)
    ys = jax.lax.broadcasted_iota(jnp.float32, (inp, inp), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (inp, inp), 1)
    # crop inverse (continuous twin of util.get_transform; the -1/+1 integer
    # quirks only affect the keypoint path, kept exact below)
    fx = (xs - t02) / t00
    fy = (ys - t12) / t00
    # image flip follows the array-reverse convention (w-1-x), matching
    # util.fliplr (the reference's kp/image flips differ by 1px; kept)
    fx = jnp.where(flip, (w - 1.0) - fx, fx)
    # frame bounds: outside -> 0 (crop_ori zero padding)
    inside1 = (fx >= 0) & (fx <= w - 1) & (fy >= 0) & (fy <= h - 1)
    # imgaug affine inverse: outside source frame -> cval
    m_inv = jnp.linalg.inv(m)
    qx = m_inv[0, 0] * fx + m_inv[0, 1] * fy + m_inv[0, 2]
    qy = m_inv[1, 0] * fx + m_inv[1, 1] * fy + m_inv[1, 2]
    ix = jnp.clip(jnp.round(qx), 0, w - 1).astype(jnp.int32)
    iy = jnp.clip(jnp.round(qy), 0, h - 1).astype(jnp.int32)
    inside0 = (qx >= -0.5) & (qx <= w - 0.5) & (qy >= -0.5) & (qy <= h - 0.5)
    flat = canvas.reshape(-1, canvas.shape[-1])
    img = jnp.take(flat, iy * w + ix, axis=0)  # (inp, inp, 3)
    img = jnp.where(inside0[..., None], img, params["cval"])
    img = jnp.where(inside1[..., None], img, 0.0)

    # ---- elementwise ops on the crop, in the drawn order -------------------
    # blur sigma rescaled from frame px to crop px by the crop zoom.
    # DEVIATION: the rescaled sigma is clamped to max_blur_sigma because the
    # blur kernel's support (3*max_blur_sigma taps) is static under jit;
    # zoom depends on the per-sample bbox, so a zoomed-in crop drawing a
    # near-max frame sigma is blurred slightly less than the reference
    # (bounded: only when blur fires AND sigma*zoom > max_blur_sigma).
    zoom = inp / t_h
    blur_sigma = jnp.clip(params["blur_sigma"] * zoom, 0.0, cfg.max_blur_sigma)

    def op_noise(x):
        n_full = jax.random.normal(params["noise_key"], x.shape) * (0.5 * 255.0)
        n_mono = jnp.broadcast_to(n_full[..., :1], x.shape)
        n = jnp.where(params["noise_pc"], n_full, n_mono)
        return jnp.clip(x + n, 0.0, 255.0)

    def op_blur(x):
        return gaussian_blur(x, blur_sigma, cfg.max_blur_sigma)

    def op_contrast(x):
        alpha = jnp.where(params["contrast_pc"], params["alphas"],
                          jnp.broadcast_to(params["alpha_shared"], (3,)))
        return jnp.clip((x - 128.0) * alpha + 128.0, 0.0, 255.0)

    def step(x, op_idx):
        gated = params["gates"][op_idx]
        y = jax.lax.switch(op_idx, [lambda v: v, op_noise, op_blur, op_contrast], x)
        return jnp.where(gated, y, x), None

    img, _ = jax.lax.scan(step, img, params["perm"])

    # crop_ori's legacy scipy-imresize BYTESCALE quirk: the crop region is
    # min-max stretched to [0, 255] and quantized to the uint8 grid before
    # the final /255 (data/util.py:189-218). Computed over the resized crop
    # (the host stretches the pre-resize region; extremes match closely).
    cmin = jnp.min(img)
    cscale = jnp.maximum(jnp.max(img) - cmin, 1e-12)
    img = jnp.floor(jnp.clip((img - cmin) * (255.0 / cscale), 0, 255) + 0.5)
    img = img / 255.0
    if mean is not None:
        img = img - jnp.asarray(mean, jnp.float32)
        if std is not None:
            img = img / jnp.asarray(std, jnp.float32)

    # ---- targets: exact MPII transform + window-rule labelmaps -------------
    gate = pts[:, 1] > 0  # transform/render only when original-frame y > 0
    tpts = mpii_transform_points(pts[:, :2] + 1.0, center, scale, cfg.out_res)
    kp2d = jnp.where(gate[:, None],
                     mpii_transform_points(pts[:, :2] + 1.0, center, scale,
                                           inp).astype(jnp.float32),
                     pts[:, :2])

    def per_joint(pt, v, g):
        hm, win_vis = draw_labelmap(pt - 1, cfg.sigma, cfg.out_res, cfg.label_type)
        hm = jnp.where(g, hm, 0.0)
        weight = jnp.where(g, v * win_vis, v)
        return hm, weight

    target, weight = jax.vmap(per_joint)(tpts, pts[:, 2], gate)
    return {"image": img, "target": target, "target_weight": weight[:, None],
            "keypoint2d": kp2d}


def animal_source_view(rng, canvas, pts, center, scale, flip_perm,
                       cfg: AnimalSourceAugConfig, mean=None, std=None,
                       is_aug: bool = True):
    params = draw_animal_source_params(rng, cfg)
    if not is_aug:
        off = {"gates": jnp.zeros(4, bool), "flip": jnp.bool_(False)}
        params = {**params, **off}
    return animal_source_apply(params, canvas, pts, center, scale, flip_perm,
                               cfg, mean=mean, std=std)


def animal_source_batch(rng, canvases, pts, centers, scales, flip_perm,
                        cfg: AnimalSourceAugConfig, mean=None, std=None,
                        is_aug: bool = True):
    """Batched source views: canvases (B, H, W, 3) float32 [0,255]."""
    keys = jax.random.split(rng, canvases.shape[0])
    return jax.vmap(lambda k, c, p, ce, s: animal_source_view(
        k, c, p, ce, s, flip_perm, cfg, mean=mean, std=std, is_aug=is_aug))(
        keys, canvases, pts, centers, scales)


def flip_perm_from_pairs(pairs, num_keypoints: int):
    """FLIP_PAIRS entry -> permutation vector for device-side shufflelr."""
    import numpy as np
    perm = np.arange(num_keypoints)
    for a, b in pairs:
        perm[a], perm[b] = perm[b], perm[a]
    return perm.astype(np.int32)


def rrc_view(rng, image, keypoints, cfg: DeviceAugConfig):
    """Shared RandomResizedCrop base view (the mt pipelines' transforms_base)."""
    size = cfg.image_size
    i, j, side = _rrc_params(rng, cfg, image.shape[0])
    image = _rrc_image(image, i, j, side, size)
    factor = size / side
    kp = (jnp.asarray(keypoints, jnp.float32) - jnp.stack([j, i])) * factor
    return image, kp


def rrc_batch(rng, images, keypoints, cfg: DeviceAugConfig):
    b = images.shape[0]
    keys = jax.random.split(rng, b)
    return jax.vmap(lambda k, im, kp: rrc_view(k, im, kp, cfg))(keys, images, keypoints)


def augment_batch(rng, images, keypoints, visible, cfg: DeviceAugConfig,
                  n_views: int = 1, mean=None, std=None):
    """Batched multi-view augmentation; one jitted program for all views.

    Returns pytree with leading (n_views, B, ...) axes (views stacked first,
    matching the trainers' (k, B, ...) teacher-view contract).
    """
    b = images.shape[0]
    keys = jax.random.split(rng, n_views * b).reshape(n_views, b, -1)

    def per_view(view_keys):
        return jax.vmap(lambda k, im, kp, vis: augment_view(k, im, kp, vis, cfg)
                        )(view_keys, images, keypoints, visible)

    out = jax.vmap(per_view)(keys)
    if mean is None and std is not None:
        raise ValueError("std given without mean; pass mean=[0,0,0] for "
                         "scale-only normalization")
    if mean is not None:
        m = jnp.asarray(mean, jnp.float32)
        s = jnp.asarray(std if std is not None else [1.0, 1.0, 1.0], jnp.float32)
        out["image"] = (out["image"] - m) / s
    return out
