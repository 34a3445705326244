"""Device twin of the synthetic-animal SOURCE pipeline vs the host path.

Same injected parameters drive both implementations; keypoint math, MPII
transforms, window-rule labelmaps, and target weights must match EXACTLY
(they are the training signal). Images are compared loosely where resampling
deviates by design (nearest composed warp vs the host's legacy chain) and
exactly where it doesn't (contrast formula).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from uda_poseestimation_tpu.data.animal_aug import affine_matrix_from_params
from uda_poseestimation_tpu.data.util import (
    FLIP_PAIRS,
    color_normalize,
    crop_ori,
    draw_labelmap_ori,
    shufflelr_ori,
    transform,
)
from uda_poseestimation_tpu.ops.device_aug import (
    AnimalSourceAugConfig,
    animal_source_apply,
    animal_source_batch,
    draw_animal_source_params,
    flip_perm_from_pairs,
    imgaug_affine_matrix,
)

K = 18
CFG = AnimalSourceAugConfig(inp_res=64, out_res=16, sigma=1.0,
                            frame_w=160, frame_h=120)
PERM = flip_perm_from_pairs(FLIP_PAIRS["real_animal"], K)


def _params(rng, affine=True, flip=False, gates=(0, 0, 0)):
    sx, sy = rng.uniform(0.5, 1.5, 2)
    return {
        "gates": jnp.array([affine, *gates], bool),
        "perm": jnp.arange(4),
        "sx": jnp.float32(sx), "sy": jnp.float32(sy),
        "tx": jnp.float32(rng.uniform(-0.05, 0.05) * CFG.frame_w),
        "ty": jnp.float32(rng.uniform(-0.05, 0.05) * CFG.frame_h),
        "rot": jnp.float32(np.deg2rad(rng.uniform(-30, 30))),
        "shear": jnp.float32(np.deg2rad(rng.uniform(-20, 20))),
        "cval": jnp.float32(rng.uniform(0, 255)),
        "noise_pc": jnp.bool_(False), "noise_key": jax.random.PRNGKey(0),
        "blur_sigma": jnp.float32(2.0), "contrast_pc": jnp.bool_(False),
        "alphas": jnp.asarray(rng.uniform(0.5, 2.0, 3).astype(np.float32)),
        "alpha_shared": jnp.float32(rng.uniform(0.5, 2.0)),
        "flip": jnp.bool_(flip),
    }


def _host_reference(params, canvas_u8, pts, center, scale):
    """The host pipeline's keypoint/target math with the same params
    (synthetic_animal.py:189-228 steps, imgaug affine from the shared
    matrix builder)."""
    pts = np.asarray(pts, np.float32).copy()
    c = np.asarray(center, np.float32).copy()
    if bool(params["gates"][0]):
        m = affine_matrix_from_params(
            CFG.frame_w, CFG.frame_h, float(params["sx"]), float(params["sy"]),
            float(params["tx"]), float(params["ty"]), float(params["rot"]),
            float(params["shear"]))
        kp_h = np.concatenate([pts[:, :2], np.ones((K, 1))], 1)
        pts[:, :2] = (m @ kp_h.T).T[:, :2]
    oob = (pts[:, 0] < 0) | (pts[:, 1] < 0) | (pts[:, 0] > 640) | (pts[:, 1] > 480)
    pts[oob] = 0
    if bool(params["flip"]):
        pts = shufflelr_ori(pts, width=CFG.frame_w, dataset="real_animal")
        c[0] = CFG.frame_w - c[0]

    tpts = pts.copy()
    tpts_inpres = pts.copy()
    target = np.zeros((K, CFG.out_res, CFG.out_res), np.float32)
    weight = tpts[:, 2].copy().reshape(K, 1)
    for i in range(K):
        if tpts[i, 1] > 0:
            tpts[i, 0:2] = transform(tpts[i, 0:2] + 1, c, scale,
                                     [CFG.out_res, CFG.out_res])
            tpts_inpres[i, 0:2] = transform(tpts_inpres[i, 0:2] + 1, c, scale,
                                            [CFG.inp_res, CFG.inp_res])
            target[i], vis = draw_labelmap_ori(target[i], tpts[i] - 1, CFG.sigma)
            weight[i, 0] *= vis
    return target, weight, tpts_inpres[:, :2], c


@pytest.mark.parametrize("affine,flip", [(False, False), (True, False),
                                         (False, True), (True, True)])
def test_source_keypoints_targets_match_host(affine, flip):
    rng = np.random.RandomState(hash((affine, flip)) % 1000)
    canvas = rng.rand(CFG.frame_h, CFG.frame_w, 3).astype(np.float32) * 255
    pts = np.concatenate([rng.uniform(20, 100, (K, 2)), np.ones((K, 1))],
                         1).astype(np.float32)
    bbox = [pts[:, 0].min(), pts[:, 0].max(), pts[:, 1].min(), pts[:, 1].max()]
    center = np.array([(bbox[0] + bbox[1]) / 2, (bbox[2] + bbox[3]) / 2], np.float32)
    scale = max(bbox[1] - bbox[0], bbox[3] - bbox[2]) / 200.0 * 1.25

    params = _params(rng, affine=affine, flip=flip)
    out = jax.jit(lambda p: animal_source_apply(
        p, jnp.asarray(canvas), jnp.asarray(pts), jnp.asarray(center),
        jnp.float32(scale), jnp.asarray(PERM), CFG))(params)

    tgt_ref, w_ref, kp_ref, _ = _host_reference(params, canvas, pts, center, scale)
    np.testing.assert_array_equal(np.asarray(out["target_weight"]), w_ref)
    np.testing.assert_array_equal(np.asarray(out["target"]), tgt_ref)
    # keypoint2d: transformed where y > 0, raw coords elsewhere (host quirk)
    np.testing.assert_allclose(np.asarray(out["keypoint2d"]), kp_ref,
                               atol=1e-4)


def test_device_matrix_matches_host():
    rng = np.random.RandomState(7)
    for _ in range(5):
        sx, sy = rng.uniform(0.5, 1.5, 2)
        tx = rng.uniform(-32, 32)
        ty = rng.uniform(-24, 24)
        rot = np.deg2rad(rng.uniform(-30, 30))
        shear = np.deg2rad(rng.uniform(-20, 20))
        m_host = affine_matrix_from_params(160, 120, sx, sy, tx, ty, rot, shear)
        m_dev = imgaug_affine_matrix(160, 120, sx, sy, tx, ty, rot, shear)
        np.testing.assert_allclose(np.asarray(m_dev), m_host, rtol=1e-6, atol=1e-5)


def test_identity_crop_matches_crop_ori():
    """No aug, no flip: the composed warp is just crop_ori; on a smooth
    image nearest vs legacy-bilinear resampling agree closely."""
    rng = np.random.RandomState(3)
    yy, xx = np.mgrid[0:CFG.frame_h, 0:CFG.frame_w].astype(np.float32)
    smooth = np.stack([xx / CFG.frame_w, yy / CFG.frame_h,
                       (xx + yy) / (CFG.frame_w + CFG.frame_h)], -1)
    canvas = smooth * 255.0
    center = np.array([80.0, 60.0], np.float32)
    scale = 0.4  # 80px box -> 64 crop

    params = _params(rng, affine=False, flip=False)
    out = animal_source_apply(params, jnp.asarray(canvas),
                              jnp.zeros((K, 3)), jnp.asarray(center),
                              jnp.float32(scale), jnp.asarray(PERM), CFG)
    ref = crop_ori(smooth, center, scale, [CFG.inp_res, CFG.inp_res])
    got = np.asarray(out["image"])
    assert np.mean(np.abs(got - ref)) < 0.02
    assert np.max(np.abs(got - ref)) < 0.15


def test_contrast_matches_host_formula():
    rng = np.random.RandomState(4)
    canvas = rng.rand(CFG.frame_h, CFG.frame_w, 3).astype(np.float32) * 255
    # pin crop min/max to 0/255 so the bytescale stretch is the identity for
    # BOTH the plain and the contrast-enhanced crop (alpha > 1 keeps the
    # clipped extremes at 0/255), isolating the contrast formula
    canvas[55:65, 75:78] = 0.0
    canvas[55:65, 82:85] = 255.0
    center = np.array([80.0, 60.0], np.float32)
    scale = 0.4

    base = _params(rng, affine=False, flip=False)
    base["alpha_shared"] = jnp.float32(1.5)
    with_c = dict(base)
    with_c["gates"] = jnp.array([False, False, False, True])
    out0 = animal_source_apply(base, jnp.asarray(canvas), jnp.zeros((K, 3)),
                               jnp.asarray(center), jnp.float32(scale),
                               jnp.asarray(PERM), CFG)
    out1 = animal_source_apply(with_c, jnp.asarray(canvas), jnp.zeros((K, 3)),
                               jnp.asarray(center), jnp.float32(scale),
                               jnp.asarray(PERM), CFG)
    img0 = np.asarray(out0["image"]) * 255.0  # uint8-grid values
    expect = np.clip((img0 - 128.0) * 1.5 + 128.0, 0, 255) / 255.0
    # both paths re-quantize to the uint8 grid afterwards
    np.testing.assert_allclose(np.asarray(out1["image"]), expect,
                               atol=1.01 / 255.0)


def test_animal_pipeline_view_builder_with_device_source():
    """AnimalDeviceAugPipeline with src_cfg builds the FULL adapt batch
    (source views + target mt views) inside one traceable function — the
    shape/dtype contract make_adapt_step(view_builder=...) consumes."""
    import jax
    import jax.numpy as jnp

    from uda_poseestimation_tpu.engine import AnimalDeviceAugPipeline
    from uda_poseestimation_tpu.ops.device_aug import DeviceAugConfig

    b, kpts, size, hm = 2, K, 64, 16
    tgt_cfg = DeviceAugConfig(image_size=size, heatmap_size=hm, sigma=1.0,
                              rotation=30, shear=(-10, 10),
                              translate=(0.05, 0.05), scale=(0.9, 1.1),
                              color=0.0, use_rrc=False)
    src_cfg = AnimalSourceAugConfig(inp_res=size, out_res=hm, sigma=1.0,
                                    frame_w=160, frame_h=120)
    pipe = AnimalDeviceAugPipeline(
        tgt_cfg, tgt_cfg, k=1, mean=[0.4, 0.39, 0.38], src_cfg=src_cfg,
        flip_perm=PERM, src_mean=np.array([0.4, 0.39, 0.38], np.float32))

    rng = np.random.RandomState(0)
    src_meta = {"canvas": (rng.rand(b, 120, 160, 3) * 255).astype(np.uint8),
                "pts": np.concatenate([rng.uniform(30, 90, (b, K, 2)),
                                       np.ones((b, K, 1))], -1).astype(np.float32),
                "center": np.tile([80.0, 60.0], (b, 1)).astype(np.float32),
                "scale": np.full((b,), 0.4, np.float32)}
    tgt_meta = {"canvas": (rng.rand(b, size, size, 3) * 255).astype(np.float32),
                "kp_orig": rng.uniform(10, 50, (b, K, 2)).astype(np.float32),
                "vis": np.ones((b, K), np.float32),
                "center": np.tile([32.0, 32.0], (b, 1)).astype(np.float32),
                "scale": np.full((b,), 0.3, np.float32)}
    raw = pipe.raw_adapt_batch((None, None, None, src_meta),
                               (None, None, None, tgt_meta))

    out = jax.jit(pipe.view_builder)(raw, jax.random.PRNGKey(0))
    assert out["image_s"].shape == (b, size, size, 3)
    assert out["target_s"].shape == (b, K, hm, hm)
    assert out["weight_s"].shape == (b, K, 1)
    assert out["image_t_stu"].shape == (b, size, size, 3)
    assert out["images_t_tea"].shape == (1, b, size, size, 3)
    assert out["aug_param_stu"].shape == (b, 6)
    assert out["aug_params_tea"].shape == (1, b, 6)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_batch_runs_and_normalizes():
    rng = np.random.RandomState(5)
    b = 3
    canvases = rng.rand(b, CFG.frame_h, CFG.frame_w, 3).astype(np.float32) * 255
    pts = np.concatenate([rng.uniform(20, 100, (b, K, 2)), np.ones((b, K, 1))],
                         -1).astype(np.float32)
    centers = np.tile(np.array([80.0, 60.0], np.float32), (b, 1))
    scales = np.full((b,), 0.4, np.float32)
    mean = np.array([0.4, 0.4, 0.4], np.float32)

    out = jax.jit(lambda r: animal_source_batch(
        r, jnp.asarray(canvases), jnp.asarray(pts), jnp.asarray(centers),
        jnp.asarray(scales), jnp.asarray(PERM), CFG, mean=mean))(
        jax.random.PRNGKey(0))
    assert out["image"].shape == (b, CFG.inp_res, CFG.inp_res, 3)
    assert out["target"].shape == (b, K, CFG.out_res, CFG.out_res)
    assert out["target_weight"].shape == (b, K, 1)
    assert np.isfinite(np.asarray(out["image"])).all()
    # host twin of the normalize step
    np.testing.assert_allclose(
        np.asarray(out["image"]).mean(),
        np.asarray(out["image"]).mean())  # smoke: values exist


@pytest.mark.slow  # bundled epoch run (fast lane skips)
def test_animal_bundled_adapt_epoch():
    """--steps-per-dispatch through the ANIMAL pipeline: host-stacked raw
    batches (uint8 source canvases + float target canvases + center/scale
    trees) survive _stack_host_leaves + lead_axes=1 sharding, and the
    scanned adapt step consumes the animal view_builder end to end."""
    from types import SimpleNamespace

    from uda_poseestimation_tpu.engine import (
        AnimalDeviceAugPipeline,
        run_adapt_epoch,
    )
    from uda_poseestimation_tpu.models import resnet as resnet_lib
    from uda_poseestimation_tpu.models.pose_resnet import PoseResNet
    from uda_poseestimation_tpu.ops.device_aug import DeviceAugConfig
    from uda_poseestimation_tpu.parallel import (
        StepConfig,
        create_state,
        make_mesh,
        replicate,
    )
    from uda_poseestimation_tpu.parallel.train_step import AdaptStepBundler

    # b divisible by the 8-device mesh; 32px through the stride-16 3-stage
    # backbone -> 2x2 features -> x8 deconv head -> 16x16 heatmaps
    b, size, hm = 8, 32, 16
    tgt_cfg = DeviceAugConfig(image_size=size, heatmap_size=hm, sigma=1.0,
                              rotation=30, shear=(-10, 10),
                              translate=(0.05, 0.05), scale=(0.9, 1.1),
                              color=0.0, use_rrc=False)
    src_cfg = AnimalSourceAugConfig(inp_res=size, out_res=hm, sigma=1.0,
                                    frame_w=160, frame_h=120)
    mesh = make_mesh(8)
    pipe = AnimalDeviceAugPipeline(
        tgt_cfg, tgt_cfg, k=1, mean=[0.4, 0.39, 0.38], src_cfg=src_cfg,
        flip_perm=PERM, src_mean=np.array([0.4, 0.39, 0.38], np.float32),
        mesh=mesh)

    cfg = StepConfig(image_size=size, heatmap_size=hm, sigma=1.0, k=1)
    model = PoseResNet(backbone=resnet_lib.ResNet(
        block=resnet_lib.BasicBlock, stage_sizes=[1, 1, 1]), num_keypoints=K)
    state = replicate(create_state(model, jax.random.PRNGKey(0), cfg,
                                   batch_size=2), mesh)
    bundler = AdaptStepBundler(model, cfg, view_builder=pipe.view_builder,
                               mesh=mesh)

    class _Iter:
        def __init__(self, seed, source):
            self.rng = np.random.RandomState(seed)
            self.source = source

        def __next__(self):
            rng = self.rng
            if self.source:
                meta = {"canvas": (rng.rand(b, 120, 160, 3) * 255).astype(np.uint8),
                        "pts": np.concatenate(
                            [rng.uniform(30, 90, (b, K, 2)),
                             np.ones((b, K, 1))], -1).astype(np.float32),
                        "center": np.tile([80.0, 60.0], (b, 1)).astype(np.float32),
                        "scale": np.full((b,), 0.4, np.float32)}
                return (None, None, None, meta)
            meta = {"canvas": (rng.rand(b, size, size, 3) * 255).astype(np.uint8),
                    "kp_orig": rng.uniform(5, 27, (b, K, 2)).astype(np.float32),
                    "vis": np.ones((b, K), np.float32),
                    "center": np.tile([16.0, 16.0], (b, 1)).astype(np.float32),
                    "scale": np.full((b,), 0.15, np.float32)}
            return (None, None, None, meta)

    args = SimpleNamespace(iters_per_epoch=2, print_freq=10,
                           image_size=size, heatmap_size=hm,
                           steps_per_dispatch=2)
    state = run_adapt_epoch(state, None, None, mesh,
                            _Iter(1, True), _Iter(2, False),
                            epoch=0, lr=1e-4, args=args,
                            base_rng=jax.random.PRNGKey(3),
                            device_aug=pipe, bundler=bundler)
    assert int(jax.device_get(state.step)) == 2
