"""Golden parity vs the ACTUAL reference implementation.

The reference at /root/reference is pure Python; the modules that don't
import torchvision/scipy.misc/imgaug at import time can be loaded directly
and used as oracles: lib/keypoint_detection.py (numpy), lib/datasets/util.py
(generate_target / transform / draw_labelmap / shufflelr), lib/models/loss.py
and utils.py (torch CPU), lib/meter.py. These tests execute the reference's
code against ours on random inputs — the strongest parity evidence available
without datasets or GPUs.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest
import torch
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")


def _load(name, path, package_stubs=()):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_kpd():
    return _load("ref_kpd", os.path.join(REF, "lib/keypoint_detection.py"))


@pytest.fixture(scope="module")
def ref_util():
    return _load("ref_dutil", os.path.join(REF, "lib/datasets/util.py"))


@pytest.fixture(scope="module")
def ref_loss():
    return _load("ref_loss", os.path.join(REF, "lib/models/loss.py"))


@pytest.fixture(scope="module")
def ref_trainer_utils():
    return _load("ref_tutils", os.path.join(REF, "utils.py"))


def test_pck_accuracy_matches_reference(ref_kpd):
    from uda_poseestimation_tpu.ops import accuracy, keypoint_pck_accuracy
    rng = np.random.RandomState(0)
    out = rng.rand(8, 21, 64, 64).astype(np.float32)
    tgt = rng.rand(8, 21, 64, 64).astype(np.float32)
    tgt[:, 3] = 0.0  # some channels without GT peaks
    r_acc, r_avg, r_cnt, r_pred = ref_kpd.accuracy(out, tgt)
    o_acc, o_avg, o_cnt, o_pred = accuracy(out, tgt)
    np.testing.assert_allclose(o_acc, r_acc, atol=1e-12)
    assert abs(o_avg - r_avg) < 1e-12 and o_cnt == r_cnt
    np.testing.assert_array_equal(o_pred, r_pred)
    j_acc, j_avg, j_cnt, _ = keypoint_pck_accuracy(jnp.asarray(out), jnp.asarray(tgt))
    np.testing.assert_allclose(np.asarray(j_acc), r_acc, atol=1e-6)
    assert abs(float(j_avg) - r_avg) < 1e-6


def test_generate_target_matches_reference(ref_util):
    from uda_poseestimation_tpu.data.util import generate_target
    rng = np.random.RandomState(1)
    # sigma=1.5 pins the fractional-sigma paste-window quirks against the
    # reference's own code (trunc'd ul/br, size//2 patch peak)
    for sigma, hm, im in [(2, (64, 64), (256, 256)), (1, (16, 16), (64, 64)),
                          (2, (8, 8), (256, 256)), (1.5, (64, 64), (256, 256))]:
        kp = rng.uniform(-80, 340, (21, 2)).astype(np.float32)
        vis = (rng.rand(21, 1) > 0.3).astype(np.float32)
        r_t, r_w = ref_util.generate_target(kp, vis, hm, sigma, im)
        o_t, o_w = generate_target(kp, vis, hm, sigma, im)
        np.testing.assert_allclose(o_t, r_t, atol=1e-6)
        np.testing.assert_array_equal(o_w, r_w)


def test_mpii_transform_matches_reference(ref_util):
    from uda_poseestimation_tpu.data.util import get_transform, transform
    rng = np.random.RandomState(2)
    for _ in range(10):
        c = rng.uniform(50, 300, 2)
        s = rng.uniform(0.5, 2.5)
        rot = rng.choice([0, -15.0, 20.0])
        res = [64, 64]
        np.testing.assert_allclose(get_transform(c, s, res, rot=rot),
                                   ref_util.get_transform(c, s, res, rot=rot),
                                   atol=1e-10)
        pt = rng.uniform(0, 400, 2)
        for invert in (0, 1):
            np.testing.assert_array_equal(
                transform(pt, c, s, res, invert=invert, rot=rot),
                ref_util.transform(pt, c, s, res, invert=invert, rot=rot))


def test_draw_labelmap_matches_reference(ref_util):
    from uda_poseestimation_tpu.data.util import draw_labelmap_ori
    rng = np.random.RandomState(3)
    # sigma=1.5 exercises the fractional-sigma trunc quirks (shifted paste
    # center near the low border, 10-wide window)
    for sigma in (2, 1.5):
        for label_type in ("Gaussian", "Cauchy"):
            for _ in range(20):
                pt = rng.uniform(-10, 74, 2).astype(np.float32)
                ref_img, ref_vis = ref_util.draw_labelmap_ori(
                    torch.zeros(64, 64), torch.tensor(pt), sigma, type=label_type)
                our_img, our_vis = draw_labelmap_ori(np.zeros((64, 64), np.float32),
                                                     pt, sigma, label_type=label_type)
                assert our_vis == ref_vis
                np.testing.assert_allclose(our_img, ref_img.numpy(), atol=1e-6)


def test_shufflelr_matches_reference(ref_util):
    from uda_poseestimation_tpu.data.util import shufflelr_ori
    rng = np.random.RandomState(4)
    for dataset, k in (("real_animal", 18), ("animal_pose", 14)):
        x = rng.uniform(0, 300, (k, 3)).astype(np.float32)
        ref_out = ref_util.shufflelr_ori(torch.tensor(x), width=320, dataset=dataset)
        our_out = shufflelr_ori(x, width=320, dataset=dataset)
        np.testing.assert_allclose(our_out, ref_out.numpy(), atol=1e-6)


def test_losses_match_reference(ref_loss):
    from uda_poseestimation_tpu.models import loss as L
    rng = np.random.RandomState(5)
    out = rng.randn(4, 16, 8, 8).astype(np.float32)
    tgt = rng.randn(4, 16, 8, 8).astype(np.float32)
    w = (rng.rand(4, 16, 1) > 0.3).astype(np.float32)
    mask = (rng.rand(4, 16) > 0.5).astype(np.float32)

    r = ref_loss.JointsMSELoss()(torch.tensor(out), torch.tensor(tgt),
                                 torch.tensor(w)).item()
    o = float(L.joints_mse_loss(jnp.asarray(out), jnp.asarray(tgt), jnp.asarray(w)))
    assert abs(r - o) < 1e-6

    r = ref_loss.ConsLoss()(torch.tensor(out), torch.tensor(tgt),
                            tea_mask=torch.tensor(mask)).item()
    o = float(L.cons_loss(jnp.asarray(out), jnp.asarray(tgt), tea_mask=jnp.asarray(mask)))
    assert abs(r - o) < 1e-6

    r = ref_loss.JointsKLLoss()(torch.tensor(out), torch.tensor(np.abs(tgt))).item()
    o = float(L.joints_kl_loss(jnp.asarray(out), jnp.asarray(np.abs(tgt))))
    assert abs(r - o) < 1e-5

    r = ref_loss.EntLoss()(torch.tensor(out)).item()
    o = float(L.ent_loss(jnp.asarray(out)))
    assert abs(r - o) < 1e-6

    import jax
    r = ref_loss.ConsSoftmaxLoss()(torch.tensor(out), torch.tensor(tgt),
                                   tea_mask=torch.tensor(mask)).item()
    o = float(L.cons_softmax_loss(jnp.asarray(out), jnp.asarray(tgt),
                                  tea_mask=jnp.asarray(mask)))
    assert abs(r - o) < 1e-7


def test_rectify_matches_reference(ref_trainer_utils):
    from uda_poseestimation_tpu.ops import rectify
    rng = np.random.RandomState(6)
    for sigma in (2, 1.5):  # fractional sigma: trunc'd paste window quirks
        hm = rng.rand(3, 7, 64, 64).astype(np.float32)
        ref_out = ref_trainer_utils.rectify(torch.tensor(hm), sigma=sigma).numpy()
        our_out = np.asarray(rectify(jnp.asarray(hm), sigma))
        np.testing.assert_allclose(our_out, ref_out, atol=5e-6)


def test_rectify_matches_reference_borders(ref_trainer_utils):
    """Peaks forced near every border so all four paste-clip paths fire.

    Note the reference's swapped clip quirk (x range clipped at h, y at w;
    utils.py:101-105) makes its own rectify RAISE on non-square maps
    (g-range/img-range shape mismatch in the paste), so square maps — where
    the quirk is benign — are the entire usable parity surface.
    """
    from uda_poseestimation_tpu.ops import rectify
    rng = np.random.RandomState(7)
    hm = rng.rand(2, 5, 64, 64).astype(np.float32)
    hm[0, 0, 5, 62] = 2.0
    hm[0, 1, 2, 30] = 2.0
    hm[1, 2, 61, 33] = 2.0
    hm[1, 3, 40, 1] = 2.0
    hm[1, 4, 0, 0] = 2.0
    ref_out = ref_trainer_utils.rectify(torch.tensor(hm), sigma=2).numpy()
    our_out = np.asarray(rectify(jnp.asarray(hm), 2))
    np.testing.assert_allclose(our_out, ref_out, atol=5e-6)


def test_ema_matches_reference(ref_trainer_utils):
    import torch.nn as tnn
    from uda_poseestimation_tpu.models import ema_update
    torch.manual_seed(0)
    stu = tnn.Linear(4, 4)
    tea = tnn.Linear(4, 4)
    opt = ref_trainer_utils.OldWeightEMA(tea, stu, alpha=0.9)
    # after init teacher == student
    np.testing.assert_allclose(tea.weight.detach().numpy(),
                               stu.weight.detach().numpy())
    with torch.no_grad():
        stu.weight += 1.0
    opt.step()
    ours = ema_update({"w": jnp.asarray(stu.weight.detach().numpy() - 1.0)},
                      {"w": jnp.asarray(stu.weight.detach().numpy())}, 0.9)
    np.testing.assert_allclose(np.asarray(ours["w"]),
                               tea.weight.detach().numpy(), atol=1e-6)


def test_schedules_match_reference(ref_trainer_utils):
    from uda_poseestimation_tpu.utils import cosine_rampdown, sigmoid_rampup
    for cur in (0, 3.5, 10, 20):
        assert abs(sigmoid_rampup(cur, 10) - ref_trainer_utils.sigmoid_rampup(cur, 10)) < 1e-12
        assert abs(cosine_rampdown(cur, 10) - ref_trainer_utils.cosine_rampdown(cur, 10)) < 1e-12


@pytest.fixture(scope="module")
def ref_transforms():
    """Load lib/transforms/keypoint_detection.py with torchvision stubbed out
    (only the keypoint math and PIL-side helpers are exercised)."""
    import types
    from PIL import Image

    tv = types.ModuleType("torchvision")
    tf = types.ModuleType("torchvision.transforms")
    func = types.ModuleType("torchvision.transforms.functional")
    trans = types.ModuleType("torchvision.transforms.transforms")

    class _Stub:
        def __init__(self, *a, **k):
            pass

        def __call__(self, image):
            return image

    func.affine = lambda image, angle, translate, shear, scale: image
    func.resize = lambda image, size, *a, **k: (
        image.resize((size, size)) if isinstance(size, int) else image)
    func.crop = lambda image, top, left, h, w: image.crop(
        (left, top, left + w, top + h))
    func.hflip = lambda image: image.transpose(Image.FLIP_LEFT_RIGHT)
    func.rotate = lambda image, angle: image.rotate(angle)
    trans.ToTensor = _Stub
    trans.Normalize = _Stub
    trans.ColorJitter = _Stub
    trans.RandomTransforms = _Stub
    tv.transforms = tf
    tf.functional = func
    tf.transforms = trans
    for name, mod in (("torchvision", tv), ("torchvision.transforms", tf),
                      ("torchvision.transforms.functional", func),
                      ("torchvision.transforms.transforms", trans)):
        sys.modules[name] = mod
    try:
        yield _load("ref_T", os.path.join(REF, "lib/transforms/keypoint_detection.py"))
    finally:
        for name in ("torchvision", "torchvision.transforms",
                     "torchvision.transforms.functional",
                     "torchvision.transforms.transforms"):
            sys.modules.pop(name, None)


def test_affine_keypoint_math_matches_reference(ref_transforms):
    from PIL import Image
    from uda_poseestimation_tpu.data.transforms import affine as our_affine

    rng = np.random.RandomState(7)
    img = Image.fromarray(np.zeros((256, 256, 3), np.uint8))
    for _ in range(10):
        kp = rng.uniform(-50, 300, (21, 2)).astype(np.float64)
        angle = float(rng.uniform(-170, 170))
        shx, shy = rng.uniform(-30, 30, 2)
        tx, ty = int(rng.uniform(-12, 12)), int(rng.uniform(-12, 12))
        scale = float(rng.uniform(0.6, 1.3))
        _, ref_kp, ref_aug = ref_transforms.affine(img, angle, shx, shy, tx, ty,
                                                   scale, kp)
        _, our_kp, our_aug = our_affine(img, angle, shx, shy, tx, ty, scale, kp)
        np.testing.assert_allclose(our_kp, ref_kp, atol=1e-9)
        ref_flat = [ref_aug[0], *ref_aug[1], *ref_aug[2], ref_aug[3]]
        np.testing.assert_allclose(our_aug, ref_flat, atol=1e-9)


def test_rotate_and_resizepad_match_reference(ref_transforms):
    from PIL import Image
    from uda_poseestimation_tpu.data.transforms import (
        resize_pad as our_resize_pad, rotate as our_rotate)

    rng = np.random.RandomState(8)
    img = Image.fromarray((rng.rand(256, 256, 3) * 255).astype(np.uint8))
    kp = rng.uniform(0, 250, (16, 2))
    _, ref_kp = ref_transforms.rotate(img, 33.0, kp)
    _, our_kp = our_rotate(img, 33.0, kp)
    np.testing.assert_allclose(our_kp, ref_kp, atol=1e-9)

    tall = Image.fromarray((rng.rand(200, 120, 3) * 255).astype(np.uint8))
    kp2 = rng.uniform(0, 100, (16, 2))
    ref_img, ref_kp2 = ref_transforms.resize_pad(tall, kp2.copy(), 256)
    our_img, our_kp2 = our_resize_pad(tall, kp2.copy(), 256)
    np.testing.assert_allclose(our_kp2, ref_kp2, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(our_img), np.asarray(ref_img))
