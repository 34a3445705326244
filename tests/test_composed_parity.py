"""Composed-iteration golden parity vs the reference's ACTUAL train() math.

Every component of the adaptation step is golden-tested elsewhere; this file
tests the COMPOSITION: a torch-CPU oracle executes the reference's
adaptation iteration (train_human.py:326-440) line by line, using the
reference's own modules wherever they import cleanly on CPU —
lib/models/Style_net.py (Net, vgg, decoder), lib/models/loss.py
(JointsMSELoss, ConsLoss), utils.py (rectify, OldWeightEMA) — plus a
transcription of ``torchvision.transforms.functional.affine``'s tensor path
(torchvision is not installed; the stub follows the documented
``_get_inverse_affine_matrix`` + ``_gen_affine_grid`` + ``grid_sample``
(nearest, zeros, align_corners=False) semantics, see ops/affine.py:10-29).

Both sides run the same ported weights, the same batches, and the same
style/occlusion decisions; the fused step returns its intermediates via
``StepConfig(aux_outputs=True)``. A sign/ordering/precedence slip BETWEEN
parity-perfect components (warp-chain order, mask precedence, styled-input
routing, EMA timing, optimizer ordering) fails these assertions.
"""

import importlib.util
import math
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from test_weight_port import TorchPoseResNet, _randomize_bn_stats
from tools.port_torch_weights import (
    convert_decoder,
    convert_pose_resnet,
    convert_vgg_encoder,
)
from uda_poseestimation_tpu.models import StyleNet, pose_resnet50
from uda_poseestimation_tpu.ops import generate_target_batch
from uda_poseestimation_tpu.parallel import StepConfig, make_adapt_step
from uda_poseestimation_tpu.parallel.train_step import UDAState, make_tx

REF = "/root/reference"
pytestmark = [
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted"),
    pytest.mark.slow,  # full-model torch-oracle iterations (fast lane skips)
]

B = 2
K = 2
KPTS = 21
IMG = 64
HM = 16


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_mods():
    return {
        "style": _load("ref_style_net", os.path.join(REF, "lib/models/Style_net.py")),
        "loss": _load("ref_loss_c", os.path.join(REF, "lib/models/loss.py")),
        "utils": _load("ref_utils_c", os.path.join(REF, "utils.py")),
    }


# ---------------------------------------------------------------------------
# torchvision.transforms.functional.affine stub (tensor path)
# ---------------------------------------------------------------------------

def _inverse_affine_matrix(angle, translate, scale, shear):
    """torchvision _get_inverse_affine_matrix with center=(0,0) — the tensor
    path the trainers hit (the reference carries the same formulas for its
    keypoint math, lib/transforms/keypoint_detection.py:147-167)."""
    rot = math.radians(angle)
    sx, sy = (math.radians(s) for s in shear)
    cx, cy = 0.0, 0.0
    tx, ty = translate
    a = math.cos(rot - sy) / math.cos(sy)
    b = -math.cos(rot - sy) * math.tan(sx) / math.cos(sy) - math.sin(rot)
    c = math.sin(rot - sy) / math.cos(sy)
    d = -math.sin(rot - sy) * math.tan(sx) / math.cos(sy) + math.cos(rot)
    m = [d, -b, 0.0, -c, a, 0.0]
    m = [x / scale for x in m]
    m[2] += m[0] * (-cx - tx) + m[1] * (-cy - ty)
    m[5] += m[3] * (-cx - tx) + m[4] * (-cy - ty)
    m[2] += cx
    m[5] += cy
    return m


def tf_affine(img, angle, translate, shear, scale):
    """tF.affine for (C,H,W)/(B,C,H,W) tensors: inverse matrix ->
    _gen_affine_grid -> grid_sample(nearest, zeros, align_corners=False)."""
    single = img.dim() == 3
    x = img[None] if single else img
    b, c, h, w = x.shape
    m = _inverse_affine_matrix(angle, list(translate), scale, list(shear))
    theta = torch.tensor(m, dtype=torch.float32).reshape(1, 2, 3)
    d = 0.5
    base = torch.empty(1, h, w, 3)
    base[..., 0] = torch.linspace(-w * 0.5 + d, w * 0.5 - d, w)
    base[..., 1] = torch.linspace(-h * 0.5 + d, h * 0.5 - d, h).unsqueeze(-1)
    base[..., 2] = 1.0
    rescaled = theta.transpose(1, 2) / torch.tensor([0.5 * w, 0.5 * h])
    grid = base.view(1, h * w, 3).bmm(rescaled).view(1, h, w, 2).expand(b, h, w, 2)
    out = F.grid_sample(x, grid, mode="nearest", padding_mode="zeros",
                        align_corners=False)
    return out[0] if single else out


# ---------------------------------------------------------------------------
# The oracle: reference train_human.py:326-440, transcribed
# ---------------------------------------------------------------------------

def reference_adapt_iteration(student, teacher, style_net, criterion,
                              con_criterion, stu_optimizer, tea_optimizer,
                              batch, dec, args, rectify):
    """One reference adaptation iteration on CPU f32.

    ``dec`` carries the per-iteration random decisions (style gates/alphas,
    injected occlusion geometry) so both sides see identical draws. CUDA-only
    machinery is dropped faithfully: ``.cuda()`` moves, and the
    autocast+GradScaler pair (:414/:436-440) — CUDA-AMP loss scaling with no
    CPU effect; plain backward/step is the exact f32 equivalent.
    """
    ratio = args["image_size"] / args["heatmap_size"]
    recover_min = torch.tensor(args["recover_min"])
    recover_max = torch.tensor(args["recover_max"])

    stu_optimizer.zero_grad()                                      # :327
    x_s = batch["x_s"].clone()
    x_s_ori = x_s.clone()                                          # :333
    x_t_stu = batch["x_t_stu"].clone()
    x_t_teas = [t.clone() for t in batch["x_t_teas"]]
    x_t_teas_ori = [t.clone() for t in x_t_teas]                   # :336
    label_s, weight_s = batch["label_s"], batch["weight_s"]
    out = {}

    with torch.no_grad():
        if style_net is not None and dec["do_s2t"]:                # :348
            _a = dec["alpha_s2t"]
            x_s = style_net(x_s, x_t_teas_ori[0], _a)[2]           # :350
            x_s = torch.maximum(torch.minimum(                     # :351
                x_s.permute(0, 2, 3, 1), recover_max), recover_min
            ).permute(0, 3, 1, 2)
        if style_net is not None and dec["do_t2s"]:                # :353
            _a = dec["alpha_t2s"]
            x_t_teas = [style_net(t, x_s_ori, _a)[2] for t in x_t_teas]  # :355
            x_t_teas = [torch.maximum(torch.minimum(               # :356
                t.permute(0, 2, 3, 1), recover_max), recover_min
            ).permute(0, 3, 1, 2) for t in x_t_teas]

        y_t_teas = [teacher(t) for t in x_t_teas]                  # :358
        y_t_tea_recon = torch.zeros_like(y_t_teas[0])              # :359
        tea_mask = torch.zeros(y_t_teas[0].shape[:2])              # :360
        for ind in range(x_t_teas[0].size(0)):                     # :361
            recons = torch.zeros(args["k"], *y_t_teas[0].size()[1:])  # :362
            for _k in range(args["k"]):
                angle, (tx, ty), (shx, shy), scale = batch["aug_param_tea"][_k]  # :364
                _angle, _tx, _ty = float(angle[ind]), float(tx[ind]), float(ty[ind])
                _shx, _shy, _scale = float(shx[ind]), float(shy[ind]), float(scale[ind])
                temp = tf_affine(y_t_teas[_k][ind], 0.,            # :366
                                 translate=[_tx / ratio, _ty / ratio],
                                 shear=[0., 0.], scale=1.)
                temp = tf_affine(temp, _angle, translate=[0., 0.], # :367
                                 shear=[0., 0.], scale=_scale)
                temp = tf_affine(temp, 0., translate=[0, 0],       # :368
                                 shear=[_shx, _shy], scale=1.)
                recons[_k] = temp
            y_t_tea_recon[ind] = torch.mean(recons, dim=0)         # :371
            tea_mask[ind] = 1.                                     # :372

        angle, (tx, ty), (shx, shy), scale = batch["aug_param_stu"]  # :374
        if args["occlude_rate"] > -1:                              # :376
            occ = dec["occlusion"]  # injected geometry (both sides share it)
            for _b in range(x_t_stu.size(0)):                      # :385
                if occ["do"][_b]:
                    _angle, _tx, _ty = float(angle[_b]), float(tx[_b]), float(ty[_b])
                    _shx, _shy, _scale = float(shx[_b]), float(shy[_b]), float(scale[_b])
                    temp = tf_affine(x_t_stu[_b], 0.,              # :388
                                     translate=[_tx / ratio, _ty / ratio],
                                     shear=[0., 0.], scale=1.)
                    temp = tf_affine(temp, _angle, translate=[0., 0.],
                                     shear=[0., 0.], scale=_scale)
                    temp = tf_affine(temp, 0., translate=[0., 0.],
                                     shear=[_shx, _shy], scale=1.)
                    left, right = int(occ["left"][_b]), int(occ["right"][_b])
                    upper, bottom = int(occ["upper"][_b]), int(occ["bottom"][_b])
                    left_src = int(occ["left_src"][_b])
                    upper_src = int(occ["upper_src"][_b])
                    right_src = left_src + right - left            # :406
                    bottom_src = upper_src + bottom - upper        # :408
                    temp[:, left:right, upper:bottom] = \
                        temp[:, left_src:right_src, upper_src:bottom_src]  # :409
                    x_t_stu[_b] = tf_affine(temp, -_angle,         # :412
                                            translate=[-_tx / ratio, -_ty / ratio],
                                            shear=[-_shx, -_shy], scale=1. / _scale)

    y_s = student(x_s)                                             # :415
    y_t_stu = student(x_t_stu)                                     # :416
    y_t_stu_recon = torch.zeros_like(y_t_stu)                      # :418
    for ind in range(x_t_stu.size(0)):                             # :419
        _angle, _tx, _ty = float(angle[ind]), float(tx[ind]), float(ty[ind])
        _shx, _shy, _scale = float(shx[ind]), float(shy[ind]), float(scale[ind])
        temp = tf_affine(y_t_stu[ind], 0.,                         # :421
                         translate=[_tx / ratio, _ty / ratio],
                         shear=[0., 0.], scale=1.)
        temp = tf_affine(temp, _angle, translate=[0., 0.],
                         shear=[0., 0.], scale=_scale)
        y_t_stu_recon[ind] = tf_affine(temp, 0., translate=[0., 0.],  # :423
                                       shear=[_shx, _shy], scale=1.)

    loss_s = criterion(y_s, label_s, weight_s)                     # :425
    activates = y_t_tea_recon.amax(dim=(2, 3))                     # :427
    y_t_tea_rect = rectify(y_t_tea_recon, sigma=args["sigma"])     # :428
    mask_thresh = torch.kthvalue(
        activates.view(-1),
        int(args["mask_ratio"] * activates.numel()))[0].item()     # :429
    tea_mask = tea_mask * activates > mask_thresh                  # :430
    loss_c = con_criterion(y_t_stu_recon, y_t_tea_rect, tea_mask=tea_mask)  # :432
    loss_all = loss_s + args["lambda_c"] * loss_c                  # :434
    loss_all.backward()                                            # :436
    stu_optimizer.step()                                           # :437
    tea_optimizer.step()                                           # :438

    out.update(
        x_s_styled=x_s.detach(), x_t_teas_styled=[t.detach() for t in x_t_teas],
        x_t_stu_final=x_t_stu.detach(), y_t_tea_recon=y_t_tea_recon,
        activates=activates, mask_thresh=mask_thresh,
        y_t_tea_rect=y_t_tea_rect, tea_mask=tea_mask,
        y_s=y_s.detach(), y_t_stu_recon=y_t_stu_recon.detach(),
        loss_s=float(loss_s.detach()), loss_c=float(loss_c.detach()),
        loss_all=float(loss_all.detach()))
    return out


# ---------------------------------------------------------------------------
# Shared fixtures: models, ported weights, batches
# ---------------------------------------------------------------------------

ARGS = dict(image_size=IMG, heatmap_size=HM, sigma=2, k=K, lambda_c=1.0,
            mask_ratio=0.5, occlude_rate=-1.0,
            recover_min=(-2.1179, -2.0357, -1.8044),
            recover_max=(2.2489, 2.4285, 2.64))


@pytest.fixture(scope="module")
def weights(ref_mods):
    gen = torch.Generator().manual_seed(11)
    student = TorchPoseResNet(KPTS)
    teacher = TorchPoseResNet(KPTS)
    with torch.no_grad():
        for m in (student, teacher):
            for p in m.parameters():
                p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
            _randomize_bn_stats(m, gen)
    vgg31 = torch.nn.Sequential(*list(ref_mods["style"].vgg.children())[:31])
    decoder = ref_mods["style"].decoder
    with torch.no_grad():
        for m in list(vgg31.modules()) + list(decoder.modules()):
            if isinstance(m, torch.nn.Conv2d):
                m.weight.copy_(torch.randn(m.weight.shape, generator=gen) * 0.05)
                m.bias.copy_(torch.randn(m.bias.shape, generator=gen) * 0.02)
    return {"student_sd": student.state_dict(), "teacher_sd": teacher.state_dict(),
            "vgg_sd": vgg31.state_dict(), "decoder_sd": decoder.state_dict()}


@pytest.fixture(scope="module")
def batch_np():
    rng = np.random.RandomState(5)
    kp = rng.uniform(10, IMG - 10, size=(B, KPTS, 2)).astype(np.float32)
    target, weight = generate_target_batch(kp, np.ones((B, KPTS), np.float32),
                                           (HM, HM), ARGS["sigma"], (IMG, IMG))

    def aug():
        return np.stack([
            rng.uniform(-60, 60, B), np.round(rng.uniform(-8, 8, B)),
            np.round(rng.uniform(-8, 8, B)), rng.uniform(-20, 20, B),
            rng.uniform(-20, 20, B), rng.uniform(0.7, 1.3, B)], -1).astype(np.float32)

    return {
        "x_s": rng.uniform(-1.5, 1.5, (B, 3, IMG, IMG)).astype(np.float32),
        "x_t_stu": rng.uniform(-1.5, 1.5, (B, 3, IMG, IMG)).astype(np.float32),
        "x_t_teas": rng.uniform(-1.5, 1.5, (K, B, 3, IMG, IMG)).astype(np.float32),
        "target_s": np.asarray(target, np.float32),
        "weight_s": np.asarray(weight, np.float32),
        "aug_stu": aug(),
        "aug_teas": np.stack([aug() for _ in range(K)]),
    }


def _torch_side(weights, ref_mods, lr, use_sgd=False):
    student = TorchPoseResNet(KPTS)
    teacher = TorchPoseResNet(KPTS)
    student.load_state_dict(weights["student_sd"])
    if use_sgd:                                                    # :137-138
        stu_optimizer = torch.optim.SGD(student.parameters(), lr=lr,
                                        momentum=0.9, weight_decay=0.0001,
                                        nesterov=True)
    else:
        stu_optimizer = torch.optim.Adam(student.parameters(), lr=lr)  # :139
    tea_optimizer = ref_mods["utils"].OldWeightEMA(teacher, student, alpha=0.999)  # :141
    teacher.load_state_dict(weights["teacher_sd"])  # resume-style load AFTER EMA ctor (:155-157)
    student.train()
    teacher.train()                                                # :320-321
    vgg31 = torch.nn.Sequential(*list(ref_mods["style"].vgg.children())[:31])
    vgg31.load_state_dict(weights["vgg_sd"])
    decoder = ref_mods["style"].decoder
    decoder.load_state_dict(weights["decoder_sd"])
    style_net = ref_mods["style"].Net(vgg31, decoder)              # :129
    style_net.eval()
    criterion = ref_mods["loss"].JointsMSELoss()                   # :133
    con_criterion = ref_mods["loss"].ConsLoss()                    # :134
    return student, teacher, style_net, criterion, con_criterion, \
        stu_optimizer, tea_optimizer


def _jax_state(weights, cfg):
    stu = convert_pose_resnet(weights["student_sd"])
    tea = convert_pose_resnet(weights["teacher_sd"])
    tx = make_tx(cfg.use_sgd)
    return UDAState(step=jnp.zeros((), jnp.int32),
                    student_params=stu["params"], student_stats=stu["batch_stats"],
                    teacher_params=tea["params"], teacher_stats=tea["batch_stats"],
                    opt_state=tx.init(stu["params"]))


def _jax_batch(batch_np):
    nhwc = lambda x: np.transpose(x, (0, 2, 3, 1))
    return {"image_s": nhwc(batch_np["x_s"]),
            "target_s": batch_np["target_s"], "weight_s": batch_np["weight_s"],
            "image_t_stu": nhwc(batch_np["x_t_stu"]),
            "images_t_tea": np.stack([nhwc(x) for x in batch_np["x_t_teas"]]),
            "aug_param_stu": batch_np["aug_stu"],
            "aug_params_tea": batch_np["aug_teas"]}


def _torch_batch(batch_np):
    t = torch.tensor

    def aug_tuple(a):  # (B, 6) -> the meta tuple layout (:364/:374)
        return (t(a[:, 0]), (t(a[:, 1]), t(a[:, 2])),
                (t(a[:, 3]), t(a[:, 4])), t(a[:, 5]))

    return {"x_s": t(batch_np["x_s"]), "x_t_stu": t(batch_np["x_t_stu"]),
            "x_t_teas": [t(x) for x in batch_np["x_t_teas"]],
            "label_s": t(batch_np["target_s"]), "weight_s": t(batch_np["weight_s"]),
            "aug_param_stu": aug_tuple(batch_np["aug_stu"]),
            "aug_param_tea": [aug_tuple(a) for a in batch_np["aug_teas"]]}


def _delta_tree(after, before):
    return jax.tree_util.tree_map(
        lambda a, b: np.asarray(a, np.float64) - np.asarray(b, np.float64),
        after, before)


def _assert_deltas_close(ours, oracle, rel_l2):
    """Per-leaf relative L2 of the optimizer update.

    The composed scenarios run SGD (the reference's --SGD path,
    train_human.py:137-138): its update is LINEAR in the gradient, so this
    directly bounds the cross-framework gradient deviation. Thresholds are
    calibrated to measured f32 backward noise (torch-CPU vs XLA-CPU through
    ~50 BatchNorm'd layers): a SINGLE loss branch's gradients agree to
    median ~1e-2 / worst ~5e-2 per leaf, so the weight_s=0 scenarios (pure
    consistency branch — the composed path under test) assert at 0.1; the
    combined loss_s+loss_c runs suffer elementwise CANCELLATION between the
    two branches (relative error of a small sum of large opposing terms) and
    only support a gross-error bound of 0.5, which still fails on any real
    composition slip (missing term, wrong warp order, mask misapplied — all
    O(1) relative). Adam's first step is ~sign(g)*lr per element, pure noise
    amplification — torch-Adam ordering is pinned separately by
    test_optimizer_updates_match_torch."""
    flat_a = jax.tree_util.tree_flatten_with_path(ours)[0]
    flat_b = dict((jax.tree_util.keystr(p), v)
                  for p, v in jax.tree_util.tree_flatten_with_path(oracle)[0])
    assert flat_a and len(flat_a) == len(flat_b)
    for p, a in flat_a:
        b = flat_b[jax.tree_util.keystr(p)]
        err = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)
        assert err < rel_l2, f"{jax.tree_util.keystr(p)}: delta rel-L2 {err:.3e}"


# ---------------------------------------------------------------------------
# Scenario A: style transfer active (all four gate combinations), no occlusion
# ---------------------------------------------------------------------------

def test_composed_iteration_with_style(ref_mods, weights, batch_np):
    lr = 1e-3
    cfg = StepConfig(image_size=IMG, heatmap_size=HM, sigma=float(ARGS["sigma"]),
                     k=K, occlude_rate=-1.0, aux_outputs=True, use_sgd=True,
                     recover_min=ARGS["recover_min"], recover_max=ARGS["recover_max"])
    model = pose_resnet50(num_keypoints=KPTS)
    style = StyleNet()
    style_params = {"encoder": convert_vgg_encoder(weights["vgg_sd"]),
                    "decoder": convert_decoder(weights["decoder_sd"])}
    step = make_adapt_step(model, cfg, style_model=style)
    jbatch = _jax_batch(batch_np)
    tbatch = _torch_batch(batch_np)

    for do_s2t, do_t2s in [(True, True), (True, False), (False, True),
                           (False, False)]:
        dec = {"do_s2t": do_s2t, "alpha_s2t": 0.7,
               "do_t2s": do_t2s, "alpha_t2s": 0.4}

        state = _jax_state(weights, cfg)
        params_before = jax.tree_util.tree_map(np.asarray, state.student_params)
        tea_before = jax.tree_util.tree_map(np.asarray, state.teacher_params)
        new_state, metrics, y_s = step(
            state, style_params, jbatch, jnp.float32(lr), jax.random.PRNGKey(0),
            jnp.bool_(do_s2t), jnp.float32(dec["alpha_s2t"]),
            jnp.bool_(do_t2s), jnp.float32(dec["alpha_t2s"]))
        metrics = jax.device_get(metrics)
        aux = metrics["aux"]

        (student, teacher, style_net, criterion, con_criterion,
         stu_opt, tea_opt) = _torch_side(weights, ref_mods, lr, use_sgd=True)
        args = dict(ARGS)
        ref = reference_adapt_iteration(
            student, teacher, style_net, criterion, con_criterion,
            stu_opt, tea_opt, tbatch, dec, args, ref_mods["utils"].rectify)

        nchw = lambda x: np.transpose(np.asarray(x, np.float32), (0, 3, 1, 2))
        tag = f"(s2t={do_s2t}, t2s={do_t2s})"
        np.testing.assert_allclose(
            nchw(aux["x_s_styled"]), ref["x_s_styled"].numpy(),
            atol=2e-3, rtol=2e-3, err_msg=f"x_s_styled {tag}")
        for i in range(K):
            np.testing.assert_allclose(
                nchw(aux["x_t_teas_styled"][i]), ref["x_t_teas_styled"][i].numpy(),
                atol=2e-3, rtol=2e-3, err_msg=f"x_t_tea_styled[{i}] {tag}")
        np.testing.assert_allclose(
            np.asarray(aux["y_t_tea_recon"]), ref["y_t_tea_recon"].numpy(),
            atol=3e-3, err_msg=f"y_t_tea_recon {tag}")
        np.testing.assert_allclose(
            np.asarray(aux["activates"]), ref["activates"].numpy(),
            atol=3e-3, err_msg=f"activates {tag}")
        assert abs(float(aux["mask_thresh"]) - ref["mask_thresh"]) < 3e-3
        np.testing.assert_array_equal(
            np.asarray(aux["tea_mask"]), ref["tea_mask"].numpy(),
            err_msg=f"tea_mask {tag}")
        # rectified maps are pure unit-peak gaussians at the argmaxes —
        # near-exact once the argmaxes agree
        np.testing.assert_allclose(
            np.asarray(aux["y_t_tea_rect"]), ref["y_t_tea_rect"].numpy(),
            atol=1e-5, err_msg=f"y_t_tea_rect {tag}")
        np.testing.assert_allclose(
            np.asarray(y_s), ref["y_s"].numpy(), atol=3e-3,
            err_msg=f"y_s {tag}")
        np.testing.assert_allclose(
            np.asarray(aux["y_t_stu_recon"]), ref["y_t_stu_recon"].numpy(),
            atol=3e-3, err_msg=f"y_t_stu_recon {tag}")
        assert float(metrics["loss_s"]) == pytest.approx(ref["loss_s"], rel=1e-3, abs=1e-5)
        assert float(metrics["loss_c"]) == pytest.approx(ref["loss_c"], rel=1e-3, abs=1e-5)
        assert float(metrics["loss_all"]) == pytest.approx(ref["loss_all"], rel=1e-3, abs=1e-5)

        # post-step parameter deltas: gross-error bound on the combined loss
        # (see _assert_deltas_close on why combined is noise-limited)
        ours_delta = _delta_tree(
            jax.tree_util.tree_map(np.asarray, new_state.student_params),
            params_before)
        torch_after = convert_pose_resnet(student.state_dict())["params"]
        torch_delta = _delta_tree(torch_after, params_before)
        _assert_deltas_close(ours_delta, torch_delta, rel_l2=0.5)

        # teacher EMA: applied AFTER the student update (:437-438), from the
        # UPDATED student
        tea_ours = jax.tree_util.tree_map(np.asarray, new_state.teacher_params)
        tea_ref = convert_pose_resnet(teacher.state_dict())["params"]
        for pa, pb in zip(jax.tree_util.tree_leaves(tea_ours),
                          jax.tree_util.tree_leaves(tea_ref)):
            np.testing.assert_allclose(pa, pb, atol=1e-5)
        # and it moved: teacher != its pre-step self
        moved = any(np.abs(a - b).max() > 0
                    for a, b in zip(jax.tree_util.tree_leaves(tea_ours),
                                    jax.tree_util.tree_leaves(tea_before)))
        assert moved

    # --- sharp delta check: consistency branch alone (weight_s = 0) -------
    # zeroing weight_s kills loss_s, so the update is purely the COMPOSED
    # path under test (style -> teacher -> inverse-warp -> rectify -> mask ->
    # ConsLoss -> student -> warp) with no cross-branch cancellation; the
    # same jitted step is reused (weights are data, not trace constants)
    zero_np = dict(batch_np, weight_s=np.zeros_like(batch_np["weight_s"]))
    state = _jax_state(weights, cfg)
    params_before = jax.tree_util.tree_map(np.asarray, state.student_params)
    new_state, metrics, _ = step(
        state, style_params, _jax_batch(zero_np), jnp.float32(lr),
        jax.random.PRNGKey(0), jnp.bool_(True), jnp.float32(0.7),
        jnp.bool_(True), jnp.float32(0.4))
    metrics = jax.device_get(metrics)

    (student, teacher, style_net, criterion, con_criterion,
     stu_opt, tea_opt) = _torch_side(weights, ref_mods, lr, use_sgd=True)
    ref = reference_adapt_iteration(
        student, teacher, style_net, criterion, con_criterion, stu_opt,
        tea_opt, _torch_batch(zero_np),
        {"do_s2t": True, "alpha_s2t": 0.7, "do_t2s": True, "alpha_t2s": 0.4},
        dict(ARGS), ref_mods["utils"].rectify)
    assert float(metrics["loss_s"]) == pytest.approx(0.0, abs=1e-9)
    assert float(metrics["loss_c"]) == pytest.approx(ref["loss_c"], rel=1e-3)
    ours_delta = _delta_tree(
        jax.tree_util.tree_map(np.asarray, new_state.student_params),
        params_before)
    torch_delta = _delta_tree(convert_pose_resnet(student.state_dict())["params"],
                              params_before)
    _assert_deltas_close(ours_delta, torch_delta, rel_l2=0.1)


# ---------------------------------------------------------------------------
# Scenario B: adaptive occlusion active with shared injected geometry
# ---------------------------------------------------------------------------

def test_composed_iteration_with_occlusion(ref_mods, weights, batch_np,
                                           monkeypatch):
    from uda_poseestimation_tpu.parallel import train_step as ts

    lr = 1e-3
    occ = {"do": np.array([True, True]),
           "left": np.array([10, 3]), "right": np.array([30, 23]),
           "upper": np.array([5, 40]), "bottom": np.array([25, 60]),
           "left_src": np.array([20, 0]), "upper_src": np.array([33, 12])}

    def fake_geometry(rng, y_t_tea_recon, cfg):
        i32 = lambda k: jnp.asarray(occ[k], jnp.int32)
        return (jnp.asarray(occ["do"]), i32("left"), i32("right"),
                i32("upper"), i32("bottom"), i32("left_src"), i32("upper_src"))

    monkeypatch.setattr(ts, "_occlusion_geometry", fake_geometry)

    cfg = StepConfig(image_size=IMG, heatmap_size=HM, sigma=float(ARGS["sigma"]),
                     k=K, occlude_rate=0.9, aux_outputs=True, gather_impl="xla",
                     use_sgd=True,
                     recover_min=ARGS["recover_min"], recover_max=ARGS["recover_max"])
    model = pose_resnet50(num_keypoints=KPTS)
    step = make_adapt_step(model, cfg, style_model=None)
    state = _jax_state(weights, cfg)
    params_before = jax.tree_util.tree_map(np.asarray, state.student_params)
    new_state, metrics, y_s = step(
        state, None, _jax_batch(batch_np), jnp.float32(lr), jax.random.PRNGKey(0),
        jnp.bool_(False), jnp.float32(0.0), jnp.bool_(False), jnp.float32(0.0))
    metrics = jax.device_get(metrics)
    aux = metrics["aux"]

    (student, teacher, _style_net, criterion, con_criterion,
     stu_opt, tea_opt) = _torch_side(weights, ref_mods, lr, use_sgd=True)
    args = dict(ARGS, occlude_rate=0.9)
    dec = {"do_s2t": False, "alpha_s2t": 0.0, "do_t2s": False, "alpha_t2s": 0.0,
           "occlusion": occ}
    ref = reference_adapt_iteration(
        student, teacher, None, criterion, con_criterion, stu_opt, tea_opt,
        _torch_batch(batch_np), dec, args, ref_mods["utils"].rectify)

    # the occluded student view composes forward-chain -> paste -> single
    # backward affine over the SAME input pixels — near-exact
    np.testing.assert_allclose(
        np.transpose(np.asarray(aux["x_t_stu_final"], np.float32), (0, 3, 1, 2)),
        ref["x_t_stu_final"].numpy(), atol=1e-5, err_msg="occluded x_t_stu")
    np.testing.assert_allclose(np.asarray(aux["y_t_tea_recon"]),
                               ref["y_t_tea_recon"].numpy(), atol=3e-3)
    np.testing.assert_array_equal(np.asarray(aux["tea_mask"]),
                                  ref["tea_mask"].numpy())
    np.testing.assert_allclose(np.asarray(aux["y_t_stu_recon"]),
                               ref["y_t_stu_recon"].numpy(), atol=3e-3)
    assert float(metrics["loss_s"]) == pytest.approx(ref["loss_s"], rel=1e-3, abs=1e-5)
    assert float(metrics["loss_c"]) == pytest.approx(ref["loss_c"], rel=1e-3, abs=1e-5)

    ours_delta = _delta_tree(
        jax.tree_util.tree_map(np.asarray, new_state.student_params),
        params_before)
    torch_delta = _delta_tree(convert_pose_resnet(student.state_dict())["params"],
                              params_before)
    _assert_deltas_close(ours_delta, torch_delta, rel_l2=0.5)

    # sharp consistency-only deltas (weight_s = 0; same jitted step): the
    # occluded-input -> student -> warp -> ConsLoss gradient path
    zero_np = dict(batch_np, weight_s=np.zeros_like(batch_np["weight_s"]))
    state = _jax_state(weights, cfg)
    params_before = jax.tree_util.tree_map(np.asarray, state.student_params)
    new_state, metrics, _ = step(
        state, None, _jax_batch(zero_np), jnp.float32(lr), jax.random.PRNGKey(0),
        jnp.bool_(False), jnp.float32(0.0), jnp.bool_(False), jnp.float32(0.0))
    metrics = jax.device_get(metrics)
    (student, teacher, _sn, criterion, con_criterion,
     stu_opt, tea_opt) = _torch_side(weights, ref_mods, lr, use_sgd=True)
    ref = reference_adapt_iteration(
        student, teacher, None, criterion, con_criterion, stu_opt, tea_opt,
        _torch_batch(zero_np), dec, args, ref_mods["utils"].rectify)
    assert float(metrics["loss_c"]) == pytest.approx(ref["loss_c"], rel=1e-3)
    ours_delta = _delta_tree(
        jax.tree_util.tree_map(np.asarray, new_state.student_params),
        params_before)
    torch_delta = _delta_tree(convert_pose_resnet(student.state_dict())["params"],
                              params_before)
    _assert_deltas_close(ours_delta, torch_delta, rel_l2=0.1)


# ---------------------------------------------------------------------------
# Optimizer ordering parity (exact, on synthetic tensors)
# ---------------------------------------------------------------------------

def test_optimizer_updates_match_torch():
    """make_tx + _apply_updates vs torch Adam / SGD(momentum, wd, nesterov)
    (train_human.py:136-139) over several steps on identical synthetic
    gradients — pins the exact update ordering (bias correction, eps
    placement, nesterov lookahead, decoupled-vs-coupled weight decay) free of
    the gradient-noise amplification that makes end-to-end Adam deltas
    uncomparable."""
    from uda_poseestimation_tpu.parallel.train_step import _apply_updates

    rng = np.random.RandomState(3)
    shapes = [(4, 5), (7,), (2, 3, 3)]
    params0 = [rng.randn(*s).astype(np.float32) for s in shapes]
    grads_per_step = [[rng.randn(*s).astype(np.float32) * 10.0 ** rng.randint(-4, 1)
                       for s in shapes] for _ in range(4)]
    lr = 1e-2

    for use_sgd in (False, True):
        tparams = [torch.tensor(p.copy(), requires_grad=True) for p in params0]
        if use_sgd:
            topt = torch.optim.SGD(tparams, lr=lr, momentum=0.9,
                                   weight_decay=0.0001, nesterov=True)
        else:
            topt = torch.optim.Adam(tparams, lr=lr)

        tx = make_tx(use_sgd)
        jparams = [jnp.asarray(p) for p in params0]
        opt_state = tx.init(jparams)

        for grads in grads_per_step:
            topt.zero_grad()
            for p, g in zip(tparams, grads):
                p.grad = torch.tensor(g)
            topt.step()
            direction, opt_state = tx.update([jnp.asarray(g) for g in grads],
                                             opt_state, jparams)
            jparams = _apply_updates(jparams, direction, lr)

        for jp, tp in zip(jparams, tparams):
            np.testing.assert_allclose(np.asarray(jp), tp.detach().numpy(),
                                       atol=1e-6, rtol=1e-5,
                                       err_msg=f"use_sgd={use_sgd}")
