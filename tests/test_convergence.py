"""End-to-end learning evidence: the pipeline optimizes, not just computes.

The round-1 suite was parity/one-step tests only; nothing demonstrated that
the loss descends and PCK rises over a training run (the reference's only
correctness check is its validate loop, train_human.py:461-500). This test
overfits a LEARNABLE synthetic task — images where each keypoint is a
distinct-colored Gaussian blob at its location — through the real fused
steps:

1. ``pretrain``: supervised steps on a fixed source batch until train-batch
   PCK exceeds 0.9 (catches sign/LR/loss-masking bugs);
2. ``adapt``: mean-teacher adaptation against a brightness/contrast-shifted
   target domain, with real rotated student views, teacher views, occlusion,
   rectify + kth-value masking, and EMA — target PCK of BOTH the student and
   the EMA teacher must improve over the source-only model (catches
   consistency-sign/warp-mismatch/EMA bugs no single-step parity test can).

Small everything (PoseResNet on a 3-stage BasicBlock ResNet, 64x64, b=4) so
the whole run fits the CPU mesh in minutes; step budgets and thresholds
carry ~2x margin over calibrated runs.
"""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # multi-minute convergence runs (fast lane skips)

from uda_poseestimation_tpu.models.pose_resnet import PoseResNet
from uda_poseestimation_tpu.models import resnet as resnet_lib
from uda_poseestimation_tpu.ops import generate_target_batch
from uda_poseestimation_tpu.ops.affine import forward_warp_images
from uda_poseestimation_tpu.parallel import (
    StepConfig,
    create_state,
    make_adapt_step,
    make_eval_step,
    make_pretrain_step,
)

# 64px images through a 3-stage (stride-16) BasicBlock backbone -> 4x4
# features -> 32x32 heatmaps: same relative PCK precision as the real config
# (256px/stride-32/64x64), small enough for the CPU mesh. A stride-32
# backbone at 64px would bottleneck to 2x2 features and cap localization.
SIZE, HM, B, K = 64, 32, 4, 4
SIGMA = 2.0
# distinct color signature per keypoint so the task is learnable, not
# arbitrary: the model must locate each blob by its color
COLORS = np.array([[1.0, 0.0, 0.0],
                   [0.0, 1.0, 0.0],
                   [0.0, 0.0, 1.0],
                   [1.0, 1.0, 0.0]], np.float32)


def make_blob_batch(rng, shift=False, kp=None):
    """(images (B,S,S,3), kp (B,K,2) image-scale, target, weight)."""
    if kp is None:
        kp = rng.uniform(10, SIZE - 10, (B, K, 2)).astype(np.float32)
    yy, xx = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32)
    d2 = ((xx[None, None] - kp[..., 0, None, None]) ** 2
          + (yy[None, None] - kp[..., 1, None, None]) ** 2)
    blobs = np.exp(-d2 / (2.0 * 3.0 ** 2))  # (B, K, S, S)
    imgs = np.einsum("bkhw,kc->bhwc", blobs, COLORS).astype(np.float32)
    if shift:  # target domain: dimmer, offset (brightness/contrast shift)
        imgs = imgs * 0.55 + 0.25
    target, weight = generate_target_batch(kp, np.ones((B, K), np.float32),
                                           (HM, HM), SIGMA, (SIZE, SIZE))
    return imgs, kp, np.asarray(target), np.asarray(weight)


def identity_aug():
    return np.tile(np.array([0, 0, 0, 0, 0, 1], np.float32), (B, 1))


def make_model():
    backbone = resnet_lib.ResNet(block=resnet_lib.BasicBlock,
                                 stage_sizes=[1, 1, 1])
    return PoseResNet(backbone=backbone, num_keypoints=K)


def test_pipeline_learns():
    cfg = StepConfig(image_size=SIZE, heatmap_size=HM, sigma=SIGMA, k=1,
                     teacher_alpha=0.9)  # fast-tracking EMA for a short run
    model = make_model()
    state = create_state(model, jax.random.PRNGKey(0), cfg, batch_size=2)
    pretrain_step = make_pretrain_step(model, cfg)
    adapt_step = make_adapt_step(model, cfg)
    eval_step = make_eval_step(model)

    rng = np.random.RandomState(0)
    lr = jnp.float32(5e-3)

    def pck(params, stats, imgs, tgt, w):
        _, _, acc = eval_step(params, stats, jnp.asarray(imgs),
                              jnp.asarray(tgt), jnp.asarray(w))
        acc = np.asarray(acc)
        return float(acc[acc >= 0].mean())

    # --- phase 1: supervised overfit of a fixed source batch ---------------
    src_imgs, src_kp, src_tgt, src_w = make_blob_batch(rng)
    batch = {"image_s": jnp.asarray(src_imgs), "target_s": jnp.asarray(src_tgt),
             "weight_s": jnp.asarray(src_w)}
    first_loss = None
    pck_src = 0.0
    for i in range(200):
        state, metrics, _ = pretrain_step(state, None, batch, lr,
                                          jnp.bool_(False), jnp.float32(0.0))
        if first_loss is None:
            first_loss = float(metrics["loss_all"])
        if i >= 20 and i % 10 == 0:
            pck_src = pck(state.student_params, state.student_stats,
                          src_imgs, src_tgt, src_w)
            if pck_src > 0.95:
                break
    last_loss = float(jax.device_get(metrics["loss_all"]))
    assert np.isfinite(last_loss)
    assert last_loss < first_loss / 3, (first_loss, last_loss)
    pck_src = pck(state.student_params, state.student_stats,
                  src_imgs, src_tgt, src_w)
    assert pck_src > 0.9, f"pretraining failed to learn: train-batch PCK {pck_src}"

    # --- phase 2: mean-teacher adaptation on the shifted target domain -----
    # same keypoint layout, shifted appearance: the source-trained model is
    # PARTIALLY right on the target (the premise mean-teacher self-training
    # needs — with zero transfer, rectified pseudo-labels carry no signal)
    tgt_imgs, _, tgt_tgt, tgt_w = make_blob_batch(rng, shift=True, kp=src_kp)
    pck_tgt_before = pck(state.student_params, state.student_stats,
                         tgt_imgs, tgt_tgt, tgt_w)

    # teacher := pretrained student (the reference reloads best_pt into both,
    # train_human.py:209-213)
    state = state.replace(
        teacher_params=jax.tree_util.tree_map(jnp.copy, state.student_params),
        teacher_stats=jax.tree_util.tree_map(jnp.copy, state.student_stats))

    aug_tea = identity_aug()
    n_adapt = 80
    for i in range(n_adapt):
        # real rotated student view + matching aug_param (the step un-warps
        # the student heatmaps through the same chain)
        aug_stu = identity_aug()
        aug_stu[:, 0] = rng.uniform(-20, 20, B)
        x_t_stu = forward_warp_images(
            jnp.transpose(jnp.asarray(tgt_imgs), (0, 3, 1, 2)),
            jnp.asarray(aug_stu), cfg.ratio)
        x_t_stu = jnp.transpose(x_t_stu, (0, 2, 3, 1))
        abatch = {
            "image_s": jnp.asarray(src_imgs),
            "target_s": jnp.asarray(src_tgt),
            "weight_s": jnp.asarray(src_w),
            "image_t_stu": x_t_stu,
            "images_t_tea": jnp.asarray(tgt_imgs)[None],
            "aug_param_stu": jnp.asarray(aug_stu),
            "aug_params_tea": jnp.asarray(aug_tea)[None],
        }
        state, metrics, _ = adapt_step(
            state, None, abatch, lr, jax.random.PRNGKey(1000 + i),
            jnp.bool_(False), jnp.float32(0.0), jnp.bool_(False), jnp.float32(0.0))
        if i >= 20 and i % 10 == 0:  # early exit once both clearly improved
            p_stu = pck(state.student_params, state.student_stats,
                        tgt_imgs, tgt_tgt, tgt_w)
            p_tea = pck(state.teacher_params, state.teacher_stats,
                        tgt_imgs, tgt_tgt, tgt_w)
            if p_stu > 0.95 and p_tea > 0.95:
                break
    m = jax.device_get(metrics)
    assert np.isfinite(float(m["loss_all"]))
    assert np.isfinite(float(m["loss_c"]))

    pck_tgt_student = pck(state.student_params, state.student_stats,
                          tgt_imgs, tgt_tgt, tgt_w)
    pck_tgt_teacher = pck(state.teacher_params, state.teacher_stats,
                          tgt_imgs, tgt_tgt, tgt_w)
    # adaptation must raise target PCK for the student AND for the EMA
    # teacher (the model the reference validates with after pretrain_epoch,
    # train_human.py:222-224)
    print(f"pck src={pck_src:.3f} tgt_before={pck_tgt_before:.3f} "
          f"tgt_student={pck_tgt_student:.3f} tgt_teacher={pck_tgt_teacher:.3f}")
    assert pck_tgt_student > min(pck_tgt_before + 0.1, 0.9), \
        (pck_tgt_before, pck_tgt_student)
    assert pck_tgt_teacher > min(pck_tgt_before + 0.1, 0.9), \
        (pck_tgt_before, pck_tgt_teacher)


def test_pipeline_learns_with_style_transfer():
    """The CANONICAL loop — style transfer firing at p=0.5 — still learns.

    The paper's method ships with AdaIN s2t/t2s active (train_human.py:
    347-356 with --s2t-freq/--t2s-freq 0.5); test_pipeline_learns runs with
    the gates off, so the ``lax.switch`` style cases only ever executed in
    one-step tests. Here a real StyleNet (random frozen encoder + decoder
    briefly pre-trained on the blob images via make_decoder_step) is active
    during adaptation with per-iteration host gate draws at p=0.5 — all four
    switch cases must execute inside a run whose target PCK still rises for
    student AND teacher.
    """
    from uda_poseestimation_tpu.adain_engine import make_decoder_step
    from uda_poseestimation_tpu.models import StyleNet

    cfg = StepConfig(image_size=SIZE, heatmap_size=HM, sigma=SIGMA, k=1,
                     teacher_alpha=0.85)  # fast-tracking EMA for a short run
    model = make_model()
    state = create_state(model, jax.random.PRNGKey(0), cfg, batch_size=2)
    pretrain_step = make_pretrain_step(model, cfg)
    eval_step = make_eval_step(model)

    rng = np.random.RandomState(1)
    lr = jnp.float32(5e-3)

    def pck(params, stats, imgs, tgt, w):
        _, _, acc = eval_step(params, stats, jnp.asarray(imgs),
                              jnp.asarray(tgt), jnp.asarray(w))
        acc = np.asarray(acc)
        return float(acc[acc >= 0].mean())

    # supervised pretrain (as in test_pipeline_learns)
    src_imgs, src_kp, src_tgt, src_w = make_blob_batch(rng)
    batch = {"image_s": jnp.asarray(src_imgs), "target_s": jnp.asarray(src_tgt),
             "weight_s": jnp.asarray(src_w)}
    for i in range(200):
        state, metrics, _ = pretrain_step(state, None, batch, lr,
                                          jnp.bool_(False), jnp.float32(0.0))
        if i >= 20 and i % 10 == 0 and pck(
                state.student_params, state.student_stats,
                src_imgs, src_tgt, src_w) > 0.95:
            break

    tgt_imgs, _, tgt_tgt, tgt_w = make_blob_batch(rng, shift=True, kp=src_kp)
    pck_tgt_before = pck(state.student_params, state.student_stats,
                         tgt_imgs, tgt_tgt, tgt_w)
    state = state.replace(
        teacher_params=jax.tree_util.tree_map(jnp.copy, state.student_params),
        teacher_stats=jax.tree_util.tree_map(jnp.copy, state.student_stats))

    # StyleNet: frozen random encoder; decoder pre-trained for a few dozen
    # iterations on the blob images (adain_engine.make_decoder_step — the
    # real decoder-pretraining path) so stylization roughly preserves content
    style = StyleNet(style_loss_kind="meanstd")
    dummy = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    sv = jax.jit(lambda r: style.init(r, dummy, dummy))(jax.random.PRNGKey(7))
    enc, dec = sv["params"]["encoder"], sv["params"]["decoder"]
    dstep, dtx = make_decoder_step(content_weight=1.0, style_weight=0.05,
                                   lr=1e-3)
    dopt = dtx.init(dec)
    dl0 = dl = None
    for j in range(40):
        c, s = (src_imgs, tgt_imgs) if j % 2 == 0 else (tgt_imgs, src_imgs)
        dec, dopt, dloss, _, _, _ = dstep(dec, dopt, enc, jnp.asarray(c),
                                          jnp.asarray(s))
        dl0 = dl0 if dl0 is not None else float(dloss)
        dl = float(dloss)
    assert dl < dl0  # the decoder actually trained
    style_params = {"encoder": enc, "decoder": dec}

    adapt_step = make_adapt_step(model, cfg, style_model=style)
    aug_tea = identity_aug()
    cases_seen = set()
    for i in range(170):
        aug_stu = identity_aug()
        aug_stu[:, 0] = rng.uniform(-20, 20, B)
        x_t_stu = forward_warp_images(
            jnp.transpose(jnp.asarray(tgt_imgs), (0, 3, 1, 2)),
            jnp.asarray(aug_stu), cfg.ratio)
        x_t_stu = jnp.transpose(x_t_stu, (0, 2, 3, 1))
        abatch = {
            "image_s": jnp.asarray(src_imgs),
            "target_s": jnp.asarray(src_tgt),
            "weight_s": jnp.asarray(src_w),
            "image_t_stu": x_t_stu,
            "images_t_tea": jnp.asarray(tgt_imgs)[None],
            "aug_param_stu": jnp.asarray(aug_stu),
            "aug_params_tea": jnp.asarray(aug_tea)[None],
        }
        # canonical host RNG structure: one gate draw + one alpha per
        # direction per iteration at freq 0.5 (train_human.py:348-355)
        do_s2t = 0.5 > rng.rand()
        alpha_s2t = float(rng.uniform(0, 1)) if do_s2t else 0.0
        do_t2s = 0.5 > rng.rand()
        alpha_t2s = float(rng.uniform(0, 1)) if do_t2s else 0.0
        cases_seen.add((do_s2t, do_t2s))
        state, metrics, _ = adapt_step(
            state, style_params, abatch, lr, jax.random.PRNGKey(2000 + i),
            jnp.bool_(do_s2t), jnp.float32(alpha_s2t),
            jnp.bool_(do_t2s), jnp.float32(alpha_t2s))
        if i >= 30 and i % 10 == 0:
            p_stu = pck(state.student_params, state.student_stats,
                        tgt_imgs, tgt_tgt, tgt_w)
            p_tea = pck(state.teacher_params, state.teacher_stats,
                        tgt_imgs, tgt_tgt, tgt_w)
            if len(cases_seen) == 4 and p_stu > 0.95 and p_tea > 0.95:
                break

    # all four lax.switch style cases executed INSIDE the learning run
    assert cases_seen == {(False, False), (True, False), (False, True),
                          (True, True)}, cases_seen
    assert np.isfinite(float(jax.device_get(metrics["loss_all"])))
    pck_tgt_student = pck(state.student_params, state.student_stats,
                          tgt_imgs, tgt_tgt, tgt_w)
    pck_tgt_teacher = pck(state.teacher_params, state.teacher_stats,
                          tgt_imgs, tgt_tgt, tgt_w)
    print(f"style-on: tgt_before={pck_tgt_before:.3f} "
          f"tgt_student={pck_tgt_student:.3f} tgt_teacher={pck_tgt_teacher:.3f}")
    assert pck_tgt_student > min(pck_tgt_before + 0.1, 0.9), \
        (pck_tgt_before, pck_tgt_student)
    assert pck_tgt_teacher > min(pck_tgt_before + 0.1, 0.9), \
        (pck_tgt_before, pck_tgt_teacher)


if __name__ == "__main__":
    test_pipeline_learns()
    test_pipeline_learns_with_style_transfer()
    print("convergence: ok")
