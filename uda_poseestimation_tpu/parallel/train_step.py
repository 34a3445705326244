"""Fused, sharded train/eval steps — the centerpiece of the TPU design.

One jitted function per phase replaces the reference's per-iteration Python
orchestration (train_human.py:244-458):

- ``pretrain``: optional s2t AdaIN stylization + student forward + JointsMSE
  + Adam/SGD update;
- ``adapt``: s2t/t2s stylization, k teacher forwards, batched inverse-affine
  heatmap reconstruction, vectorized adaptive keypoint occlusion, student
  forwards, rectify + global kth-value confidence masking, consistency loss,
  student update, mean-teacher EMA — all inside a single XLA program;
- ``eval``: forward + loss for the validate loop.

Everything the reference does with per-sample Python loops over GPU tensors
(warp chains :359-372/418-423, occlusion :376-413, rectify utils.py:77-109)
is re-expressed as batched masked ops so the step stays shape-stable and
jittable. Batch arrays are sharded over the ('data',) mesh axis; parameters
are replicated; XLA inserts the gradient all-reduce (GSPMD), which rides ICI
on a real slice. The global kth-value mask threshold is computed on the
logically-global activation tensor, matching the reference's whole-batch
semantics (train_human.py:429) across shards.

Mixed precision: model compute runs in bf16 (TPU-native; replaces the
reference's CUDA AMP + GradScaler — no loss scaling needed on bf16), losses
and statistics in f32.

Parity notes (vs train_human.py / train_animal.py):
- teacher and student run BatchNorm in train mode during adaptation
  (:320-321); running stats update through those forwards; the EMA covers
  parameters only (utils.py:9-25);
- styled images are clamped to per-domain normalized bounds
  (recover_min/max, train_human.py:32-33 vs train_animal.py:34-35);
- ``tea_mask = tea_mask * activates > mask_thresh`` parses as
  ``(tea_mask * activates) > thresh`` (:430) — with tea_mask == 1 that is
  elementwise ``activates > thresh``; preserved;
- per-iteration Bernoulli draws (s2t/t2s) and alphas are fed in as scalars
  so the host keeps the reference's one-draw-per-iteration RNG structure;
  per-sample occlusion randomness uses jax.random inside the step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.ema import ema_update
from ..models.loss import cons_loss, joints_mse_loss
from ..models.style_net import StyleNet
from ..ops.affine import (
    backward_warp_images,
    chain_coeffs,
    compose_nearest_indices,
    forward_warp_images,
    gather_nearest,
    inverse_affine_coeffs,
    inverse_warp_heatmaps,
)
from ..ops.heatmap import get_max_preds, rectify
from ..ops.pck import keypoint_pck_accuracy


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static (trace-time) configuration — mirrors the trainer flags."""

    image_size: int = 256
    heatmap_size: int = 64
    sigma: float = 2.0
    k: int = 1
    lambda_c: float = 1.0
    teacher_alpha: float = 0.999
    mask_ratio: float = 0.5
    occlude_rate: float = 0.5
    occlude_thresh: float = 0.9
    occlude_size: int = 10
    # styled-image clamp = normalized [0,1] bounds; human/hand values
    # (train_human.py:32-33). Animal trainers override (train_animal.py:34-35).
    recover_min: Tuple[float, float, float] = (-2.1179, -2.0357, -1.8044)
    recover_max: Tuple[float, float, float] = (2.2489, 2.4285, 2.64)
    use_sgd: bool = False
    # 0.1x learning rate on backbone params — the reference's get_parameters
    # finetune groups (lib/models/pose_resnet.py:86-91; PoseResNet ctor flag).
    finetune: bool = False
    # True -> reproduce the reference's 3 chained nearest resamples exactly;
    # False -> single fused resample (faster, smoother; deliberate deviation).
    exact_warp_chain: bool = True
    # Occlusion image-warp gather implementation (trace-time decision):
    #   "auto"   -> Pallas one-hot MXU kernel on TPU (~1.6x over XLA's gather;
    #               hi/lo bf16 split -> ~4e-6 max abs deviation from the exact
    #               gather; ops/pallas_warp.py, PERF.md), XLA gather elsewhere;
    #   "pallas" -> force the Pallas kernel (tests set pallas_interpret=True
    #               to exercise the exact branch on CPU meshes);
    #   "xla"    -> force the bit-exact XLA gather.
    gather_impl: str = "auto"
    # Run the Pallas kernel in interpret mode (CPU-mesh testing only).
    pallas_interpret: bool = False
    # True -> the adapt step also returns its intermediate tensors under
    # metrics["aux"] (styled images, reconstructions, mask, ...) so tests can
    # compare the COMPOSITION against the reference trainer's torch oracle
    # (tests/test_composed_parity.py). Trace-time flag; no cost when False.
    aux_outputs: bool = False
    # False -> the Pallas occlusion gather uses ONE bf16 dot instead of the
    # hi/lo split (half the MXU FLOPs): it gathers bf16(image) values exactly,
    # which is bit-equivalent end-to-end when the student/teacher models cast
    # inputs to bf16 (the trainers' dtype=jnp.bfloat16 configuration) —
    # gather(bf16(x)) == bf16(gather(x)) because a gather only copies values.
    # Keep True when the models run in f32 (tests / numeric parity work).
    gather_exact: bool = True
    # dtype carried by the styled images between the style switch and the
    # pose models. "float32" (default) matches the reference numerics for
    # f32-model runs. "bfloat16" keeps the decoder output, the clamp, and
    # the un-styled passthroughs in bf16 — BIT-IDENTICAL for bf16 models
    # (their first conv casts the input to bf16 anyway, and clamping a bf16
    # value against bf16-rounded bounds equals cast-after-f32-clamp: the only
    # bf16 value in [bf16(lo), lo) is bf16(lo) itself, which both paths map
    # to bf16(lo)) — while halving the HBM traffic and the 3-channel
    # relayout cost of the (1+k)·B styled images (PERF.md round 3).
    style_io_dtype: str = "float32"

    @property
    def ratio(self) -> float:
        return self.image_size / self.heatmap_size


@flax.struct.dataclass
class UDAState:
    """Replicated training state (student + teacher + optimizer)."""

    step: jnp.ndarray
    student_params: Any
    student_stats: Any
    teacher_params: Any
    teacher_stats: Any
    opt_state: Any


def make_tx(use_sgd: bool = False) -> optax.GradientTransformation:
    """Gradient direction transform (lr applied separately per step).

    Matches torch Adam(lr)/SGD(momentum=0.9, wd=1e-4, nesterov)
    (train_human.py:136-139) including torch's update ordering.
    """
    if use_sgd:
        return optax.chain(
            optax.add_decayed_weights(1e-4),
            optax.trace(decay=0.9, nesterov=True),
        )
    return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)


def create_state(model, rng, cfg: StepConfig, batch_size: int = 2) -> UDAState:
    """Initialize student/teacher (teacher = copy of student, OldWeightEMA init)."""
    x = jnp.zeros((batch_size, cfg.image_size, cfg.image_size, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, x, train=False))(rng)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    tx = make_tx(cfg.use_sgd)
    return UDAState(
        step=jnp.zeros((), jnp.int32),
        student_params=params,
        student_stats=stats,
        # real copies: the teacher must not alias student buffers (the jitted
        # steps donate the state, and aliased buffers break donation)
        teacher_params=jax.tree_util.tree_map(jnp.copy, params),
        teacher_stats=jax.tree_util.tree_map(jnp.copy, stats),
        opt_state=tx.init(params),
    )


def _clamp_styled(x, cfg: StepConfig):
    lo = jnp.asarray(cfg.recover_min, x.dtype)
    hi = jnp.asarray(cfg.recover_max, x.dtype)
    return jnp.maximum(jnp.minimum(x, hi), lo)


def _apply_updates(params, direction, lr, lr_scale=None):
    if lr_scale is None:
        return jax.tree_util.tree_map(lambda p, d: p - lr * d, params, direction)
    return jax.tree_util.tree_map(lambda p, d, s: p - (lr * s) * d,
                                  params, direction, lr_scale)


def _finetune_lr_scale(params, cfg: StepConfig):
    """Per-leaf lr multipliers: 0.1 on the backbone when cfg.finetune (the
    reference's get_parameters param groups), else None (uniform lr)."""
    if not cfg.finetune:
        return None
    from ..models.pose_resnet import backbone_param_mask

    mask = backbone_param_mask(params)
    return jax.tree_util.tree_map(lambda m: 0.1 if m else 1.0, mask)


def _maybe_stylize(style_model, style_params, content, style, alpha, do_it, cfg):
    """lax.cond-gated AdaIN transfer + clamp (skips compute when not drawn)."""

    def yes(c):
        g = style_model.apply({"params": style_params}, c, style, alpha,
                              method=StyleNet.stylize)
        return _clamp_styled(g, cfg)

    return jax.lax.cond(do_it, yes, lambda c: c, content)


def _nchw(x):
    return jnp.transpose(x, (0, 3, 1, 2))


def _nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


# ---------------------------------------------------------------------------
# Adaptive keypoint occlusion, vectorized (train_human.py:376-413)
# ---------------------------------------------------------------------------

def _paste_patch(img, left, right, upper, bottom, left_src, upper_src):
    """img (C, H, W): copy rows [left_src, ...) / cols [upper_src, ...) onto
    the rectangle rows [left, right) x cols [upper, bottom)."""
    c, h, w = img.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    mask = (rows >= left) & (rows < right) & (cols >= upper) & (cols < bottom)
    src_r = jnp.clip(rows - left + left_src, 0, h - 1)
    src_c = jnp.clip(cols - upper + upper_src, 0, w - 1)
    idx = (src_r * w + src_c).reshape(-1)
    src_vals = jnp.take(img.reshape(c, -1), idx, axis=1).reshape(c, h, w)
    return jnp.where(mask[None], src_vals, img)


def _occlusion_geometry(rng, y_t_tea_recon, cfg: StepConfig):
    """Per-sample occlusion decisions: gate, rectangle, source offsets."""
    b, k = y_t_tea_recon.shape[:2]
    s = cfg.image_size
    conf = jnp.max(y_t_tea_recon, axis=(2, 3))  # (B, K)
    preds, _ = get_max_preds(y_t_tea_recon)  # (B, K, 2) (x, y), already masked
    conf_table = conf >= cfg.occlude_thresh

    k_gate, k_choice, k_src1, k_src2 = jax.random.split(rng, 4)
    u = jax.random.uniform(k_gate, (b,))
    do = (conf_table.sum(axis=1) > 0) & (u <= cfg.occlude_rate)

    # uniform choice among confident keypoints (Gumbel-max over the mask)
    gumbel = jax.random.gumbel(k_choice, (b, k))
    choice = jnp.argmax(jnp.where(conf_table, gumbel, -jnp.inf), axis=1)  # (B,)
    pos = jnp.take_along_axis(preds, choice[:, None, None].repeat(2, -1), axis=1)[:, 0]
    pos = (pos * cfg.ratio).astype(jnp.int32)  # (B, 2) (x, y) image scale

    # rectangle: rows from y (pos[:,1]) -> [left, right), cols from x -> [upper, bottom)
    left = jnp.maximum(pos[:, 1] - cfg.occlude_size, 0)
    right = jnp.minimum(pos[:, 1] + cfg.occlude_size, s)
    upper = jnp.maximum(pos[:, 0] - cfg.occlude_size, 0)
    bottom = jnp.minimum(pos[:, 0] + cfg.occlude_size, s)

    u1 = jax.random.uniform(k_src1, (b,))
    u2 = jax.random.uniform(k_src2, (b,))
    left_src = jnp.floor(u1 * (s - (right - left) + 1).astype(jnp.float32)).astype(jnp.int32)
    upper_src = jnp.floor(u2 * (s - (bottom - upper) + 1).astype(jnp.float32)).astype(jnp.int32)
    return do, left, right, upper, bottom, left_src, upper_src


def _occlude_batch(rng, x_t_stu_nhwc, y_t_tea_recon, aug_param_stu,
                   cfg: StepConfig, mesh=None):
    """Paste random patches over confident predicted keypoints.

    Reference semantics per sample (train_human.py:376-413): with probability
    occlude_rate, and only if some keypoint's confidence >= occlude_thresh,
    forward-warp the student view into teacher-aligned space, paste a random
    patch of the same image over one uniformly-chosen confident keypoint
    (box +-occlude_size at image scale), and warp back with a single inverse
    affine. Vectorized: all samples are warped/pasted, the per-sample
    Bernoulli/eligibility mask selects the result.

    ``mesh``: the trace-time device mesh (threaded from make_adapt_step);
    required for the Pallas gather on multi-device meshes, where pallas_call
    must run under shard_map (it does not auto-partition under GSPMD).
    """
    s = cfg.image_size
    do, left, right, upper, bottom, left_src, upper_src = _occlusion_geometry(
        rng, y_t_tea_recon, cfg)

    imgs = _nchw(x_t_stu_nhwc)
    if cfg.exact_warp_chain:
        # Single-gather evaluation of backward(paste(forward(x))): all three
        # stages are integer index remaps under nearest resampling, so they
        # compose exactly (forward chain c1,c2,c3, then the rectangle remap,
        # then the single backward affine) — 1 gather instead of 3 over the
        # full-resolution images, bit-identical to the sequential path.
        angle, tx, ty, shx, shy, scale = jnp.moveaxis(
            jnp.asarray(aug_param_stu, jnp.float32), -1, 0)
        c1, c2, c3 = chain_coeffs(angle, tx / cfg.ratio, ty / cfg.ratio,
                                  shx, shy, scale)
        cb = inverse_affine_coeffs(-angle, -tx / cfg.ratio, -ty / cfg.ratio,
                                   -shx, -shy, 1.0 / scale)

        h = w = s
        half = (s - 1) / 2.0

        impl = cfg.gather_impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        if impl == "pallas" and (s & (s - 1)) != 0:
            # the fused kernel's shift/mask row-col split needs a power-of-two
            # image size (all canonical configs); other sizes use XLA
            impl = "xla"
        if impl == "pallas":
            # Fully-fused kernel: the staged index chain is evaluated
            # in-kernel on per-tile register vectors (the XLA formulation's
            # full-grid index math cost ~3x the gather itself; PERF.md).
            from ..ops.pallas_warp import (
                occlusion_warp_onehot,
                occlusion_warp_onehot_sharded,
            )
            coeffs = jnp.stack([cb, c1, c2, c3], axis=1)  # (B, 4, 6)
            rect = jnp.stack([left, right, upper, bottom, left_src, upper_src],
                             axis=-1).astype(jnp.int32)  # (B, 6)
            # pallas_call does not auto-partition under GSPMD: single-device
            # meshes call it directly; multi-device meshes go through a
            # shard_map over the batch axis.
            if mesh is not None and mesh.size > 1:
                occluded = occlusion_warp_onehot_sharded(
                    imgs, coeffs, rect, mesh,
                    interpret=cfg.pallas_interpret, exact=cfg.gather_exact)
            else:
                occluded = occlusion_warp_onehot(imgs, coeffs, rect,
                                                 interpret=cfg.pallas_interpret,
                                                 exact=cfg.gather_exact)
        else:
            ys0 = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32) - half
            xs0 = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32) - half

            def indices_one(cb_i, c1_i, c2_i, c3_i, lt, up, ls, us, rb, bb):
                valid = jnp.ones((h, w), bool)
                # backward warp index map (last applied)
                qx, qy, valid = compose_nearest_indices([cb_i], xs0, ys0, valid, h, w)
                # rectangle remap on absolute integer coords
                qr = (qy + half).astype(jnp.int32)  # rows (y)
                qc = (qx + half).astype(jnp.int32)  # cols (x)
                inside = (qr >= lt) & (qr < rb) & (qc >= up) & (qc < bb)
                rr = jnp.where(inside, qr - lt + ls, qr)
                rc = jnp.where(inside, qc - up + us, qc)
                # forward chain index maps (first applied)
                fx, fy, valid = compose_nearest_indices(
                    [c1_i, c2_i, c3_i],
                    rc.astype(jnp.float32) - half, rr.astype(jnp.float32) - half,
                    valid, h, w)
                return fx, fy, valid

            fx, fy, valid = jax.vmap(indices_one)(cb, c1, c2, c3, left, upper,
                                                  left_src, upper_src, right, bottom)
            occluded = jax.vmap(lambda img, x_, y_, v_: gather_nearest(
                img, x_, y_, v_, h, w))(imgs, fx, fy, valid)
    else:
        warped = forward_warp_images(imgs, aug_param_stu, cfg.ratio, fused=True)
        pasted = jax.vmap(_paste_patch)(warped, left, right, upper, bottom,
                                        left_src, upper_src)
        occluded = backward_warp_images(pasted, aug_param_stu, cfg.ratio)
    out = jnp.where(do[:, None, None, None], occluded, imgs)
    return _nhwc(out)


# ---------------------------------------------------------------------------
# Steps
# ---------------------------------------------------------------------------

def make_pretrain_step(model, cfg: StepConfig, style_model: Optional[StyleNet] = None):
    """Source-only supervised step (train_human.py:244-302)."""
    fn = _pretrain_step_fn(model, cfg, style_model)

    def step_fn(state, style_params, batch, lr, do_s2t, alpha):
        return fn(state, style_params, batch, lr, None, do_s2t, alpha)

    return jax.jit(step_fn, donate_argnums=(0,))


def _pretrain_step_fn(model, cfg: StepConfig,
                      style_model: Optional[StyleNet] = None,
                      view_builder=None):
    """The raw (unjitted) pretrain step — shared by make_pretrain_step and
    PretrainStepBundler. ``view_builder(raw_batch, rng, do_s2t)`` (the
    --device-aug + --steps-per-dispatch path) builds the source views — and,
    gated on ``do_s2t``, the style image — inside the same XLA program."""
    tx = make_tx(cfg.use_sgd)

    def step_fn(state: UDAState, style_params, batch, lr, rng, do_s2t, alpha):
        if view_builder is not None:
            rng, r_views = jax.random.split(rng)
            batch = view_builder(batch, r_views, do_s2t)
        x_s = batch["image_s"]
        if style_model is not None:
            x_s = _maybe_stylize(style_model, style_params, x_s,
                                 batch["image_t_style"], alpha, do_s2t, cfg)
        label_s = batch["target_s"]
        weight_s = batch["weight_s"]

        def loss_fn(params):
            y_s, mut = model.apply(
                {"params": params, "batch_stats": state.student_stats},
                x_s, train=True, mutable=["batch_stats"])
            loss = joints_mse_loss(y_s, label_s, weight_s[..., 0])
            return loss, (y_s, mut["batch_stats"])

        (loss, (y_s, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.student_params)
        direction, new_opt = tx.update(grads, state.opt_state, state.student_params)
        new_params = _apply_updates(state.student_params, direction, lr,
                                    _finetune_lr_scale(state.student_params, cfg))
        _, acc_avg, acc_cnt, _ = keypoint_pck_accuracy(y_s, label_s)
        metrics = {"loss_all": loss, "loss_s": loss, "acc_s": acc_avg,
                   "acc_cnt": acc_cnt}
        new_state = state.replace(step=state.step + 1, student_params=new_params,
                                  student_stats=new_stats, opt_state=new_opt)
        return new_state, metrics, y_s

    return step_fn


def make_adapt_step(model, cfg: StepConfig, style_model: Optional[StyleNet] = None,
                    view_builder=None, mesh=None):
    """Mean-teacher adaptation step (train_human.py:305-458), fully fused.

    With ``view_builder`` (the --device-aug path) the step consumes raw
    canvases and generates all augmented views inside the same XLA program —
    one dispatch per training iteration end to end. Pass ``mesh`` to run the
    Pallas occlusion gather under shard_map on multi-chip meshes.
    """
    return jax.jit(_adapt_step_fn(model, cfg, style_model, view_builder, mesh),
                   donate_argnums=(0,))


def _adapt_step_fn(model, cfg: StepConfig, style_model: Optional[StyleNet] = None,
                   view_builder=None, mesh=None):
    """The raw (unjitted) adapt step — shared by make_adapt_step and
    AdaptStepBundler."""
    tx = make_tx(cfg.use_sgd)

    def step_fn(state: UDAState, style_params, batch, lr, rng,
                do_s2t, alpha_s2t, do_t2s, alpha_t2s):
        if view_builder is not None:
            rng, r_views = jax.random.split(rng)
            batch = view_builder(batch, r_views)
        x_s = batch["image_s"]          # (B, H, W, 3)
        x_s_ori = x_s
        x_t_stu = batch["image_t_stu"]  # (B, H, W, 3)
        x_t_teas = batch["images_t_tea"]  # (k, B, H, W, 3)
        aug_stu = batch["aug_param_stu"]  # (B, 6)
        aug_teas = batch["aug_params_tea"]  # (k, B, 6)
        label_s = batch["target_s"]
        weight_s = batch["weight_s"]

        # --- no-grad region: style transfer, teacher, occlusion -----------
        if style_model is not None:
            # Both directions stylize against the ORIGINAL tensors
            # (train_human.py:348-356: s2t uses x_t_teas_ori[0], t2s uses
            # x_s_ori), so the VGG encodings are shared: ONE batched encoder
            # call over [x_s_ori; all k tea views] under a joint cond, then a
            # lax.switch picks the decoder work for the drawn directions —
            # when both fire, all 1+k decodes run as ONE batched decoder call
            # (the decoder has no BatchNorm, so batching is per-sample exact).
            def enc(x):
                return style_model.apply({"params": style_params}, x,
                                         method=StyleNet.encode)

            sdtype = (jnp.bfloat16 if cfg.style_io_dtype == "bfloat16"
                      else jnp.float32)

            def dec(t):
                return style_model.apply({"params": style_params}, t,
                                         method=StyleNet.decode).astype(sdtype)

            from ..ops.adain import adain as adain_fn

            any_style = jnp.logical_or(do_s2t, do_t2s)
            b = x_s.shape[0]
            feat_hw = cfg.image_size // 8
            feat_shape = ((1 + cfg.k) * b, feat_hw, feat_hw, 512)

            def encode_all(_):
                stacked = jnp.concatenate([x_s_ori[None], x_t_teas], axis=0)
                f = enc(stacked.reshape((-1,) + stacked.shape[2:]))
                return f.astype(jnp.float32)

            f_all = jax.lax.cond(any_style, encode_all,
                                 lambda _: jnp.zeros(feat_shape, jnp.float32),
                                 None)
            f_s = f_all[:b]
            f_ts = f_all[b:].reshape((cfg.k, b) + f_all.shape[1:])

            # AdaIN targets are VPU-cheap; computing them outside the switch
            # keeps all branches decoder-only.
            t_s2t = adain_fn(f_s, f_ts[0], data_format="NHWC")
            t_s2t = alpha_s2t * t_s2t + (1.0 - alpha_s2t) * f_s
            t_t2s = jnp.stack([
                alpha_t2s * adain_fn(f_ts[i], f_s, data_format="NHWC")
                + (1.0 - alpha_t2s) * f_ts[i]
                for i in range(cfg.k)])
            t_t2s_flat = t_t2s.reshape((-1,) + t_t2s.shape[2:])

            def case_none():
                return x_s.astype(sdtype), x_t_teas.astype(sdtype)

            def case_s2t():
                return _clamp_styled(dec(t_s2t), cfg), x_t_teas.astype(sdtype)

            def case_t2s():
                g = _clamp_styled(dec(t_t2s_flat), cfg)
                return x_s.astype(sdtype), g.reshape(x_t_teas.shape)

            def case_both():
                g = _clamp_styled(dec(jnp.concatenate([t_s2t, t_t2s_flat])), cfg)
                return g[:b], g[b:].reshape(x_t_teas.shape)

            case = do_s2t.astype(jnp.int32) + 2 * do_t2s.astype(jnp.int32)
            x_s, x_t_teas = jax.lax.switch(
                case, [case_none, case_s2t, case_t2s, case_both])

        # k teacher forwards in train mode; running stats chain through views
        tea_stats = state.teacher_stats
        recons = []
        for i in range(cfg.k):
            y_tea, mut = model.apply(
                {"params": state.teacher_params, "batch_stats": tea_stats},
                x_t_teas[i], train=True, mutable=["batch_stats"])
            tea_stats = mut["batch_stats"]
            recons.append(inverse_warp_heatmaps(y_tea, aug_teas[i], cfg.ratio,
                                                fused=not cfg.exact_warp_chain))
        y_t_tea_recon = jnp.mean(jnp.stack(recons), axis=0)
        y_t_tea_recon = jax.lax.stop_gradient(y_t_tea_recon)

        if cfg.occlude_rate > -1:
            x_t_stu = _occlude_batch(rng, x_t_stu, y_t_tea_recon, aug_stu, cfg,
                                     mesh=mesh)

        # confidence mask: global kth-value over the (B*K) activations
        # (train_human.py:427-430). jnp.sort on the logically-global array
        # keeps whole-batch semantics under sharding.
        activates = jnp.max(y_t_tea_recon, axis=(2, 3))  # (B, K)
        y_t_tea_rect = rectify(y_t_tea_recon, cfg.sigma)
        numel = activates.size
        kth = max(int(cfg.mask_ratio * numel), 1)  # torch kthvalue is 1-indexed
        mask_thresh = jnp.sort(activates.reshape(-1))[kth - 1]
        tea_mask = activates > mask_thresh  # (B, K) — (1 * activates) > thresh

        # --- grad region: student forwards + losses ------------------------
        def loss_fn(params):
            y_s, mut1 = model.apply(
                {"params": params, "batch_stats": state.student_stats},
                x_s, train=True, mutable=["batch_stats"])
            y_t_stu, mut2 = model.apply(
                {"params": params, "batch_stats": mut1["batch_stats"]},
                x_t_stu, train=True, mutable=["batch_stats"])
            y_t_stu_recon = inverse_warp_heatmaps(y_t_stu, aug_stu, cfg.ratio,
                                                  fused=not cfg.exact_warp_chain)
            loss_s = joints_mse_loss(y_s, label_s, weight_s[..., 0])
            loss_c = cons_loss(y_t_stu_recon, y_t_tea_rect, tea_mask=tea_mask)
            loss_all = loss_s + cfg.lambda_c * loss_c
            return loss_all, (y_s, loss_s, loss_c, y_t_stu_recon,
                              mut2["batch_stats"])

        (loss_all, (y_s, loss_s, loss_c, y_t_stu_recon, new_stats)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(state.student_params)
        direction, new_opt = tx.update(grads, state.opt_state, state.student_params)
        new_params = _apply_updates(state.student_params, direction, lr,
                                    _finetune_lr_scale(state.student_params, cfg))
        new_teacher = ema_update(state.teacher_params, new_params, cfg.teacher_alpha)

        _, acc_avg, acc_cnt, _ = keypoint_pck_accuracy(y_s, label_s)
        metrics = {"loss_all": loss_all, "loss_s": loss_s, "loss_c": loss_c,
                   "acc_s": acc_avg, "acc_cnt": acc_cnt}
        if cfg.aux_outputs:
            # every composition-sensitive intermediate, for golden comparison
            # against the reference trainer oracle (train_human.py:326-440)
            metrics["aux"] = {
                "x_s_styled": x_s, "x_t_teas_styled": x_t_teas,
                "x_t_stu_final": x_t_stu,
                "y_t_tea_recon": y_t_tea_recon, "y_t_tea_rect": y_t_tea_rect,
                "activates": activates, "mask_thresh": mask_thresh,
                "tea_mask": tea_mask, "y_t_stu_recon": y_t_stu_recon,
                "grads": grads,
            }
        new_state = state.replace(
            step=state.step + 1,
            student_params=new_params, student_stats=new_stats,
            teacher_params=new_teacher, teacher_stats=tea_stats,
            opt_state=new_opt)
        return new_state, metrics, y_s

    return step_fn


class AdaptStepBundler:
    """--steps-per-dispatch: ``lax.scan`` n adaptation iterations per XLA
    dispatch.

    On a high-latency-attach host (this testbed: a tunneled TPU with
    ~2.5-3 ms dispatch overhead plus host round trips per step, PERF.md) one
    dispatch per iteration leaves the device idle between steps; scanning n
    pre-staged iterations amortizes dispatch/readback and lets H2D of bundle
    i+1 overlap n device steps — the same overlap the reference gets from
    DataLoader workers (train_human.py:90-105).

    Semantics are identical to n sequential ``make_adapt_step`` calls: the
    host still draws the reference's one-gate/alpha-per-iteration RNG
    sequence and passes them as (n,) arrays; state (params, BN stats, EMA,
    optimizer) chains through the scan carry; per-iteration metrics come
    back stacked. Jitted bundles are cached per bundle size (a trailing
    partial group compiles its own size once).
    """

    def __init__(self, model, cfg: StepConfig,
                 style_model: Optional[StyleNet] = None, view_builder=None,
                 mesh=None):
        self._step_fn = _adapt_step_fn(model, cfg, style_model, view_builder,
                                       mesh)
        self._jitted = {}

    def get(self, n_steps: int):
        if n_steps not in self._jitted:
            step_fn = self._step_fn

            def bundle_fn(state, style_params, batches, lr, rngs,
                          do_s2t, alpha_s2t, do_t2s, alpha_t2s):
                def body(st, xs):
                    b, rng, ds, a_s, dt, a_t = xs
                    st, metrics, y_s = step_fn(st, style_params, b, lr, rng,
                                               ds, a_s, dt, a_t)
                    return st, (metrics, y_s)

                state, (metrics, y_all) = jax.lax.scan(
                    body, state,
                    (batches, rngs, do_s2t, alpha_s2t, do_t2s, alpha_t2s),
                    length=n_steps)
                return state, metrics, y_all[-1]

            self._jitted[n_steps] = jax.jit(bundle_fn, donate_argnums=(0,))
        return self._jitted[n_steps]

    def __call__(self, state, style_params, batches, lr, rngs,
                 do_s2t, alpha_s2t, do_t2s, alpha_t2s):
        n = int(np.asarray(do_s2t).shape[0]) if hasattr(do_s2t, "shape") \
            else len(do_s2t)
        return self.get(n)(state, style_params, batches, lr, rngs,
                           do_s2t, alpha_s2t, do_t2s, alpha_t2s)


class PretrainStepBundler:
    """--steps-per-dispatch for the PRETRAIN phase: ``lax.scan`` n
    source-only supervised iterations per XLA dispatch.

    The pretrain phase is the bulk of the canonical schedules (70 of 100
    human epochs, train_human.py:244-302) and is just as H2D/dispatch-bound
    on high-latency-attach hosts as adaptation — same rationale and
    semantics as AdaptStepBundler: host gate/alpha draws ride in as (n,)
    arrays, state chains through the scan carry, per-iteration metrics come
    back stacked, and jitted bundles are cached per bundle size.

    NOTE: deliberately mirrors AdaptStepBundler's orchestration (cache
    dict / scan wrapper / n-inference) rather than sharing a generic base —
    the two differ in step arity and gate structure, and keeping each
    flat-and-obvious was chosen over a parameterized abstraction. A fix to
    one bundler's orchestration almost certainly applies to the other.

    ``view_builder(raw_batch, rng, do_s2t)`` (from
    DeviceAugPipeline.pretrain_view_builder / the animal twin) generates the
    source views in-step from raw uint8 canvases; the style image is built
    under a ``lax.cond`` on the iteration's s2t gate so un-drawn iterations
    skip that work, like the reference only loads a style batch when the
    draw fires (train_human.py:267-276).
    """

    def __init__(self, model, cfg: StepConfig,
                 style_model: Optional[StyleNet] = None, view_builder=None):
        self._step_fn = _pretrain_step_fn(model, cfg, style_model, view_builder)
        self._jitted = {}

    def get(self, n_steps: int):
        if n_steps not in self._jitted:
            step_fn = self._step_fn

            def bundle_fn(state, style_params, batches, lr, rngs, do_s2t,
                          alphas):
                def body(st, xs):
                    b, rng, ds, a = xs
                    st, metrics, y_s = step_fn(st, style_params, b, lr, rng,
                                               ds, a)
                    return st, (metrics, y_s)

                state, (metrics, y_all) = jax.lax.scan(
                    body, state, (batches, rngs, do_s2t, alphas),
                    length=n_steps)
                return state, metrics, y_all[-1]

            self._jitted[n_steps] = jax.jit(bundle_fn, donate_argnums=(0,))
        return self._jitted[n_steps]

    def __call__(self, state, style_params, batches, lr, rngs, do_s2t, alphas):
        n = int(np.asarray(do_s2t).shape[0]) if hasattr(do_s2t, "shape") \
            else len(do_s2t)
        return self.get(n)(state, style_params, batches, lr, rngs, do_s2t,
                           alphas)


def make_eval_step(model):
    """Inference forward + loss + per-keypoint PCK (train_human.py:461-500).

    PCK is computed on device (ops.pck.keypoint_pck_accuracy, parity-tested
    against the host twin) so the validate loop only reads back scalars —
    full heatmap readbacks are expensive on tunneled TPUs.
    """

    def eval_fn(params, stats, x, label, weight):
        y = model.apply({"params": params, "batch_stats": stats}, x, train=False)
        loss = joints_mse_loss(y, label, weight[..., 0])
        acc_per_kpt, _, _, _ = keypoint_pck_accuracy(y, label)
        return y, loss, acc_per_kpt

    return jax.jit(eval_fn)
