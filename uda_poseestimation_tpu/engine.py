"""Trainer engine: host-side epoch loops around the fused device steps.

The reference implements ``pretrain`` / ``train`` / ``validate`` three times
(train_human.py:244-500, train_animal.py:267-525, train_animal_other.py);
here one engine serves all trainers, preserving the observable behavior:

- identical meter names / ProgressMeter line formats;
- per-iteration host RNG draw structure for s2t/t2s gating and alphas
  (one np.random.rand() per check, one np.random.uniform per applied style,
  in the reference's order — train_human.py:270-276, 347-356);
- the target iterator is advanced exactly when the reference advances it;
- PCK accuracy on the host via the numpy twin, and the same
  AverageMeterList(ignore_val=-1) aggregation in validate.

Device work (style transfer, teacher views, warps, occlusion, rectify,
losses, optimizer, EMA) all lives in parallel.train_step; this module only
feeds sharded numpy batches and reads back scalar metrics.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .data.loader import ForeverDataIterator
from .parallel.mesh import shard_batch
from .utils.meter import AverageMeter, AverageMeterList, ProgressMeter


def make_source_batch(x_s, label_s, weight_s, image_t_style=None):
    batch = {"image_s": np.asarray(x_s, np.float32),
             "target_s": np.asarray(label_s, np.float32),
             "weight_s": np.asarray(weight_s, np.float32)}
    if image_t_style is not None:
        batch["image_t_style"] = np.asarray(image_t_style, np.float32)
    return batch


def make_adapt_batch(src_tuple, tgt_tuple):
    x_s, label_s, weight_s, _meta_s = src_tuple
    (x_t_stu, _t_stu, _w_stu, meta_t_stu,
     x_t_teas, _t_teas, _w_teas, metas_t_tea) = tgt_tuple
    return {
        "image_s": np.asarray(x_s, np.float32),
        "target_s": np.asarray(label_s, np.float32),
        "weight_s": np.asarray(weight_s, np.float32),
        "image_t_stu": np.asarray(x_t_stu, np.float32),
        "images_t_tea": np.stack([np.asarray(x, np.float32) for x in x_t_teas]),
        "aug_param_stu": np.asarray(meta_t_stu["aug_param_stu"], np.float32),
        "aug_params_tea": np.stack([np.asarray(m["aug_param_tea"], np.float32)
                                    for m in metas_t_tea]),
    }


class _DeviceAugBase:
    """Shared host-side plumbing for the --device-aug pipelines: per-call
    RNG folding and mesh-aware device placement."""

    mesh = None
    rng = None
    _n = 0

    def next_rng(self):
        self._n += 1
        return jax.random.fold_in(self.rng, self._n)

    def _put(self, arrays):
        if self.mesh is None:
            return tuple(jnp.asarray(a) for a in arrays)
        return tuple(shard_batch(list(arrays), self.mesh))

    def _put_tree(self, tree):
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in tree.items()}
        return shard_batch(tree, self.mesh)


class DeviceAugPipeline(_DeviceAugBase):
    """Jitted on-device view generation for the --device-aug fast path.

    Host datasets supply one canonical canvas per sample (Resize/ResizePad +
    ToTensor, identity aug_param); this pipeline draws and renders the
    student/teacher/source views on device (ops.device_aug). See the
    DEVIATION NOTE in ops/device_aug.py.
    """

    host_visualizable = True  # raw source canvases are host arrays

    def __init__(self, cfg_src, cfg_stu, cfg_tea, k: int, mean, std,
                 mesh=None, seed: int = 0):
        from .ops.device_aug import augment_batch

        self.k = k
        self.mesh = mesh
        self.rng = jax.random.PRNGKey(seed)
        self._n = 0

        def dev_canvas(c):
            # uint8 canvases cross host->device 4x smaller; exact /255
            return c.astype(jnp.float32) / 255.0 if c.dtype == jnp.uint8 else c

        def prep_source(rng, canvas, kp, vis):
            out = augment_batch(rng, dev_canvas(canvas), kp, vis, cfg_src,
                                n_views=1, mean=mean, std=std)
            return (out["image"][0], out["target"][0], out["target_weight"][0],
                    out["keypoint2d"][0])

        def prep_target(rng, canvas, kp, vis):
            # one shared RandomResizedCrop base view (transforms_base), then
            # independent affine/jitter per student/teacher view
            from .ops.device_aug import rrc_batch

            r_base, r_stu, r_tea = jax.random.split(rng, 3)
            base_img, base_kp = rrc_batch(r_base, dev_canvas(canvas), kp, cfg_src)
            stu = augment_batch(r_stu, base_img, base_kp, vis, cfg_stu,
                                n_views=1, mean=mean, std=std)
            tea = augment_batch(r_tea, base_img, base_kp, vis, cfg_tea,
                                n_views=k, mean=mean, std=std)
            return (stu["image"][0], stu["aug_param"][0],
                    tea["image"], tea["aug_param"])

        self.prep_source = jax.jit(prep_source)
        self.prep_target = jax.jit(prep_target)
        self._prep_source_raw = prep_source
        self._prep_target_raw = prep_target

    def _pack_canvas(self, x):
        """uint8 transport when the canvas is exactly uint8/255 (PIL
        decode/resize keeps uint8; ToTensor divides by 255 — true for every
        canonical-canvas pipeline); the on-device /255 matches the host's to
        within 1 ulp (XLA reciprocal-multiply division). Checked per batch —
        any batch off the uint8 grid ships as f32 (mixed datasets, float
        decode paths); already-uint8 inputs pass straight through."""
        x = np.asarray(x)
        if x.dtype == np.uint8:
            return x
        x = x.astype(np.float32, copy=False)
        q = np.round(x * 255.0)
        if np.max(np.abs(q / 255.0 - x)) < 1e-6:
            return q.astype(np.uint8)
        return x

    def view_builder(self, raw_batch, rng):
        """Build the standard adapt-step batch from raw canvases, traceable
        inside the fused step (pass to make_adapt_step(view_builder=...))."""
        r_s, r_t = jax.random.split(rng)
        img_s, tgt_s, w_s, _kp = self._prep_source_raw(
            r_s, raw_batch["canvas_s"], raw_batch["kp_s"], raw_batch["vis_s"])
        x_t_stu, aug_stu, x_t_teas, aug_teas = self._prep_target_raw(
            r_t, raw_batch["canvas_t"], raw_batch["kp_t"], raw_batch["vis_t"])
        return {"image_s": img_s, "target_s": tgt_s, "weight_s": w_s,
                "image_t_stu": x_t_stu, "images_t_tea": x_t_teas,
                "aug_param_stu": aug_stu, "aug_params_tea": aug_teas}

    def raw_adapt_batch(self, src_tuple, tgt_tuple, device: bool = True):
        """Raw-canvas adapt batch; ``device=False`` returns host numpy (the
        --steps-per-dispatch path stacks n of these and ships them in ONE
        sharded device_put)."""
        x, _t, weight, meta = src_tuple
        meta_t = tgt_tuple[3]
        batch = {
            "canvas_s": self._pack_canvas(x),
            "kp_s": np.asarray(meta["keypoint2d"], np.float32),
            "vis_s": np.asarray(weight, np.float32)[..., 0],
            "canvas_t": self._pack_canvas(tgt_tuple[0]),
            "kp_t": np.asarray(meta_t["keypoint2d_ori"], np.float32),
            "vis_t": np.asarray(meta_t["target_weight_ori"], np.float32)[..., 0],
        }
        return self._put_tree(batch) if device else batch

    def raw_source(self, src_tuple):
        x, _t, weight, meta = src_tuple
        return self._put((self._pack_canvas(x),
                          np.asarray(meta["keypoint2d"], np.float32),
                          np.asarray(weight, np.float32)[..., 0]))

    def raw_pretrain_batch(self, src_tuple, tgt_tuple=None):
        """Host dict of raw canvases for one pretrain iteration — the
        --steps-per-dispatch path stacks n of these (see raw_adapt_batch).
        ``tgt_tuple`` supplies the style-image canvas when s2t is enabled."""
        x, _t, weight, meta = src_tuple
        batch = {
            "canvas_s": self._pack_canvas(x),
            "kp_s": np.asarray(meta["keypoint2d"], np.float32),
            "vis_s": np.asarray(weight, np.float32)[..., 0],
        }
        if tgt_tuple is not None:
            meta_t = tgt_tuple[3]
            batch.update({
                "canvas_t": self._pack_canvas(tgt_tuple[0]),
                "kp_t": np.asarray(meta_t["keypoint2d_ori"], np.float32),
                "vis_t": np.asarray(meta_t["target_weight_ori"],
                                    np.float32)[..., 0],
            })
        return batch

    def pretrain_view_builder(self, style_enabled: bool):
        """In-step source-view builder for PretrainStepBundler. The style
        image (the teacher view the reference feeds, train_human.py:270-276)
        is generated under a lax.cond on the iteration's s2t gate."""

        def build(raw_batch, rng, do_s2t):
            r_s, r_t = jax.random.split(rng)
            img_s, tgt_s, w_s, _kp = self._prep_source_raw(
                r_s, raw_batch["canvas_s"], raw_batch["kp_s"],
                raw_batch["vis_s"])
            out = {"image_s": img_s, "target_s": tgt_s, "weight_s": w_s}
            if style_enabled:
                def mk_style(_):
                    _, _, teas, _ = self._prep_target_raw(
                        r_t, raw_batch["canvas_t"], raw_batch["kp_t"],
                        raw_batch["vis_t"])
                    return teas[0]

                out["image_t_style"] = jax.lax.cond(
                    do_s2t, mk_style, lambda _: jnp.zeros_like(img_s), None)
            return out

        return build

    def pretrain_style_template(self, raw_batch):
        """{style leaf: (shape, dtype)} for zero placeholders on non-fired
        s2t iterations of the bundled pretrain (data-order contract: the
        target stream is consumed ONLY on fired draws, like the unbundled
        loop; the in-step style compute is lax.cond-gated so the zeros are
        never read). Derived from the source leaves — source and target
        canvases share the canonical canvas grid and keypoint count."""
        return {"canvas_t": (raw_batch["canvas_s"].shape,
                             raw_batch["canvas_s"].dtype),
                "kp_t": (raw_batch["kp_s"].shape, np.float32),
                "vis_t": (raw_batch["vis_s"].shape, np.float32)}

    def raw_target(self, tgt_tuple):
        canvas = tgt_tuple[0]
        meta = tgt_tuple[3]
        return self._put((self._pack_canvas(canvas),
                          np.asarray(meta["keypoint2d_ori"], np.float32),
                          np.asarray(meta["target_weight_ori"], np.float32)[..., 0]))

    def style_image(self, tgt_tuple):
        """Normalized style image for the pretrain s2t draw (the teacher view
        the reference feeds, train_human.py:270-276)."""
        c_t, kp_t, vis_t = self.raw_target(tgt_tuple)
        _, _, teas, _ = self.prep_target(self.next_rng(), c_t, kp_t, vis_t)
        return teas[0]


class AnimalDeviceAugPipeline(_DeviceAugBase):
    """--device-aug for the animal trainers: ALL random views on device.

    Target mt student/teacher views — affine warp + original-frame keypoint
    math + MPII-transform window-rule labelmaps — and (with ``src_cfg``) the
    SOURCE pipeline — imgaug Affine/Noise/Blur/Contrast + hflip + crop_ori
    composed into one warp + targets (ops.device_aug.animal_source_*) — are
    generated inside the fused step. The host only decodes frames. Device
    twins are parity-tested in tests/test_device_aug.py and
    tests/test_animal_source_device.py.
    """

    host_visualizable = False  # source views exist only on device

    def __init__(self, cfg_stu, cfg_tea, k: int, mean, label_type: str = "Gaussian",
                 mesh=None, seed: int = 0, src_cfg=None, flip_perm=None,
                 src_mean=None, src_is_aug: bool = True):
        from .ops.device_aug import animal_augment_batch, animal_source_batch

        self.k = k
        self.mesh = mesh
        self.rng = jax.random.PRNGKey(seed)
        self._n = 0
        self.src_cfg = src_cfg
        self._image_size = cfg_stu.image_size
        self._flip_perm = (np.asarray(flip_perm, np.int32)
                           if flip_perm is not None else None)
        self._src_mean = src_mean
        self._mean = mean

        def source_views(rng, canvas, pts, c, s):
            # canvases cross the host->device link as uint8 (4x smaller)
            out = animal_source_batch(rng, canvas.astype(jnp.float32), pts, c, s,
                                      jnp.asarray(self._flip_perm), src_cfg,
                                      mean=src_mean, is_aug=src_is_aug)
            return (out["image"], out["target"], out["target_weight"],
                    out["keypoint2d"])

        self._source_views = source_views
        self.prep_source = jax.jit(source_views) if src_cfg is not None else None

        def builder(raw_batch, rng):
            r_stu, r_tea, r_src = jax.random.split(rng, 3)
            canvas = raw_batch["canvas_t"]
            if canvas.dtype == jnp.uint8:  # uint8 H2D transport; /255 on device
                canvas = canvas.astype(jnp.float32) / 255.0
            kp = raw_batch["kp_t"]
            vis = raw_batch["vis_t"]
            c = raw_batch["center_t"]
            s = raw_batch["scale_t"]
            stu = animal_augment_batch(r_stu, canvas, kp, vis, c, s, cfg_stu,
                                       n_views=1, mean=mean, label_type=label_type)
            tea = animal_augment_batch(r_tea, canvas, kp, vis, c, s, cfg_tea,
                                       n_views=k, mean=mean, label_type=label_type)
            if src_cfg is not None:
                img_s, target_s, weight_s, _ = source_views(
                    r_src, raw_batch["canvas_s"], raw_batch["pts_s"],
                    raw_batch["center_s"], raw_batch["scale_s"])
            else:
                img_s = raw_batch["image_s"]
                target_s = raw_batch["target_s"]
                weight_s = raw_batch["weight_s"]
            return {"image_s": img_s,
                    "target_s": target_s,
                    "weight_s": weight_s,
                    "image_t_stu": stu["image"][0],
                    "aug_param_stu": stu["aug_param"][0],
                    "images_t_tea": tea["image"],
                    "aug_params_tea": tea["aug_param"]}

        self.view_builder = builder

    def raw_source(self, src_tuple):
        """Raw-mode source tuple -> device arrays for prep_source."""
        meta = src_tuple[3]
        return self._put((np.asarray(meta["canvas"], np.uint8),
                          np.asarray(meta["pts"], np.float32),
                          np.asarray(meta["center"], np.float32),
                          np.asarray(meta["scale"], np.float32)))

    def raw_pretrain_batch(self, src_tuple, tgt_tuple=None):
        """Host dict of one pretrain iteration's raw inputs for the
        --steps-per-dispatch bundle. The animal style image is the
        host-normalized identity teacher view used AS-IS (see style_image) —
        it rides along as a dense f32 leaf."""
        meta = src_tuple[3]
        batch = {
            "canvas_s": np.asarray(meta["canvas"], np.uint8),
            "pts_s": np.asarray(meta["pts"], np.float32),
            "center_s": np.asarray(meta["center"], np.float32),
            "scale_s": np.asarray(meta["scale"], np.float32),
        }
        if tgt_tuple is not None:
            batch["image_t_style"] = np.asarray(tgt_tuple[4][0], np.float32)
        return batch

    def pretrain_style_template(self, raw_batch):
        """Zero-placeholder spec for non-fired s2t bundle iterations (see
        DeviceAugPipeline.pretrain_style_template). The animal style image
        is the host-normalized identity teacher view at image size."""
        b = raw_batch["canvas_s"].shape[0]
        return {"image_t_style": ((b, self._image_size, self._image_size, 3),
                                  np.float32)}

    def pretrain_view_builder(self, style_enabled: bool):
        """In-step source-view builder for PretrainStepBundler (the animal
        SOURCE pipeline runs on device; style image passes through)."""
        if self.src_cfg is None:
            raise ValueError("animal pretrain bundling needs src_cfg "
                             "(--device-aug source pipeline)")

        def build(raw_batch, rng, do_s2t):
            img_s, target_s, weight_s, _ = self._source_views(
                rng, raw_batch["canvas_s"], raw_batch["pts_s"],
                raw_batch["center_s"], raw_batch["scale_s"])
            out = {"image_s": img_s, "target_s": target_s,
                   "weight_s": weight_s}
            if style_enabled:
                out["image_t_style"] = raw_batch["image_t_style"]
            return out

        return build

    def style_image(self, tgt_tuple):
        """Pretrain s2t style image: the identity teacher view, used AS-IS —
        the animal mt datasets color_normalize teacher views on the host even
        under --device-aug (real_animal.py:260), exactly what the reference
        feeds (x_t_teas_ori[0])."""
        img = np.asarray(tgt_tuple[4][0], np.float32)
        return self._put([img])[0]

    def raw_adapt_batch(self, src_tuple, tgt_tuple, device: bool = True):
        meta = tgt_tuple[3]
        canvas_t = np.asarray(meta["canvas"])
        if canvas_t.dtype != np.uint8:  # keep legacy float canvases working
            canvas_t = canvas_t.astype(np.float32) / 255.0
        batch = {
            "canvas_t": canvas_t,
            "kp_t": np.asarray(meta["kp_orig"], np.float32),
            "vis_t": np.asarray(meta["vis"], np.float32),
            "center_t": np.asarray(meta["center"], np.float32),
            "scale_t": np.asarray(meta["scale"], np.float32),
        }
        if self.src_cfg is not None:
            meta_s = src_tuple[3]
            batch.update({
                "canvas_s": np.asarray(meta_s["canvas"], np.uint8),
                "pts_s": np.asarray(meta_s["pts"], np.float32),
                "center_s": np.asarray(meta_s["center"], np.float32),
                "scale_s": np.asarray(meta_s["scale"], np.float32),
            })
        else:
            x_s, label_s, weight_s, _meta = src_tuple
            batch.update({
                "image_s": np.asarray(x_s, np.float32),
                "target_s": np.asarray(label_s, np.float32),
                "weight_s": np.asarray(weight_s, np.float32),
            })
        return self._put_tree(batch) if device else batch


class StyleGate:
    """Host-side per-iteration Bernoulli + alpha draws (reference RNG order).

    ``rng`` defaults to the global np.random stream like the reference
    (train_human.py:348,353); multi-process epochs inject a seed-derived
    process-synchronized stream instead (parallel/distributed.py) so every
    process gates/blends identically while data sampling stays local."""

    def __init__(self, enabled: bool, freq: float, alpha_range, rng=None):
        self.enabled = enabled
        self.freq = freq
        self.alpha_range = tuple(alpha_range)
        self.rng = rng if rng is not None else np.random

    def draw(self):
        if not self.enabled:
            return False, 0.0
        if self.freq > self.rng.rand():
            return True, float(self.rng.uniform(*self.alpha_range))
        return False, 0.0


def _is_primary() -> bool:
    from .parallel import distributed as dist

    return dist.is_primary()


def _control_rng(args, epoch):
    """Multi-process: the process-synchronized control stream (gates, step
    PRNG seeds); single-process: the global np.random module (reference
    behavior). Returns (stream, is_primary)."""
    from .parallel import distributed as dist

    if dist.is_multiprocess():
        return dist.control_rng(getattr(args, "seed", 0) or 0, epoch), \
            dist.is_primary()
    return np.random, True


def run_pretrain_epoch(state, style_params, pretrain_step, mesh, source_iter,
                       target_iter: Optional[ForeverDataIterator], epoch, lr, args,
                       visualize=None, style_enabled=False,
                       device_aug: Optional[DeviceAugPipeline] = None,
                       bundler=None, base_rng=None):
    """Source-only supervised epoch (train_human.py:244-302).

    With ``bundler`` (a PretrainStepBundler) and ``args.steps_per_dispatch
    > 1`` the epoch scans n iterations per dispatch, exactly like
    run_adapt_epoch's bundled mode. Data-order contract (round 5): bundled
    and unbundled pretrain consume IDENTICAL source/target/gate streams —
    the target loader is advanced only on fired s2t draws in both modes
    (reference train_human.py:267-276); non-fired bundle slots carry zero
    style placeholders that the lax.cond-gated style compute never reads
    (tests/test_engine_loops.py::test_bundled_pretrain_target_stream_contract)."""
    batch_time = AverageMeter("Time", ":4.2f")
    data_time = AverageMeter("Data", ":3.1f")
    losses_all = AverageMeter("Loss (all)", ":.4e")
    losses_s = AverageMeter("Loss (s)", ":.4e")
    acc_s = AverageMeter("Acc (s)", ":3.2f")
    progress = ProgressMeter(args.iters_per_epoch,
                             [batch_time, data_time, losses_all, losses_s, acc_s],
                             prefix="Epoch: [{}]".format(epoch))

    ctrl, primary = _control_rng(args, epoch)
    gate = StyleGate(style_enabled, getattr(args, "s2t_freq", 0.0),
                     getattr(args, "s2t_alpha", (0.0, 1.0)), rng=ctrl)

    n_bundle = max(1, int(getattr(args, "steps_per_dispatch", 1) or 1))
    if n_bundle > 1 and bundler is not None:
        if base_rng is None:
            # Derived WITHOUT consuming from ctrl: the unbundled pretrain
            # loop draws nothing here, so a ctrl.randint would shift the s2t
            # gate stream by one draw between modes (data-order contract).
            seed = (getattr(args, "seed", 0) or 0)
            base_rng = jax.random.PRNGKey((seed * 1000003 + epoch) % 2 ** 31)
        return _run_pretrain_epoch_bundled(
            state, style_params, bundler, mesh, source_iter, target_iter,
            epoch, lr, args, gate, style_enabled, base_rng, device_aug,
            n_bundle,
            [batch_time, data_time, losses_all, losses_s, acc_s], progress)

    dummy_style = None
    end = time.time()

    # one-deep software pipeline (like run_validate): step i is dispatched
    # BEFORE step i-1's metrics are read back, so host batch building (PIL
    # decode, augmentation, H2D) overlaps the device step
    pending = None

    def flush(item):
        nonlocal end
        i, n, metrics, y_s, x_s_np, meta_s = item
        # metrics (incl. PCK) are computed on device; one small D2H fetch.
        # (reading back the full y_s heatmaps every iteration costs more than
        # the step itself on tunneled TPUs)
        m = jax.device_get(metrics)
        acc_s.update(float(m["acc_s"]), int(m["acc_cnt"]))
        losses_all.update(float(m["loss_all"]), n)
        losses_s.update(float(m["loss_s"]), n)
        batch_time.update(time.time() - end)
        end = time.time()
        if primary and i % args.print_freq == 0:
            progress.display(i)
            if visualize is not None and meta_s.get("keypoint2d") is not None:
                from .ops.pck import get_max_preds_np
                from .parallel.distributed import host_local
                pred_s, _ = get_max_preds_np(host_local(y_s).astype(np.float32))
                ratio = args.image_size / args.heatmap_size
                visualize(x_s_np[0], pred_s[0] * ratio,
                          "source_{}_pred.jpg".format(i))
                # device-aug: keypoint2d is the sharded on-device kp_aug —
                # like y_s above, fetch only this process's rows (row 0 of
                # rank 0 == global row 0, matching x_s_np[0])
                visualize(x_s_np[0], host_local(meta_s["keypoint2d"])[0],
                          "source_{}_label.jpg".format(i))

    for i in range(args.iters_per_epoch):
        x_s, label_s, weight_s, meta_s = next(source_iter)
        do_s2t, alpha = gate.draw()
        if device_aug is not None:
            # raw/prep contract is pipeline-specific (human: canvas/kp/vis;
            # animal: canvas/pts/center/scale) — pass the tuple through
            raw = device_aug.raw_source((x_s, label_s, weight_s, meta_s))
            img_s, tgt_s, w_s, kp_aug = device_aug.prep_source(
                device_aug.next_rng(), *raw)
            batch = {"image_s": img_s, "target_s": tgt_s, "weight_s": w_s}
            meta_s = {"keypoint2d": kp_aug if device_aug.host_visualizable
                      else None}
            if style_enabled:
                if do_s2t:
                    batch["image_t_style"] = device_aug.style_image(next(target_iter))
                else:
                    batch["image_t_style"] = jnp.zeros_like(img_s)
        else:
            if do_s2t:
                tgt = next(target_iter)
                image_t_style = np.asarray(tgt[4][0], np.float32)
            else:
                if dummy_style is None:
                    dummy_style = np.zeros_like(np.asarray(x_s, np.float32))
                image_t_style = dummy_style
            batch = make_source_batch(x_s, label_s, weight_s,
                                      image_t_style if style_enabled else None)
            batch = shard_batch(batch, mesh)
        data_time.update(time.time() - end)

        state, metrics, y_s = pretrain_step(state, style_params, batch,
                                            jnp.float32(lr), jnp.bool_(do_s2t),
                                            jnp.float32(alpha))
        if pending is not None:
            flush(pending)
        pending = (i, len(x_s), metrics, y_s, np.asarray(x_s), meta_s)
    if pending is not None:
        flush(pending)
    return state


def _run_pretrain_epoch_bundled(state, style_params, bundler, mesh,
                                source_iter, target_iter, epoch, lr, args,
                                gate, style_enabled, base_rng, device_aug,
                                n_bundle, meters, progress):
    """n-iterations-per-dispatch pretrain epoch (see run_pretrain_epoch)."""
    (batch_time, data_time, losses_all, losses_s, acc_s) = meters
    batch_size = None
    style_tpl = None  # {style leaf: (shape, dtype)} once known
    end = time.time()
    pending = None

    def flush(item):
        nonlocal end
        base_i, n_sub, n_img, metrics = item
        m = jax.device_get(metrics)
        dt = (time.time() - end) / n_sub
        for j in range(n_sub):
            acc_s.update(float(m["acc_s"][j]), int(m["acc_cnt"][j]))
            losses_all.update(float(m["loss_all"][j]), n_img)
            losses_s.update(float(m["loss_s"][j]), n_img)
            batch_time.update(dt)
            if _is_primary() and (base_i + j) % args.print_freq == 0:
                progress.display(base_i + j)
        end = time.time()

    i = 0
    while i < args.iters_per_epoch:
        n_sub = min(n_bundle, args.iters_per_epoch - i)
        # Data-order contract (matches the unbundled loop and the reference,
        # train_human.py:267-276): per iteration, fetch source -> draw the
        # s2t gate -> fetch a target batch ONLY if the gate fired. Non-fired
        # iterations get zero style placeholders (never read: the in-step
        # style compute is lax.cond-gated on do_s2t), so bundled and
        # unbundled pretrain consume identical source/target/gate streams.
        host_batches, gates, needs_tpl = [], [], []
        for _j in range(n_sub):
            src = next(source_iter)
            g = gate.draw()
            fired = style_enabled and bool(g[0])
            tgt = next(target_iter) if fired else None
            if device_aug is not None:
                b = device_aug.raw_pretrain_batch(src, tgt)
            else:
                x_s, label_s, weight_s, _meta = src
                style_img = (np.asarray(tgt[4][0], np.float32)
                             if fired else None)
                b = make_source_batch(x_s, label_s, weight_s, style_img)
                if style_enabled and not fired:
                    # same zeros the unbundled loop feeds on non-fired draws
                    b["image_t_style"] = np.zeros_like(b["image_s"])
            host_batches.append(b)
            gates.append(g)
            needs_tpl.append(style_enabled and not fired
                             and device_aug is not None)
        if style_enabled and device_aug is not None:
            if style_tpl is None or any(needs_tpl):
                # placeholder spec: from a real fetched batch when one exists
                # (exact shapes/dtypes), else the pipeline's derivation
                fired_b = next(
                    (b for b, g in zip(host_batches, gates)
                     if style_enabled and bool(g[0])), None)
                if fired_b is not None:
                    spec = device_aug.pretrain_style_template(fired_b)
                    style_tpl = {k: ((np.asarray(fired_b[k]).shape,
                                      np.asarray(fired_b[k]).dtype)
                                     if k in fired_b else v)
                                 for k, v in spec.items()}
                elif style_tpl is None:
                    style_tpl = device_aug.pretrain_style_template(
                        host_batches[0])
            zeros = {k: np.zeros(s, d) for k, (s, d) in style_tpl.items()}
            for b, m in zip(host_batches, needs_tpl):
                if m:
                    b.update(zeros)
        stacked = jax.tree_util.tree_map(_stack_host_leaves, *host_batches)
        if batch_size is None:
            batch_size = jax.tree_util.tree_leaves(stacked)[0].shape[1]
        batch = shard_batch(stacked, mesh, lead_axes=1) if mesh is not None \
            else jax.tree_util.tree_map(jnp.asarray, stacked)
        rngs = jnp.stack([
            jax.random.fold_in(base_rng, epoch * args.iters_per_epoch + i + j)
            for j in range(n_sub)])
        data_time.update(time.time() - end)

        g = np.asarray(gates, np.float64)  # (n, 2)
        state, metrics, _y_last = bundler(
            state, style_params, batch, jnp.float32(lr), rngs,
            jnp.asarray(g[:, 0].astype(bool)),
            jnp.asarray(g[:, 1], jnp.float32))
        if pending is not None:
            flush(pending)
        pending = (i, n_sub, batch_size, metrics)
        i += n_sub
    if pending is not None:
        flush(pending)
    return state


def run_adapt_epoch(state, style_params, adapt_step, mesh, source_iter, target_iter,
                    epoch, lr, args, visualize=None, style_enabled=False,
                    base_rng=None, device_aug: Optional[DeviceAugPipeline] = None,
                    bundler=None):
    """Mean-teacher adaptation epoch (train_human.py:305-458).

    With ``bundler`` (an AdaptStepBundler) and ``args.steps_per_dispatch > 1``
    the epoch runs n iterations per XLA dispatch: batches for the bundle are
    stacked on the host, shipped in one sharded device_put, and scanned on
    device; per-iteration metrics come back stacked, keeping meter/log
    behavior identical. Host RNG draw order is preserved (one gate/alpha
    draw per iteration, in reference order)."""
    batch_time = AverageMeter("Time", ":4.2f")
    data_time = AverageMeter("Data", ":3.1f")
    losses_all = AverageMeter("Loss (all)", ":.4e")
    losses_s = AverageMeter("Loss (s)", ":.4e")
    losses_c = AverageMeter("Loss (c)", ":.4e")
    acc_s = AverageMeter("Acc (s)", ":3.2f")
    progress = ProgressMeter(args.iters_per_epoch,
                             [batch_time, data_time, losses_all, losses_s,
                              losses_c, acc_s],
                             prefix="Epoch: [{}]".format(epoch))

    ctrl, primary = _control_rng(args, epoch)
    s2t = StyleGate(style_enabled, getattr(args, "s2t_freq", 0.0),
                    getattr(args, "s2t_alpha", (0.0, 1.0)), rng=ctrl)
    t2s = StyleGate(style_enabled, getattr(args, "t2s_freq", 0.0),
                    getattr(args, "t2s_alpha", (0.0, 1.0)), rng=ctrl)
    if base_rng is None:
        base_rng = jax.random.PRNGKey(ctrl.randint(0, 2 ** 31 - 1))

    n_bundle = max(1, int(getattr(args, "steps_per_dispatch", 1) or 1))
    if n_bundle > 1 and bundler is not None:
        return _run_adapt_epoch_bundled(
            state, style_params, bundler, mesh, source_iter, target_iter,
            epoch, lr, args, s2t, t2s, base_rng, device_aug, n_bundle,
            [batch_time, data_time, losses_all, losses_s, losses_c, acc_s],
            progress)

    end = time.time()

    # one-deep software pipeline: host decode/augment of batch i+1 overlaps
    # the device step for batch i (see run_pretrain_epoch)
    pending = None

    def flush(item):
        nonlocal end
        i, n, metrics, y_s, src = item
        m = jax.device_get(metrics)
        acc_s.update(float(m["acc_s"]), int(m["acc_cnt"]))
        losses_all.update(float(m["loss_all"]), n)
        losses_s.update(float(m["loss_s"]), n)
        losses_c.update(float(m["loss_c"]), n)
        batch_time.update(time.time() - end)
        end = time.time()
        if primary and i % args.print_freq == 0:
            progress.display(i)
            if visualize is not None:
                from .ops.pck import get_max_preds_np
                from .parallel.distributed import host_local
                pred_s, _ = get_max_preds_np(host_local(y_s).astype(np.float32))
                ratio = args.image_size / args.heatmap_size
                visualize(np.asarray(src[0])[0], pred_s[0] * ratio,
                          "source_{}_pred.jpg".format(i))
                if src[3].get("keypoint2d") is not None:
                    visualize(np.asarray(src[0])[0],
                              np.asarray(src[3]["keypoint2d"])[0],
                              "source_{}_label.jpg".format(i))

    for i in range(args.iters_per_epoch):
        src = next(source_iter)
        tgt = next(target_iter)
        if device_aug is not None:
            # raw canvases only; all views are generated inside the fused
            # step (make_adapt_step(view_builder=...)) — one XLA dispatch
            batch = device_aug.raw_adapt_batch(src, tgt)
            src = (src[0], None, None, {"keypoint2d": None})
        else:
            batch = shard_batch(make_adapt_batch(src, tgt), mesh)
        data_time.update(time.time() - end)

        do_s2t, alpha_s2t = s2t.draw()
        do_t2s, alpha_t2s = t2s.draw()
        rng = jax.random.fold_in(base_rng, epoch * args.iters_per_epoch + i)
        state, metrics, y_s = adapt_step(state, style_params, batch,
                                         jnp.float32(lr), rng,
                                         jnp.bool_(do_s2t), jnp.float32(alpha_s2t),
                                         jnp.bool_(do_t2s), jnp.float32(alpha_t2s))
        if pending is not None:
            flush(pending)
        pending = (i, len(src[0]), metrics, y_s, src)
    if pending is not None:
        flush(pending)
    return state


def _stack_host_leaves(*xs):
    """Stack one leaf across a bundle. uint8 canvases stay uint8 only when
    EVERY sub-batch packed to uint8; a mixed bundle decodes the uint8 ones
    back to the exact f32 canvas (u8/255) first — dtype semantics, not just
    promotion, differ between the two transports."""
    if all(x.dtype == np.uint8 for x in xs):
        return np.stack(xs)
    return np.stack([x.astype(np.float32) / 255.0 if x.dtype == np.uint8 else x
                     for x in xs])


def _run_adapt_epoch_bundled(state, style_params, bundler, mesh, source_iter,
                             target_iter, epoch, lr, args, s2t, t2s, base_rng,
                             device_aug, n_bundle, meters, progress):
    """n-iterations-per-dispatch adaptation epoch (see run_adapt_epoch)."""
    (batch_time, data_time, losses_all, losses_s, losses_c, acc_s) = meters
    batch_size = None
    end = time.time()
    pending = None

    def flush(item):
        nonlocal end
        base_i, n_sub, n_img, metrics = item
        m = jax.device_get(metrics)
        dt = (time.time() - end) / n_sub
        for j in range(n_sub):
            acc_s.update(float(m["acc_s"][j]), int(m["acc_cnt"][j]))
            losses_all.update(float(m["loss_all"][j]), n_img)
            losses_s.update(float(m["loss_s"][j]), n_img)
            losses_c.update(float(m["loss_c"][j]), n_img)
            batch_time.update(dt)
            if _is_primary() and (base_i + j) % args.print_freq == 0:
                progress.display(base_i + j)
        end = time.time()

    i = 0
    while i < args.iters_per_epoch:
        n_sub = min(n_bundle, args.iters_per_epoch - i)
        host_batches, gates = [], []
        for j in range(n_sub):
            src = next(source_iter)
            tgt = next(target_iter)
            if device_aug is not None:
                host_batches.append(
                    device_aug.raw_adapt_batch(src, tgt, device=False))
            else:
                host_batches.append(make_adapt_batch(src, tgt))
            do_s2t, alpha_s2t = s2t.draw()
            do_t2s, alpha_t2s = t2s.draw()
            gates.append((do_s2t, alpha_s2t, do_t2s, alpha_t2s))
        stacked = jax.tree_util.tree_map(_stack_host_leaves, *host_batches)
        if batch_size is None:
            # every leaf is (n_sub, B, ...) after stacking
            batch_size = jax.tree_util.tree_leaves(stacked)[0].shape[1]
        batch = shard_batch(stacked, mesh, lead_axes=1) if mesh is not None \
            else jax.tree_util.tree_map(jnp.asarray, stacked)
        rngs = jnp.stack([
            jax.random.fold_in(base_rng, epoch * args.iters_per_epoch + i + j)
            for j in range(n_sub)])
        data_time.update(time.time() - end)

        g = np.asarray(gates, np.float64)  # (n, 4)
        state, metrics, _y_last = bundler(
            state, style_params, batch, jnp.float32(lr), rngs,
            jnp.asarray(g[:, 0].astype(bool)), jnp.asarray(g[:, 1], jnp.float32),
            jnp.asarray(g[:, 2].astype(bool)), jnp.asarray(g[:, 3], jnp.float32))
        if pending is not None:
            flush(pending)
        pending = (i, n_sub, batch_size, metrics)
        i += n_sub
    if pending is not None:
        flush(pending)
    return state


def run_validate(eval_step, params, stats, val_loader, args, visualize=None,
                 image_size=None, heatmap_size=None, mesh=None):
    """Evaluation loop returning group PCK (train_human.py:461-500).

    With ``mesh``, batches are padded to a multiple of the mesh size and
    sharded over the ('data',) axis, so validation scales with chips like
    training does (the reference validates through the same DataParallel
    models). Padding rows carry zero targets/weights: PCK ignores them
    (GT<=1 rule) and the logged loss is rescaled to the real-row mean.
    """
    batch_time = AverageMeter("Time", ":6.3f")
    losses = AverageMeter("Loss", ":.2e")
    acc = AverageMeterList(list(range(val_loader.dataset.num_keypoints)), ":3.2f",
                           ignore_val=-1)
    progress = ProgressMeter(len(val_loader), [batch_time, losses], prefix="Test: ")

    image_size = image_size or args.image_size
    heatmap_size = heatmap_size or args.heatmap_size
    pad_to = getattr(val_loader, "batch_size", None)
    if mesh is not None and pad_to:
        n = mesh.size
        pad_to = ((pad_to + n - 1) // n) * n
    # multi-process: every process iterates the full (deterministic) val
    # loader for identical meter bookkeeping, but contributes only its
    # contiguous row slice of each padded batch to the global array
    from .parallel import distributed as dist
    from .parallel.mesh import _spans_processes

    # keyed on the MESH, not the global process count: a local/sub-mesh
    # (e.g. the mesh(1) aux pattern) must take the single-process path even
    # inside a multi-process run
    mp = mesh is not None and _spans_processes(mesh)
    if mp and not pad_to:
        raise ValueError("multi-process validation requires a loader batch_size")
    primary = _is_primary()
    end = time.time()

    # multi-deep software pipeline: eval batches are independent, so keep a
    # few dispatched ahead of the scalar readback — hides dispatch/readback
    # latency (significant on tunneled TPUs, harmless elsewhere; results are
    # jax futures anyway). Depth bounds in-flight device memory.
    from collections import deque

    depth = 3
    pending = deque()

    def flush(pending_item):
        nonlocal end
        (i, n_real, x_np, y, loss, acc_per_kpt, meta) = pending_item
        loss, acc_per_kpt = jax.device_get((loss, acc_per_kpt))
        # padded rows carry zero weight, so the device loss sums only real
        # rows but averages over pad_to; rescale so the logged loss matches
        # the reference's per-real-sample mean on the final partial batch
        if pad_to and n_real < pad_to:
            loss = loss * (pad_to / n_real)
        losses.update(float(loss), n_real)
        acc.update(list(np.asarray(acc_per_kpt)), n_real)
        batch_time.update(time.time() - end)
        end = time.time()
        if primary and i % args.val_print_freq == 0:
            progress.display(i)
            if visualize is not None:
                from .ops.pck import get_max_preds_np
                from .parallel.distributed import host_local
                pred, _ = get_max_preds_np(host_local(y).astype(np.float32))
                ratio = image_size / heatmap_size
                visualize(x_np[0], pred[0] * ratio, "val_{}_pred.jpg".format(i))
                visualize(x_np[0], np.asarray(meta["keypoint2d"])[0],
                          "val_{}_label.jpg".format(i))

    for i, (x, label, weight, meta) in enumerate(val_loader):
        x = np.asarray(x, np.float32)
        label = np.asarray(label, np.float32)
        weight = np.asarray(weight, np.float32)
        n_real = len(x)
        if pad_to and n_real < pad_to:
            # pad the final partial batch to a stable shape (avoids a fresh
            # XLA compile); padded rows have all-zero targets, which PCK
            # excludes by the GT<=1 rule, so accuracy is unaffected
            pad = pad_to - n_real
            x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
            label = np.concatenate([label, np.zeros((pad,) + label.shape[1:], label.dtype)])
            weight = np.concatenate([weight, np.zeros((pad,) + weight.shape[1:], weight.dtype)])
        if mesh is not None:
            rows = dist.local_rows(pad_to, mesh) if mp else slice(None)
            x_d, label_d, weight_d = shard_batch(
                [x[rows], label[rows], weight[rows]], mesh)
        else:
            x_d, label_d, weight_d = jnp.asarray(x), jnp.asarray(label), jnp.asarray(weight)
        y, loss, acc_per_kpt = eval_step(params, stats, x_d, label_d, weight_d)
        pending.append((i, n_real, x, y, loss, acc_per_kpt, meta))
        if len(pending) >= depth:
            flush(pending.popleft())
    while pending:
        flush(pending.popleft())
    return val_loader.dataset.group_accuracy(acc.average())
