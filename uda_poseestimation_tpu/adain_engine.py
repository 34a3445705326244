"""AdaIN decoder pretraining engine — twin of adain/train/train_{human,animal}.py.

Trains only the decoder with Adam(lr=1e-5) on content + mean/std style losses
(the adain/net.py variant), with the reference's 50/50 random content/style
swap between source and target batches, per-iteration text log lines of the
same format, side-by-side PNG dumps every ``log_img_interval``, and decoder
checkpoints saved as ``decoder_<exp>.pth.tar`` every ``save_model_interval``.
The ``adjust_learning_rate`` decay (lr/(1+5e-5*iter)) exists upstream but is
never called — constant LR is preserved (SURVEY.md appendix).

The whole forward+backward runs as one jitted step; the frozen VGG encoder
parameters are donated as constants.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
from PIL import Image

from .models.style_net import StyleNet


def load_encoder_params(vgg_path: str, rng_if_missing=None):
    """VGG-normalised encoder params from a torch file, or random fallback."""
    if vgg_path and os.path.exists(vgg_path):
        from tools.port_torch_weights import _load_torch, convert_vgg_encoder
        return convert_vgg_encoder(_load_torch(vgg_path))
    print(f"WARNING: vgg weights not found at {vgg_path!r}; "
          "using randomly-initialized encoder (style losses will be meaningless)")
    style = StyleNet(style_loss_kind="meanstd")
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    rng = rng_if_missing if rng_if_missing is not None else jax.random.PRNGKey(0)
    return jax.jit(lambda r: style.init(r, dummy, dummy))(rng)["params"]["encoder"]


def make_decoder_step(content_weight: float, style_weight: float, lr: float,
                      tx=None):
    """The jitted decoder-training step (adain/train/train_human.py:208-215).

    ``tx`` defaults to the reference's Adam(lr); tests inject SGD to compare
    post-step parameter deltas (linear in the gradient) against the torch
    oracle without Adam's sign(g) noise amplification."""
    style = StyleNet(style_loss_kind="meanstd")
    if tx is None:
        tx = optax.adam(lr)

    @jax.jit
    def step(decoder_params, opt_state, encoder_params, content, style_imgs):
        def loss_fn(dec_params):
            loss_c, loss_s, g_t = style.apply(
                {"params": {"encoder": encoder_params, "decoder": dec_params}},
                content, style_imgs, 1.0)
            loss_c = content_weight * loss_c
            loss_s = style_weight * loss_s
            return loss_c + loss_s, (loss_c, loss_s, g_t)

        (loss, (loss_c, loss_s, g_t)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(decoder_params)
        updates, opt_state = tx.update(grads, opt_state, decoder_params)
        decoder_params = optax.apply_updates(decoder_params, updates)
        return decoder_params, opt_state, loss, loss_c, loss_s, g_t

    return step, tx


def _pick_decoder_mesh(batch_size: int):
    """Largest local ('data',) mesh that divides the batch, or None.

    The reference's AdaIN trainers are single-GPU (adain/train/
    train_human.py:162 — plain ``.to(device)``, no DataParallel); on TPU the
    same decoder step shards the batch across all local chips via GSPMD
    (params replicated, gradients all-reduced over ICI) with identical
    semantics — the content/style losses are plain batch means and the
    encoder/decoder carry no cross-sample state (no BatchNorm)."""
    import jax
    import numpy as _np
    from jax.sharding import Mesh

    devices = jax.local_devices()  # LOCAL: this trainer is single-process
    n = len(devices)
    while n > 1 and batch_size % n:
        n -= 1
    if n <= 1:
        return None
    return Mesh(_np.asarray(devices[:n]), ("data",))


def save_side_by_side(path, g_t, content, style_img, denormalize):
    """Concatenate (stylized | content | style) horizontally like save_image."""
    ims = [np.clip(denormalize(np.asarray(x)), 0, 1) for x in (g_t, content, style_img)]
    im = np.concatenate(ims, axis=1)  # HWC, concat width
    Image.fromarray((im * 255).astype(np.uint8)).save(path)


def run_decoder_training(args, source_iter, target_iter, denormalize,
                         get_target_view=lambda tgt: tgt[4][0],
                         get_source_image=lambda src: src[0],
                         mesh="auto"):
    exp_name = args.exp_name
    log_root = "logs/" + exp_name
    save_model_dir = Path(os.path.join(log_root, args.save_model_dir))
    save_model_dir.mkdir(exist_ok=True, parents=True)
    Path(log_root).mkdir(exist_ok=True, parents=True)
    fname = os.path.join(log_root, "log_" + exp_name + ".txt")
    out = os.path.join(log_root, "save_imgs/save_img_" + exp_name + "/")
    os.makedirs(out, exist_ok=True)
    open(fname, "w").close()

    encoder_params = load_encoder_params(getattr(args, "vgg_resolved", None)
                                         or args.vgg)
    style = StyleNet(style_loss_kind="meanstd")
    dummy = jnp.zeros((1, args.image_size, args.image_size, 3), jnp.float32)
    decoder_params = jax.jit(lambda r: style.init(r, dummy, dummy))(
        jax.random.PRNGKey(0))["params"]["decoder"]

    step, tx = make_decoder_step(args.content_weight, args.style_weight, args.lr)
    opt_state = tx.init(decoder_params)

    # one-deep software pipeline (same pattern as the trainer epoch loops):
    # iteration i's losses/g_t are read back only AFTER iteration i+1 is
    # dispatched, so host decode + the per-iteration log write overlap the
    # device step instead of blocking on a D2H round trip every iteration
    # (the reference runs this loop for 160k iterations,
    # adain/train/train_human.py:191-235). Log lines and PNG dumps are
    # byte-identical, written one iteration later in wall time.
    pending = None

    def flush(item):
        j, loss, loss_c, loss_s, g_t, content0, style0 = item
        with open(fname, "a") as f:
            f.write("iter: " + str(j) + ", decoder_loss: " + str(float(loss))
                    + ", content loss: " + str(float(loss_c))
                    + ", style loss: " + str(float(loss_s)) + "\n")
        if j % args.log_img_interval == 0:
            save_side_by_side(out + str(j) + ".png", np.asarray(g_t)[0],
                              content0, style0, denormalize)

    i = 0
    for _ in range(args.max_iter):
        src = next(source_iter)
        tgt = next(target_iter)
        source_image = np.asarray(get_source_image(src), np.float32)
        target_image = np.asarray(get_target_view(tgt), np.float32)

        if np.random.rand() > 0.5:
            content_images, style_images = source_image, target_image
        else:
            content_images, style_images = target_image, source_image

        if i == 0:
            if mesh == "auto":
                # resolved on the first batch: its leading dim is the true
                # loader batch (the human pair hardcodes 4 regardless of
                # --batch_size, matching the reference)
                mesh = _pick_decoder_mesh(len(content_images))
            if mesh is not None:
                from .parallel import replicate
                encoder_params = replicate(encoder_params, mesh)
                decoder_params = replicate(decoder_params, mesh)
                opt_state = replicate(opt_state, mesh)
                print(f"decoder training sharded over {mesh.size} devices")
        if mesh is not None:
            from .parallel import shard_batch
            content_d, style_d = shard_batch(
                [content_images, style_images], mesh)
        else:
            content_d = jnp.asarray(content_images)
            style_d = jnp.asarray(style_images)

        decoder_params, opt_state, loss, loss_c, loss_s, g_t = step(
            decoder_params, opt_state, encoder_params, content_d, style_d)

        if pending is not None:
            flush(pending)
        pending = (i, loss, loss_c, loss_s, g_t,
                   content_images[0], style_images[0])

        if (i + 1) % args.save_model_interval == 0 or (i + 1) == args.max_iter:
            # torch-readable, in the reference's exact on-disk format: a raw
            # Sequential-index decoder state_dict (adain/train/
            # train_human.py:228-232), so reference tooling can consume it
            import torch

            from tools.port_torch_weights import export_decoder
            save_name = os.path.join(save_model_dir, "decoder_" + exp_name + ".pth.tar")
            torch.save(export_decoder(
                jax.tree_util.tree_map(np.asarray, decoder_params)), save_name)
        i += 1
        if i >= args.max_iter:
            break
    if pending is not None:
        flush(pending)
