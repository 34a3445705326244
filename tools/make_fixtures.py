"""Generate tiny fake datasets for end-to-end trainer smokes.

Fixtures live in /tmp (wiped between sessions); regenerate with:

    python tools/make_fixtures.py rhd /tmp/fake_rhd

The RHD fixture mirrors the on-disk layout RenderedHandPose expects
(reference lib/datasets/rendered_hand_pose.py): RHD_published_v2/
{training,evaluation}/color/*.png + anno_*.pickle with uv_vis/xyz/K. Images
carry a bright blob at each keypoint so short training runs can actually
learn (not just execute).
"""

import os
import pickle
import sys

import numpy as np
from PIL import Image


def _shift_domain(img, xx, yy):
    """Strong appearance shift, geometry preserved — the fixture twin of a
    synthetic->real domain gap (VERDICT r4 item 2): gamma curve, contrast
    squeeze, color cast, and a structured stripe texture. Keypoint blobs
    stay at their locations with their channel identities, so the task is
    unchanged; only the image statistics move."""
    img = img ** 1.7                                   # gamma
    img = 0.28 + 0.5 * img                             # contrast squeeze
    img = img + np.array([0.13, -0.07, 0.05], np.float32)  # color cast
    img = img + 0.10 * np.sin((xx + 0.5 * yy) / 9.0)[..., None]  # texture
    return img


def _shift_domain_hard(img, xx, yy):
    """Harder shift variant (``rhd_shifted_hard``): MULTIPLICATIVE
    multi-orientation texture on top of the global curves. Unlike the
    additive/global v1 shift this is outside the span of the canonical
    ColorJitter augmentation (which rescales blob and background together);
    combined with the SNR-reduced blobs rendered by
    ``make_rhd(shift="hard")`` it produced a gap that source-only training
    still partially bridges while the mean-teacher loop starts to drift on
    the low-SNR pseudo-labels — both outcomes recorded in PERF.md
    (round-5 adaptation-gain drives)."""
    img = img ** 1.5                                   # gamma
    img = 0.24 + 0.6 * img                             # contrast squeeze
    img = img + np.array([0.10, -0.06, 0.04], np.float32)  # color cast
    tex = (0.62 + 0.38 * np.sin((xx + 0.5 * yy) / 7.0)
           * np.sin((yy - 0.7 * xx) / 11.0))
    return img * tex[..., None]                        # local modulation


def make_rhd(root, n_train=96, n_eval=16, size=320, shift=False):
    base = os.path.join(root, "RHD_published_v2")
    for set_name, n, seed in (("training", n_train, 0), ("evaluation", n_eval, 1)):
        color = os.path.join(base, set_name, "color")
        mask = os.path.join(base, set_name, "mask")
        os.makedirs(color, exist_ok=True)
        os.makedirs(mask, exist_ok=True)
        rng = np.random.RandomState(seed + (10 if shift else 0))
        anno = {}
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
        # "hard" also changes the OBJECT appearance: dimmer, broader blobs
        # over a busier background — an SNR reduction no global jitter can
        # mimic (jitter rescales blob and background together)
        amp, sig, bg = (0.62, 8.0, 0.34) if shift == "hard" else (1.0, 6.0, 0.15)
        for i in range(n):
            kp = rng.uniform(60, size - 60, (21, 2)).astype(np.float32)
            img = rng.rand(size, size, 3).astype(np.float32) * bg
            for j in range(21):
                g = np.exp(-((xx - kp[j, 0]) ** 2 + (yy - kp[j, 1]) ** 2) / (2 * sig ** 2))
                img[..., j % 3] += amp * g
            if shift == "hard":
                img = _shift_domain_hard(img, xx, yy)
            elif shift:
                img = _shift_domain(img, xx, yy)
            img = np.clip(img, 0, 1)
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(color, "%.5d.png" % i))
            uv = np.zeros((42, 3))
            uv[:21, :2] = kp
            uv[:21, 2] = 1
            uv[21:, :2] = 5.0  # right hand far away & invisible
            anno[i] = {
                "uv_vis": uv,
                "xyz": rng.rand(42, 3) + 1.0,
                "K": np.array([[320.0, 0, 160], [0, 320.0, 160], [0, 0, 1]]),
            }
        with open(os.path.join(base, set_name, "anno_%s.pickle" % set_name), "wb") as f:
            pickle.dump(anno, f)
    print("fake RHD at", root)


def make_animal(root, n_per_animal=8, frames_per_shot=4):
    """Fake synthetic-animal (source) + TigDog (target) trees.

    Layout (synthetic_animal.py / real_animal.py contracts):
        <root>/animal_data/synthetic_animal/<animal>_combineds5r5_texture/*.png
        <root>/animal_data/clean_data/keypoints_18.json
        <root>/animal_data/behaviorDiscovery2.0/{ranges,landmarks,<animal>}/...
        <root>/cached_data/...   (set UDA_CACHED_DATA_DIR to it)
    """
    import json

    from scipy.io import savemat

    data_dir = os.path.join(root, "animal_data")
    cached = os.path.join(root, "cached_data")
    rng = np.random.RandomState(0)

    # ---- synthetic source -------------------------------------------------
    data = {}
    for animal in ("horse", "tiger"):
        img_dir = os.path.join(data_dir, "synthetic_animal",
                               f"{animal}_combineds5r5_texture")
        os.makedirs(img_dir, exist_ok=True)
        imgpaths, kpts_all, bbox_all = [], [], []
        for i in range(n_per_animal):
            p = os.path.join(img_dir, f"{i:04d}_img.png")
            kp = np.concatenate([rng.uniform(150, 500, (18, 1)),
                                 rng.uniform(100, 380, (18, 1)),
                                 np.ones((18, 1))], axis=1)
            img = rng.rand(480, 640, 3).astype(np.float32) * 0.2
            yy, xx = np.mgrid[0:480, 0:640].astype(np.float32)
            for j in range(18):
                g = np.exp(-((xx - kp[j, 0]) ** 2 + (yy - kp[j, 1]) ** 2)
                           / (2 * 8.0 ** 2))
                img[..., j % 3] += g
            Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(p)
            imgpaths.append(os.path.relpath(p, root))
            kpts_all.append(kp.tolist())
            bbox_all.append([float(kp[:, 0].min()), float(kp[:, 0].max()),
                             float(kp[:, 1].min()), float(kp[:, 1].max())])
        n_train = max(2, int(n_per_animal * 0.75))
        data[animal] = {"keypoints": kpts_all, "imgpath": imgpaths,
                        "bbox": bbox_all,
                        "train_idxs": list(range(n_train)),
                        "valid_idxs": list(range(n_train, n_per_animal))}
        cdir = os.path.join(cached, "synthetic_animal",
                            f"{animal}_combineds5r5_texture")
        os.makedirs(cdir, exist_ok=True)
        import torch
        torch.save({"mean": torch.tensor([0.4, 0.39, 0.38]),
                    "std": torch.tensor([0.25, 0.24, 0.23])},
                   os.path.join(cdir, "mean.pth.tar"))
    alldir = os.path.join(cached, "synthetic_animal", "all_combineds5r5_texture")
    os.makedirs(alldir, exist_ok=True)
    import torch
    torch.save({"mean": torch.tensor([0.3999, 0.3909, 0.3871]),
                "std": torch.tensor([0.2589, 0.2431, 0.2291])},
               os.path.join(alldir, "mean.pth.tar"))
    os.makedirs(os.path.join(data_dir, "clean_data"), exist_ok=True)
    with open(os.path.join(data_dir, "clean_data", "keypoints_18.json"), "w") as f:
        json.dump(data, f)

    # ---- TigDog target ----------------------------------------------------
    for animal in ("horse", "tiger"):
        rdir = os.path.join(data_dir, "behaviorDiscovery2.0", "ranges", animal)
        ldir = os.path.join(data_dir, "behaviorDiscovery2.0", "landmarks", animal)
        idir = os.path.join(data_dir, "behaviorDiscovery2.0", animal)
        for d in (rdir, ldir, idir):
            os.makedirs(d, exist_ok=True)
        ranges, frame = [], 1
        for shot in (1, 2):
            ranges.append([shot, frame, frame + frames_per_shot - 1])
            cells = np.empty((frames_per_shot, 1), dtype=object)
            for fi in range(frames_per_shot):
                kp = np.concatenate([rng.uniform(60, 260, (18, 1)),
                                     rng.uniform(40, 200, (18, 1))], axis=1)
                img = rng.rand(240, 320, 3).astype(np.float32) * 0.2
                yy, xx = np.mgrid[0:240, 0:320].astype(np.float32)
                for j in range(18):
                    g = np.exp(-((xx - kp[j, 0]) ** 2 + (yy - kp[j, 1]) ** 2)
                               / (2 * 6.0 ** 2))
                    img[..., j % 3] += g
                name = "0" * (8 - len(str(frame))) + str(frame) + ".jpg"
                Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
                    os.path.join(idir, name))
                rec = np.zeros((1, 1), dtype=[("coord", "O"), ("vis", "O")])
                rec[0, 0]["coord"] = kp
                rec[0, 0]["vis"] = np.ones((18, 1))
                cells[fi, 0] = rec
                frame += 1
            savemat(os.path.join(ldir, f"{shot}.mat"), {"landmarks": cells})
        savemat(os.path.join(rdir, "ranges.mat"),
                {"ranges": np.asarray(ranges, np.int64)})
        n_frames = 2 * frames_per_shot
        cdir = os.path.join(cached, "real_animal", animal)
        os.makedirs(cdir, exist_ok=True)
        idxs = rng.permutation(n_frames)
        np.save(os.path.join(cdir, "train_idxs_by_video.npy"),
                np.sort(idxs[: n_frames * 3 // 4]))
        np.save(os.path.join(cdir, "valid_idxs_by_video.npy"),
                np.sort(idxs[n_frames * 3 // 4:]))
    print("fake animal data at", root,
          "(set UDA_CACHED_DATA_DIR=%s)" % cached)


def make_style_weights(out_dir="saved_models"):
    """Random-init StyleNet weights in the reference's torch formats:
    vgg_normalised.pth (Sequential state dict) + decoder_rand.pth — enough
    to drive the --decoder-name CLI path (adain transfer with an untrained
    decoder) on testbeds without the real released weights."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from tools.port_torch_weights import export_decoder, export_vgg_encoder
    from uda_poseestimation_tpu.models import StyleNet

    style = StyleNet()
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jax.jit(lambda r: style.init(r, dummy, dummy))(
        jax.random.PRNGKey(0))["params"]
    os.makedirs(out_dir, exist_ok=True)
    torch.save(export_vgg_encoder(params["encoder"]),
               os.path.join(out_dir, "vgg_normalised.pth"))
    torch.save(export_decoder(params["decoder"]),
               os.path.join(out_dir, "decoder_rand.pth"))
    print("random style-net weights at", out_dir)


if __name__ == "__main__":
    kind = sys.argv[1] if len(sys.argv) > 1 else "rhd"
    if kind == "rhd":
        make_rhd(sys.argv[2] if len(sys.argv) > 2 else "/tmp/fake_rhd")
    elif kind == "rhd_shifted":
        # domain-shifted target twin for adaptation-gain drives
        make_rhd(sys.argv[2] if len(sys.argv) > 2 else "/tmp/fake_rhd_shifted",
                 shift=True)
    elif kind == "rhd_shifted_hard":
        # harder shift (multiplicative texture + SNR-reduced blobs); see
        # _shift_domain_hard and the PERF.md round-5 gain-drive notes
        make_rhd(sys.argv[2] if len(sys.argv) > 2
                 else "/tmp/fake_rhd_shifted_hard", shift="hard")
    elif kind == "animal":
        make_animal(sys.argv[2] if len(sys.argv) > 2 else "/tmp/fake_animal")
    elif kind == "style":
        make_style_weights(sys.argv[2] if len(sys.argv) > 2 else "saved_models")
    else:
        raise SystemExit(f"unknown fixture kind {kind}")
