"""Convert reference torch checkpoints into this framework's Flax pytrees
(and back — the export direction keeps our checkpoints torch-readable).

Covers every torch artifact the reference consumes or produces:

- torchvision ImageNet ResNet state dicts -> headless backbone variables
  (lib/models/resnet.py:52-62 load path);
- reference PoseResNet train checkpoints (``best_pt.pth`` / ``best.pth``
  dicts with DataParallel 'module.' prefixes, train_human.py:226-237);
- ``vgg_normalised.pth`` -> VGGEncoder (Style_net.py:64-118, truncated @31);
- AdaIN decoder state dicts -> Decoder (Style_net.py:32-62).

Export half (``export_*``): exact inverses of the converters, producing
``module.``-prefixed state dicts of torch tensors so reference-side tooling
can ``torch.load`` and ``load_state_dict`` artifacts this framework writes
(utils/checkpoint.py uses these for ``best_pt.pth`` / ``best.pth``; the AdaIN
engine for ``decoder_<exp>.pth.tar``). Round trips are bit-exact — every
mapping is a pure transpose.

Layout rules: torch conv OIHW -> flax HWIO; torch ConvTranspose2d
(in, out, kh, kw) -> our Deconv kernel (kh, kw, in, out); BatchNorm
weight/bias -> scale/bias params, running_mean/var -> batch_stats mean/var.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _load_torch(path):
    import torch
    return torch.load(path, map_location="cpu", weights_only=False)


def _np(t):
    # copy=True: tensor.numpy() SHARES storage with the live torch module, so
    # a view here silently tracks any later in-place torch mutation (e.g. a
    # test's oracle opt.step() run between convert and consume).
    return np.array(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _conv(w):
    return _np(w).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _deconv(w):
    return _np(w).transpose(2, 3, 0, 1)  # (in, out, kh, kw) -> (kh, kw, in, out)


def _set(tree, path, value):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _strip_prefix(sd, prefix):
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


# ---------------------------------------------------------------------------
# ResNet backbone
# ---------------------------------------------------------------------------

def convert_resnet_backbone(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """torchvision ResNet state_dict -> (params, batch_stats) for our ResNet."""
    params: dict = {}
    stats: dict = {}

    def bn(src_key, dst):
        _set(params, dst + ("scale",), _np(sd[src_key + ".weight"]))
        _set(params, dst + ("bias",), _np(sd[src_key + ".bias"]))
        _set(stats, dst + ("mean",), _np(sd[src_key + ".running_mean"]))
        _set(stats, dst + ("var",), _np(sd[src_key + ".running_var"]))

    _set(params, ("conv1", "kernel"), _conv(sd["conv1.weight"]))
    bn("bn1", ("bn1",))

    stage_sizes = {}
    for k in sd:
        if k.startswith("layer"):
            stage = int(k[5])
            block = int(k.split(".")[1])
            stage_sizes[stage] = max(stage_sizes.get(stage, 0), block + 1)

    for stage, n_blocks in sorted(stage_sizes.items()):
        for i in range(n_blocks):
            src = f"layer{stage}.{i}"
            dst = f"layer{stage}_{i}"
            for conv_i in (1, 2, 3):
                key = f"{src}.conv{conv_i}.weight"
                if key not in sd:
                    continue
                _set(params, (dst, f"conv{conv_i}", "kernel"), _conv(sd[key]))
                bn(f"{src}.bn{conv_i}", (dst, f"bn{conv_i}"))
            if f"{src}.downsample.0.weight" in sd:
                _set(params, (dst, "downsample_conv", "kernel"),
                     _conv(sd[f"{src}.downsample.0.weight"]))
                bn(f"{src}.downsample.1", (dst, "downsample_bn"))
    return params, stats


# ---------------------------------------------------------------------------
# PoseResNet (backbone + Upsampling + head)
# ---------------------------------------------------------------------------

def convert_pose_resnet(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Reference PoseResNet state_dict -> {'params', 'batch_stats'}.

    Accepts raw or DataParallel ('module.'-prefixed) state dicts.
    """
    if any(k.startswith("module.") for k in sd):
        sd = _strip_prefix(sd, "module.")

    backbone_sd = _strip_prefix(sd, "backbone.")
    b_params, b_stats = convert_resnet_backbone(backbone_sd)

    params = {"backbone": b_params}
    stats = {"backbone": b_stats}

    up_params: dict = {}
    up_stats: dict = {}
    # reference Upsampling Sequential: deconv at 0/3/6 (+bias variant), bn at 1/4/7
    for i, (conv_idx, bn_idx) in enumerate(((0, 1), (3, 4), (6, 7))):
        _set(up_params, (f"deconv{i}", "kernel"),
             _deconv(sd[f"upsampling.{conv_idx}.weight"]))
        if f"upsampling.{conv_idx}.bias" in sd:
            _set(up_params, (f"deconv{i}", "bias"), _np(sd[f"upsampling.{conv_idx}.bias"]))
        _set(up_params, (f"bn{i}", "scale"), _np(sd[f"upsampling.{bn_idx}.weight"]))
        _set(up_params, (f"bn{i}", "bias"), _np(sd[f"upsampling.{bn_idx}.bias"]))
        _set(up_stats, (f"bn{i}", "mean"), _np(sd[f"upsampling.{bn_idx}.running_mean"]))
        _set(up_stats, (f"bn{i}", "var"), _np(sd[f"upsampling.{bn_idx}.running_var"]))
    params["upsampling"] = up_params
    stats["upsampling"] = up_stats

    params["head"] = {"kernel": _conv(sd["head.weight"]), "bias": _np(sd["head.bias"])}
    return {"params": params, "batch_stats": stats}


def load_reference_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference train checkpoint dict and convert the model entries."""
    ckpt = _load_torch(path)
    out: Dict[str, Any] = {}
    for key in ("student", "teacher"):
        if key in ckpt:
            entry = ckpt[key]
            if isinstance(entry, dict) and "params" in entry:
                # our own raw-pytree fallback for non-PoseResNet models
                # (utils/checkpoint.py save_checkpoint)
                out[key] = entry
            else:
                out[key] = convert_pose_resnet(entry)
    for key in ("epoch",):
        if key in ckpt:
            out[key] = ckpt[key]
    if "args" in ckpt:
        try:
            out["args"] = vars(ckpt["args"])
        except TypeError:
            out["args"] = ckpt["args"]
    if ckpt.get("format") == "uda_poseestimation_tpu":
        # our own torch-format checkpoint: the optax optimizer state rides
        # along as a nested numpy state dict (utils/checkpoint.py)
        if "stu_optimizer" in ckpt:
            out["stu_optimizer"] = ckpt["stu_optimizer"]
        if "lr_scheduler" in ckpt:
            out["lr_scheduler"] = ckpt["lr_scheduler"]
    # reference torch optimizer / lr_scheduler states are torch-specific;
    # resume from them is not supported (the reference itself skips the
    # teacher optimizer).
    return out


# ---------------------------------------------------------------------------
# Export direction: Flax pytrees -> torch state dicts (torch-readable ckpts)
# ---------------------------------------------------------------------------

def _t(arr):
    """numpy/jax array -> contiguous (writable) torch tensor."""
    import torch
    return torch.from_numpy(np.array(np.asarray(arr), copy=True))


def _conv_out(kernel):
    return _t(np.asarray(kernel).transpose(3, 2, 0, 1))  # HWIO -> OIHW


def _deconv_out(kernel):
    return _t(np.asarray(kernel).transpose(2, 3, 0, 1))  # (kh,kw,in,out) -> (in,out,kh,kw)


def export_resnet_backbone(params, stats) -> dict:
    """(params, batch_stats) of our headless ResNet -> torchvision-style
    state_dict entries (inverse of convert_resnet_backbone)."""
    sd: dict = {}

    def bn(src, dst_key):
        sd[dst_key + ".weight"] = _t(src["scale"])
        sd[dst_key + ".bias"] = _t(src["bias"])

    def bn_stats(src, dst_key):
        sd[dst_key + ".running_mean"] = _t(src["mean"])
        sd[dst_key + ".running_var"] = _t(src["var"])

    sd["conv1.weight"] = _conv_out(params["conv1"]["kernel"])
    bn(params["bn1"], "bn1")
    bn_stats(stats["bn1"], "bn1")
    for name in sorted(k for k in params if k.startswith("layer")):
        stage, block = name[5:].split("_")
        dst = f"layer{stage}.{block}"
        p, s = params[name], stats[name]
        for conv_i in (1, 2, 3):
            if f"conv{conv_i}" not in p:
                continue
            sd[f"{dst}.conv{conv_i}.weight"] = _conv_out(p[f"conv{conv_i}"]["kernel"])
            bn(p[f"bn{conv_i}"], f"{dst}.bn{conv_i}")
            bn_stats(s[f"bn{conv_i}"], f"{dst}.bn{conv_i}")
        if "downsample_conv" in p:
            sd[f"{dst}.downsample.0.weight"] = _conv_out(p["downsample_conv"]["kernel"])
            bn(p["downsample_bn"], f"{dst}.downsample.1")
            bn_stats(s["downsample_bn"], f"{dst}.downsample.1")
    return sd


def export_pose_resnet(variables, prefix: str = "module.") -> dict:
    """{'params','batch_stats'} of our PoseResNet -> a reference-compatible
    state_dict (DataParallel 'module.'-prefixed by default, matching what
    train_human.py:226-237 writes). Inverse of convert_pose_resnet."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: dict = {}
    for k, v in export_resnet_backbone(params["backbone"],
                                       stats.get("backbone", {})).items():
        sd["backbone." + k] = v
    up_p = params["upsampling"]
    up_s = stats.get("upsampling", {})
    for i, (conv_idx, bn_idx) in enumerate(((0, 1), (3, 4), (6, 7))):
        sd[f"upsampling.{conv_idx}.weight"] = _deconv_out(up_p[f"deconv{i}"]["kernel"])
        if "bias" in up_p[f"deconv{i}"]:
            sd[f"upsampling.{conv_idx}.bias"] = _t(up_p[f"deconv{i}"]["bias"])
        sd[f"upsampling.{bn_idx}.weight"] = _t(up_p[f"bn{i}"]["scale"])
        sd[f"upsampling.{bn_idx}.bias"] = _t(up_p[f"bn{i}"]["bias"])
        sd[f"upsampling.{bn_idx}.running_mean"] = _t(up_s[f"bn{i}"]["mean"])
        sd[f"upsampling.{bn_idx}.running_var"] = _t(up_s[f"bn{i}"]["var"])
    sd["head.weight"] = _conv_out(params["head"]["kernel"])
    sd["head.bias"] = _t(params["head"]["bias"])
    return {prefix + k: v for k, v in sd.items()}


def export_decoder(params) -> dict:
    """Decoder params -> the reference's Sequential-index state_dict (what
    adain/train/train_human.py:228-232 torch.saves). Inverse of
    convert_decoder."""
    sd: dict = {}
    for idx, name in _DECODER_LAYER_MAP.items():
        leaf = params[name]["Conv_0"] if "Conv_0" in params[name] else params[name]
        sd[f"{idx}.weight"] = _conv_out(leaf["kernel"])
        sd[f"{idx}.bias"] = _t(leaf["bias"])
    return sd


def export_vgg_encoder(params) -> dict:
    """VGGEncoder params -> vgg_normalised-style state_dict (inverse of
    convert_vgg_encoder)."""
    sd: dict = {}
    for idx, name in _VGG_LAYER_MAP.items():
        leaf = params[name] if name == "conv0" else params[name]["Conv_0"]
        sd[f"{idx}.weight"] = _conv_out(leaf["kernel"])
        sd[f"{idx}.bias"] = _t(leaf["bias"])
    return sd


# ---------------------------------------------------------------------------
# VGG encoder / AdaIN decoder
# ---------------------------------------------------------------------------

_VGG_LAYER_MAP = {
    0: "conv0",
    2: "conv1_1",
    5: "conv1_2",
    9: "conv2_1",
    12: "conv2_2",
    16: "conv3_1",
    19: "conv3_2",
    22: "conv3_3",
    25: "conv3_4",
    29: "conv4_1",
}

_DECODER_LAYER_MAP = {
    1: "conv0",
    5: "conv1",
    8: "conv2",
    11: "conv3",
    14: "conv4",
    18: "conv5",
    21: "conv6",
    25: "conv7",
    28: "conv8",
}


def convert_vgg_encoder(sd: Dict[str, Any]) -> dict:
    """vgg_normalised state_dict (Sequential indices) -> VGGEncoder params."""
    params: dict = {}
    for idx, name in _VGG_LAYER_MAP.items():
        w = _conv(sd[f"{idx}.weight"])
        b = _np(sd[f"{idx}.bias"])
        if name == "conv0":
            params[name] = {"kernel": w, "bias": b}
        else:
            params[name] = {"Conv_0": {"kernel": w, "bias": b}}
    return params


def convert_decoder(sd: Dict[str, Any]) -> dict:
    """AdaIN decoder state_dict -> Decoder params."""
    params: dict = {}
    for idx, name in _DECODER_LAYER_MAP.items():
        params[name] = {"Conv_0": {"kernel": _conv(sd[f"{idx}.weight"]),
                                   "bias": _np(sd[f"{idx}.bias"])}}
    return params


def _is_torch_file(path: str) -> bool:
    with open(path, "rb") as f:
        magic = f.read(4)
    return magic[:2] == b"PK" or magic[:1] == b"\x80"


def load_style_net_params(vgg_path: str, decoder_path: str) -> dict:
    """Build StyleNet params from vgg_normalised.pth + a decoder checkpoint.

    Decoder checkpoints may be reference torch state dicts or our own msgpack
    files (written by the adain pretraining CLIs).
    """
    vgg_sd = _load_torch(vgg_path)
    if _is_torch_file(decoder_path):
        decoder_params = convert_decoder(_load_torch(decoder_path))
    else:
        import flax.serialization
        with open(decoder_path, "rb") as f:
            decoder_params = flax.serialization.msgpack_restore(f.read())
    return {"encoder": convert_vgg_encoder(vgg_sd), "decoder": decoder_params}


def main():  # pragma: no cover - CLI utility
    import argparse

    import flax.serialization

    parser = argparse.ArgumentParser(description="Port torch checkpoints to Flax msgpack")
    parser.add_argument("kind", choices=["resnet", "pose_resnet", "vgg", "decoder"])
    parser.add_argument("src")
    parser.add_argument("dst")
    args = parser.parse_args()
    sd = _load_torch(args.src)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if args.kind == "resnet":
        params, stats = convert_resnet_backbone(sd)
        out = {"params": params, "batch_stats": stats}
    elif args.kind == "pose_resnet":
        out = convert_pose_resnet(sd.get("student", sd))
    elif args.kind == "vgg":
        out = {"params": convert_vgg_encoder(sd)}
    else:
        out = {"params": convert_decoder(sd)}
    with open(args.dst, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(out))
    print("wrote", args.dst)


if __name__ == "__main__":  # pragma: no cover
    main()
