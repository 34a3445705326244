"""Numeric parity of ported torch weights: a torch oracle of the reference's
PoseResNet (torchvision-equivalent Bottleneck ResNet-50 + Simple-Baseline
deconv head) and VGG/decoder is built with plain torch.nn, its state_dict is
converted through tools.port_torch_weights, and the Flax forward must match
the torch forward in eval mode."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import jax
import jax.numpy as jnp

from tools.port_torch_weights import (
    convert_decoder,
    convert_pose_resnet,
    convert_vgg_encoder,
)
from uda_poseestimation_tpu.models import Decoder, StyleNet, VGGEncoder, pose_resnet50


# --- torch oracle: torchvision-style Bottleneck ResNet-50 (v1) --------------

class TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNetHeadless(tnn.Module):
    def __init__(self, blocks=(3, 4, 6, 3)):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, blocks[0])
        self.layer2 = self._make_layer(128, blocks[1], stride=2)
        self.layer3 = self._make_layer(256, blocks[2], stride=2)
        self.layer4 = self._make_layer(512, blocks[3], stride=2)

    def _make_layer(self, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4))
        layers = [TorchBottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(TorchBottleneck(self.inplanes, planes))
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


class TorchPoseResNet(tnn.Module):
    def __init__(self, num_keypoints, blocks=(3, 4, 6, 3)):
        super().__init__()
        self.backbone = TorchResNetHeadless(blocks)
        layers = []
        in_c = 2048
        for _ in range(3):
            layers += [tnn.ConvTranspose2d(in_c, 256, 4, stride=2, padding=1, bias=False),
                       tnn.BatchNorm2d(256), tnn.ReLU(inplace=True)]
            in_c = 256
        self.upsampling = tnn.Sequential(*layers)
        self.head = tnn.Conv2d(256, num_keypoints, 1)

    def forward(self, x):
        return self.head(self.upsampling(self.backbone(x)))


def _randomize_bn_stats(module, gen):
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=gen) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=gen) + 0.5)


def test_pose_resnet_port_matches_torch():
    gen = torch.Generator().manual_seed(0)
    ref = TorchPoseResNet(num_keypoints=5)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        _randomize_bn_stats(ref, gen)
    ref.eval()

    x = torch.randn(2, 3, 64, 64, generator=gen)
    with torch.no_grad():
        y_ref = ref(x).numpy()

    variables = convert_pose_resnet(ref.state_dict())
    model = pose_resnet50(num_keypoints=5)
    # sanity: ported tree matches the model's own init structure
    init_vars = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    ported_paths = {jax.tree_util.keystr(p) for p, _ in
                    jax.tree_util.tree_flatten_with_path(variables["params"])[0]}
    init_paths = {jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(init_vars["params"])[0]}
    assert ported_paths == init_paths

    x_jax = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    y = model.apply({"params": variables["params"],
                     "batch_stats": variables["batch_stats"]}, x_jax, train=False)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=5e-4, rtol=1e-3)


# --- full reference checkpoint round-trip ------------------------------------
# The reference writes best_pt/best as
#   {'student': sd, 'teacher': sd, 'stu_optimizer': ..., 'lr_scheduler': ...,
#    'epoch': e, 'args': Namespace}  (train_human.py:226-237)
# with DataParallel 'module.'-prefixed keys. Build exactly that file with
# torch.save, load it through load_reference_checkpoint, and check the full
# load -> forward -> PCK path for both pose_resnet50 and pose_resnet101.

@pytest.mark.parametrize("blocks,factory_name", [
    ((3, 4, 6, 3), "pose_resnet50"),
    ((3, 4, 23, 3), "pose_resnet101"),
])
def test_reference_checkpoint_roundtrip(tmp_path, blocks, factory_name):
    import argparse

    from tools.port_torch_weights import load_reference_checkpoint
    from uda_poseestimation_tpu import models as model_zoo
    from uda_poseestimation_tpu.ops import generate_target_batch
    from uda_poseestimation_tpu.ops.pck import accuracy

    num_kpts = 5
    gen = torch.Generator().manual_seed(2)
    student = TorchPoseResNet(num_kpts, blocks)
    teacher = TorchPoseResNet(num_kpts, blocks)
    with torch.no_grad():
        for m in (student, teacher):
            for p in m.parameters():
                p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
            _randomize_bn_stats(m, gen)
    student.eval()
    teacher.eval()

    def dp_state_dict(m):  # DataParallel(m).state_dict() key layout
        return {"module." + k: v for k, v in m.state_dict().items()}

    path = tmp_path / "best_pt.pth"
    torch.save({
        "student": dp_state_dict(student),
        "teacher": dp_state_dict(teacher),
        "stu_optimizer": {"state": {}, "param_groups": []},
        "lr_scheduler": {"last_epoch": 3},
        "epoch": 3,
        "args": argparse.Namespace(arch=factory_name, image_size=64),
    }, str(path))

    ckpt = load_reference_checkpoint(str(path))
    assert ckpt["epoch"] == 3
    assert ckpt["args"]["arch"] == factory_name

    model = getattr(model_zoo, factory_name)(num_keypoints=num_kpts)
    x = torch.randn(2, 3, 64, 64, generator=gen)
    x_jax = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))

    rng = np.random.RandomState(0)
    kp = rng.uniform(8, 56, size=(2, num_kpts, 2)).astype(np.float32)
    target, _ = generate_target_batch(kp, np.ones((2, num_kpts), np.float32),
                                      (16, 16), 2.0, (64, 64))
    target = np.asarray(target)

    for role, torch_model in (("student", student), ("teacher", teacher)):
        with torch.no_grad():
            y_ref = torch_model(x).numpy()
        y = np.asarray(model.apply(
            {"params": ckpt[role]["params"],
             "batch_stats": ckpt[role]["batch_stats"]}, x_jax, train=False))
        np.testing.assert_allclose(y, y_ref, atol=5e-4, rtol=1e-3)
        _, avg_ref, _, _ = accuracy(y_ref, target)
        _, avg, _, _ = accuracy(y, target)
        assert avg == pytest.approx(avg_ref)


# --- write direction: framework checkpoints must be torch-readable ----------
# SURVEY §5 checkpoint contract: reference-side tooling torch.loads
# best_pt.pth/best.pth and load_state_dicts the model entries
# (train_human.py:226-237). save_checkpoint writes exactly that; round trip
# through convert_pose_resnet must be bit-exact (pure transposes).

def test_framework_checkpoint_torch_readable(tmp_path):
    import optax

    from uda_poseestimation_tpu.utils.checkpoint import (
        filtered_update,
        load_checkpoint,
        save_checkpoint,
    )

    num_kpts = 4
    model = pose_resnet50(num_keypoints=num_kpts)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    # distinguishable teacher + non-trivial optimizer state
    teacher = jax.tree_util.tree_map(lambda x: x + 0.01, variables["params"])
    tx = optax.scale_by_adam()
    opt_state = tx.init(variables["params"])
    grads = jax.tree_util.tree_map(jnp.ones_like, variables["params"])
    _, opt_state = tx.update(grads, opt_state, variables["params"])

    path = str(tmp_path / "best_pt.pth")
    save_checkpoint(path, {
        "student": {"params": variables["params"],
                    "batch_stats": variables["batch_stats"]},
        "teacher": {"params": teacher,
                    "batch_stats": variables["batch_stats"]},
        "stu_optimizer": opt_state,
        "lr_scheduler": {"epoch": 2, "milestones": [45, 60], "gamma": 0.1},
        "epoch": 2,
        "args": {"arch": "pose_resnet50"},
    })

    # 1) plain torch.load sees the reference's contract: module.-prefixed
    #    torch-tensor state dicts that load_state_dict into a torch model
    raw = torch.load(path, map_location="cpu", weights_only=False)
    assert set(raw) >= {"student", "teacher", "stu_optimizer",
                        "lr_scheduler", "epoch", "args"}
    sd = raw["student"]
    assert all(k.startswith("module.") for k in sd)
    assert all(isinstance(v, torch.Tensor) for v in sd.values())
    ref_model = TorchPoseResNet(num_keypoints=num_kpts)
    ref_model.load_state_dict({k[len("module."):]: v for k, v in sd.items()})
    ref_model.eval()

    # 2) the torch forward matches our forward under the written weights
    gen = torch.Generator().manual_seed(7)
    x = torch.randn(2, 3, 64, 64, generator=gen)
    with torch.no_grad():
        y_ref = ref_model(x).numpy()
    y = np.asarray(model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=False))
    np.testing.assert_allclose(y, y_ref, atol=5e-4, rtol=1e-3)

    # 3) re-porting to Flax is bit-exact for every leaf (student AND teacher)
    ckpt = load_checkpoint(path)
    for role, src in (("student", variables["params"]), ("teacher", teacher)):
        merged = filtered_update(jax.tree_util.tree_map(np.asarray, src),
                                 ckpt[role]["params"])
        for a, b in zip(jax.tree_util.tree_leaves(merged),
                        jax.tree_util.tree_leaves(
                            jax.tree_util.tree_map(np.asarray, src))):
            np.testing.assert_array_equal(a, b)

    # 4) optimizer state round-trips through the resume path
    import flax.serialization
    restored = flax.serialization.from_state_dict(opt_state,
                                                  ckpt["stu_optimizer"])
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ckpt["epoch"] == 2


def test_decoder_checkpoint_torch_readable(tmp_path):
    """export_decoder writes the reference's raw Sequential-index state_dict
    (adain/train/train_human.py:228-232); torch.load + our own
    load_style_net_params-style convert must round-trip bit-exactly."""
    from tools.port_torch_weights import export_decoder

    decoder = Decoder()
    params = decoder.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 8, 8, 512)))["params"]
    path = str(tmp_path / "decoder_test.pth.tar")
    torch.save(export_decoder(jax.tree_util.tree_map(np.asarray, params)), path)

    sd = torch.load(path, map_location="cpu", weights_only=False)
    ref_dec = _torch_decoder()
    ref_dec.load_state_dict(sd, strict=False)  # pads/relus have no params
    assert set(sd) == {f"{i}.{p}" for i in (1, 5, 8, 11, 14, 18, 21, 25, 28)
                       for p in ("weight", "bias")}

    back = convert_decoder(sd)
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(back)[0],
                   key=lambda t: jax.tree_util.keystr(t[0])),
            sorted(jax.tree_util.tree_flatten_with_path(params)[0],
                   key=lambda t: jax.tree_util.keystr(t[0]))):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# --- VGG encoder / decoder oracle -------------------------------------------

def _torch_vgg31():
    return tnn.Sequential(
        tnn.Conv2d(3, 3, 1), tnn.ReflectionPad2d(1), tnn.Conv2d(3, 64, 3), tnn.ReLU(),
        tnn.ReflectionPad2d(1), tnn.Conv2d(64, 64, 3), tnn.ReLU(),
        tnn.MaxPool2d(2, 2, ceil_mode=True),
        tnn.ReflectionPad2d(1), tnn.Conv2d(64, 128, 3), tnn.ReLU(),
        tnn.ReflectionPad2d(1), tnn.Conv2d(128, 128, 3), tnn.ReLU(),
        tnn.MaxPool2d(2, 2, ceil_mode=True),
        tnn.ReflectionPad2d(1), tnn.Conv2d(128, 256, 3), tnn.ReLU(),
        tnn.ReflectionPad2d(1), tnn.Conv2d(256, 256, 3), tnn.ReLU(),
        tnn.ReflectionPad2d(1), tnn.Conv2d(256, 256, 3), tnn.ReLU(),
        tnn.ReflectionPad2d(1), tnn.Conv2d(256, 256, 3), tnn.ReLU(),
        tnn.MaxPool2d(2, 2, ceil_mode=True),
        tnn.ReflectionPad2d(1), tnn.Conv2d(256, 512, 3), tnn.ReLU(),
    )


def _torch_decoder():
    up = lambda: tnn.Upsample(scale_factor=2, mode="nearest")
    pad = lambda: tnn.ReflectionPad2d(1)
    return tnn.Sequential(
        pad(), tnn.Conv2d(512, 256, 3), tnn.ReLU(), up(),
        pad(), tnn.Conv2d(256, 256, 3), tnn.ReLU(),
        pad(), tnn.Conv2d(256, 256, 3), tnn.ReLU(),
        pad(), tnn.Conv2d(256, 256, 3), tnn.ReLU(),
        pad(), tnn.Conv2d(256, 128, 3), tnn.ReLU(), up(),
        pad(), tnn.Conv2d(128, 128, 3), tnn.ReLU(),
        pad(), tnn.Conv2d(128, 64, 3), tnn.ReLU(), up(),
        pad(), tnn.Conv2d(64, 64, 3), tnn.ReLU(),
        pad(), tnn.Conv2d(64, 3, 3),
    )


def test_vgg_and_decoder_port_match_torch():
    gen = torch.Generator().manual_seed(1)
    vgg = _torch_vgg31()
    dec = _torch_decoder()
    with torch.no_grad():
        for m in list(vgg.modules()) + list(dec.modules()):
            if isinstance(m, tnn.Conv2d):
                m.weight.copy_(torch.randn(m.weight.shape, generator=gen) * 0.05)
                m.bias.copy_(torch.randn(m.bias.shape, generator=gen) * 0.05)
    vgg.eval()
    dec.eval()

    x = torch.randn(1, 3, 33, 47, generator=gen)  # odd sizes hit ceil-mode pooling
    with torch.no_grad():
        feat_ref = vgg(x).numpy()
        g_ref = dec(torch.tensor(feat_ref)).numpy()

    enc_params = convert_vgg_encoder(vgg.state_dict())
    encoder = VGGEncoder()
    x_jax = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    feat = encoder.apply({"params": enc_params}, x_jax)
    np.testing.assert_allclose(np.asarray(feat).transpose(0, 3, 1, 2), feat_ref,
                               atol=2e-4, rtol=1e-3)

    dec_params = convert_decoder(dec.state_dict())
    decoder = Decoder()
    g = decoder.apply({"params": dec_params}, jnp.asarray(feat_ref.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2), g_ref,
                               atol=2e-4, rtol=1e-3)


def test_restore_train_state_resume_and_pretrain():
    """restore_train_state applies the reference's key-filtered resume/
    pretrain loads (/root/reference/train_human.py:153-167, 240-257 and
    train_animal.py:155-162 — note animal resume DOES restore stu_optimizer,
    :159) and must return a state whose every leaf is back on the mesh,
    fully replicated — filtered_update leaves host numpy arrays behind."""
    import flax.serialization

    from uda_poseestimation_tpu.parallel import (
        StepConfig, create_state, make_mesh, replicate)
    from uda_poseestimation_tpu.utils.checkpoint import restore_train_state

    cfg = StepConfig(image_size=32, heatmap_size=8, sigma=2.0)
    model = pose_resnet50(num_keypoints=3)
    mesh = make_mesh(2)
    state = replicate(create_state(model, jax.random.PRNGKey(0), cfg,
                                   batch_size=2), mesh)

    bump = lambda d: jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float32) + 1.0, d)
    stu = {"params": bump(state.student_params),
           "batch_stats": bump(state.student_stats)}
    tea = {"params": jax.tree_util.tree_map(
               lambda x: np.asarray(x, np.float32) + 2.0, state.student_params),
           "batch_stats": bump(state.teacher_stats)}
    opt_sd = flax.serialization.to_state_dict(
        jax.tree_util.tree_map(lambda x: np.asarray(x) + 3.0, state.opt_state))
    ckpt = {"student": stu, "teacher": tea, "stu_optimizer": opt_sd, "epoch": 4}

    logs = []
    restored = restore_train_state(state, ckpt, mesh, load_optimizer=True,
                                   log=logs.append)
    assert not logs
    for leaf in jax.tree_util.tree_leaves(restored):
        assert isinstance(leaf, jax.Array) and leaf.sharding.is_fully_replicated
    for a, b in zip(jax.tree_util.tree_leaves(restored.student_params),
                    jax.tree_util.tree_leaves(stu["params"])):
        np.testing.assert_array_equal(np.asarray(a), b)
    for a, b in zip(jax.tree_util.tree_leaves(restored.teacher_params),
                    jax.tree_util.tree_leaves(tea["params"])):
        np.testing.assert_array_equal(np.asarray(a), b)
    # optimizer state restored (count leaf = 0+3 from the bump)
    for a, b in zip(jax.tree_util.tree_leaves(restored.opt_state),
                    jax.tree_util.tree_leaves(
                        jax.tree_util.tree_map(lambda x: np.asarray(x) + 3.0,
                                               state.opt_state))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # pretrain path: teacher initialized FROM the student entry
    restored_pt = restore_train_state(state, ckpt, mesh,
                                      teacher_source="student")
    for a, b in zip(jax.tree_util.tree_leaves(restored_pt.teacher_params),
                    jax.tree_util.tree_leaves(stu["params"])):
        np.testing.assert_array_equal(np.asarray(a), b)
    # optimizer untouched when load_optimizer=False
    for a, b in zip(jax.tree_util.tree_leaves(restored_pt.opt_state),
                    jax.tree_util.tree_leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # incompatible optimizer tree: logged, fresh state kept, no raise
    bad = dict(ckpt, stu_optimizer={"nonsense": np.zeros(3)})
    restored_bad = restore_train_state(state, bad, mesh, load_optimizer=True,
                                       log=logs.append)
    assert logs and "optimizer" in logs[0]
    for a, b in zip(jax.tree_util.tree_leaves(restored_bad.opt_state),
                    jax.tree_util.tree_leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
