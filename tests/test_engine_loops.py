"""Engine epoch-loop coverage: the pipelined pretrain loop with style
transfer under --device-aug (the style_image path), for both pipeline
flavors. The trainer smokes cover the no-style configurations end to end."""

from types import SimpleNamespace

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from uda_poseestimation_tpu.engine import (
    AnimalDeviceAugPipeline,
    DeviceAugPipeline,
    run_pretrain_epoch,
)
from uda_poseestimation_tpu.models import StyleNet
from uda_poseestimation_tpu.models.pose_resnet import PoseResNet
from uda_poseestimation_tpu.models import resnet as resnet_lib
from uda_poseestimation_tpu.ops import generate_target_batch
from uda_poseestimation_tpu.ops.device_aug import DeviceAugConfig
from uda_poseestimation_tpu.parallel import (
    StepConfig,
    create_state,
    make_mesh,
    make_pretrain_step,
    replicate,
)

B, K, SIZE, HM = 8, 4, 32, 16  # B divisible by the 8-device mesh
MEAN = [0.485, 0.456, 0.406]

pytestmark = pytest.mark.slow  # epoch-loop runs (fast lane skips)
STD = [0.229, 0.224, 0.225]


def _cfg(**kw):
    base = dict(image_size=SIZE, heatmap_size=HM, sigma=1.0, rotation=30,
                shear=(-10, 10), translate=(0.05, 0.05), scale=(0.9, 1.1),
                color=0.0)
    base.update(kw)
    return DeviceAugConfig(**base)


def _src_item(rng):
    x = rng.randint(0, 256, (B, SIZE, SIZE, 3)).astype(np.float32) / 255.0
    kp = rng.uniform(4, SIZE - 4, (B, K, 2)).astype(np.float32)
    tgt, w = generate_target_batch(kp, np.ones((B, K), np.float32),
                                   (HM, HM), 1.0, (SIZE, SIZE))
    return (x, np.asarray(tgt), np.asarray(w), {"keypoint2d": kp})


def _tgt_item(rng):
    canvas = rng.randint(0, 256, (B, SIZE, SIZE, 3)).astype(np.float32) / 255.0
    kp = rng.uniform(4, SIZE - 4, (B, K, 2)).astype(np.float32)
    meta = {"keypoint2d_ori": kp,
            "target_weight_ori": np.ones((B, K, 1), np.float32)}
    teas = [canvas.copy()]
    return (canvas, None, None, meta, teas, None, None, [meta])


class _Forever:
    def __init__(self, make, seed):
        self.make = make
        self.rng = np.random.RandomState(seed)

    def __next__(self):
        return self.make(self.rng)


def test_pretrain_epoch_with_style_and_device_aug():
    cfg = StepConfig(image_size=SIZE, heatmap_size=HM, sigma=1.0, k=1)
    model = PoseResNet(backbone=resnet_lib.ResNet(
        block=resnet_lib.BasicBlock, stage_sizes=[1, 1, 1]), num_keypoints=K)
    state = create_state(model, jax.random.PRNGKey(0), cfg, batch_size=2)
    style = StyleNet()
    dummy = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    style_params = jax.jit(lambda r: style.init(r, dummy, dummy))(
        jax.random.PRNGKey(1))["params"]
    mesh = make_mesh(8)
    state = replicate(state, mesh)
    style_params = replicate(style_params, mesh)

    step = make_pretrain_step(model, cfg, style_model=style)
    pipe = DeviceAugPipeline(_cfg(use_rrc=True), _cfg(use_rrc=False),
                             _cfg(use_rrc=False), k=1, mean=MEAN, std=STD,
                             mesh=mesh)
    args = SimpleNamespace(iters_per_epoch=2, print_freq=10,
                           image_size=SIZE, heatmap_size=HM,
                           s2t_freq=1.0, s2t_alpha=(0.5, 0.5))
    np.random.seed(0)
    state = run_pretrain_epoch(state, style_params, step, mesh,
                               _Forever(_src_item, 1), _Forever(_tgt_item, 2),
                               epoch=0, lr=1e-4, args=args,
                               style_enabled=True, device_aug=pipe)
    assert int(jax.device_get(state.step)) == 2


def test_adapt_epoch_bundled_device_aug():
    """run_adapt_epoch with --steps-per-dispatch > 1: the bundled loop
    (host-stacked raw uint8 canvases, lead_axes=1 sharding, scanned steps,
    stacked metric readback) drives the same engine surface, including a
    trailing partial bundle (iters_per_epoch not divisible by the bundle)."""
    from uda_poseestimation_tpu.engine import run_adapt_epoch
    from uda_poseestimation_tpu.parallel.train_step import AdaptStepBundler

    cfg = StepConfig(image_size=SIZE, heatmap_size=HM, sigma=1.0, k=1)
    model = PoseResNet(backbone=resnet_lib.ResNet(
        block=resnet_lib.BasicBlock, stage_sizes=[1, 1, 1]), num_keypoints=K)
    mesh = make_mesh(8)
    state = replicate(create_state(model, jax.random.PRNGKey(0), cfg,
                                   batch_size=2), mesh)
    pipe = DeviceAugPipeline(_cfg(use_rrc=True), _cfg(use_rrc=False),
                             _cfg(use_rrc=False), k=1, mean=MEAN, std=STD,
                             mesh=mesh)
    bundler = AdaptStepBundler(model, cfg, view_builder=pipe.view_builder,
                               mesh=mesh)
    args = SimpleNamespace(iters_per_epoch=3, print_freq=10,
                           image_size=SIZE, heatmap_size=HM,
                           steps_per_dispatch=2)
    np.random.seed(0)
    state = run_adapt_epoch(state, None, None, mesh,
                            _Forever(_src_item, 3), _Forever(_tgt_item, 4),
                            epoch=0, lr=1e-4, args=args,
                            base_rng=jax.random.PRNGKey(5),
                            device_aug=pipe, bundler=bundler)
    # 3 iterations ran: one bundle of 2 + a partial bundle of 1
    assert int(jax.device_get(state.step)) == 3
    assert set(bundler._jitted) == {2, 1}


def test_pretrain_epoch_bundled_device_aug():
    """run_pretrain_epoch with --steps-per-dispatch > 1: the bundled loop
    stacks raw uint8 canvases (source + style target), scans the pretrain
    step on device with the style image built under the per-iteration s2t
    cond, and handles a trailing partial bundle."""
    from uda_poseestimation_tpu.parallel.train_step import PretrainStepBundler

    cfg = StepConfig(image_size=SIZE, heatmap_size=HM, sigma=1.0, k=1)
    model = PoseResNet(backbone=resnet_lib.ResNet(
        block=resnet_lib.BasicBlock, stage_sizes=[1, 1, 1]), num_keypoints=K)
    style = StyleNet()
    dummy = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    mesh = make_mesh(8)
    state = replicate(create_state(model, jax.random.PRNGKey(0), cfg,
                                   batch_size=2), mesh)
    style_params = replicate(jax.jit(lambda r: style.init(r, dummy, dummy))(
        jax.random.PRNGKey(1))["params"], mesh)
    pipe = DeviceAugPipeline(_cfg(use_rrc=True), _cfg(use_rrc=False),
                             _cfg(use_rrc=False), k=1, mean=MEAN, std=STD,
                             mesh=mesh)
    bundler = PretrainStepBundler(
        model, cfg, style_model=style,
        view_builder=pipe.pretrain_view_builder(True))
    args = SimpleNamespace(iters_per_epoch=3, print_freq=10,
                           image_size=SIZE, heatmap_size=HM,
                           steps_per_dispatch=2,
                           s2t_freq=0.5, s2t_alpha=(0.2, 0.9))
    np.random.seed(3)  # freq=0.5 draws both gate outcomes across 3 iters
    state = run_pretrain_epoch(state, style_params, None, mesh,
                               _Forever(_src_item, 6), _Forever(_tgt_item, 7),
                               epoch=0, lr=1e-4, args=args,
                               style_enabled=True, device_aug=pipe,
                               bundler=bundler,
                               base_rng=jax.random.PRNGKey(8))
    assert int(jax.device_get(state.step)) == 3
    assert set(bundler._jitted) == {2, 1}


class _CountingIter:
    """Forever-iterator wrapper that counts fetches (data-order contract)."""

    def __init__(self, make, seed):
        self.inner = _Forever(make, seed)
        self.fetches = 0

    def __next__(self):
        self.fetches += 1
        return next(self.inner)


def test_bundled_pretrain_target_stream_contract():
    """VERDICT r4 item 7: bundled and unbundled pretrain must consume the
    target loader IDENTICALLY — one fetch per FIRED s2t draw, none otherwise
    (reference train_human.py:267-276). Runs the same epoch config through
    both modes with the same global-np.random gate stream and asserts equal
    target consumption; catches any accidental widening of the bundled
    path's staging back to fetch-every-iteration."""
    from uda_poseestimation_tpu.parallel.train_step import PretrainStepBundler

    cfg = StepConfig(image_size=SIZE, heatmap_size=HM, sigma=1.0, k=1)
    model = PoseResNet(backbone=resnet_lib.ResNet(
        block=resnet_lib.BasicBlock, stage_sizes=[1, 1, 1]), num_keypoints=K)
    style = StyleNet()
    dummy = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    mesh = make_mesh(8)
    style_params = replicate(jax.jit(lambda r: style.init(r, dummy, dummy))(
        jax.random.PRNGKey(1))["params"], mesh)

    iters = 5
    args = SimpleNamespace(iters_per_epoch=iters, print_freq=100,
                           image_size=SIZE, heatmap_size=HM, seed=0,
                           s2t_freq=0.5, s2t_alpha=(0.2, 0.9))

    def gate_plan(seed):
        # the exact sequence both modes must reproduce from np.random
        np.random.seed(seed)
        rs = np.random
        return [args.s2t_freq > rs.rand() and (rs.uniform(0.2, 0.9) or True)
                for _ in range(iters)]

    # a seed whose gate sequence mixes fired and non-fired draws
    seed = next(s for s in range(100)
                if 0 < sum(map(bool, gate_plan(s))) < iters)
    fired = sum(map(bool, gate_plan(seed)))

    def run(bundled):
        # fresh state per run: the jitted steps donate the state buffers
        state0 = replicate(create_state(model, jax.random.PRNGKey(0), cfg,
                                        batch_size=2), mesh)
        pipe = DeviceAugPipeline(_cfg(use_rrc=True), _cfg(use_rrc=False),
                                 _cfg(use_rrc=False), k=1, mean=MEAN, std=STD,
                                 mesh=mesh, seed=3)
        src = _CountingIter(_src_item, 6)
        tgt = _CountingIter(_tgt_item, 7)
        kw = {}
        if bundled:
            args.steps_per_dispatch = 2
            kw["bundler"] = PretrainStepBundler(
                model, cfg, style_model=style,
                view_builder=pipe.pretrain_view_builder(True))
        else:
            args.steps_per_dispatch = 1
            kw["pretrain_step"] = make_pretrain_step(model, cfg,
                                                     style_model=style)
        np.random.seed(seed)
        state = run_pretrain_epoch(
            state0, style_params, kw.pop("pretrain_step", None), mesh, src,
            tgt, epoch=0, lr=1e-4, args=args, style_enabled=True,
            device_aug=pipe, **kw)
        assert int(jax.device_get(state.step)) == iters
        return src.fetches, tgt.fetches

    src_u, tgt_u = run(bundled=False)
    src_b, tgt_b = run(bundled=True)
    assert src_u == src_b == iters
    assert tgt_u == fired, (tgt_u, fired)
    assert tgt_b == tgt_u, ("bundled pretrain must advance the target "
                            "stream only on fired s2t draws", tgt_b, tgt_u)


def test_animal_bundled_pretrain_style_placeholder():
    """Animal pipeline under the aligned bundled pretrain: bundles mixing
    fired and non-fired s2t draws stack real host style images against zero
    placeholders of identical shape/dtype (pretrain_style_template)."""
    from uda_poseestimation_tpu.ops.device_aug import AnimalSourceAugConfig
    from uda_poseestimation_tpu.parallel.train_step import PretrainStepBundler

    n_kpt = 6
    cfg = StepConfig(image_size=SIZE, heatmap_size=HM, sigma=1.0, k=1)
    model = PoseResNet(backbone=resnet_lib.ResNet(
        block=resnet_lib.BasicBlock, stage_sizes=[1, 1, 1]),
        num_keypoints=n_kpt)
    style = StyleNet()
    dummy = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    mesh = make_mesh(8)
    state = replicate(create_state(model, jax.random.PRNGKey(0), cfg,
                                   batch_size=2), mesh)
    style_params = replicate(jax.jit(lambda r: style.init(r, dummy, dummy))(
        jax.random.PRNGKey(1))["params"], mesh)

    src_cfg = AnimalSourceAugConfig(inp_res=SIZE, out_res=HM, sigma=1.0,
                                    frame_w=160, frame_h=120)
    tgt_cfg = _cfg(use_rrc=False)
    pipe = AnimalDeviceAugPipeline(
        tgt_cfg, tgt_cfg, k=1, mean=[0.4, 0.39, 0.38], mesh=mesh,
        src_cfg=src_cfg,
        flip_perm=np.arange(n_kpt, dtype=np.int32),
        src_mean=np.array([0.4, 0.39, 0.38], np.float32))

    def _animal_src(rng):
        meta = {"canvas": rng.randint(0, 256, (B, 120, 160, 3)).astype(np.uint8),
                "pts": np.concatenate(
                    [rng.uniform(10, 100, (B, n_kpt, 2)),
                     np.ones((B, n_kpt, 1))], -1).astype(np.float32),
                "center": rng.uniform(60, 100, (B, 2)).astype(np.float32),
                "scale": np.full((B,), 0.8, np.float32)}
        return (None, None, None, meta)

    def _animal_tgt(rng):
        style_img = rng.rand(B, SIZE, SIZE, 3).astype(np.float32) - 0.4
        return (None, None, None, {}, [style_img], None, None, None)

    bundler = PretrainStepBundler(
        model, cfg, style_model=style,
        view_builder=pipe.pretrain_view_builder(True))
    args = SimpleNamespace(iters_per_epoch=4, print_freq=100,
                           image_size=SIZE, heatmap_size=HM, seed=0,
                           steps_per_dispatch=2,
                           s2t_freq=0.5, s2t_alpha=(0.2, 0.9))
    # pick a seed with a mixed fired/non-fired gate sequence
    def n_fired(s):
        np.random.seed(s)
        return sum(args.s2t_freq > np.random.rand() and bool(
            np.random.uniform(0.2, 0.9) or True) for _ in range(4))
    seed = next(s for s in range(100) if 0 < n_fired(s) < 4)
    np.random.seed(seed)
    tgt = _CountingIter(_animal_tgt, 9)
    state = run_pretrain_epoch(state, style_params, None, mesh,
                               _Forever(_animal_src, 8), tgt,
                               epoch=0, lr=1e-4, args=args,
                               style_enabled=True, device_aug=pipe,
                               bundler=bundler)
    assert int(jax.device_get(state.step)) == 4
    assert tgt.fetches == n_fired(seed)


def test_animal_pretrain_view_builder():
    """AnimalDeviceAugPipeline.pretrain_view_builder: in-step device SOURCE
    views from a raw_pretrain_batch, with the host-normalized style image
    passing through untouched (see test_animal_style_image_passthrough)."""
    from uda_poseestimation_tpu.data.util import FLIP_PAIRS
    from uda_poseestimation_tpu.ops.device_aug import (
        AnimalSourceAugConfig,
        flip_perm_from_pairs,
    )

    n_kpt = 18
    src_cfg = AnimalSourceAugConfig(inp_res=SIZE, out_res=HM, sigma=1.0,
                                    frame_w=160, frame_h=120)
    tgt_cfg = _cfg(use_rrc=False)
    pipe = AnimalDeviceAugPipeline(
        tgt_cfg, tgt_cfg, k=1, mean=[0.4, 0.39, 0.38],
        src_cfg=src_cfg,
        flip_perm=flip_perm_from_pairs(FLIP_PAIRS["real_animal"], n_kpt),
        src_mean=np.array([0.4, 0.39, 0.38], np.float32))
    rng = np.random.RandomState(11)
    meta = {"canvas": rng.randint(0, 256, (B, 120, 160, 3)).astype(np.uint8),
            "pts": np.concatenate(
                [rng.uniform(10, 100, (B, n_kpt, 2)),
                 np.ones((B, n_kpt, 1))], -1).astype(np.float32),
            "center": rng.uniform(60, 100, (B, 2)).astype(np.float32),
            "scale": np.full((B,), 0.8, np.float32)}
    style = rng.rand(B, SIZE, SIZE, 3).astype(np.float32) - 0.4
    src_tuple = (None, None, None, meta)
    tgt_tuple = (None, None, None, {}, [style], None, None, None)

    raw = pipe.raw_pretrain_batch(src_tuple, tgt_tuple)
    assert raw["canvas_s"].dtype == np.uint8
    build = pipe.pretrain_view_builder(True)
    out = jax.jit(lambda r, b, d: build(b, r, d))(
        jax.random.PRNGKey(3),
        {k: jnp.asarray(v) for k, v in raw.items()}, jnp.bool_(True))
    assert out["image_s"].shape == (B, SIZE, SIZE, 3)
    assert out["target_s"].shape == (B, n_kpt, HM, HM)
    assert out["weight_s"].shape[:2] == (B, n_kpt)
    np.testing.assert_allclose(np.asarray(out["image_t_style"]), style,
                               atol=1e-7)  # passthrough, not re-normalized


def test_animal_style_image_passthrough():
    """The animal mt datasets color_normalize teacher views on the host even
    under --device-aug (real_animal.py:260), so style_image must feed them
    AS-IS — normalizing again would double-shift the style statistics."""
    tgt_cfg = _cfg(use_rrc=False)
    pipe = AnimalDeviceAugPipeline(tgt_cfg, tgt_cfg, k=1,
                                   mean=[0.4, 0.39, 0.38])
    rng = np.random.RandomState(0)
    teas = [(rng.rand(B, SIZE, SIZE, 3).astype(np.float32)
             - np.array([0.4, 0.39, 0.38], np.float32))]  # already normalized
    tgt_tuple = (None, None, None, {}, teas, None, None, None)
    out = np.asarray(pipe.style_image(tgt_tuple))
    np.testing.assert_allclose(out, teas[0], atol=1e-7)
