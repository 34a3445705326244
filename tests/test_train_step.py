"""End-to-end train-step tests on the virtual 8-device CPU mesh.

Exercises the full fused adaptation step (style transfer + teacher views +
inverse warps + occlusion + rectify + kth-value mask + EMA) with the batch
sharded over ('data',) — the TPU-native stand-in for multi-chip execution
(SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np

from uda_poseestimation_tpu.models import StyleNet, pose_resnet50
from uda_poseestimation_tpu.ops import generate_target_batch
from uda_poseestimation_tpu.parallel import (
    StepConfig,
    create_state,
    make_adapt_step,
    make_eval_step,
    make_mesh,
    make_pretrain_step,
    replicate,
    shard_batch,
)

CFG = StepConfig(image_size=64, heatmap_size=16, sigma=2.0, k=2)
B, K = 8, 5


def _fake_batch(rng, with_teacher: bool):
    kp = rng.uniform(8, 56, size=(B, K, 2)).astype(np.float32)
    vis = np.ones((B, K), np.float32)
    target, weight = generate_target_batch(kp, vis, (16, 16), 2, (64, 64))
    batch = {
        "image_s": rng.rand(B, 64, 64, 3).astype(np.float32),
        "target_s": np.asarray(target),
        "weight_s": np.asarray(weight),
    }
    if with_teacher:
        batch.update({
            "image_t_stu": rng.rand(B, 64, 64, 3).astype(np.float32),
            "images_t_tea": rng.rand(CFG.k, B, 64, 64, 3).astype(np.float32),
            "aug_param_stu": np.stack([
                rng.uniform(-30, 30, B), np.round(rng.uniform(-4, 4, B)),
                np.round(rng.uniform(-4, 4, B)), rng.uniform(-10, 10, B),
                rng.uniform(-10, 10, B), rng.uniform(0.8, 1.2, B)], -1).astype(np.float32),
            "aug_params_tea": np.stack([np.stack([
                rng.uniform(-30, 30, B), np.round(rng.uniform(-4, 4, B)),
                np.round(rng.uniform(-4, 4, B)), rng.uniform(-10, 10, B),
                rng.uniform(-10, 10, B), rng.uniform(0.8, 1.2, B)], -1)
                for _ in range(CFG.k)]).astype(np.float32),
        })
    else:
        batch["image_t_style"] = rng.rand(B, 64, 64, 3).astype(np.float32)
    return batch


def test_pretrain_step_runs_and_updates():
    mesh = make_mesh(8)
    model = pose_resnet50(num_keypoints=K)
    state = create_state(model, jax.random.PRNGKey(0), CFG, batch_size=2)
    state = replicate(state, mesh)
    rng = np.random.RandomState(0)
    batch = _fake_batch(rng, with_teacher=False)
    sb = dict(batch)
    sb["images_t_tea"] = None
    batch = {k: v for k, v in batch.items()}
    batch_sharded = shard_batch(batch, mesh)
    step = make_pretrain_step(model, CFG, style_model=None)
    p0 = jax.tree_util.tree_leaves(state.student_params)[0].copy()
    state, metrics, y_s = step(state, None, batch_sharded,
                               jnp.float32(1e-3), jnp.bool_(False), jnp.float32(0.5))
    assert y_s.shape == (B, K, 16, 16)
    assert np.isfinite(float(metrics["loss_all"]))
    p1 = jax.tree_util.tree_leaves(state.student_params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))  # params moved
    assert int(state.step) == 1


def test_adapt_step_full_fused():
    mesh = make_mesh(8)
    model = pose_resnet50(num_keypoints=K)
    style = StyleNet()
    state = create_state(model, jax.random.PRNGKey(1), CFG, batch_size=2)
    state = replicate(state, mesh)
    rng = np.random.RandomState(1)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    style_params = jax.jit(lambda r: style.init(r, dummy, dummy))(
        jax.random.PRNGKey(2))["params"]
    style_params = replicate(style_params, mesh)
    batch = shard_batch(_fake_batch(rng, with_teacher=True), mesh)

    step = make_adapt_step(model, CFG, style_model=style)
    tea0 = jax.tree_util.tree_leaves(state.teacher_params)[0].copy()
    state, metrics, y_s = step(state, style_params, batch, jnp.float32(1e-3),
                               jax.random.PRNGKey(3),
                               jnp.bool_(True), jnp.float32(0.7),
                               jnp.bool_(True), jnp.float32(0.3))
    for name in ("loss_all", "loss_s", "loss_c", "acc_s"):
        assert np.isfinite(float(metrics[name])), name
    tea1 = jax.tree_util.tree_leaves(state.teacher_params)[0]
    assert not np.allclose(np.asarray(tea0), np.asarray(tea1))  # EMA moved
    # run a second step (state donation + re-use path)
    batch2 = shard_batch(_fake_batch(np.random.RandomState(2), with_teacher=True), mesh)
    state, metrics2, _ = step(state, style_params, batch2, jnp.float32(1e-3),
                              jax.random.PRNGKey(4),
                              jnp.bool_(False), jnp.float32(0.7),
                              jnp.bool_(False), jnp.float32(0.3))
    assert int(state.step) == 2
    assert np.isfinite(float(metrics2["loss_all"]))


def test_bundled_steps_match_sequential():
    """AdaptStepBundler (--steps-per-dispatch): scanning n iterations in one
    dispatch must be equivalent to n sequential make_adapt_step calls —
    same state chaining (params, BN stats, EMA, optimizer), same metrics,
    with identical per-iteration RNG keys and gates. Batches are stacked and
    sharded with lead_axes=1 (the bundle transport).

    SGD config: the scan body and the standalone step compile to
    differently-fused f32 programs with ~1e-6 deviations; SGD keeps the
    resulting state deviation linear in that noise, whereas Adam's
    ~sign(g)*lr elementwise step amplifies it into whole +-lr flips on
    near-zero-gradient elements (see tests/test_composed_parity.py)."""
    import dataclasses

    from uda_poseestimation_tpu.parallel.train_step import AdaptStepBundler

    cfg = dataclasses.replace(CFG, use_sgd=True)
    mesh = make_mesh(8)
    model = pose_resnet50(num_keypoints=K)
    n = 3
    rng = np.random.RandomState(7)
    host_batches = [_fake_batch(rng, with_teacher=True) for _ in range(n)]
    gates = [(True, 0.7, False, 0.0), (False, 0.0, True, 0.4),
             (True, 0.2, True, 0.9)]
    keys = [jax.random.PRNGKey(100 + j) for j in range(n)]
    style = StyleNet()
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    style_params = replicate(jax.jit(lambda r: style.init(r, dummy, dummy))(
        jax.random.PRNGKey(2))["params"], mesh)

    # sequential reference
    step = make_adapt_step(model, cfg, style_model=style, mesh=mesh)
    state = replicate(create_state(model, jax.random.PRNGKey(1), cfg,
                                   batch_size=2), mesh)
    seq_metrics = []
    for j in range(n):
        state, m, _ = step(state, style_params,
                           shard_batch(host_batches[j], mesh),
                           jnp.float32(1e-3), keys[j],
                           jnp.bool_(gates[j][0]), jnp.float32(gates[j][1]),
                           jnp.bool_(gates[j][2]), jnp.float32(gates[j][3]))
        seq_metrics.append(jax.device_get(m))
    seq_state = state

    # bundled
    bundler = AdaptStepBundler(model, cfg, style_model=style, mesh=mesh)
    state = replicate(create_state(model, jax.random.PRNGKey(1), cfg,
                                   batch_size=2), mesh)
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *host_batches)
    batch = shard_batch(stacked, mesh, lead_axes=1)
    g = np.asarray(gates, np.float64)
    state, metrics, y_last = bundler(
        state, style_params, batch, jnp.float32(1e-3), jnp.stack(keys),
        jnp.asarray(g[:, 0].astype(bool)), jnp.asarray(g[:, 1], jnp.float32),
        jnp.asarray(g[:, 2].astype(bool)), jnp.asarray(g[:, 3], jnp.float32))
    metrics = jax.device_get(metrics)

    # scan body vs standalone step compile to differently-fused f32 programs;
    # per-step deviations are ~1e-6 and compound over the chained steps —
    # tolerances sit well above that noise, far below any logic error
    for j in range(n):
        for name in ("loss_all", "loss_s", "loss_c", "acc_s", "acc_cnt"):
            np.testing.assert_allclose(np.asarray(metrics[name])[j],
                                       seq_metrics[j][name], rtol=5e-4,
                                       atol=1e-5, err_msg=f"{name}[{j}]")
    for tree_a, tree_b in ((state.student_params, seq_state.student_params),
                           (state.teacher_params, seq_state.teacher_params),
                           (state.student_stats, seq_state.student_stats)):
        for a, b in zip(jax.tree_util.tree_leaves(tree_a),
                        jax.tree_util.tree_leaves(tree_b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=1e-4)
    assert int(state.step) == n
    assert y_last.shape[0] == B
    # partial trailing bundle: a different size compiles its own scan
    tail = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *host_batches[:2])
    state, metrics2, _ = bundler(
        state, style_params, shard_batch(tail, mesh, lead_axes=1),
        jnp.float32(1e-3), jnp.stack(keys[:2]),
        jnp.asarray(g[:2, 0].astype(bool)), jnp.asarray(g[:2, 1], jnp.float32),
        jnp.asarray(g[:2, 2].astype(bool)), jnp.asarray(g[:2, 3], jnp.float32))
    assert int(state.step) == n + 2
    assert np.isfinite(np.asarray(jax.device_get(metrics2)["loss_all"])).all()


def test_pretrain_bundled_matches_sequential():
    """PretrainStepBundler must be equivalent to n sequential
    make_pretrain_step calls — same state chaining and metrics under
    identical gate/alpha draws (same rationale/tolerances as
    test_bundled_steps_match_sequential; SGD keeps deviations linear)."""
    import dataclasses

    from uda_poseestimation_tpu.parallel.train_step import PretrainStepBundler

    cfg = dataclasses.replace(CFG, use_sgd=True)
    mesh = make_mesh(8)
    model = pose_resnet50(num_keypoints=K)
    style = StyleNet()
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    style_params = replicate(jax.jit(lambda r: style.init(r, dummy, dummy))(
        jax.random.PRNGKey(2))["params"], mesh)
    n = 3
    rng = np.random.RandomState(17)
    host_batches = [_fake_batch(rng, with_teacher=False) for _ in range(n)]
    gates = [(True, 0.8), (False, 0.0), (True, 0.3)]

    # sequential reference
    step = make_pretrain_step(model, cfg, style_model=style)
    state = replicate(create_state(model, jax.random.PRNGKey(1), cfg,
                                   batch_size=2), mesh)
    seq_metrics = []
    for j in range(n):
        state, m, _ = step(state, style_params,
                           shard_batch(host_batches[j], mesh),
                           jnp.float32(1e-3), jnp.bool_(gates[j][0]),
                           jnp.float32(gates[j][1]))
        seq_metrics.append(jax.device_get(m))
    seq_state = state

    # bundled
    bundler = PretrainStepBundler(model, cfg, style_model=style)
    state = replicate(create_state(model, jax.random.PRNGKey(1), cfg,
                                   batch_size=2), mesh)
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *host_batches)
    batch = shard_batch(stacked, mesh, lead_axes=1)
    g = np.asarray(gates, np.float64)
    rngs = jnp.stack([jax.random.PRNGKey(40 + j) for j in range(n)])
    state, metrics, y_last = bundler(
        state, style_params, batch, jnp.float32(1e-3), rngs,
        jnp.asarray(g[:, 0].astype(bool)), jnp.asarray(g[:, 1], jnp.float32))
    metrics = jax.device_get(metrics)

    for j in range(n):
        for name in ("loss_all", "loss_s", "acc_s", "acc_cnt"):
            np.testing.assert_allclose(np.asarray(metrics[name])[j],
                                       seq_metrics[j][name], rtol=5e-4,
                                       atol=1e-5, err_msg=f"{name}[{j}]")
    for tree_a, tree_b in ((state.student_params, seq_state.student_params),
                           (state.student_stats, seq_state.student_stats)):
        for a, b in zip(jax.tree_util.tree_leaves(tree_a),
                        jax.tree_util.tree_leaves(tree_b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=1e-4)
    assert int(state.step) == n
    assert y_last.shape[0] == B


def test_eval_step():
    mesh = make_mesh(8)
    model = pose_resnet50(num_keypoints=K)
    state = create_state(model, jax.random.PRNGKey(0), CFG, batch_size=2)
    state = replicate(state, mesh)
    rng = np.random.RandomState(3)
    batch = shard_batch(_fake_batch(rng, with_teacher=False), mesh)
    ev = make_eval_step(model)
    y, loss, acc_per_kpt = ev(state.student_params, state.student_stats,
                              batch["image_s"], batch["target_s"], batch["weight_s"])
    assert y.shape == (B, K, 16, 16)
    assert np.isfinite(float(loss))
    assert acc_per_kpt.shape == (K,)
    # device per-keypoint PCK must match the host twin
    from uda_poseestimation_tpu.ops import accuracy as np_accuracy
    host_acc, _, _, _ = np_accuracy(np.asarray(y), np.asarray(batch["target_s"]))
    np.testing.assert_allclose(np.asarray(acc_per_kpt), host_acc, atol=1e-6)


def test_fused_occlusion_matches_sequential():
    """Single-gather occlusion == forward-chain -> paste -> backward warp."""
    import jax.numpy as jnp
    from uda_poseestimation_tpu.ops.affine import (
        backward_warp_images, forward_warp_images)
    from uda_poseestimation_tpu.parallel.train_step import (
        _nchw, _nhwc, _occlude_batch, _occlusion_geometry, _paste_patch)

    rng = np.random.RandomState(9)
    cfg = StepConfig(image_size=64, heatmap_size=16, sigma=2.0,
                     occlude_thresh=0.5, occlude_rate=1.0, occlude_size=6)
    B_, K_ = 6, 4
    imgs = rng.rand(B_, 64, 64, 3).astype(np.float32)
    hm = rng.rand(B_, K_, 16, 16).astype(np.float32)  # confident peaks
    aug = np.stack([rng.uniform(-40, 40, B_), np.round(rng.uniform(-3, 3, B_)),
                    np.round(rng.uniform(-3, 3, B_)), rng.uniform(-15, 15, B_),
                    rng.uniform(-15, 15, B_), rng.uniform(0.8, 1.2, B_)],
                   -1).astype(np.float32)
    key = jax.random.PRNGKey(11)

    fused = np.asarray(_occlude_batch(key, jnp.asarray(imgs), jnp.asarray(hm),
                                      jnp.asarray(aug), cfg))

    # sequential oracle with the same geometry draws
    do, left, right, upper, bottom, left_src, upper_src = _occlusion_geometry(
        key, jnp.asarray(hm), cfg)
    chw = _nchw(jnp.asarray(imgs))
    warped = forward_warp_images(chw, jnp.asarray(aug), cfg.ratio)
    pasted = jax.vmap(_paste_patch)(warped, left, right, upper, bottom,
                                    left_src, upper_src)
    back = backward_warp_images(pasted, jnp.asarray(aug), cfg.ratio)
    seq = np.asarray(_nhwc(jnp.where(np.asarray(do)[:, None, None, None], back, chw)))

    assert np.asarray(do).any()  # occlusion actually exercised
    np.testing.assert_array_equal(fused, seq)


def test_sharded_step_matches_single_device():
    """GSPMD data parallelism must be semantics-preserving: the fused adapt
    step gives the same losses/params on a 1-device vs 8-device mesh (global
    kth-value mask, global-batch BN, gradient all-reduce)."""
    model = pose_resnet50(num_keypoints=K)
    rng = np.random.RandomState(7)
    batch_np = _fake_batch(rng, with_teacher=True)

    results = []
    for n_dev in (1, 8):
        mesh = make_mesh(n_dev)
        state = create_state(model, jax.random.PRNGKey(1), CFG, batch_size=2)
        state = replicate(state, mesh)
        batch = shard_batch(batch_np, mesh)
        step = make_adapt_step(model, CFG, style_model=None)
        state, metrics, _ = step(state, None, batch, jnp.float32(1e-3),
                                 jax.random.PRNGKey(5),
                                 jnp.bool_(False), jnp.float32(0.0),
                                 jnp.bool_(False), jnp.float32(0.0))
        # BN batch stats are a deterministic function of the global batch
        stats_leaf = jax.tree_util.tree_leaves(state.student_stats)[0]
        results.append((float(metrics["loss_all"]), float(metrics["loss_c"]),
                        float(metrics["acc_s"]), np.asarray(stats_leaf)))
    assert abs(results[0][0] - results[1][0]) < 1e-5
    assert abs(results[0][1] - results[1][1]) < 1e-5
    assert abs(results[0][2] - results[1][2]) < 1e-6
    np.testing.assert_allclose(results[0][3], results[1][3], atol=1e-5)
    # (post-Adam params are not compared: near-zero gradients make the Adam
    # direction sign-sensitive to reduction order — expected fp behavior)


def test_adapt_step_multichip_pallas_branch():
    """Regression for the round-1 unbound-`mesh` NameError: the EXACT
    multi-chip Pallas occlusion branch (shard_map over the 8-device mesh)
    must trace and execute. gather_impl='pallas' + interpret=True runs the
    real kernel wrapper on the CPU mesh."""
    cfg = StepConfig(image_size=64, heatmap_size=16, sigma=2.0, k=1,
                     occlude_rate=1.0, occlude_thresh=0.0,
                     gather_impl="pallas", pallas_interpret=True)
    mesh = make_mesh(8)
    model = pose_resnet50(num_keypoints=K)
    state = replicate(create_state(model, jax.random.PRNGKey(6), cfg,
                                   batch_size=2), mesh)
    rng = np.random.RandomState(12)
    batch = _fake_batch(rng, with_teacher=True)
    batch["images_t_tea"] = batch["images_t_tea"][:1]
    batch["aug_params_tea"] = batch["aug_params_tea"][:1]
    batch = shard_batch(batch, mesh)
    step = make_adapt_step(model, cfg, style_model=None, mesh=mesh)
    state, metrics, _ = step(state, None, batch, jnp.float32(1e-3),
                             jax.random.PRNGKey(13),
                             jnp.bool_(False), jnp.float32(0.0),
                             jnp.bool_(False), jnp.float32(0.0))
    assert np.isfinite(float(metrics["loss_all"]))

    # and the pallas (interpret) occlusion output must equal the exact XLA
    # gather path bit for bit in interpret mode (f32 dots, exact one-hots)
    from uda_poseestimation_tpu.parallel.train_step import _occlude_batch
    cfg_x = StepConfig(image_size=64, heatmap_size=16, sigma=2.0, k=1,
                       occlude_rate=1.0, occlude_thresh=0.0,
                       gather_impl="xla")
    hm = rng.rand(B, K, 16, 16).astype(np.float32)
    key = jax.random.PRNGKey(14)
    imgs = np.asarray(jax.device_get(batch["image_t_stu"]))
    aug = np.asarray(jax.device_get(batch["aug_param_stu"]))
    out_p = np.asarray(_occlude_batch(
        key, shard_batch(imgs, mesh), jnp.asarray(hm), jnp.asarray(aug),
        cfg, mesh=mesh))
    out_x = np.asarray(_occlude_batch(
        key, jnp.asarray(imgs), jnp.asarray(hm), jnp.asarray(aug), cfg_x))
    np.testing.assert_allclose(out_p, out_x, atol=1e-6)


def test_finetune_scales_backbone_lr():
    """cfg.finetune=True must scale backbone updates by exactly 0.1 (the
    reference's get_parameters param groups, lib/models/pose_resnet.py:86-91)
    while head/upsampling updates are unchanged. Adam's direction is
    lr-independent, so first-step deltas compare exactly."""
    import dataclasses

    mesh = make_mesh(1)
    model = pose_resnet50(num_keypoints=K, finetune=True)
    batch = shard_batch(_fake_batch(np.random.RandomState(21),
                                    with_teacher=False), mesh)
    deltas = {}
    for ft in (False, True):
        cfg = dataclasses.replace(CFG, finetune=ft)
        state = replicate(create_state(model, jax.random.PRNGKey(8), cfg,
                                       batch_size=2), mesh)
        p0 = jax.device_get(state.student_params)
        step = make_pretrain_step(model, cfg, style_model=None)
        state, _, _ = step(state, None, batch, jnp.float32(1e-3),
                           jnp.bool_(False), jnp.float32(0.0))
        p1 = jax.device_get(state.student_params)
        deltas[ft] = jax.tree_util.tree_map(
            lambda a, b: np.asarray(b) - np.asarray(a), p0, p1)
    # The two cfgs compile to different XLA programs, so near-zero gradients
    # can flip the Adam direction's SIGN between runs (fp reduction order —
    # same caveat as test_sharded_step_matches_single_device); |direction| is
    # ~1 regardless, so compare magnitudes.
    np.testing.assert_allclose(
        np.abs(deltas[True]["backbone"]["conv1"]["kernel"]),
        0.1 * np.abs(deltas[False]["backbone"]["conv1"]["kernel"]), rtol=1e-3)
    np.testing.assert_allclose(
        np.abs(deltas[True]["head"]["kernel"]),
        np.abs(deltas[False]["head"]["kernel"]), rtol=1e-3)


def test_no_unbound_globals_in_package():
    """symtable lint over every package module: any name a function resolves
    to module scope must actually be bound there (or be a builtin). Would
    have caught round 1's `mesh` NameError, which only manifested at trace
    time on multi-chip TPUs (no test/bench config reached the branch)."""
    import builtins
    import pathlib
    import symtable

    pkg = pathlib.Path(__file__).resolve().parents[1] / "uda_poseestimation_tpu"
    builtin_names = set(dir(builtins)) | {"__file__", "__name__", "__doc__",
                                          "__package__", "__spec__",
                                          "__loader__", "__builtins__"}
    failures = []
    for path in sorted(pkg.rglob("*.py")):
        src = path.read_text()
        top = symtable.symtable(src, str(path), "exec")
        module_bound = {s.get_name() for s in top.get_symbols()
                        if s.is_assigned() or s.is_imported()}

        def walk(table):
            if table.get_type() in ("function", "lambda"):
                for s in table.get_symbols():
                    if (s.is_global() and s.is_referenced()
                            and not s.is_assigned()
                            and s.get_name() not in module_bound
                            and s.get_name() not in builtin_names):
                        failures.append(
                            f"{path.name}: '{s.get_name()}' free in "
                            f"{table.get_name()}:{table.get_lineno()}")
            for child in table.get_children():
                walk(child)

        walk(top)
    assert not failures, "\n".join(failures)


def test_pretrain_step_with_style():
    """Pretrain step with the s2t style branch active (cond path)."""
    mesh = make_mesh(8)
    model = pose_resnet50(num_keypoints=K)
    style = StyleNet()
    state = create_state(model, jax.random.PRNGKey(4), CFG, batch_size=2)
    state = replicate(state, mesh)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    style_params = replicate(jax.jit(lambda r: style.init(r, dummy, dummy))(
        jax.random.PRNGKey(5))["params"], mesh)
    batch = shard_batch(_fake_batch(np.random.RandomState(4), with_teacher=False), mesh)
    step = make_pretrain_step(model, CFG, style_model=style)
    for do in (True, False):
        state, metrics, y_s = step(state, style_params, batch, jnp.float32(1e-3),
                                   jnp.bool_(do), jnp.float32(0.8))
        assert np.isfinite(float(metrics["loss_all"])), do


def test_decoder_batching_per_sample_exact():
    """The style switch's both-directions case decodes s2t and t2s targets
    as ONE batched decoder call; valid because the decoder has no BatchNorm,
    so batching must be per-sample exact (this is the invariant)."""
    style = StyleNet()
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jax.jit(lambda r: style.init(r, dummy, dummy))(
        jax.random.PRNGKey(0))["params"]
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(2, 8, 8, 512).astype(np.float32))
    b = jnp.asarray(rng.rand(3, 8, 8, 512).astype(np.float32))

    dec = jax.jit(lambda t: style.apply({"params": params}, t,
                                        method=StyleNet.decode))
    d_cat = dec(jnp.concatenate([a, b]))
    np.testing.assert_allclose(np.asarray(d_cat[:2]), np.asarray(dec(a)),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d_cat[2:]), np.asarray(dec(b)),
                               atol=1e-6, rtol=1e-6)


def test_style_io_bf16_clamp_commutes_exhaustive():
    """The bf16 styled-image transport (StepConfig.style_io_dtype) rests on:
    bf16(clamp_f32(f32(v), lo, hi)) == clamp_bf16(v, bf16(lo), bf16(hi)) for
    every bf16 value v. Proven here EXHAUSTIVELY over all 65536 bf16 bit
    patterns against each per-channel bound of both trainer configs
    (train_human.py:32-33, train_animal.py:34-35)."""
    import ml_dtypes

    all_bits = np.arange(1 << 16, dtype=np.uint16)
    v = all_bits.view(ml_dtypes.bfloat16)
    finite = np.isfinite(v.astype(np.float32))
    v = v[finite]
    v32 = v.astype(np.float32)

    bounds = list(StepConfig().recover_min) + list(StepConfig().recover_max)
    # train_animal.py:50-51 bounds
    bounds += [-0.3999, -0.3909, -0.3871, 0.6001, 0.6091, 0.6129]
    for lo in bounds:
        for hi in bounds:
            if hi <= lo:
                continue
            ref = np.clip(v32, np.float32(lo), np.float32(hi)).astype(
                ml_dtypes.bfloat16)
            got = np.minimum(np.maximum(v, ml_dtypes.bfloat16(lo)),
                             ml_dtypes.bfloat16(hi))
            np.testing.assert_array_equal(ref.view(np.uint16),
                                          got.view(np.uint16),
                                          err_msg=f"lo={lo} hi={hi}")


def test_style_io_bf16_step_matches_f32_io():
    """style_io_dtype='bfloat16' must be semantics-preserving for bf16
    models: same batch/rng/gates through the fused adapt step give the same
    losses and styled images as the default f32 transport (tolerances cover
    cross-program fusion noise only — the inputs reaching every conv are
    bit-identical by test_style_io_bf16_clamp_commutes_exhaustive).

    1-device mesh: aux_outputs over a multi-device CPU mesh trips a stuck
    XLA-CPU AllGather abort (the aux tensors' resharding deadlocks in the
    in-process communicator) — same reason test_composed_parity runs
    unsharded; sharding equivalence is covered by
    test_sharded_step_matches_single_device."""
    import dataclasses

    mesh = make_mesh(1)
    model = pose_resnet50(num_keypoints=K, dtype=jnp.bfloat16)
    style = StyleNet(dtype=jnp.bfloat16)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    style_params = replicate(jax.jit(lambda r: style.init(r, dummy, dummy))(
        jax.random.PRNGKey(2))["params"], mesh)
    batch = shard_batch(_fake_batch(np.random.RandomState(31),
                                    with_teacher=True), mesh)

    outs = {}
    for io_dtype in ("float32", "bfloat16"):
        cfg = dataclasses.replace(CFG, style_io_dtype=io_dtype,
                                  aux_outputs=True)
        state = replicate(create_state(model, jax.random.PRNGKey(1), cfg,
                                       batch_size=2), mesh)
        step = make_adapt_step(model, cfg, style_model=style, mesh=mesh)
        state, metrics, _ = step(state, style_params, batch, jnp.float32(1e-3),
                                 jax.random.PRNGKey(9),
                                 jnp.bool_(True), jnp.float32(0.7),
                                 jnp.bool_(True), jnp.float32(0.3))
        outs[io_dtype] = jax.device_get(metrics)

    aux32, aux16 = outs["float32"]["aux"], outs["bfloat16"]["aux"]
    assert aux16["x_s_styled"].dtype == jnp.bfloat16
    # styled tensors agree to bf16 resolution (values are in ~[-2.7, 2.7])
    for name in ("x_s_styled", "x_t_teas_styled"):
        np.testing.assert_allclose(
            np.asarray(aux32[name], np.float32),
            np.asarray(aux16[name], np.float32), atol=0.05,
            err_msg=name)
    for name in ("loss_all", "loss_s", "loss_c"):
        np.testing.assert_allclose(outs["float32"][name], outs["bfloat16"][name],
                                   rtol=2e-2, atol=1e-4, err_msg=name)


def test_bf16_style_params_bit_identical():
    """Storing the frozen StyleNet params in bf16 (parallel.cast_floating,
    what the trainers deploy) must be BIT-identical to f32 storage under the
    bf16 StyleNet: flax promotes f32 params to bf16 at every apply with the
    same round-to-nearest cast."""
    from uda_poseestimation_tpu.parallel import cast_floating

    style = StyleNet(dtype=jnp.bfloat16)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params32 = jax.jit(lambda r: style.init(r, dummy, dummy))(
        jax.random.PRNGKey(7))["params"]
    params16 = cast_floating(params32, jnp.bfloat16)
    rng = np.random.RandomState(5)
    content = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    sty = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))

    fn = jax.jit(lambda p: style.apply({"params": p}, content, sty, 0.7,
                                       method=StyleNet.stylize))
    np.testing.assert_array_equal(np.asarray(fn(params32)),
                                  np.asarray(fn(params16)))


def test_run_validate_sharded_matches_single_device():
    """Sharded validation (mesh over 8 devices, padded batches) must produce
    the same group PCK and mean loss as the unsharded loop — including a
    final partial batch."""
    from types import SimpleNamespace

    from uda_poseestimation_tpu.engine import run_validate

    class FakeDataset:
        num_keypoints = K

        def group_accuracy(self, accs):
            return accs

    class FakeLoader:
        batch_size = 6  # deliberately NOT divisible by 8
        dataset = FakeDataset()

        def __init__(self, batches):
            self.batches = batches

        def __len__(self):
            return len(self.batches)

        def __iter__(self):
            return iter(self.batches)

    rng = np.random.RandomState(33)
    from uda_poseestimation_tpu.ops import generate_target_batch

    def mk(n):
        kp = rng.uniform(8, 56, size=(n, K, 2)).astype(np.float32)
        vis = np.ones((n, K), np.float32)
        t, w = generate_target_batch(kp, vis, (16, 16), 2, (64, 64))
        return (rng.rand(n, 64, 64, 3).astype(np.float32), np.asarray(t),
                np.asarray(w), {"keypoint2d": kp})

    batches = [mk(6), mk(6), mk(3)]  # partial final batch
    model = pose_resnet50(num_keypoints=K)
    state = create_state(model, jax.random.PRNGKey(2), CFG, batch_size=2)
    ev = make_eval_step(model)
    args = SimpleNamespace(image_size=64, heatmap_size=16, val_print_freq=100)

    accs_ref = run_validate(ev, state.student_params, state.student_stats,
                            FakeLoader(batches), args)
    accs_sh = run_validate(ev, state.student_params, state.student_stats,
                           FakeLoader(batches), args, mesh=make_mesh(8))
    np.testing.assert_allclose(np.asarray(accs_sh), np.asarray(accs_ref),
                               atol=1e-5)
