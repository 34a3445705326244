"""Equivalence tests for the fused 1x1-conv + BN-stats probe
(ops/bn_fuse.py + models/fused_bn.py, VERDICT r4 item 3).

The probe must be a pure reordering: same math as ``nn.Conv(1x1) ->
nn.BatchNorm`` up to float reduction order, identical variable trees, and
identical gradients (the custom VJP is the analytic gradient of the unfused
composition). Kernel correctness runs the Pallas path in interpret mode on
the CPU mesh; module-level tests use the XLA impl the flag would pick here.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uda_poseestimation_tpu.models import resnet as R
from uda_poseestimation_tpu.models.fused_bn import (Conv1x1Stats,
                                                    StatsBatchNorm)
from uda_poseestimation_tpu.ops.bn_fuse import (conv1x1_bn_stats,
                                                matmul_stats, _mm_stats_xla)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("m,k,n", [(200, 70, 130), (64, 64, 64),
                                   (1024, 256, 512)])
def test_matmul_stats_pallas_matches_xla(dtype, m, k, n):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(m, k), dtype)
    w = jnp.asarray(rng.randn(k, n) / np.sqrt(k), dtype)
    yp, s1p, s2p = matmul_stats(x, w, dtype, "pallas", True)
    yx, s1x, s2x = _mm_stats_xla(x, w, dtype)
    assert yp.dtype == yx.dtype == dtype
    np.testing.assert_allclose(np.float32(yp), np.float32(yx),
                               rtol=1e-5, atol=1e-5)
    # stats accumulate f32 either way; only the reduction order differs
    np.testing.assert_allclose(s1p, s1x, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(s2p, s2x, rtol=1e-4, atol=1e-3)


def test_matmul_stats_grad_matches_unfused():
    """The custom VJP must equal autodiff of the unfused composition."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(96, 40), jnp.float32)
    w = jnp.asarray(rng.randn(40, 24), jnp.float32)
    t1 = jnp.asarray(rng.randn(24), jnp.float32)
    t2 = jnp.asarray(rng.randn(24), jnp.float32)

    def loss_fused(x, w):
        y, s1, s2 = matmul_stats(x, w, jnp.float32, "xla", False)
        return jnp.sum(y ** 2) + jnp.sum(s1 * t1) + jnp.sum(s2 * t2)

    def loss_plain(x, w):
        y, s1, s2 = _mm_stats_xla(x, w, jnp.float32)
        return jnp.sum(y ** 2) + jnp.sum(s1 * t1) + jnp.sum(s2 * t2)

    gf = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    gp = jax.grad(loss_plain, argnums=(0, 1))(x, w)
    for a, b in zip(gf, gp):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_matmul_stats_pallas_grad():
    """Gradients flow through the Pallas forward (interpret) identically."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(48, 32), jnp.float32)
    w = jnp.asarray(rng.randn(32, 16), jnp.float32)

    def loss(impl, interpret, x, w):
        y, s1, s2 = matmul_stats(x, w, jnp.float32, impl, interpret)
        return jnp.sum(jnp.tanh(y)) + jnp.sum(s1) + 0.1 * jnp.sum(s2)

    gp = jax.grad(functools.partial(loss, "pallas", True),
                  argnums=(0, 1))(x, w)
    gx = jax.grad(functools.partial(loss, "xla", False),
                  argnums=(0, 1))(x, w)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("strides", [1, 2])
def test_conv1x1_matches_lax_conv(strides):
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 8, 12), jnp.float32)
    k = jnp.asarray(rng.randn(1, 1, 12, 20) * 0.2, jnp.float32)
    y, s1, s2 = conv1x1_bn_stats(x, k, strides=strides, impl="xla")
    ref = jax.lax.conv_general_dilated(
        x, k, (strides, strides), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(s1, jnp.sum(ref, (0, 1, 2)), rtol=1e-5,
                               atol=1e-4)
    np.testing.assert_allclose(s2, jnp.sum(ref * ref, (0, 1, 2)), rtol=1e-5,
                               atol=1e-4)


def _bottleneck_pair(fuse, dtype=jnp.float32):
    import flax.linen as nn
    convd = functools.partial(nn.Conv, dtype=dtype)
    norm = functools.partial(nn.BatchNorm, use_running_average=False,
                             momentum=0.9, epsilon=1e-5, dtype=dtype)
    return R.Bottleneck(filters=8, strides=2, downsample=True, conv=convd,
                        norm=norm, fuse_bn=fuse)


def test_bottleneck_fused_matches_plain():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(4, 8, 8, 16), jnp.float32)
    plain = _bottleneck_pair(False)
    fused = _bottleneck_pair(True)
    v = plain.init(jax.random.PRNGKey(0), x)
    vf = fused.init(jax.random.PRNGKey(0), x)
    # identical variable trees (names, shapes, dtypes) and identical init
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vf)
    for a, b in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(vf)):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(a, b)

    yp, mp = plain.apply(v, x, mutable=["batch_stats"])
    yf, mf = fused.apply(v, x, mutable=["batch_stats"])
    np.testing.assert_allclose(yp, yf, rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(mp),
                    jax.tree_util.tree_leaves(mf)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_bottleneck_fused_grads_match():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
    plain = _bottleneck_pair(False)
    fused = _bottleneck_pair(True)
    v = plain.init(jax.random.PRNGKey(0), x)

    def loss(mod, params):
        y, _ = mod.apply({"params": params,
                          "batch_stats": v["batch_stats"]}, x,
                         mutable=["batch_stats"])
        return jnp.sum(y ** 2)

    gp = jax.grad(functools.partial(loss, plain))(v["params"])
    gf = jax.grad(functools.partial(loss, fused))(v["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4),
        gp, gf)


def test_resnet50_fused_tree_and_forward():
    """Flag-on resnet50: identical variable tree, bit-exact eval path, and
    train-path closeness where it is numerically meaningful.

    The FULL train forward is chaotic in the float reduction order: measured
    layer-by-layer, the fused/plain diff is ~2e-5 at layer1 and amplifies
    ~10x per block through 16 train-mode BNs (each normalizes by small-batch
    statistics of an input that already differs) — exactly what a different
    XLA reduction order would do to the unfused path. So this asserts the
    stem is bit-exact and layer1 agrees tightly, not the depth-50 output.
    """
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    plain = R.resnet50()
    fused = R.resnet50(fuse_bn=True)
    assert fused.fuse_bn and not plain.fuse_bn
    v = jax.jit(lambda: plain.init(jax.random.PRNGKey(0), x, train=False))()

    filt = lambda mdl, _m: mdl.name in ("bn1", "layer1_0")

    def run(mod):
        return jax.jit(lambda v: mod.apply(
            v, x, train=True, mutable=["batch_stats", "intermediates"],
            capture_intermediates=filt))(v)

    _, mp = run(plain)
    _, mf = run(fused)
    stem_p = mp["intermediates"]["bn1"]["__call__"][0]
    stem_f = mf["intermediates"]["bn1"]["__call__"][0]
    np.testing.assert_array_equal(stem_p, stem_f)  # stem BN is unfused
    l1p = mp["intermediates"]["layer1_0"]["__call__"][0]
    l1f = mf["intermediates"]["layer1_0"]["__call__"][0]
    np.testing.assert_allclose(l1p, l1f, rtol=1e-4, atol=1e-4)
    # eval path is shared (plain) code — exact match by construction
    ye = plain.apply(v, x, train=False)
    yef = fused.apply(v, x, train=False)
    np.testing.assert_array_equal(ye, yef)


def test_stats_batchnorm_running_average_matches_flax():
    import flax.linen as nn
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(4, 6, 6, 8), jnp.float32)
    ref = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)
    mine = StatsBatchNorm(use_running_average=True, momentum=0.9,
                          epsilon=1e-5)
    v = ref.init(jax.random.PRNGKey(0), x)
    v = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.randn(*a.shape) ** 2 + 0.5, a.dtype), v)
    np.testing.assert_allclose(ref.apply(v, x), mine.apply(v, x),
                               rtol=1e-6, atol=1e-6)
