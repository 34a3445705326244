"""Tests for batched affine warps.

Sampling semantics are validated against torch.nn.functional.grid_sample
(torch CPU is available in this image) using torchvision's grid construction
(_gen_affine_grid with align_corners=False), which is exactly the pipeline
the reference's tF.affine(tensor) path lowers to.
"""

import numpy as np
import jax.numpy as jnp
import torch

from uda_poseestimation_tpu.ops import (
    inverse_affine_coeffs,
    warp_affine,
    warp_affine_chain,
    inverse_warp_heatmaps,
    affine_keypoints,
    generate_target,
)
from uda_poseestimation_tpu.ops.affine import backward_warp_images, chain_coeffs, compose_inverse_coeffs


def torch_affine(img_chw: np.ndarray, coeffs: np.ndarray, mode: str):
    """torchvision F_t.affine re-derivation: theta grid + grid_sample."""
    c, h, w = img_chw.shape
    theta = torch.tensor(coeffs, dtype=torch.float32).reshape(1, 2, 3)
    # _gen_affine_grid: base grid over centered pixel coords, normalized by w/2, h/2
    d = 0.5
    base_grid = torch.empty(1, h, w, 3)
    x_grid = torch.linspace(-w * 0.5 + d, w * 0.5 + d - 1, steps=w)
    base_grid[..., 0].copy_(x_grid)
    y_grid = torch.linspace(-h * 0.5 + d, h * 0.5 + d - 1, steps=h).unsqueeze_(-1)
    base_grid[..., 1].copy_(y_grid)
    base_grid[..., 2].fill_(1)
    rescaled_theta = theta.transpose(1, 2) / torch.tensor([0.5 * w, 0.5 * h])
    grid = base_grid.view(1, h * w, 3).bmm(rescaled_theta).view(1, h, w, 2)
    out = torch.nn.functional.grid_sample(
        torch.tensor(img_chw, dtype=torch.float32).unsqueeze(0), grid,
        mode=mode, padding_mode="zeros", align_corners=False)
    return out[0].numpy()


def rand_params(rng, n):
    angle = rng.uniform(-170, 170, n)
    tx = rng.uniform(-10, 10, n)
    ty = rng.uniform(-10, 10, n)
    shx = rng.uniform(-25, 25, n)
    shy = rng.uniform(-25, 25, n)
    scale = rng.uniform(0.7, 1.4, n)
    return angle, tx, ty, shx, shy, scale


def test_warp_matches_grid_sample():
    rng = np.random.RandomState(0)
    imgs = rng.rand(4, 3, 33, 47).astype(np.float32)
    angle, tx, ty, shx, shy, scale = rand_params(rng, 4)
    coeffs = np.asarray(inverse_affine_coeffs(angle, tx, ty, shx, shy, scale))
    for mode in ("nearest", "bilinear"):
        ours = np.asarray(warp_affine(jnp.asarray(imgs), jnp.asarray(coeffs), mode))
        for i in range(4):
            ref = torch_affine(imgs[i], coeffs[i], mode)
            # nearest can differ on exact .5 sampling boundaries from fp
            # association differences; random real-valued params avoid them.
            np.testing.assert_allclose(ours[i], ref, atol=2e-5)


def test_identity_warp_is_exact():
    rng = np.random.RandomState(1)
    imgs = rng.rand(2, 5, 16, 16).astype(np.float32)
    zero = np.zeros(2)
    one = np.ones(2)
    out = warp_affine_chain(jnp.asarray(imgs), zero, zero, zero, zero, zero, one)
    np.testing.assert_array_equal(np.asarray(out), imgs)


def test_fused_equals_composed_for_bilinear_rotation_only():
    # With a single non-trivial stage the fused path must equal the chain.
    rng = np.random.RandomState(2)
    imgs = rng.rand(2, 4, 32, 32).astype(np.float32)
    angle = np.array([30.0, -50.0])
    zero = np.zeros(2)
    one = np.ones(2)
    a = warp_affine_chain(jnp.asarray(imgs), angle, zero, zero, zero, zero, one, mode="bilinear")
    b = warp_affine_chain(jnp.asarray(imgs), angle, zero, zero, zero, zero, one,
                          mode="bilinear", fused=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_compose_coeffs_math():
    rng = np.random.RandomState(3)
    angle, tx, ty, shx, shy, scale = rand_params(rng, 3)
    c1, c2, c3 = chain_coeffs(jnp.asarray(angle), jnp.asarray(tx), jnp.asarray(ty),
                              jnp.asarray(shx), jnp.asarray(shy), jnp.asarray(scale))
    comp = np.asarray(compose_inverse_coeffs(c1, compose_inverse_coeffs(c2, c3)))
    # check on random points: p_in via composed == chained evaluation
    pts = rng.randn(5, 2).astype(np.float32)
    for i in range(3):
        def apply(m, p):
            return np.stack([m[0] * p[..., 0] + m[1] * p[..., 1] + m[2],
                             m[3] * p[..., 0] + m[4] * p[..., 1] + m[5]], -1)
        step = apply(np.asarray(c1)[i], apply(np.asarray(c2)[i], apply(np.asarray(c3)[i], pts)))
        direct = apply(comp[i], pts)
        np.testing.assert_allclose(step, direct, rtol=1e-4, atol=1e-4)


def test_inverse_warp_recovers_heatmap_argmax():
    """Property: rendering a heatmap from affine-transformed keypoints, then
    inverse-warping with the stored aug_param, recovers the original argmax
    to within quantization tolerance (the trainer's core assumption,
    train_human.py:359-372)."""
    rng = np.random.RandomState(4)
    image_size, heatmap_size, ratio = (256, 256), (64, 64), 4.0
    kp = rng.uniform(80, 176, size=(8, 16, 2)).astype(np.float32)
    vis = np.ones((8, 16), np.float32)

    angle = rng.uniform(-60, 60, 8)
    shx = rng.uniform(-20, 20, 8)
    shy = rng.uniform(-20, 20, 8)
    tx = np.round(rng.uniform(-12, 12, 8))
    ty = np.round(rng.uniform(-12, 12, 8))
    scale = rng.uniform(0.8, 1.25, 8)

    kp_aug = np.asarray(affine_keypoints(
        jnp.asarray(kp), jnp.asarray(angle)[:, None], jnp.asarray(shx)[:, None],
        jnp.asarray(shy)[:, None], jnp.asarray(tx)[:, None], jnp.asarray(ty)[:, None],
        jnp.asarray(scale)[:, None], image_size))

    hm_aug = np.stack([np.asarray(generate_target(kp_aug[i], vis[i], heatmap_size, 2, image_size)[0])
                       for i in range(8)])
    aug_param = np.stack([-angle, -tx, -ty, -shx, -shy, 1.0 / scale], axis=-1)
    recon = np.asarray(inverse_warp_heatmaps(jnp.asarray(hm_aug), jnp.asarray(aug_param), ratio))

    flat = recon.reshape(8, 16, -1)
    got = np.stack([flat.argmax(-1) % 64, flat.argmax(-1) // 64], -1).astype(np.float32)
    expect = kp / ratio
    valid = flat.max(-1) > 0.5  # keypoints that stayed in frame through the warp
    assert valid.mean() > 0.8
    err = np.abs(got - expect).max(-1)
    assert np.percentile(err[valid], 90) <= 2.0  # nearest x3 resamples + render quantization


def test_backward_warp_roundtrip_center():
    """Forward chain then single-affine backward warp restores central pixels."""
    rng = np.random.RandomState(5)
    imgs = rng.rand(4, 3, 64, 64).astype(np.float32)
    angle = rng.uniform(-30, 30, 4)
    zero = np.zeros(4)
    scale = rng.uniform(0.9, 1.1, 4)
    aug = np.stack([angle, zero, zero, zero, zero, scale], -1)
    from uda_poseestimation_tpu.ops.affine import forward_warp_images
    fwd = forward_warp_images(jnp.asarray(imgs), jnp.asarray(aug), 4.0)
    back = np.asarray(backward_warp_images(fwd, jnp.asarray(aug), 4.0))
    # interior crop round-trips approximately under nearest resampling
    center = (slice(None), slice(None), slice(24, 40), slice(24, 40))
    close = np.isclose(back[center], imgs[center], atol=0.35)
    assert close.mean() > 0.7


def test_composed_nearest_chain_bit_exact():
    """The one-gather composed chain must equal the 3 sequential resamples."""
    rng = np.random.RandomState(7)
    imgs = rng.rand(6, 4, 64, 64).astype(np.float32)
    angle, tx, ty, shx, shy, scale = rand_params(rng, 6)
    from uda_poseestimation_tpu.ops.affine import chain_coeffs, warp_affine
    c1, c2, c3 = chain_coeffs(jnp.asarray(angle), jnp.asarray(tx), jnp.asarray(ty),
                              jnp.asarray(shx), jnp.asarray(shy), jnp.asarray(scale))
    seq = warp_affine(jnp.asarray(imgs), c1, "nearest")
    seq = warp_affine(seq, c2, "nearest")
    seq = warp_affine(seq, c3, "nearest")
    composed = warp_affine_chain(jnp.asarray(imgs), angle, tx, ty, shx, shy, scale,
                                 mode="nearest")
    np.testing.assert_array_equal(np.asarray(composed), np.asarray(seq))


def test_pallas_warp_gather_interpret():
    """One-hot MXU gather kernel (interpret mode) vs the XLA take gather."""
    import jax
    from uda_poseestimation_tpu.ops.affine import (
        chain_coeffs, compose_nearest_indices, _grid)
    from uda_poseestimation_tpu.ops.pallas_warp import warp_gather_onehot

    rng = np.random.RandomState(12)
    B_, K_, H_, W_ = 4, 5, 32, 32
    hms = jnp.asarray(rng.rand(B_, K_, H_, W_).astype(np.float32))
    angle, tx, ty, shx, shy, scale = rand_params(rng, B_)
    c1, c2, c3 = chain_coeffs(jnp.asarray(angle), jnp.asarray(tx), jnp.asarray(ty),
                              jnp.asarray(shx), jnp.asarray(shy), jnp.asarray(scale))
    y_c, x_c = _grid(H_, W_)

    def maps(cs):
        xs = jnp.broadcast_to(x_c, (H_, W_))
        ys = jnp.broadcast_to(y_c, (H_, W_))
        valid = jnp.ones((H_, W_), bool)
        xs, ys, valid = compose_nearest_indices(list(cs), xs, ys, valid, H_, W_)
        return ((xs + (W_ - 1) / 2).astype(jnp.int32).reshape(-1),
                (ys + (H_ - 1) / 2).astype(jnp.int32).reshape(-1),
                valid.reshape(-1))

    ix, iy, valid = jax.vmap(maps)(jnp.stack([c1, c2, c3], 1))
    ref = warp_affine_chain(hms, angle, tx, ty, shx, shy, scale, mode="nearest")
    got = warp_gather_onehot(hms, ix, iy, valid, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pallas_warp_bf16_gathers_bf16_values():
    """exact=False must return EXACTLY the bf16-cast source values: the
    single-dot kernel is bit-equivalent to the exact gather downstream of a
    bf16 cast (gather(bf16(x)) == bf16(gather(x)))."""
    from uda_poseestimation_tpu.ops.pallas_warp import warp_gather_onehot

    rng = np.random.RandomState(14)
    B_, K_, H_, W_ = 4, 3, 16, 16
    hms = jnp.asarray(rng.randn(B_, K_, H_, W_).astype(np.float32)) * 2.5
    ix = jnp.asarray(rng.randint(0, W_, (B_, H_ * W_)), jnp.int32)
    iy = jnp.asarray(rng.randint(0, H_, (B_, H_ * W_)), jnp.int32)
    valid = jnp.asarray(rng.rand(B_, H_ * W_) > 0.1)
    got = warp_gather_onehot(hms, ix, iy, valid, interpret=True, exact=False)
    hms_bf16 = hms.astype(jnp.bfloat16).astype(jnp.float32)
    ref = warp_gather_onehot(hms_bf16, ix, iy, valid, interpret=True, exact=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pallas_warp_sharded_interpret():
    """shard_map wrapper over the batch axis equals the unsharded kernel."""
    import jax
    from uda_poseestimation_tpu.ops.pallas_warp import (
        warp_gather_onehot, warp_gather_onehot_sharded)
    from uda_poseestimation_tpu.parallel import make_mesh

    rng = np.random.RandomState(13)
    B_, K_, H_, W_ = 8, 4, 16, 16
    hms = jnp.asarray(rng.rand(B_, K_, H_, W_).astype(np.float32))
    ix = jnp.asarray(rng.randint(0, W_, (B_, H_ * W_)), jnp.int32)
    iy = jnp.asarray(rng.randint(0, H_, (B_, H_ * W_)), jnp.int32)
    valid = jnp.asarray(rng.rand(B_, H_ * W_) > 0.1)
    ref = warp_gather_onehot(hms, ix, iy, valid, interpret=True)
    mesh = make_mesh(8)
    got = warp_gather_onehot_sharded(hms, ix, iy, valid, mesh, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
