"""Model smoke tests + loss parity vs torch-formula oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from uda_poseestimation_tpu.models import (
    StyleNet,
    ema_update,
    loss as L,
    pose_resnet50,
    backbone_param_mask,
)


def test_pose_resnet_shapes_and_state():
    model = pose_resnet50(num_keypoints=21)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    assert "params" in variables and "batch_stats" in variables
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 21, 16, 16)  # stride 32 backbone, x8 deconv
    # train mode updates batch stats
    y2, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert y2.shape == (2, 21, 16, 16)
    assert "batch_stats" in mutated
    mask = backbone_param_mask(variables["params"])
    leaves = jax.tree_util.tree_leaves(mask)
    assert any(leaves) and not all(leaves)


def test_stem_modes_exact():
    """All StemConv modes (direct / space-to-depth / im2col) compute the
    same function from the same 7x7 parameter: exact up to f32 summation
    order, fwd and wgrad."""
    from uda_poseestimation_tpu.models.resnet import StemConv

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    direct = StemConv(features=16, mode="direct")
    params = direct.init(jax.random.PRNGKey(1), x)
    y_ref = direct.apply(params, x)
    assert y_ref.shape == (2, 16, 16, 16)

    def loss(p, mod):
        return (mod.apply(p, x) ** 2).sum()

    g_ref = jax.grad(loss)(params, direct)
    for mode in ("s2d", "im2col"):
        mod = StemConv(features=16, mode=mode)
        np.testing.assert_allclose(np.asarray(mod.apply(params, x)),
                                   np.asarray(y_ref), atol=2e-5,
                                   err_msg=mode)
        g = jax.grad(loss)(params, mod)
        for a, b in zip(jax.tree_util.tree_leaves(g),
                        jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-2, rtol=1e-5, err_msg=mode)

    # odd spatial sizes fall back to the direct conv under s2d
    x_odd = jnp.asarray(rng.randn(1, 31, 31, 3).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(StemConv(features=16, mode="s2d").apply(params, x_odd)),
        np.asarray(direct.apply(params, x_odd)), atol=2e-5)


def test_vgg_stem_im2col_exact():
    """_ConvBlock(im2col=True) == the stock reflect-pad conv under shared
    parameters (style_net.py UDA_VGG_IM2COL path)."""
    from uda_poseestimation_tpu.models.style_net import _ConvBlock

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 17, 23, 3).astype(np.float32))
    stock = _ConvBlock(8)
    fast = _ConvBlock(8, im2col=True)
    params = stock.init(jax.random.PRNGKey(5), x)
    np.testing.assert_allclose(np.asarray(fast.apply(params, x)),
                               np.asarray(stock.apply(params, x)), atol=2e-5)


def test_upconv_subpixel_exact():
    """_UpConvBlock == nearest-2x-upsample -> reflect-pad -> conv3x3 with the
    SAME parameters (the subpixel identity, ops/subpixel.py)."""
    from uda_poseestimation_tpu.models.style_net import (
        _ConvBlock,
        _UpConvBlock,
        _upsample_nearest2x,
    )

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 9, 13, 8).astype(np.float32))
    fused = _UpConvBlock(12)
    refblk = _ConvBlock(12)
    params = fused.init(jax.random.PRNGKey(2), x)

    y1 = fused.apply(params, x)
    y2 = refblk.apply(params, _upsample_nearest2x(x))
    assert y1.shape == (2, 18, 26, 12)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-5)

    def loss(p, run):
        return (run(p) ** 2).sum()

    g1 = jax.grad(loss)(params, lambda p: fused.apply(p, x))
    g2 = jax.grad(loss)(params, lambda p: refblk.apply(p, _upsample_nearest2x(x)))
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3,
                                   rtol=1e-5)


def test_deconv_both_paths_match_torch_convtranspose(monkeypatch):
    """Deconv(k=4): BOTH evaluations — the default dilated conv and the
    UDA_PHASE_DECONV subpixel phase form — match torch
    ConvTranspose2d(4, s=2, p=1) under the same parameters."""
    from uda_poseestimation_tpu.models import pose_resnet as pr

    rng = np.random.RandomState(2)
    x = rng.randn(2, 5, 7, 6).astype(np.float32)
    deconv = pr.Deconv(4, kernel_size=4, use_bias=True)
    params = deconv.init(jax.random.PRNGKey(3), jnp.asarray(x))
    kernel = np.asarray(params["params"]["kernel"])  # (4,4,in,out)
    bias = np.asarray(params["params"]["bias"])

    ref = torch.nn.ConvTranspose2d(6, 4, 4, stride=2, padding=1, bias=True)
    with torch.no_grad():
        ref.weight.copy_(torch.tensor(kernel.transpose(2, 3, 0, 1)))
        ref.bias.copy_(torch.tensor(bias))
    y_ref = ref(torch.tensor(x.transpose(0, 3, 1, 2))).detach().numpy()

    for phase in (False, True):
        monkeypatch.setattr(pr, "_PHASE_DECONV", phase)
        y = deconv.apply(params, jnp.asarray(x))
        assert y.shape == (2, 10, 14, 4)
        np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), y_ref,
                                   atol=1e-5, err_msg=f"phase={phase}")


def test_decoder_subpixel_flag_equivalent(monkeypatch):
    """The UDA_SUBPIXEL_DECODER Decoder shares one parameter tree with the
    default path and computes the same function."""
    from uda_poseestimation_tpu.models import style_net as sn

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 8, 512).astype(np.float32) * 0.1)
    monkeypatch.setattr(sn, "_SUBPIXEL_DECODER", False)
    dec = sn.Decoder()
    params = dec.init(jax.random.PRNGKey(4), x)
    y_base = dec.apply(params, x)
    monkeypatch.setattr(sn, "_SUBPIXEL_DECODER", True)
    y_sub = sn.Decoder().apply(params, x)
    assert y_sub.shape == y_base.shape == (1, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(y_sub), np.asarray(y_base),
                               atol=2e-5)


def test_style_net_shapes():
    model = StyleNet()
    content = jnp.zeros((1, 64, 64, 3), jnp.float32)
    style = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), content, style)
    loss_c, loss_s, g_t = model.apply(variables, content, style, 0.7)
    assert g_t.shape == (1, 64, 64, 3)
    assert np.isfinite(float(loss_c)) and np.isfinite(float(loss_s))
    out = model.apply(variables, content, style, method=StyleNet.stylize)
    assert out.shape == (1, 64, 64, 3)


def test_joints_mse_loss_matches_torch_formula():
    rng = np.random.RandomState(0)
    out = rng.randn(4, 16, 8, 8).astype(np.float32)
    tgt = rng.randn(4, 16, 8, 8).astype(np.float32)
    w = (rng.rand(4, 16, 1) > 0.3).astype(np.float32)
    to, tt = torch.tensor(out), torch.tensor(tgt)
    ref = (F.mse_loss(to.reshape(4, 16, -1), tt.reshape(4, 16, -1), reduction="none")
           * 0.5 * torch.tensor(w).view(4, 16, 1)).mean().item()
    got = float(L.joints_mse_loss(jnp.asarray(out), jnp.asarray(tgt), jnp.asarray(w)))
    assert abs(ref - got) < 1e-6
    ref_none = (F.mse_loss(to.reshape(4, 16, -1), tt.reshape(4, 16, -1), reduction="none")
                * 0.5 * torch.tensor(w).view(4, 16, 1)).mean(dim=-1).numpy()
    got_none = np.asarray(L.joints_mse_loss(jnp.asarray(out), jnp.asarray(tgt),
                                            jnp.asarray(w), reduction="none"))
    np.testing.assert_allclose(got_none, ref_none, atol=1e-6)


def test_cons_loss_matches_torch_formula():
    rng = np.random.RandomState(1)
    stu = rng.randn(4, 16, 8, 8).astype(np.float32)
    tea = rng.randn(4, 16, 8, 8).astype(np.float32)
    mask = (rng.rand(4, 16) > 0.5).astype(np.float32)
    diff = torch.tensor(stu) - torch.tensor(tea)
    diff = diff * torch.tensor(mask)[:, :, None, None]
    ref = torch.mean(diff ** 2, dim=1).mean().item()
    got = float(L.cons_loss(jnp.asarray(stu), jnp.asarray(tea), tea_mask=jnp.asarray(mask)))
    assert abs(ref - got) < 1e-6


def test_joints_kl_loss_matches_torch():
    rng = np.random.RandomState(2)
    out = rng.randn(3, 5, 6, 6).astype(np.float32)
    tgt = np.abs(rng.randn(3, 5, 6, 6)).astype(np.float32)
    pred = F.log_softmax(torch.tensor(out).reshape(3, 5, -1), dim=-1)
    gt = torch.tensor(tgt).reshape(3, 5, -1)
    gt = gt / gt.sum(dim=-1, keepdim=True)
    ref = torch.nn.KLDivLoss(reduction="none")(pred, gt).sum(dim=-1).mean().item()
    got = float(L.joints_kl_loss(jnp.asarray(out), jnp.asarray(tgt)))
    assert abs(ref - got) < 1e-5


def test_ent_loss_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 4, 8, 8).astype(np.float32)
    t = torch.tensor(x).reshape(2, 4, -1)
    p = F.softmax(t, dim=2)
    ent = (-(p * F.log_softmax(t, dim=2)).sum(dim=2) / np.log(64)).mean().item()
    got = float(L.ent_loss(jnp.asarray(x)))
    assert abs(ent - got) < 1e-6


def test_coral_loss_matches_torch():
    rng = np.random.RandomState(4)
    src = rng.randn(6, 3, 4, 4).astype(np.float32)
    tgt = rng.randn(6, 3, 4, 4).astype(np.float32)
    n, c, h, w = tgt.shape
    s, t = torch.tensor(src).view(n, -1), torch.tensor(tgt).view(n, -1)
    tmp_s = torch.ones((1, n)) @ s
    cs = (s.T @ s - (tmp_s.T @ tmp_s) / n) / (n - 1)
    tmp_t = torch.ones((1, n)) @ t
    ct = (t.T @ t - (tmp_t.T @ tmp_t) / n) / (n - 1)
    ref = ((cs - ct).pow(2).sum().sqrt() / (4 * (c * h * w) ** 2)).item()
    # no precision context: coral_loss itself must request f32 matmuls
    # (TPU default truncates to bf16; the cs-ct subtraction is catastrophic)
    got = float(L.coral_loss(jnp.asarray(src), jnp.asarray(tgt)))
    assert abs(ref - got) / max(abs(ref), 1e-12) < 1e-4

    # coral_downsample > 1: torch F.interpolate(bilinear) point-samples
    # (no antialias) — full-path oracle via the reference's formula
    import torch.nn.functional as tF
    ds = 2
    s4 = tF.interpolate(torch.tensor(src), scale_factor=1 / ds, mode="bilinear")
    t4 = tF.interpolate(torch.tensor(tgt), scale_factor=1 / ds, mode="bilinear")
    n2, c2, h2, w2 = t4.shape
    s2, t2 = s4.reshape(n2, -1), t4.reshape(n2, -1)
    tmp_s = torch.ones((1, n2)) @ s2
    cs2 = (s2.T @ s2 - (tmp_s.T @ tmp_s) / n2) / (n2 - 1)
    tmp_t = torch.ones((1, n2)) @ t2
    ct2 = (t2.T @ t2 - (tmp_t.T @ tmp_t) / n2) / (n2 - 1)
    ref2 = ((cs2 - ct2).pow(2).sum().sqrt() / (4 * (c2 * h2 * w2) ** 2)).item()
    got2 = float(L.coral_loss(jnp.asarray(src), jnp.asarray(tgt),
                              coral_downsample=ds))
    assert abs(ref2 - got2) / max(abs(ref2), 1e-12) < 1e-4


def test_ema_update():
    stu = {"a": jnp.ones((3,)) * 2.0, "b": {"c": jnp.ones((2, 2))}}
    tea = {"a": jnp.zeros((3,)), "b": {"c": jnp.zeros((2, 2))}}
    out = ema_update(tea, stu, alpha=0.9)
    np.testing.assert_allclose(np.asarray(out["a"]), 0.2 * np.ones(3), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["b"]["c"]), 0.1 * np.ones((2, 2)), rtol=1e-6)
