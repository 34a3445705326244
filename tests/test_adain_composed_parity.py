"""Composed parity of the AdaIN decoder-training step vs the reference's
ACTUAL adain/net.py math.

Components (VGG encoder, decoder, adain, mean/std losses) are parity-tested
individually elsewhere; this file runs ONE full decoder-training step —
encode_with_intermediate -> adain -> decode -> re-encode -> content loss
against t + 4-level mean/std style loss -> weighted sum -> backward ->
optimizer step (adain/train/train_human.py:208-215, adain/net.py:252-268) —
through the engine's own jitted ``make_decoder_step`` and the reference's own
``Net`` module on torch CPU, with identical ported weights and batches. A
composition slip (loss weighting, t vs style target, level count, frozen
encoder leaking grads) fails these assertions while every component test
would still pass.

SGD is injected on both sides so the post-step parameter delta is LINEAR in
the gradient (Adam's first step is ~sign(g)*lr — pure cross-framework noise;
see tests/test_composed_parity.py::_assert_deltas_close).
"""

import copy
import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch
import torch.nn as tnn

from tools.port_torch_weights import convert_decoder, convert_vgg_encoder
from uda_poseestimation_tpu.adain_engine import make_decoder_step

REF = "/root/reference"
pytestmark = [
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted"),
    pytest.mark.slow,  # torch-oracle decoder training steps (fast lane skips)
]

B, IMG = 2, 64
CW, SW, LR = 1.0, 0.5, 1e-2


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_net():
    # adain/net.py does `from function import ...` (script-style import)
    _load("function", os.path.join(REF, "adain/function.py"))
    return _load("ref_adain_net", os.path.join(REF, "adain/net.py"))


def _randomize_convs(module, rs):
    for m in module.modules():
        if isinstance(m, tnn.Conv2d):
            fan_in = m.in_channels * m.kernel_size[0] * m.kernel_size[1]
            m.weight.data = torch.tensor(
                rs.normal(0.0, np.sqrt(2.0 / fan_in), size=tuple(m.weight.shape)),
                dtype=torch.float32)
            m.bias.data = torch.tensor(
                rs.normal(0.0, 0.01, size=tuple(m.bias.shape)),
                dtype=torch.float32)


def test_decoder_step_matches_reference_net(ref_net):
    rs = np.random.RandomState(0)
    vgg = copy.deepcopy(ref_net.vgg)
    decoder = copy.deepcopy(ref_net.decoder)
    _randomize_convs(vgg, rs)
    _randomize_convs(decoder, rs)

    enc_params = convert_vgg_encoder(vgg.state_dict())
    dec_params = convert_decoder(decoder.state_dict())

    content = rs.rand(B, 3, IMG, IMG).astype(np.float32)
    style_img = rs.rand(B, 3, IMG, IMG).astype(np.float32)

    # --- torch oracle: the reference's Net + training-iteration math -------
    net = ref_net.Net(tnn.Sequential(*list(vgg.children())[:31]), decoder)
    net.train()
    opt = torch.optim.SGD(net.decoder.parameters(), lr=LR)
    before_sd = {k: v.detach().clone() for k, v in decoder.state_dict().items()}
    loss_c_ref, loss_s_ref, g_t_ref = net(torch.tensor(content),
                                          torch.tensor(style_img))
    loss_c_ref = CW * loss_c_ref
    loss_s_ref = SW * loss_s_ref
    opt.zero_grad()
    (loss_c_ref + loss_s_ref).backward()
    opt.step()
    loss_c_ref = loss_c_ref.detach()
    loss_s_ref = loss_s_ref.detach()
    delta_ref = convert_decoder({
        k: decoder.state_dict()[k] - before_sd[k] for k in before_sd})

    # --- engine step (jitted, SGD injected) --------------------------------
    step, tx = make_decoder_step(CW, SW, LR, tx=optax.sgd(LR))
    new_dec, _, loss, loss_c, loss_s, g_t = step(
        dec_params, tx.init(dec_params), enc_params,
        jnp.asarray(content.transpose(0, 2, 3, 1)),
        jnp.asarray(style_img.transpose(0, 2, 3, 1)))

    np.testing.assert_allclose(float(loss_c), float(loss_c_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(loss_s), float(loss_s_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(loss), float(loss_c_ref + loss_s_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g_t).transpose(0, 3, 1, 2), g_t_ref.detach().numpy(),
        atol=5e-4, rtol=1e-3)

    # post-SGD parameter deltas: linear in the decoder gradient
    delta = jax.tree_util.tree_map(lambda a, b: np.asarray(a) - np.asarray(b),
                                   new_dec, dec_params)
    flat = jax.tree_util.tree_flatten_with_path(delta)[0]
    ref_flat = dict((jax.tree_util.keystr(p), v) for p, v in
                    jax.tree_util.tree_flatten_with_path(delta_ref)[0])
    assert flat and len(flat) == len(ref_flat)
    for p, a in flat:
        b = ref_flat[jax.tree_util.keystr(p)]
        err = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)
        assert err < 0.05, f"{jax.tree_util.keystr(p)}: delta rel-L2 {err:.3e}"
