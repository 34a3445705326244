"""AdaIN decoder-pretraining engine: one jitted step decreases the loss."""

import jax
import jax.numpy as jnp
import numpy as np

from uda_poseestimation_tpu.adain_engine import make_decoder_step
from uda_poseestimation_tpu.models import StyleNet


def test_decoder_step_learns():
    rng = np.random.RandomState(0)
    style = StyleNet(style_loss_kind="meanstd")
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda r: style.init(r, dummy, dummy))(jax.random.PRNGKey(0))
    enc = variables["params"]["encoder"]
    dec = variables["params"]["decoder"]
    step, tx = make_decoder_step(content_weight=1.0, style_weight=1.0, lr=1e-3)
    opt = tx.init(dec)
    content = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    style_imgs = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    losses = []
    for _ in range(5):
        dec, opt, loss, loss_c, loss_s, g_t = step(dec, opt, enc, content, style_imgs)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # decoder-only optimization makes progress
    assert g_t.shape == (2, 64, 64, 3)
