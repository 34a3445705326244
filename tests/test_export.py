"""Serving export: jax.export artifact round-trips and matches the model.

tools/export_inference.py AOT-exports the inference fn (heatmaps +
get_max_preds decode) with a symbolic batch dim; a consumer needs only
``jax.export.deserialize`` + ``.call``. These tests export a tiny
PoseResNet, round-trip through the serialized bytes, and check output
parity and batch polymorphism (the serving contract).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uda_poseestimation_tpu.models import resnet as resnet_lib
from uda_poseestimation_tpu.models.pose_resnet import PoseResNet

from tools.export_inference import build_inference_fn, export_model

SIZE, K = 32, 3


@pytest.fixture(scope="module")
def tiny_model():
    backbone = resnet_lib.ResNet(block=resnet_lib.BasicBlock,
                                 stage_sizes=[1, 1])
    model = PoseResNet(backbone=backbone, num_keypoints=K)
    x = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, x, train=False))(
        jax.random.PRNGKey(0))
    return model, variables


def test_export_round_trip_matches_direct_forward(tiny_model):
    model, variables = tiny_model
    exported = export_model(model, variables, SIZE, ["cpu"])
    blob = exported.serialize()
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 0

    restored = jax.export.deserialize(bytearray(blob))
    x = np.random.RandomState(1).rand(2, SIZE, SIZE, 3).astype(np.float32)
    hm, preds, maxvals = restored.call(x)

    fn = build_inference_fn(model)
    ref_hm, ref_preds, ref_maxvals = jax.jit(fn)(
        variables["params"], variables["batch_stats"], jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(hm), np.asarray(ref_hm), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(preds), np.asarray(ref_preds))
    np.testing.assert_allclose(np.asarray(maxvals), np.asarray(ref_maxvals),
                               atol=1e-6)


def test_export_symbolic_batch(tiny_model):
    """One artifact serves any batch size (symbolic leading dim)."""
    model, variables = tiny_model
    restored = jax.export.deserialize(
        bytearray(export_model(model, variables, SIZE, ["cpu"]).serialize()))
    for b in (1, 5):
        x = np.random.RandomState(b).rand(b, SIZE, SIZE, 3).astype(np.float32)
        hm, preds, maxvals = restored.call(x)
        assert hm.shape[0] == b and preds.shape == (b, K, 2)
        assert np.isfinite(np.asarray(hm)).all()


def test_export_cli_from_trainer_checkpoint(tmp_path, capsys):
    """The CLI path end to end: a trainer-written (torch-pickle) checkpoint
    -> tools/export_inference.main() -> serialized artifact whose --selfcheck
    compares the deserialized call against a direct forward. Covers
    load_variables (load_checkpoint + filtered_update merge of the teacher
    entry) and the argparse surface."""
    from tools.export_inference import main
    from uda_poseestimation_tpu.models import pose_resnet50
    from uda_poseestimation_tpu.utils.checkpoint import save_checkpoint

    model = pose_resnet50(num_keypoints=K, dtype=jnp.bfloat16)
    x = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, x, train=False))(
        jax.random.PRNGKey(2))
    entry = {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}
    ckpt = str(tmp_path / "best.pth")
    save_checkpoint(ckpt, {"student": entry, "teacher": entry, "epoch": 0})

    out = str(tmp_path / "model.jaxexp")
    main([ckpt, out, "--arch", "pose_resnet50", "--num-keypoints", str(K),
          "--image-size", str(SIZE), "--platforms", "cpu", "--selfcheck"])
    stdout = capsys.readouterr().out
    assert "selfcheck ok" in stdout, stdout[-2000:]

    restored = jax.export.deserialize(open(out, "rb").read())
    hm, preds, _ = restored.call(
        np.random.RandomState(3).rand(2, SIZE, SIZE, 3).astype(np.float32))
    # heatmaps follow the reference's (B, K, H, W) layout
    assert hm.shape == (2, K, SIZE // 4, SIZE // 4) and preds.shape == (2, K, 2)
