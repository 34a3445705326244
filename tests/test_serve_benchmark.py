"""tools/serve_benchmark.py: the serving-throughput harness runs and emits
its JSON contract (tiny registry model, CPU, chained-dispatch loop)."""

import json

import pytest


def test_serve_benchmark_emits_json_line(capsys):
    from tools import serve_benchmark

    serve_benchmark.main([
        "--platform", "cpu", "--arch", "pose_resnet50",
        "--image-size", "32", "--batch", "2", "--reps", "2",
    ])
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert rec["unit"] == "images/sec/chip"
    assert rec["value"] > 0
    assert rec["batch"] == 2
    assert rec["ms_per_batch"] > 0
    assert "pose_resnet50" in rec["metric"]


def test_serve_benchmark_prebuilt_artifact(tmp_path, capsys):
    """--artifact benchmarks a pre-exported file as-is (the true serving
    load path), no model rebuild/re-export."""
    import jax
    import jax.numpy as jnp

    from tools import serve_benchmark
    from tools.export_inference import export_model
    from uda_poseestimation_tpu.models import resnet as resnet_lib
    from uda_poseestimation_tpu.models.pose_resnet import PoseResNet

    size = 32
    backbone = resnet_lib.ResNet(block=resnet_lib.BasicBlock,
                                 stage_sizes=[1, 1])
    model = PoseResNet(backbone=backbone, num_keypoints=3)
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, x, train=False))(
        jax.random.PRNGKey(0))
    path = tmp_path / "tiny.jaxexp"
    path.write_bytes(export_model(model, variables, size, ["cpu"]).serialize())

    serve_benchmark.main([
        "--platform", "cpu", "--artifact", str(path),
        "--image-size", str(size), "--batch", "2", "--reps", "2",
    ])
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert rec["value"] > 0 and rec["batch"] == 2
    assert "tiny.jaxexp" in rec["metric"]
