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
