"""tools/run_benchmarks.py — the accuracy-parity harness (VERDICT r4 §5).

Fast lane: every materialized canonical command parses through the real
trainer argparsers, --dry-run prints all 6, and the log parser extracts the
best target 'all' PCK from a synthesized CompleteLogger transcript.

Slow lane: the harness actually RUNS an injected fixture benchmark
(fake-RHD, tiny sizes) end to end through a trainer subprocess, parses the
real log it wrote, and emits the results table/JSON — the exact machinery a
user points at the real datasets.
"""

import json
import os
import sys

import pytest

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TESTS_DIR)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from tools import run_benchmarks as rb


def test_all_canonical_commands_parse():
    for name, spec in rb.BENCHMARKS.items():
        cmd = rb.build_command(name, spec, "/data", "logs/bench", [])
        argv = cmd[2:]  # strip interpreter + trainer path
        if spec["trainer"] == "train_human.py":
            from train_human import build_parser
        else:
            from train_animal import build_parser
        args = build_parser().parse_args(argv)
        assert args.pretrain_epoch == 40 and args.batch_size == 32
        assert args.s2t_freq == 0.5 and args.occlude_thresh == 0.9


def test_dry_run_prints_all_six(capsys, tmp_path):
    results = rb.main(["--data-root", "/data", "--dry-run",
                       "--log-root", str(tmp_path / "logs")])
    out = capsys.readouterr().out
    assert set(results) == set(rb.BENCHMARKS)
    assert all(v == "DRY-RUN" for v in results.values())
    for name in rb.BENCHMARKS:
        assert f"[{name}]" in out
    assert "| benchmark | target 'all' PCK@0.05 |" in out


def test_root_override_rewrites_path(capsys, tmp_path):
    rb.main(["--data-root", "/data", "--dry-run", "--only", "RHD2H3D",
             "--root", "RHD=/elsewhere/rhd",
             "--log-root", str(tmp_path / "logs")])
    out = capsys.readouterr().out
    assert "/elsewhere/rhd" in out and "/data/RHD " not in out


def test_parse_result_extracts_best_pck(tmp_path):
    log_root = tmp_path / "x_pose_resnet101"
    log_root.mkdir()
    (log_root / "train-2026.txt").write_text(
        "Epoch: 0 Source: 0.500 Target: 0.100 Target(best): 0.100\n"
        "all: 0.100\nhead: 0.200\n"
        "Epoch: 1 Source: 0.600 Target: 0.300 Target(best): 0.300\n"
        "all: 0.300\nhead: 0.400\n"
        "Epoch: 2 Source: 0.650 Target: 0.250 Target(best): 0.300\n"
        "all: 0.250\nhead: 0.350\n")
    res = rb.parse_result(str(tmp_path / "x"))
    assert res["best_target_all_pck"] == 0.300
    assert res["epochs_seen"] == 3
    assert res["final_groups"] == {"all": 0.250, "head": 0.350}


def test_parse_result_missing_log():
    assert rb.parse_result("/nonexistent/zzz") is None


def test_render_table_placeholders():
    table = rb.render_table({"RHD2H3D": {"best_target_all_pck": 0.5,
                                         "epochs_seen": 1,
                                         "final_groups": {}, "log": "x"},
                             "SURREAL2LSP": "FAILED (rc=1)"})
    assert "0.500" in table and "FAILED" in table
    assert "fill from arXiv:2204.00172" in table


@pytest.mark.slow  # real trainer subprocess run (fast lane skips)
def test_harness_end_to_end_on_fixture(tmp_path, monkeypatch):
    """Inject a fixture benchmark and drive the FULL harness path: build ->
    subprocess trainer run -> log parse -> table/JSON."""
    from tools.make_fixtures import make_rhd

    root = str(tmp_path / "data" / "RHDfix")
    make_rhd(root, n_train=24, n_eval=8)
    log_root = str(tmp_path / "logs")

    fixture_spec = {
        "trainer": "train_human.py",
        "argv": ["{root}/RHDfix", "{root}/RHDfix",
                 "-s", "RenderedHandPose", "-t", "RenderedHandPose",
                 "--target-train", "RenderedHandPose_mt",
                 "--log", "{log}/fix_exp/run", "--seed", "0"],
    }
    monkeypatch.setitem(rb.BENCHMARKS, "FIXTURE", fixture_spec)
    monkeypatch.setitem(rb.PAPER_PCK, "FIXTURE", 0.9)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.delenv("XLA_FLAGS", raising=False)
    monkeypatch.delenv("PYTHONPATH", raising=False)
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")

    results = rb.main([
        "--data-root", str(tmp_path / "data"), "--log-root", log_root,
        "--only", "FIXTURE", "--arch", "pose_resnet50",
        "--out", str(tmp_path / "res.json"),
        "--extra", "--image-size", "64", "--heatmap-size", "16",
        "-a", "pose_resnet50", "-b", "8", "--test-batch", "8",
        "--epochs", "1", "--pretrain-epoch", "-1", "-i", "2", "-p", "1",
        "--val-print-freq", "1", "--device-aug"])

    res = results["FIXTURE"]
    assert isinstance(res, dict), res
    assert res["epochs_seen"] == 1
    assert 0.0 <= res["best_target_all_pck"] <= 1.0
    assert "all" in res["final_groups"]
    saved = json.load(open(tmp_path / "res.json"))
    assert "FIXTURE" in saved["results"] and "table" in saved


def test_gain_drive_parser(tmp_path):
    """tools/run_gain_drive.py parses the epoch-summary log contract
    (train_human.py:385) and reports the adaptation-phase delta."""
    from tools import run_gain_drive as gd

    adapt = tmp_path / "adapt"
    ctl = tmp_path / "control"
    adapt.mkdir(), ctl.mkdir()
    # stale log from an earlier/killed run: must be ignored (latest only)
    (adapt / "train-2026-01-01-00_00_00.txt").write_text(
        "Epoch: 0 Source: 0.900 Target: 0.900 Target(best): 0.900\n"
        "Epoch: 5 Source: 0.900 Target: 0.900 Target(best): 0.900\n")
    (adapt / "train-2026-01-02-00_00_00.txt").write_text(
        "Epoch: 0 Source: 0.100 Target: 0.080 Target(best): 0.080\n"
        "all: 0.080\n"
        "Epoch: 1 Source: 0.300 Target: 0.250 Target(best): 0.250\n")
    (ctl / "train-y.txt").write_text(
        "Epoch: 0 Source: 0.100 Target: 0.080 Target(best): 0.080\n"
        "Epoch: 1 Source: 0.350 Target: 0.120 Target(best): 0.120\n")
    assert gd.parse_curve(str(adapt)) == [(0, 0.1, 0.08), (1, 0.3, 0.25)]
    a, c = gd.report(str(adapt), str(ctl), pretrain_epoch=1)
    assert len(a) == 2 and len(c) == 2
    with pytest.raises(SystemExit):
        gd.report(str(tmp_path / "nope"), str(ctl), pretrain_epoch=1)
