"""Tests for meters, schedules, logger, and checkpoint roundtrips."""

import argparse
import os

import numpy as np
import optax

from uda_poseestimation_tpu.utils import (
    AverageMeter,
    AverageMeterList,
    CompleteLogger,
    ProgressMeter,
    multistep_lr,
    sigmoid_rampup,
)
from uda_poseestimation_tpu.utils.checkpoint import (
    filtered_update,
    load_checkpoint,
    save_checkpoint,
)


def test_average_meter_formats():
    m = AverageMeter("Loss (all)", ":.4e")
    m.update(0.5, 2)
    m.update(1.5, 2)
    assert abs(m.avg - 1.0) < 1e-9
    assert str(m) == "Loss (all) 1.5000e+00 (1.0000e+00)"


def test_average_meter_ignore_val():
    m = AverageMeterList([0, 1], ":3.2f", ignore_val=-1)
    m.update([-1, 0.5], 4)
    m.update([0.25, -1], 4)
    avg = m.average()
    assert avg[0] == 0.25 and avg[1] == 0.5


def test_progress_meter_line(capsys):
    m = AverageMeter("Time", ":4.2f")
    m.update(1.0)
    p = ProgressMeter(500, [m], prefix="Epoch: [3]")
    p.display(42)
    out = capsys.readouterr().out
    assert out.startswith("Epoch: [3][ 42/500]\tTime 1.00 (1.00)")


def test_multistep_lr_reference_convention():
    # step-at-epoch-start: milestone 45 first affects epoch 44
    assert multistep_lr(1e-4, 43, [45, 60]) == 1e-4
    assert abs(multistep_lr(1e-4, 44, [45, 60]) - 1e-5) < 1e-12
    assert abs(multistep_lr(1e-4, 59, [45, 60]) - 1e-6) < 1e-12
    assert sigmoid_rampup(0, 10) < sigmoid_rampup(10, 10) == 1.0


def test_checkpoint_roundtrip(tmp_path):
    params = {"backbone": {"conv1": {"kernel": np.random.rand(3, 3, 3, 8).astype(np.float32)}}}
    tx = optax.scale_by_adam()
    opt_state = tx.init(params)
    args = argparse.Namespace(lr=1e-4, lr_step=(45, 60), log="x", seed=None)
    path = str(tmp_path / "ckpt" / "best_pt.pth")
    save_checkpoint(path, {
        "student": {"params": params, "batch_stats": {}},
        "teacher": {"params": params, "batch_stats": {}},
        "stu_optimizer": opt_state,
        "lr_scheduler": {"epoch": 3},
        "epoch": 3,
        "args": args,
    })
    loaded = load_checkpoint(path)
    assert loaded["epoch"] == 3
    np.testing.assert_array_equal(
        loaded["student"]["params"]["backbone"]["conv1"]["kernel"],
        params["backbone"]["conv1"]["kernel"])
    assert loaded["args"]["lr"] == 1e-4

    # filtered update keeps unmatched leaves, copies matching ones
    fresh = {"backbone": {"conv1": {"kernel": np.zeros((3, 3, 3, 8), np.float32)},
                          "extra": {"w": np.ones(2)}}}
    merged = filtered_update(fresh, loaded["student"]["params"])
    np.testing.assert_array_equal(merged["backbone"]["conv1"]["kernel"],
                                  params["backbone"]["conv1"]["kernel"])
    np.testing.assert_array_equal(merged["backbone"]["extra"]["w"], np.ones(2))

    # optimizer state restores through flax serialization
    import flax.serialization
    restored = flax.serialization.from_state_dict(opt_state, loaded["stu_optimizer"])
    assert restored.count == opt_state.count


def test_complete_logger_paths(tmp_path, capsys):
    root = str(tmp_path / "logs" / "exp_pose_resnet101")
    logger = CompleteLogger(root, phase="train")
    logger.set_epoch(5)
    img_path = logger.get_image_path("x.jpg")
    ckpt_path = logger.get_checkpoint_path("best_pt")
    assert "output_viz" in img_path and img_path.endswith("visualize/5/x.jpg")
    assert "checkpoints" in ckpt_path and ckpt_path.endswith("best_pt.pth")
    logger.write("hello")
    logger.close()
    logs = [f for f in os.listdir(root) if f.startswith("train-")]
    assert logs
    with open(os.path.join(root, logs[0])) as f:
        assert "hello" in f.read()


def test_complete_logger_non_primary_mode(tmp_path):
    """file_output=False (non-primary distributed processes): identical
    path derivation with a pinned timestamp, but no dirs/files created and
    write() silenced — the multi-host logger contract."""
    root = str(tmp_path / "logs" / "exp_mp")
    primary = CompleteLogger(root, phase="train", now="2026-01-01-00_00_00")
    secondary = CompleteLogger(root + "2", phase="train",
                               now="2026-01-01-00_00_00", file_output=False)
    assert os.path.basename(os.path.dirname(
        primary.get_checkpoint_path("best"))) == os.path.basename(
        os.path.dirname(secondary.get_checkpoint_path("best")))
    secondary.set_epoch(3)
    secondary.write("never written")
    secondary.close()
    assert not os.path.exists(root + "2")
    assert not os.path.exists(secondary.checkpoint_directory)
    primary.close()


def test_distributed_helpers_single_process():
    """parallel/distributed.py helpers in the single-process regime (the
    default for every reference command line)."""
    import numpy as np
    import pytest

    from uda_poseestimation_tpu.parallel import distributed as dist

    assert dist.is_primary() and not dist.is_multiprocess()
    assert dist.process_count() == 1 and dist.process_index() == 0
    assert dist.local_batch_size(32) == 32
    assert dist.local_rows(8) == slice(0, 8)
    assert dist.broadcast_str("checkpoints_x") == "checkpoints_x"
    dist.barrier("noop")  # no-op single-process

    # control_rng: deterministic per (seed, epoch), distinct across epochs
    a, b = dist.control_rng(0, 1), dist.control_rng(0, 1)
    assert a.rand() == b.rand()
    assert dist.control_rng(0, 1).rand() != dist.control_rng(0, 2).rand()

    # host_local on a plain array / fully-addressable jax array
    x = np.arange(6).reshape(3, 2)
    np.testing.assert_array_equal(dist.host_local(x), x)


def test_distributed_batch_split_multiprocess_semantics(monkeypatch):
    """local_batch_size/local_rows under a simulated 2-process world:
    even split, contiguous rank-ordered rows, divisibility error."""
    import jax
    import pytest

    from uda_poseestimation_tpu.parallel import distributed as dist

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    assert dist.local_batch_size(32) == 16
    with pytest.raises(ValueError, match="not divisible"):
        dist.local_batch_size(33)
    assert dist.local_rows(8) == slice(4, 8)
    assert not dist.is_primary() and dist.is_multiprocess()


def test_launch_distributed_helper():
    """tools/launch_distributed.py: appends the --dist-* rank wiring, streams
    rank-0 output unprefixed / other ranks prefixed, propagates failures."""
    import io
    import sys

    from tools.launch_distributed import launch

    probe = ("import sys; a=sys.argv; "
             "print('ARGS', a[a.index('--dist-process-id')+1], "
             "a[a.index('--dist-num-processes')+1])")
    out = io.StringIO()
    rc = launch(2, [sys.executable, "-c", probe], stream=out)
    assert rc == 0
    lines = sorted(out.getvalue().splitlines())
    assert lines == ["ARGS 0 2", "[rank 1] ARGS 1 2"]

    rc = launch(2, [sys.executable, "-c",
                    "import sys; sys.exit(3)"], stream=io.StringIO())
    assert rc == 3
