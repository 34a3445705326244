"""Multi-host data parallelism at the TRAINER level.

tests/test_multiprocess.py proves the fused step across real process
boundaries; this file proves the full CLI path: two actual
``train_human.py`` processes joined via ``--dist-coordinator`` (gloo CPU
collectives, 1 device each) run one adaptation epoch over a mesh spanning
both processes, covering the wiring only main() owns:

- ``maybe_initialize_from_args`` + the broadcast checkpoint-dir timestamp
  (every process derives the same ``checkpoints_<ts>`` path);
- per-process local batches (``-b 8`` -> 4 rows each) assembled into
  global arrays by ``shard_batch``;
- process-0-only logs/visualization/checkpoints (``CompleteLogger``
  ``file_output=False`` on rank 1);
- the sharded multi-process ``run_validate`` row-slice path;
- the --steps-per-dispatch bundled scan under multi-process (lead_axes=1
  global-array assembly; process-synchronized per-iteration gate/PRNG
  arrays feeding the AdaptStepBundler).

Both processes must exit 0; rank 0 must write the reference's log
artifacts; rank 1 must write nothing.
"""

import glob
import os
import re
import subprocess
import sys

from _mp_worker import free_port
from tools.make_fixtures import make_rhd

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TESTS_DIR)


def test_two_process_train_human(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rhd_mp"))
    make_rhd(root, n_train=24, n_eval=8)
    log_dir = str(tmp_path_factory.mktemp("out") / "logs" / "mp")

    port = free_port()
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env.pop("XLA_FLAGS", None)  # 1 CPU device per process
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")

    argv = [root, root, "-s", "RenderedHandPose", "-t", "RenderedHandPose",
            "--target-train", "RenderedHandPose_mt", "--image-size", "64",
            "--heatmap-size", "16", "-a", "pose_resnet50", "-b", "8",
            "--test-batch", "8", "--epochs", "1", "--pretrain-epoch", "-1",
            "-i", "2", "-p", "1", "--val-print-freq", "1", "--seed", "0",
            "--device-aug", "--steps-per-dispatch", "2", "--log", log_dir,
            "--dist-coordinator", f"localhost:{port}",
            "--dist-num-processes", "2"]
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, "train_human.py")]
        + argv + ["--dist-process-id", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env=env) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            # generous: two trainer processes compile concurrently on a
            # 1-core box; cold-cache pairs can take many minutes
            out, _ = p.communicate(timeout=2400)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-6000:]

    # rank 0 wrote the reference's log contract into the shared dir
    log_root = log_dir + "_pose_resnet50"
    txts = glob.glob(os.path.join(log_root, "train-*.txt"))
    assert len(txts) == 1, txts
    text = open(txts[0]).read()
    assert re.search(r"Epoch: 0 Source: \d+\.\d+ Target: \d+\.\d+", text), \
        text[-2000:]
    assert re.search(r"^all: \d+\.\d+$", text, re.M), text[-2000:]

    # rank 1 logged nothing: exactly one process printed progress lines
    printers = [out for out in outs if "Epoch: [0]" in out]
    assert len(printers) == 1, [o[-500:] for o in outs]
