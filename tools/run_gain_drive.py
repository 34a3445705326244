"""Adaptation-gain demonstration harness (VERDICT r4 item 2).

The reference exists to LIFT target PCK via unsupervised adaptation
(reference train_human.py:305-458). Real datasets are unavailable on this
testbed, so the demonstration uses the fixture pair from
``tools/make_fixtures.py``:

- source: ``rhd`` (clean blob-learnable RHD clone)
- target: ``rhd_shifted`` — the same blob-detection task under a strong
  appearance shift (gamma curve, contrast squeeze, color cast, stripe
  texture). Keypoints are drawn from the same distribution but are NOT
  image-paired with the source set (different RNG stream), matching how a
  real target domain relates to a synthetic source. ``--shift hard`` uses
  the ``rhd_shifted_hard`` variant instead (multiplicative texture +
  SNR-reduced blobs; see PERF.md for both variants' measured outcomes).

Two drives at the canonical deployed config (pose_resnet101, 256^2, b=32,
--device-aug --decode-cache 2 --steps-per-dispatch 8, seed 0):

1. ``adapt``   — N pretrain epochs on source, then mean-teacher adaptation
                 (consistency + occlusion) on the shifted target;
2. ``control`` — the SAME schedule kept in pretrain (source-only) for all
                 epochs: what happens to target PCK without adaptation.

Gain = (adapt run's target-'all' PCK in the adaptation phase) vs both the
frozen-pretrain level and the control's curve. Curves land in PERF.md.

Usage:
    python tools/run_gain_drive.py run [--epochs 8 --pretrain-epoch 3 -i 75]
    python tools/run_gain_drive.py parse <adapt_log_dir> <control_log_dir>

``run`` regenerates the fixtures, executes both drives sequentially
(sequential: the 1-core testbed cannot feed two canonical drives), then
parses. ``parse`` re-reads an existing pair of CompleteLogger directories
(the ``<log>_<arch>`` dirs holding ``train-*.txt``; epoch-summary line
contract, train_human.py:385 — parsed with tools/run_benchmarks.py's
regex, LATEST log file per directory only).
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.run_benchmarks import _EPOCH_RE  # single source for the contract


def parse_curve(log_dir: str):
    """-> sorted [(epoch, source_pck, target_pck)] from the LATEST
    train-*.txt in ``log_dir`` (CompleteLogger keeps one per invocation;
    stale files from earlier/killed runs must not leak into the curve)."""
    txts = sorted(glob.glob(os.path.join(log_dir, "train-*.txt")))
    if not txts:
        return []
    rows = {}
    for m in _EPOCH_RE.finditer(open(txts[-1]).read()):
        rows[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    return [(e,) + rows[e] for e in sorted(rows)]


def report(adapt_dir: str, control_dir: str, pretrain_epoch: int):
    a = parse_curve(adapt_dir)
    c = parse_curve(control_dir)
    if not a or not c:
        raise SystemExit(f"no epoch-summary lines found (adapt={adapt_dir}: "
                         f"{len(a)} rows, control={control_dir}: {len(c)} "
                         f"rows) — pass the CompleteLogger <log>_<arch> dirs")
    print(f"{'epoch':>5} {'phase':>8} {'adapt tgt':>9} {'control tgt':>11} "
          f"{'delta':>7}")
    cd = {e: t for e, _, t in c}
    gain_rows = []
    for e, _, tgt in a:
        phase = "pretrain" if e < pretrain_epoch else "adapt"
        ctl = cd.get(e)
        delta = (tgt - ctl) if ctl is not None else float("nan")
        if e >= pretrain_epoch and ctl is not None:
            gain_rows.append(delta)
        print(f"{e:>5} {phase:>8} {tgt:>9.3f} "
              f"{'--' if ctl is None else '%11.3f' % ctl} {delta:>7.3f}")
    if gain_rows:
        import statistics
        print(f"adaptation-phase mean delta (adapt - source-only control): "
              f"{statistics.mean(gain_rows):+.3f}")
    return a, c


def drive_cmd(args, log, pretrain_epoch):
    return [sys.executable, os.path.join(REPO, "train_human.py"),
            args.source_root, args.target_root,
            "-s", "RenderedHandPose", "-t", "RenderedHandPose",
            "--target-train", "RenderedHandPose_mt",
            "-a", args.arch, "-b", str(args.batch_size),
            "--test-batch", str(args.batch_size),
            "--epochs", str(args.epochs),
            "--pretrain-epoch", str(pretrain_epoch),
            "-i", str(args.iters), "--seed", str(args.seed),
            "--device-aug", "--decode-cache", "2",
            "--steps-per-dispatch", "8", "-p", "25", "--log", log]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["run", "parse"])
    p.add_argument("dirs", nargs="*",
                   help="parse: <adapt>_<arch> and <control>_<arch> dirs")
    p.add_argument("--shift", choices=["v1", "hard"], default="v1",
                   help="which rhd_shifted fixture variant to (re)generate")
    p.add_argument("--source-root", default="/tmp/fake_rhd")
    p.add_argument("--target-root", default="/tmp/fake_rhd_shifted")
    p.add_argument("--log-root", default="/tmp/drive_gain")
    p.add_argument("-a", "--arch", default="pose_resnet101")
    p.add_argument("-b", "--batch-size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--pretrain-epoch", type=int, default=3)
    p.add_argument("-i", "--iters", type=int, default=75)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    if args.mode == "parse":
        if len(args.dirs) != 2:
            p.error("parse needs exactly two dirs: <adapt_log_dir> "
                    "<control_log_dir> (the <log>_<arch> directories)")
        report(args.dirs[0], args.dirs[1], args.pretrain_epoch)
        return

    mk = os.path.join(REPO, "tools", "make_fixtures.py")
    kind = {"v1": "rhd_shifted", "hard": "rhd_shifted_hard"}[args.shift]
    subprocess.run([sys.executable, mk, "rhd", args.source_root], check=True)
    subprocess.run([sys.executable, mk, kind, args.target_root], check=True)
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR=os.environ.get(
                   "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache"))
    for name, pe in (("adapt", args.pretrain_epoch), ("control", args.epochs)):
        log = os.path.join(args.log_root, name)
        print(f"=== drive: {name} (pretrain-epoch {pe}) -> "
              f"{log}_{args.arch}", flush=True)
        subprocess.run(drive_cmd(args, log, pe), check=True, env=env,
                       cwd=REPO)
    report(os.path.join(args.log_root, f"adapt_{args.arch}"),
           os.path.join(args.log_root, f"control_{args.arch}"),
           args.pretrain_epoch)


if __name__ == "__main__":
    main()
