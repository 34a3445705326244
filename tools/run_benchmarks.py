"""Accuracy-parity harness: run the 6 canonical UDA benchmarks end to end.

The reference publishes its PCK@0.05 results only in the ECCV'22 paper
(arXiv:2204.00172; README.md:76-111 lists the run commands, repo `script`
lines 1-11 the full flag sets) — no numbers are checked into the repo, and
this testbed has neither the datasets nor network egress (BASELINE.md). This
tool is the *ready-to-run* closure of that gap: point it at real dataset
roots and it executes every canonical command line exactly as published,
collects the best target-domain `'all'` PCK from each run's log, and emits
a markdown + JSON comparison table with paper-number placeholders to fill
in (PAPER_PCK below) once the paper values are verified.

Usage:
    python tools/run_benchmarks.py --data-root /data            # all 6
    python tools/run_benchmarks.py --data-root /data --only RHD2H3D
    python tools/run_benchmarks.py --data-root /data --dry-run  # print cmds
    # smoke/scale knobs are appended verbatim to every trainer invocation:
    python tools/run_benchmarks.py --data-root /data \
        --extra --epochs 2 --pretrain-epoch 1 -i 5 --device-aug

Dataset roots expected under --data-root (override any of them with
--root NAME=/abs/path): FreiHand, RHD, surreal_processed, Human36M, lsp,
H3D_crop, animal_data. Download layout: get_dataset.sh / each dataset
class's docstring.

The per-benchmark results are parsed from the trainer's CompleteLogger
train-<ts>.txt via the reference's epoch-summary contract
(train_human.py:238-240: "Epoch: N Source: A Target: B Target(best): C"
followed by per-group "name: value" PCK lines).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Paper Table values (PCK@0.05, target 'all'): UNVERIFIED OFFLINE — fill in
# from arXiv:2204.00172 when network access permits; None renders as "?" in
# the table and disables the delta column for that row.
PAPER_PCK = {
    "FreiHand2RHD": None,   # paper Tab. (FreiHand -> RHD)
    "SURREAL2Human36M": None,
    "SURREAL2LSP": None,
    "RHD2H3D": None,
    "SynAnimal2AnimalPose": None,
    "SynAnimal2TigDog": None,
}

# The canonical flag block shared by every benchmark (repo `script`,
# reference README.md:82-111): student/teacher aug, mean-teacher + AdaIN
# style-transfer schedule, occlusion. Benchmark-specific rotation is
# substituted below.
def _common(rotation: int, decoder: str) -> list[str]:
    return [
        "--debug", "--seed", "0", "--lambda_c", "1",
        "--pretrain-epoch", "40",
        "--rotation_stu", str(rotation), "--shear_stu", "-30", "30",
        "--translate_stu", "0.05", "0.05", "--scale_stu", "0.6", "1.3",
        "--color_stu", "0.25", "--blur_stu", "0",
        "--rotation_tea", str(rotation), "--shear_tea", "-30", "30",
        "--translate_tea", "0.05", "0.05", "--scale_tea", "0.6", "1.3",
        "--color_tea", "0.25", "--blur_tea", "0",
        "-b", "32", "--mask-ratio", "0.5", "--k", "1",
        "--decoder-name", decoder,
        "--s2t-freq", "0.5", "--s2t-alpha", "0", "1",
        "--t2s-freq", "0.5", "--t2s-alpha", "0", "1",
        "--occlude-rate", "0.5", "--occlude-thresh", "0.9",
    ]


def _human(src_root, tgt_root, s, t, tt, log, rotation, decoder):
    return {
        "trainer": "train_human.py",
        "argv": ["{root}/" + src_root, "{root}/" + tgt_root,
                 "-s", s, "-t", t, "--target-train", tt,
                 "--log", "{log}/" + log, "--lambda_t", "0"]
                + _common(rotation, decoder),
    }


def _animal(trainer, source, target, target_ssl, log, decoder):
    return {
        "trainer": trainer,
        "argv": ["--image-path", "{root}/animal_data",
                 "--source", source, "--target", target,
                 "--target_ssl", target_ssl, "--train_on_all_cat",
                 "--log", "{log}/" + log]
                + _common(60, decoder),
    }


# All 6 canonical benchmarks (repo `script`:6-11 / reference README.md:79-111)
BENCHMARKS = {
    "FreiHand2RHD": _human(
        "FreiHand", "RHD", "FreiHand", "RenderedHandPose",
        "RenderedHandPose_mt", "f2r_exp/syn2real", 180,
        "saved_models/decoder_f2r_0_1.pth.tar"),
    "SURREAL2Human36M": _human(
        "surreal_processed", "Human36M", "SURREAL", "Human36M",
        "Human36M_mt", "s2h_exp/syn2real", 60,
        "saved_models/decoder_s2h_0_1.pth.tar"),
    "SURREAL2LSP": _human(
        "surreal_processed", "lsp", "SURREAL", "LSP", "LSP_mt",
        "s2l_exp/syn2real", 60, "saved_models/decoder_s2l_0_1.pth.tar"),
    "RHD2H3D": _human(
        "RHD", "H3D_crop", "RenderedHandPose", "Hand3DStudio",
        "Hand3DStudio_mt", "r2h_exp/syn2real", 180,
        "saved_models/decoder_r2h_0_1.pth.tar"),
    "SynAnimal2AnimalPose": _animal(
        "train_animal_other.py", "synthetic_animal_sp_all_other",
        "animal_pose", "animal_pose_mt", "syn2animal_pose/syn2real",
        "saved_models/decoder_animal_0_1.pth.tar"),
    "SynAnimal2TigDog": _animal(
        "train_animal.py", "synthetic_animal_sp_all", "real_animal_all",
        "real_animal_all_mt", "syn2real_animal/syn2real",
        "saved_models/decoder_animal_0_1.pth.tar"),
}

_EPOCH_RE = re.compile(
    r"Epoch: (\d+) Source: (\d+\.\d+) Target: (\d+\.\d+) "
    r"Target\(best\): (\d+\.\d+)")


def build_command(name, spec, data_root, log_root, extra):
    """Materialize the canonical argv for one benchmark."""
    argv = [a.format(root=data_root.rstrip("/"), log=log_root.rstrip("/"))
            for a in spec["argv"]]
    return [sys.executable, os.path.join(REPO, spec["trainer"])] + argv + extra


def parse_result(log_arg, arch="pose_resnet101"):
    """Best target 'all' PCK + final per-group block from the trainer log.

    ``log_arg`` is the value passed to --log; CompleteLogger appends
    ``_<arch>`` (utils/logger.py, reference lib/logger.py) and writes
    train-<timestamp>.txt inside.
    """
    root = f"{log_arg}_{arch}"
    txts = sorted(glob.glob(os.path.join(root, "train-*.txt")))
    if not txts:
        return None
    text = open(txts[-1]).read()
    epochs = _EPOCH_RE.findall(text)
    if not epochs:
        return None
    best = max(float(b) for _, _, _, b in epochs)
    # last per-group PCK block (lines "group: value" after the summary)
    groups = {}
    for block in re.findall(
            r"Target\(best\): \d+\.\d+\n((?:[\w ]+: \d+\.\d+\n?)+)", text):
        groups = dict((k, float(v)) for k, v in
                      re.findall(r"([\w ]+): (\d+\.\d+)", block))
    return {"best_target_all_pck": best, "epochs_seen": len(epochs),
            "final_groups": groups, "log": txts[-1]}


def render_table(results):
    lines = ["| benchmark | target 'all' PCK@0.05 | paper | delta |",
             "|---|---|---|---|"]
    for name, res in results.items():
        paper = PAPER_PCK.get(name)
        if res is None or isinstance(res, str):
            got, delta = (res or "FAILED"), "—"
        else:
            got = f"{res['best_target_all_pck']:.3f}"
            delta = (f"{res['best_target_all_pck'] - paper:+.3f}"
                     if paper is not None else "—")
        lines.append(f"| {name} | {got} | "
                     f"{paper if paper is not None else '? (fill from arXiv:2204.00172)'} | {delta} |")
    return "\n".join(lines)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--data-root", required=True,
                   help="directory containing the dataset roots")
    p.add_argument("--log-root", default="logs/benchmarks")
    p.add_argument("--only", nargs="*", default=None,
                   help=f"subset of {list(BENCHMARKS)}")
    p.add_argument("--root", action="append", default=[],
                   metavar="NAME=PATH",
                   help="override a dataset root dir name, e.g. RHD=/x/rhd")
    p.add_argument("--arch", default="pose_resnet101",
                   help="arch suffix CompleteLogger appends to --log dirs")
    p.add_argument("--dry-run", action="store_true",
                   help="print the commands without running")
    p.add_argument("--out", default=None,
                   help="write the JSON results here (default "
                        "<log-root>/results.json)")
    p.add_argument("--extra", nargs=argparse.REMAINDER, default=[],
                   help="everything after --extra is appended verbatim to "
                        "every trainer command (smoke/scale knobs)")
    args = p.parse_args(argv)

    overrides = dict(kv.split("=", 1) for kv in args.root)
    names = args.only or list(BENCHMARKS)
    unknown = set(names) - set(BENCHMARKS)
    if unknown:
        p.error(f"unknown benchmark(s) {sorted(unknown)}; "
                f"choose from {list(BENCHMARKS)}")

    results = {}
    for name in names:
        spec = BENCHMARKS[name]
        cmd = build_command(name, spec, args.data_root, args.log_root,
                            args.extra)
        # apply --root NAME=PATH overrides to materialized path args
        for i, a in enumerate(cmd):
            for sub, path in overrides.items():
                joined = os.path.join(args.data_root.rstrip("/"), sub)
                if a == joined:
                    cmd[i] = path
        log_arg = cmd[cmd.index("--log") + 1]
        print(f"[{name}] {' '.join(cmd)}", flush=True)
        if args.dry_run:
            results[name] = "DRY-RUN"
            continue
        t0 = time.time()
        proc = subprocess.run(cmd, cwd=REPO)
        dt = time.time() - t0
        if proc.returncode != 0:
            print(f"[{name}] FAILED rc={proc.returncode} after {dt:.0f}s",
                  file=sys.stderr, flush=True)
            results[name] = f"FAILED (rc={proc.returncode})"
            continue
        res = parse_result(log_arg, arch=args.arch)
        results[name] = res if res else "NO-RESULT (log parse failed)"
        print(f"[{name}] done in {dt:.0f}s -> "
              f"{res and res['best_target_all_pck']}", flush=True)

    table = render_table(results)
    print("\n" + table)
    if not args.dry_run:
        out = args.out or os.path.join(args.log_root, "results.json")
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        with open(out, "w") as f:
            json.dump({"results": results, "paper": PAPER_PCK,
                       "table": table}, f, indent=2, default=str)
        print(f"\nresults written to {out}")
    return results


if __name__ == "__main__":
    main()
