"""End-to-end CLI-surface coverage of ``train_human.main()``.

The unit/engine tests cover every component; this file drives the actual
trainer entry point the way a user does (argv -> build_parser -> main) over
an on-disk fake-RHD fixture, covering the wiring only main() owns:

- the epoch summary + per-group PCK log contract
  (reference train_human.py:238-240);
- ``--debug`` prediction/label overlay dumps through
  ``CompleteLogger.get_image_path`` (reference train_human.py:300-302,
  456-458 -> lib/datasets/keypoint_dataset.py:42-62);
- the ``--phase test`` evaluate-only branch (reference
  train_human.py:186-195: teacher evaluated on both loaders, target pass
  visualized unconditionally, per-group lines, early return).

Runs adaptation-only (--epochs 1 --pretrain-epoch -1) at tiny sizes on the
8-device CPU mesh with --device-aug (the fast host pipeline).
"""

import glob
import os
import re

import pytest

from tools.make_fixtures import make_animal, make_rhd

pytestmark = pytest.mark.slow  # full trainer e2e runs (fast lane skips)


@pytest.fixture(scope="module")
def rhd_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rhd"))
    # default canvas size (320): the RHD left/right-hand extraction filter
    # requires hand bboxes >= 64 px (rendered_hand_pose.py min_size)
    make_rhd(root, n_train=24, n_eval=8)
    return root


def _args(root, log_dir, extra=()):
    from train_human import build_parser
    argv = [root, root, "-s", "RenderedHandPose", "-t", "RenderedHandPose",
            "--target-train", "RenderedHandPose_mt", "--image-size", "64",
            "--heatmap-size", "16", "-a", "pose_resnet50", "-b", "8",
            "--test-batch", "8", "--epochs", "1", "--pretrain-epoch", "-1",
            "-i", "2", "-p", "1", "--val-print-freq", "1", "--seed", "0",
            "--device-aug", "--log", log_dir] + list(extra)
    return build_parser().parse_args(argv)


def test_train_debug_then_phase_test(rhd_root, tmp_path, capsys):
    from train_human import main

    log_dir = str(tmp_path / "logs" / "smoke")
    main(_args(rhd_root, log_dir, ["--debug"]))

    # per-iteration progress line (ProgressMeter contract) goes to stdout
    # only — the reference's stdout tee is commented out (lib/logger.py:69-70)
    out = capsys.readouterr().out
    assert re.search(r"Epoch: \[0\]\[\s*\d+/2\]", out), out[-2000:]

    root = log_dir + "_pose_resnet50"
    txts = glob.glob(os.path.join(root, "train-*.txt"))
    assert txts, "CompleteLogger must write logs/<log>_<arch>/train-<ts>.txt"
    text = open(txts[0]).read()
    # epoch summary line (train_human.py:238)
    assert re.search(r"Epoch: 0 Source: \d+\.\d+ Target: \d+\.\d+ "
                     r"Target\(best\): \d+\.\d+", text), text[-2000:]
    # per-group PCK lines keyed by keypoint group incl. 'all' (:239-240)
    assert re.search(r"^all: \d+\.\d+$", text, re.M), text[-2000:]

    # --debug dumped overlays into output_viz/<...>/visualize/<epoch>/
    viz = os.path.join(root.replace("logs", "output_viz"), "visualize")
    imgs = glob.glob(os.path.join(viz, "**", "*.jpg"), recursive=True)
    assert imgs, "--debug must dump skeleton overlays"
    # both train-time dumps (epoch dir) and validate dumps exist
    assert any(os.sep + "0" + os.sep in p for p in imgs), imgs

    # ---- phase test: evaluate-only branch over the same logger root ----
    args = _args(rhd_root, log_dir)
    args.phase = "test"
    main(args)
    txts = glob.glob(os.path.join(root, "test-*.txt"))
    assert txts, "phase test must open a test-<ts>.txt log"
    text = open(txts[0]).read()
    assert re.search(r"Source: \d+\.\d+ Target: \d+\.\d+", text), text[-2000:]
    assert re.search(r"^all: \d+\.\d+$", text, re.M), text[-2000:]
    # the unconditional target visualize pass wrote under visualize/test/
    test_imgs = glob.glob(os.path.join(viz, "test", "*.jpg"))
    assert test_imgs, "phase test visualizes the target validation pass"


def test_train_two_phase_handoff(rhd_root, tmp_path):
    """Both phases through train_human.main(): the pretrain epoch validates
    the STUDENT and checkpoints ``best_pt``; at ``epoch == pretrain_epoch``
    main() reloads best_pt into student AND teacher before adaptation
    (reference train_human.py:244-257, 302); epoch summaries must appear for
    both epochs in one log."""
    from train_human import main

    log_dir = str(tmp_path / "logs" / "twophase")
    # enough supervised progress that target PCK clears 0 and best_pt exists
    # for the handoff (the reference-parity acc>best save rule writes nothing
    # at exactly 0, and the epoch==pretrain_epoch reload then crashes exactly
    # like the reference would with no best_pt on disk)
    try:
        main(_args(rhd_root, log_dir,
                   ["--epochs", "2", "--pretrain-epoch", "1",
                    "-i", "30", "--lr", "3e-4", "-p", "10"]))
    except FileNotFoundError as e:  # the handoff's best_pt load (see above)
        pytest.fail(
            "two-phase handoff found no best_pt — pretrain target PCK "
            "stayed exactly 0 under this numerics environment "
            f"(seed-dependent: bump the seed or -i in _args): {e}")

    root = log_dir + "_pose_resnet50"
    txts = glob.glob(os.path.join(root, "train-*.txt"))
    assert txts
    text = open(txts[0]).read()
    for ep in (0, 1):
        assert re.search(r"Epoch: %d Source: \d+\.\d+ Target: \d+\.\d+ "
                         r"Target\(best\): \d+\.\d+" % ep, text), text[-3000:]
    ckpts = glob.glob(os.path.join(
        root.replace("logs", "checkpoints"), "checkpoints_*", "best_pt.pth"))
    assert ckpts, ("pretrain epoch must write best_pt.pth "
                   "(seed-dependent: bump the seed in _args if this fires)")
    import torch
    sd = torch.load(ckpts[0], map_location="cpu", weights_only=False)
    assert sd["epoch"] == 0 and "student" in sd and "teacher" in sd


def test_train_resume(rhd_root, tmp_path):
    """--resume restores student/teacher/optimizer AND the epoch counter
    (reference train_human.py:206-224: start_epoch = checkpoint['epoch']+1) —
    the resumed run must continue at epoch 1, not restart at 0.

    Runs in the PRETRAIN phase: the checkpoint-writing ``acc > best`` rule
    needs nonzero target PCK at epoch 0, and in the adapt phase the
    evaluated TEACHER is still EMA-frozen near its random init after a few
    iterations (alpha=0.999), where PCK>0 hinges on argmax tie-breaking of
    a near-constant head — measured flipping to exactly 0 across
    toolchain/cache states. Pretrain evaluates the STUDENT, which learns
    reliably with the same 30-iter/3e-4 knobs the two-phase handoff test
    already depends on."""
    from train_human import main

    pre = ["--pretrain-epoch", "5", "-i", "30", "--lr", "3e-4", "-p", "10"]
    log_dir = str(tmp_path / "logs" / "resume")
    main(_args(rhd_root, log_dir, pre))

    root = log_dir + "_pose_resnet50"
    ckpts = glob.glob(os.path.join(
        root.replace("logs", "checkpoints"), "checkpoints_*", "best_pt.pth"))
    assert ckpts, ("epoch 0 must beat best_acc=0 and write best_pt.pth "
                   "(seed-dependent: bump the seed or -i in _args if this "
                   "fires)")

    args = _args(rhd_root, log_dir,
                 pre + ["--epochs", "2", "--resume", ckpts[0]])
    main(args)
    txts = sorted(glob.glob(os.path.join(root, "train-*.txt")),
                  key=os.path.getmtime)
    text = open(txts[-1]).read()
    assert re.search(r"Epoch: 1 Source: \d+\.\d+", text), text[-2000:]
    # epoch 0 was NOT re-run in the resumed process
    assert not re.search(r"Epoch: 0 Source:", text), text[-2000:]


def test_adain_cli_human(rhd_root, tmp_path, monkeypatch):
    """adain/train/train_human.py main(): the CLI wiring that only main()
    owns — source/target dataset construction with the AdaIN transform
    stacks, the hardcoded batch_size=4 human pair (reference adain/train/
    train_human.py:166-176), the mt 8-tuple teacher-view extraction
    (``tgt[4][0]``), the ../saved_models vgg fallback path, and the engine's
    log/PNG/checkpoint layout rooted at the CWD."""
    from adain.train.train_human import build_parser, main

    monkeypatch.chdir(tmp_path)
    argv = ["--source", "RenderedHandPose", "--target", "RenderedHandPose_mt",
            "--source_root", rhd_root, "--target_root", rhd_root,
            "--vgg", str(tmp_path / "missing_vgg.pth"),  # random-encoder fallback
            "--image-size", "64", "--heatmap-size", "16",
            "--max_iter", "2", "--save_model_interval", "2",
            "--log_img_interval", "1", "--exp_name", "smoke"]
    main(build_parser().parse_args(argv))

    log = tmp_path / "logs" / "smoke" / "log_smoke.txt"
    assert log.exists()
    lines = log.read_text().strip().splitlines()
    assert len(lines) == 2 and all(
        re.match(r"iter: \d+, decoder_loss: [\d.e+-]+, content loss: "
                 r"[\d.e+-]+, style loss: [\d.e+-]+", ln) for ln in lines), lines
    pngs = glob.glob(str(tmp_path / "logs" / "smoke" / "save_imgs"
                         / "save_img_smoke" / "*.png"))
    assert pngs, "log_img_interval=1 must dump side-by-side PNGs"
    import torch
    ckpt = tmp_path / "logs" / "smoke" / "saved_model" / "decoder_smoke.pth.tar"
    sd = torch.load(str(ckpt), map_location="cpu")
    assert any(k.endswith(".weight") for k in sd), list(sd)[:5]


def _animal_argv(root, log_dir):
    return ["--source", "synthetic_animal_sp_all", "--target", "real_animal_all",
            "--target_ssl", "real_animal_all_mt",
            "--image-path", os.path.join(root, "animal_data"),
            "--animal", "all", "--train_on_all_cat",
            "--image-size", "64", "--heatmap-size", "16",
            "--inp-res", "64", "--out-res", "16",
            "-a", "pose_resnet50", "-b", "8", "--test-batch", "8",
            "-p", "1", "--val-print-freq", "1", "--seed", "0",
            "--log", log_dir]


def test_animal_train_full_two_phase(tmp_path, monkeypatch):
    """train_animal.main() through BOTH phases at CLI level: a pretrain epoch
    (the on-device synthetic source pipeline under --device-aug) that writes
    ``best_pt``, the ``epoch == pretrain_epoch`` handoff that reloads it into
    student AND teacher (reference train_animal.py:150-156), then a
    mean-teacher adaptation epoch — plus the per-epoch summary contract with
    per-category eval (``Source .. Target .. Horse .. Tiger .. Target(best)``,
    reference train_animal.py:173-190) for BOTH epochs. The adapt-only and
    evaluate-only branches are covered by the other tests in this file."""
    from train_animal import build_parser, main

    root = str(tmp_path / "animal")
    make_animal(root)
    monkeypatch.setenv("UDA_CACHED_DATA_DIR", os.path.join(root, "cached_data"))
    log_dir = str(tmp_path / "logs" / "animal_full")
    # enough supervised progress that target-'all' PCK clears 0 and best_pt
    # exists for the handoff (probed: 40 iters at lr 3e-4 on the blob fixture
    # reach target 'all'=0.019; fewer iterations leave it at exactly 0 and
    # the reference-parity acc>best save rule then writes nothing);
    # decode-cache memoizes the raw source decode across the 80 iterations
    argv = _animal_argv(root, log_dir) + [
        "--epochs", "2", "--pretrain-epoch", "1", "-i", "40", "--lr", "3e-4",
        "-p", "10", "--decode-cache", "1", "--device-aug"]
    main(build_parser().parse_args(argv))

    root_log = log_dir + "_pose_resnet50"
    txts = glob.glob(os.path.join(root_log, "train-*.txt"))
    assert txts
    text = open(txts[0]).read()
    # both epochs logged the animal summary line (epoch 0 = pretrain,
    # epoch 1 = adaptation after the best_pt reload)
    for ep in (0, 1):
        assert re.search(
            r"Epoch: %d Source: \d+\.\d+ Target: \d+\.\d+ "
            r"Horse: \d+\.\d+ Tiger: \d+\.\d+ Target\(best\): \d+\.\d+" % ep,
            text), text[-3000:]
    # per-category group blocks for every epoch's eval
    assert re.search(r"^Horse:$", text, re.M) and re.search(r"^Tiger:$", text, re.M)
    # the pretrain phase wrote best_pt (consumed by the handoff) as a
    # torch-readable checkpoint; adaptation may or may not beat it
    ckpts = glob.glob(os.path.join(
        root_log.replace("logs", "checkpoints"), "checkpoints_*", "best_pt.pth"))
    assert ckpts, ("pretrain epoch must write best_pt.pth "
                   "(seed-dependent: bump --seed/-i if this fires)")
    import torch
    sd = torch.load(ckpts[0], map_location="cpu", weights_only=False)
    assert sd["epoch"] == 0 and "student" in sd and "teacher" in sd


def test_animal_phase_test(tmp_path, monkeypatch):
    """train_animal.main() --phase test: full setup wiring (kwargs datasets,
    the mutated ``args.animal`` per-category eval loaders, TigDog parsing,
    eval step) plus the animal summary-line contract
    ``Source: .. Target: .. Horse: .. Tiger: ..`` and per-category group
    blocks (reference train_animal.py:193-263)."""
    from train_animal import build_parser, main

    root = str(tmp_path / "animal")
    make_animal(root)
    monkeypatch.setenv("UDA_CACHED_DATA_DIR", os.path.join(root, "cached_data"))
    log_dir = str(tmp_path / "logs" / "animal")
    argv = ["--source", "synthetic_animal_sp_all", "--target", "real_animal_all",
            "--target_ssl", "real_animal_all_mt",
            "--image-path", os.path.join(root, "animal_data"),
            "--animal", "all", "--train_on_all_cat",
            "--image-size", "64", "--heatmap-size", "16",
            "--inp-res", "64", "--out-res", "16",
            "-a", "pose_resnet50", "-b", "8", "--test-batch", "8",
            "--epochs", "1", "--pretrain-epoch", "-1", "-i", "1",
            "-p", "1", "--val-print-freq", "1", "--seed", "0",
            "--phase", "test", "--log", log_dir]
    main(build_parser().parse_args(argv))

    root_log = log_dir + "_pose_resnet50"
    txts = glob.glob(os.path.join(root_log, "test-*.txt"))
    assert txts
    text = open(txts[0]).read()
    assert re.search(r"Source: \d+\.\d+ Target: \d+\.\d+ "
                     r"Horse: \d+\.\d+ Tiger: \d+\.\d+", text), text[-2000:]
    assert re.search(r"^all: \d+\.\d+$", text, re.M), text[-2000:]
    # per-category blocks
    assert re.search(r"^Horse:$", text, re.M) and re.search(r"^Tiger:$", text, re.M)
    # target + per-category validate passes dumped overlays under test/
    viz = os.path.join(root_log.replace("logs", "output_viz"), "visualize", "test")
    assert glob.glob(os.path.join(viz, "*.jpg"))
