"""The canonical `script` command lines must parse through our argparsers —
the reference's public CLI contract (including --lambda_t, which upstream's
parser would actually reject; SURVEY.md §2.1)."""

import os
import shlex

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _canonical_commands():
    with open(os.path.join(REPO, "script")) as f:
        lines = [line.strip() for line in f
                 if line.strip() and not line.startswith("#")]
    return lines


@pytest.mark.parametrize("cmd", _canonical_commands())
def test_script_commands_parse(cmd):
    parts = shlex.split(cmd)
    prog, argv = parts[1], parts[2:]
    if prog == "train_human.py":
        from train_human import build_parser
    elif prog in ("train_animal.py", "train_animal_other.py"):
        from train_animal import build_parser
    else:  # pragma: no cover
        pytest.skip(f"unknown program {prog}")
    args = build_parser().parse_args(argv)
    # spot-check load-bearing flags survived parsing
    assert args.pretrain_epoch == 40
    assert args.batch_size == 32
    assert args.mask_ratio == 0.5
    assert args.occlude_thresh == 0.9
    assert args.s2t_freq == 0.5 and args.t2s_freq == 0.5
    if prog == "train_human.py":
        assert args.lambda_t == 0.0  # parsed-and-ignored legacy flag


def test_arch_registry_matches_reference_names():
    import uda_poseestimation_tpu.models as models
    names = {n for n in models.__dict__
             if n.islower() and not n.startswith("__") and callable(models.__dict__[n])}
    for required in ("pose_resnet50", "pose_resnet101", "resnet18", "resnet34",
                     "resnet50", "resnet101", "resnet152", "resnext50_32x4d",
                     "resnext101_32x8d", "wide_resnet50_2", "wide_resnet101_2",
                     "trans_pose_resnet", "trans_pose_resnet50"):
        assert required in names, required


def test_dataset_registry_matches_reference_names():
    import uda_poseestimation_tpu.data as datasets
    for required in ("RenderedHandPose", "Hand3DStudio", "Hand3DStudioAll",
                     "RenderedHandPose_mt", "Hand3DStudio_mt", "Hand3DStudioAll_mt",
                     "FreiHand", "real_animal_all", "real_animal_all_mt",
                     "animal_pose", "animal_pose_mt", "synthetic_animal_sp_all",
                     "synthetic_animal_sp_all_other", "SURREAL", "LSP", "LSP_mt",
                     "Human36M", "Human36M_mt"):
        assert callable(datasets.__dict__[required]), required


def test_adain_cli_commands_parse():
    """The README's AdaIN pretraining commands parse (README.md:67-75)."""
    import shlex
    import sys
    sys.path.insert(0, os.path.join(REPO, "adain", "train"))
    from adain.train.train_human import build_parser as human_parser
    from adain.train.train_animal import build_parser as animal_parser

    human_cmd = ("--source SURREAL --target Human36M_mt --source_root /x "
                 "--target_root /y --exp_name s2h_0_1 --style_weight 0.1")
    args = human_parser().parse_args(shlex.split(human_cmd))
    assert args.style_weight == 0.1 and args.exp_name == "s2h_0_1"

    animal_cmd = ("--image-path ../animal_data --source synthetic_animal_sp_all "
                  "--target real_animal_all --target_ssl real_animal_all_mt "
                  "--train_on_all_cat --exp_name syn2td_0_1 --style_weight 0.1")
    args = animal_parser().parse_args(shlex.split(animal_cmd))
    assert args.train_on_all_cat and args.style_weight == 0.1


def test_distributed_flags_on_all_main_trainers():
    """Every main trainer (train_human, train_animal, and train_animal_other
    via train_animal's parser) exposes the shared multi-host surface
    (parallel/distributed.py add_distributed_args); defaults are single-
    process so the reference command lines run unchanged."""
    from train_animal import build_parser as animal_parser
    from train_human import build_parser as human_parser

    for build in (human_parser, animal_parser):
        args = build().parse_args(
            ["--dist-coordinator", "localhost:1234",
             "--dist-num-processes", "2", "--dist-process-id", "1"]
            + (["/x", "/y"] if build is human_parser else []))
        assert args.dist_coordinator == "localhost:1234"
        assert args.dist_num_processes == 2 and args.dist_process_id == 1
        # defaults: single-process (no distributed init)
        d = build().parse_args(["/x", "/y"] if build is human_parser else [])
        assert d.dist_coordinator is None and d.dist_num_processes == 1
