"""AdaIN decoder pretraining for animal datasets — CLI twin of reference
adain/train/train_animal.py (kwargs-style datasets, mean-only denormalize
with clamp, args.batch_size respected)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

import uda_poseestimation_tpu.data as datasets
import uda_poseestimation_tpu.data.transforms as T
from uda_poseestimation_tpu.adain_engine import run_decoder_training
from uda_poseestimation_tpu.data import DataLoader, ForeverDataIterator

ANIMAL_MEAN = np.array([0.3999, 0.3909, 0.3871], np.float32)


def denormalize(x):
    return np.clip(np.asarray(x) + ANIMAL_MEAN, 0, 1)


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--vgg", type=str, default="models/vgg_normalised.pth")
    parser.add_argument("--image-size", type=int, default=256, help="input image size")
    parser.add_argument("--resize-scale", nargs="+", type=float, default=(0.6, 1.3))
    parser.add_argument("--rotation", type=int, default=180)
    parser.add_argument("--heatmap-size", type=int, default=64)
    parser.add_argument("-j", "--workers", default=4, type=int, metavar="N")
    parser.add_argument("--source", default="synthetic_animal_sp", type=str)
    parser.add_argument("--target", default="real_animal", type=str)
    parser.add_argument("--target_ssl", default="real_animal", type=str)
    parser.add_argument("--image-path", default="./animal_data", type=str,
                        help="path to images")
    parser.add_argument("--animal", default="all", type=str,
                        help="horse | tiger | sheep | hound | elephant")
    parser.add_argument("--year", default=2014, type=int, metavar="N")
    parser.add_argument("--inp-res", default=256, type=int)
    parser.add_argument("--out-res", default=64, type=int)
    parser.add_argument("-f", "--flip", dest="flip", action="store_true")
    parser.add_argument("--sigma", type=float, default=1)
    parser.add_argument("--scale-factor", type=float, default=0.25)
    parser.add_argument("--rot-factor", type=float, default=30)
    parser.add_argument("--sigma-decay", type=float, default=0)
    parser.add_argument("--label-type", metavar="LABELTYPE", default="Gaussian",
                        choices=["Gaussian", "Cauchy"])
    parser.add_argument("--train_on_all_cat", action="store_true")
    parser.add_argument("--aug", action="store_true")
    for role in ("stu", "tea"):
        parser.add_argument(f"--rotation_{role}", type=int, default=180)
        parser.add_argument(f"--color_{role}", type=float, default=0)
        parser.add_argument(f"--blur_{role}", type=float, default=0)
        parser.add_argument(f"--shear_{role}", nargs="+", type=float, default=(0, 0))
        parser.add_argument(f"--translate_{role}", nargs="+", type=float, default=(0, 0))
        parser.add_argument(f"--scale_{role}", nargs="+", type=float, default=(0.6, 1.3))

    parser.add_argument("--save_model_dir", default="./saved_model")
    parser.add_argument("--exp_name", default="./")
    parser.add_argument("--lr", type=float, default=1e-5)
    parser.add_argument("--lr_decay", type=float, default=5e-5)
    parser.add_argument("--max_iter", type=int, default=500000)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--style_weight", type=float, default=1.0)
    parser.add_argument("--content_weight", type=float, default=1.0)
    parser.add_argument("--save_model_interval", type=int, default=10000)
    parser.add_argument("--log_img_interval", type=int, default=5000)
    return parser


def main(args):
    # the axon TPU plugin can win platform selection over the JAX_PLATFORMS
    # env var; honor it explicitly (same as the main trainers)
    import os

    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    np.random.seed(0)
    tgt_train_transform_stu = T.Compose([
        T.RandomAffineRotation(args.rotation_stu, args.shear_stu,
                               args.translate_stu, args.scale_stu),
        T.ToTensor(),
    ])
    tgt_train_transform_tea = T.Compose([
        T.RandomAffineRotation(args.rotation_tea, args.shear_tea,
                               args.translate_tea, args.scale_tea),
        T.ToTensor(),
    ])

    train_source_dataset = datasets.__dict__[args.source](
        is_train=True, is_aug=args.aug, **vars(args))
    train_source_loader = DataLoader(train_source_dataset, batch_size=args.batch_size,
                                     shuffle=True, num_workers=1, drop_last=True)
    target_dataset = datasets.__dict__[args.target_ssl](
        is_train=True, transforms_stu=tgt_train_transform_stu,
        transforms_tea=tgt_train_transform_tea, **vars(args))
    train_target_loader = DataLoader(target_dataset, batch_size=args.batch_size,
                                     shuffle=True, num_workers=1, drop_last=True)

    args.vgg_resolved = args.vgg if os.path.exists(args.vgg) \
        else os.path.join(os.path.dirname(__file__), "..", "..",
                          "saved_models", "vgg_normalised.pth")

    run_decoder_training(args,
                         ForeverDataIterator(train_source_loader),
                         ForeverDataIterator(train_target_loader),
                         denormalize)


if __name__ == "__main__":
    main(build_parser().parse_args())
