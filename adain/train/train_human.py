"""AdaIN decoder pretraining on a human/hand source-target pair — CLI twin of
reference adain/train/train_human.py (same flags, log/checkpoint layout)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

import uda_poseestimation_tpu.data as datasets
import uda_poseestimation_tpu.data.transforms as T
from uda_poseestimation_tpu.adain_engine import run_decoder_training
from uda_poseestimation_tpu.data import DataLoader, ForeverDataIterator

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def denormalize(x):
    return np.asarray(x) * IMAGENET_STD + IMAGENET_MEAN


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--source", type=str)
    parser.add_argument("--target", type=str)
    parser.add_argument("--source_root", type=str)
    parser.add_argument("--target_root", type=str)
    parser.add_argument("--vgg", type=str, default="models/vgg_normalised.pth")
    parser.add_argument("--image-size", type=int, default=256, help="input image size")
    parser.add_argument("--resize-scale", nargs="+", type=float, default=(0.6, 1.3),
                        help="scale range for the RandomResizeCrop augmentation")
    parser.add_argument("--rotation", type=int, default=180,
                        help="rotation range of the RandomRotation augmentation")
    parser.add_argument("--heatmap-size", type=int, default=64, help="output heatmap size")
    parser.add_argument("--color", type=float, default=0,
                        help="color range of the jitter augmentation")
    parser.add_argument("--blur", type=float, default=0,
                        help="blur range of the jitter augmentation")
    parser.add_argument("--shear", nargs="+", type=float, default=(0, 0),
                        help="shear range for the RandomResizeCrop augmentation")
    parser.add_argument("--translate", nargs="+", type=float, default=(0, 0),
                        help="tranlate range for the RandomResizeCrop augmentation")
    parser.add_argument("--scale", nargs="+", type=float, default=(0.6, 1.3),
                        help="scale range for the RandomResizeCrop augmentation")
    for role in ("stu", "tea"):
        parser.add_argument(f"--rotation_{role}", type=int, default=180)
        parser.add_argument(f"--color_{role}", type=float, default=0)
        parser.add_argument(f"--blur_{role}", type=float, default=0)
        parser.add_argument(f"--shear_{role}", nargs="+", type=float, default=(0, 0))
        parser.add_argument(f"--translate_{role}", nargs="+", type=float, default=(0, 0))
        parser.add_argument(f"--scale_{role}", nargs="+", type=float, default=(0.6, 1.3))

    parser.add_argument("--save_model_dir", default="./saved_model",
                        help="Directory to save the model")
    parser.add_argument("--exp_name", default="./", help="Directory to save the log")
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
    normalize = T.Normalize(IMAGENET_MEAN, IMAGENET_STD)
    train_transform = T.Compose([
        T.RandomResizedCrop(size=args.image_size, scale=args.resize_scale),
        T.RandomAffineRotation(args.rotation, args.shear, args.translate, args.scale),
        T.ColorJitter(brightness=args.color, contrast=args.color, saturation=args.color),
        T.GaussianBlur(high=args.blur),
        T.ToTensor(),
        normalize,
    ])
    base_transform = T.Compose([
        T.RandomResizedCrop(size=args.image_size, scale=args.resize_scale),
    ])
    tgt_train_transform_stu = T.Compose([
        T.RandomAffineRotation(args.rotation_stu, args.shear_stu,
                               args.translate_stu, args.scale_stu),
        T.ColorJitter(brightness=args.color_stu, contrast=args.color_stu,
                      saturation=args.color_stu),
        T.GaussianBlur(high=args.blur_stu),
        T.ToTensor(),
        normalize,
    ])
    tgt_train_transform_tea = T.Compose([
        T.RandomAffineRotation(args.rotation_tea, args.shear_tea,
                               args.translate_tea, args.scale_tea),
        T.ColorJitter(brightness=args.color_tea, contrast=args.color_tea,
                      saturation=args.color_tea),
        T.GaussianBlur(high=args.blur_tea),
        T.ToTensor(),
        normalize,
    ])

    image_size = (args.image_size, args.image_size)
    heatmap_size = (args.heatmap_size, args.heatmap_size)
    source_dataset = datasets.__dict__[args.source]
    train_source_dataset = source_dataset(root=args.source_root,
                                          transforms=train_transform,
                                          image_size=image_size, heatmap_size=heatmap_size)
    # reference uses batch_size=4 for the human pair regardless of --batch_size
    train_source_loader = DataLoader(train_source_dataset, batch_size=4,
                                     shuffle=True, num_workers=1, drop_last=True)
    target_dataset = datasets.__dict__[args.target]
    train_target_dataset = target_dataset(
        root=args.target_root, transforms_base=base_transform,
        transforms_stu=tgt_train_transform_stu, transforms_tea=tgt_train_transform_tea,
        image_size=image_size, heatmap_size=heatmap_size)
    train_target_loader = DataLoader(train_target_dataset, batch_size=4,
                                     shuffle=True, num_workers=1, drop_last=True)

    # reference resolves vgg weights from ../saved_models/vgg_normalised.pth
    args.vgg_resolved = args.vgg if os.path.exists(args.vgg) \
        else os.path.join(os.path.dirname(__file__), "..", "..",
                          "saved_models", "vgg_normalised.pth")

    run_decoder_training(args,
                         ForeverDataIterator(train_source_loader),
                         ForeverDataIterator(train_target_loader),
                         denormalize)


if __name__ == "__main__":
    main(build_parser().parse_args())
