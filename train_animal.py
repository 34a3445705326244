"""Animal UDA trainer (SyntheticAnimal -> TigDog) — CLI twin of reference
train_animal.py.

Same flags, kwargs-style dataset construction (``**vars(args)``), mean-only
normalization with the animal style clamp constants
(train_animal.py:34-35,54), per-category eval loaders built by mutating
``args.animal`` in place (the reference quirk, :94-107), and the same
log-line structure. train_animal_other.py reuses this module with eval
categories dog/sheep (the reference file is byte-identical except those).
"""

import argparse
import random
import warnings

import cv2
import jax
import jax.numpy as jnp
import numpy as np

cv2.setNumThreads(1)

import uda_poseestimation_tpu.data as datasets
import uda_poseestimation_tpu.data.transforms as T
import uda_poseestimation_tpu.models as models
from uda_poseestimation_tpu.data import DataLoader, ForeverDataIterator
from uda_poseestimation_tpu.engine import (
    run_adapt_epoch,
    run_pretrain_epoch,
    run_validate,
)
from uda_poseestimation_tpu.models import StyleNet
from uda_poseestimation_tpu.parallel import (
    StepConfig,
    cast_floating,
    create_state,
    make_adapt_step,
    make_eval_step,
    make_mesh,
    make_pretrain_step,
    replicate,
)
from uda_poseestimation_tpu.utils import CompleteLogger, multistep_lr
from uda_poseestimation_tpu.utils.checkpoint import (
    load_checkpoint,
    restore_train_state,
    save_checkpoint,
)

# styled-image clamp under mean-only animal normalization (train_animal.py:34-35)
RECOVER_MIN = (-0.3999, -0.3909, -0.3871)
RECOVER_MAX = (0.6001, 0.6091, 0.6129)
ANIMAL_MEAN = [0.3999, 0.3909, 0.3871]


def main(args: argparse.Namespace, eval_categories=("horse", "tiger")):
    # the axon TPU plugin can win platform selection over the
    # JAX_PLATFORMS env var; honor it explicitly (CPU-mesh smokes and
    # CI rely on it)
    import os
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    # multi-host data parallelism (--dist-*): join the distributed runtime
    # BEFORE first backend use; see parallel/distributed.py for the contract
    from uda_poseestimation_tpu.parallel import distributed as dist
    multiproc = dist.maybe_initialize_from_args(args)
    now = None
    if multiproc:
        import time as _time
        now = dist.broadcast_str(
            _time.strftime("%Y-%m-%d-%H_%M_%S", _time.localtime(_time.time())))
    logger = CompleteLogger(args.log + "_" + args.arch, args.phase, now=now,
                            file_output=dist.is_primary())
    logger.write(" ".join(f"{k}={v}" for k, v in vars(args).items()))
    if args.seed is not None:
        # multi-process: offset the GLOBAL host streams (per-sample transform
        # augmentation) per rank so sub-batch augs aren't duplicated across
        # processes; control RNG (gates, step/init PRNG, device-aug keys)
        # derives from the un-offset args.seed and stays synchronized
        host_seed = args.seed + dist.process_index() * 10007
        random.seed(host_seed)
        np.random.seed(host_seed)
        warnings.warn("You have chosen to seed training.")

    if args.device_aug:
        # raw-canvas target pipeline: views are generated on device
        # (ops/device_aug.py animal twins; see AnimalDeviceAugPipeline)
        tgt_train_transform_stu = T.Compose([T.IdentityAffine(), T.ToTensor()])
        tgt_train_transform_tea = T.Compose([T.IdentityAffine(), T.ToTensor()])
    else:
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

    # --device-aug: the synthetic source pipeline also moves on device (the
    # dataset returns raw decoded frames; imgaug/flip/crop/targets run inside
    # the fused step). Datasets without raw_mode support ignore the kwarg.
    # multi-process: each process loads its share of the global batch with
    # DistributedSampler semantics — a rank-partitioned synchronized
    # permutation, so every sample is seen exactly once per epoch globally
    local_batch = dist.local_batch_size(args.batch_size) if multiproc \
        else args.batch_size
    part = {"partition": (dist.process_index(), dist.process_count()),
            "seed": args.seed} if multiproc else {}
    # distinct permutation stream per loader: a shared one would freeze the
    # source<->target sample pairing whenever the dataset lengths match
    part_tgt = dict(part, seed=args.seed + 7919) if multiproc else {}

    train_source_dataset = datasets.__dict__[args.source](
        is_train=True, raw_mode=args.device_aug, **vars(args))
    source_on_device = args.device_aug and getattr(train_source_dataset,
                                                   "raw_mode", False)
    train_source_for_loader = train_source_dataset
    if source_on_device and args.decode_cache > 0:
        # raw-mode items are decode-only (deterministic) -> memoizable
        from uda_poseestimation_tpu.data.loader import CachedDataset
        train_source_for_loader = CachedDataset(
            train_source_dataset, max_bytes=args.decode_cache * 1e9)
    train_source_loader = DataLoader(train_source_for_loader, batch_size=local_batch,
                                     shuffle=True, num_workers=args.workers, drop_last=True,
                                     **part)
    val_source_dataset = datasets.__dict__[args.source](is_train=False, **vars(args))
    val_source_loader = DataLoader(val_source_dataset, batch_size=args.test_batch,
                                   shuffle=False, num_workers=args.workers, drop_last=False)

    target_dataset = datasets.__dict__[args.target_ssl](
        is_train=True, transforms_stu=tgt_train_transform_stu,
        transforms_tea=tgt_train_transform_tea, **vars(args))
    train_target_loader = DataLoader(target_dataset, batch_size=local_batch,
                                     shuffle=True, num_workers=args.workers, drop_last=True,
                                     **part_tgt)
    val_target_dataset = datasets.__dict__[args.target](is_train=False, **vars(args))
    val_target_loader = DataLoader(val_target_dataset, batch_size=args.test_batch,
                                   shuffle=False, num_workers=args.workers, drop_last=False)

    # per-category eval loaders: args.animal is mutated in place (reference quirk)
    per_cat_loaders = []
    for cat in eval_categories:
        args.animal = cat
        ds_cat = datasets.__dict__[args.target](is_train=False, **vars(args))
        per_cat_loaders.append((cat, DataLoader(ds_cat, batch_size=args.test_batch,
                                                shuffle=False, num_workers=args.workers)))

    logger.write("Source train: {}".format(len(train_source_loader)))
    logger.write("Target train: {}".format(len(train_target_loader)))
    logger.write("Source test: {}".format(len(val_source_loader)))
    logger.write("Target test: {}".format(len(val_target_loader)))

    if multiproc and args.seed is not None:
        # some dataset split constructors reset the global `random` module
        # to fixed constants (random.seed(42) in human36m/freihand/h3d);
        # restore the rank-offset stream for per-sample augmentation draws
        random.seed(host_seed)
        np.random.seed(host_seed)

    train_source_iter = ForeverDataIterator(train_source_loader)
    train_target_iter = ForeverDataIterator(train_target_loader)

    cfg = StepConfig(image_size=args.image_size, heatmap_size=args.heatmap_size,
                     sigma=args.sigma, k=args.k, lambda_c=args.lambda_c,
                     teacher_alpha=args.teacher_alpha, mask_ratio=args.mask_ratio,
                     occlude_rate=args.occlude_rate, occlude_thresh=args.occlude_thresh,
                     occlude_size=args.occlude_size,
                     recover_min=RECOVER_MIN, recover_max=RECOVER_MAX,
                     use_sgd=args.SGD,
                     # bf16 models: single-dot Pallas occlusion gather and
                     # bf16 styled-image transport are bit-equivalent
                     # (see StepConfig.gather_exact / style_io_dtype)
                     gather_exact=False, style_io_dtype="bfloat16")
    model = models.__dict__[args.arch](num_keypoints=train_source_dataset.num_keypoints,
                                       finetune=args.finetune, dtype=jnp.bfloat16)
    if getattr(model, "finetune", False):
        # ctor flag -> 0.1x backbone lr (reference get_parameters groups)
        import dataclasses as _dc
        cfg = _dc.replace(cfg, finetune=True)
    mesh = make_mesh()
    rng = jax.random.PRNGKey(args.seed if args.seed is not None else 0)
    state = replicate(create_state(model, rng, cfg, batch_size=2), mesh)

    if args.decoder_name is not None:
        from tools.port_torch_weights import load_style_net_params
        style_model = StyleNet(dtype=jnp.bfloat16)
        # frozen at runtime -> store bf16 (bit-identical: the bf16 StyleNet
        # promotes f32 params to bf16 at every apply; see cast_floating)
        style_params = replicate(cast_floating(load_style_net_params(
            "saved_models/vgg_normalised.pth", args.decoder_name),
            jnp.bfloat16), mesh)
    else:
        style_model = None
        style_params = None

    pretrain_step = make_pretrain_step(model, cfg, style_model=style_model)
    eval_step = make_eval_step(model)
    if args.device_aug:
        from uda_poseestimation_tpu.engine import AnimalDeviceAugPipeline
        from uda_poseestimation_tpu.ops.device_aug import DeviceAugConfig
        common = dict(image_size=args.image_size, heatmap_size=args.heatmap_size,
                      sigma=args.sigma, use_rrc=False, color=0.0)
        aug_stu = DeviceAugConfig(rotation=args.rotation_stu,
                                  shear=tuple(args.shear_stu),
                                  translate=tuple(args.translate_stu),
                                  scale=tuple(args.scale_stu), **common)
        aug_tea = DeviceAugConfig(rotation=args.rotation_tea,
                                  shear=tuple(args.shear_tea),
                                  translate=tuple(args.translate_tea),
                                  scale=tuple(args.scale_tea), **common)
        if source_on_device:
            from uda_poseestimation_tpu.data.util import FLIP_PAIRS
            from uda_poseestimation_tpu.ops.device_aug import (
                AnimalSourceAugConfig,
                flip_perm_from_pairs,
            )
            src_cfg = AnimalSourceAugConfig(
                inp_res=args.inp_res, out_res=args.out_res, sigma=args.sigma,
                label_type=args.label_type)
            flip_perm = flip_perm_from_pairs(
                FLIP_PAIRS[train_source_dataset.FLIP_DATASET],
                train_source_dataset.num_keypoints)
            src_kwargs = dict(src_cfg=src_cfg, flip_perm=flip_perm,
                              src_mean=train_source_dataset.mean)
        else:
            src_kwargs = {}
        device_aug = AnimalDeviceAugPipeline(
            aug_stu, aug_tea, k=args.k, mean=ANIMAL_MEAN,
            label_type=args.label_type, mesh=mesh,
            seed=args.seed if args.seed is not None else 0, **src_kwargs)
        adapt_step = make_adapt_step(model, cfg, style_model=style_model,
                                     view_builder=device_aug.view_builder,
                                     mesh=mesh)
    else:
        device_aug = None
        adapt_step = make_adapt_step(model, cfg, style_model=style_model, mesh=mesh)

    bundler = None
    pretrain_bundler = None
    if getattr(args, "steps_per_dispatch", 1) > 1:
        from uda_poseestimation_tpu.parallel.train_step import (
            AdaptStepBundler, PretrainStepBundler)
        bundler = AdaptStepBundler(
            model, cfg, style_model=style_model,
            view_builder=device_aug.view_builder if device_aug else None,
            mesh=mesh)
        pretrain_bundler = PretrainStepBundler(
            model, cfg, style_model=style_model,
            view_builder=(device_aug.pretrain_view_builder(
                style_model is not None)
                if device_aug is not None and source_on_device else None))

    start_epoch = 0
    if args.resume:
        checkpoint = load_checkpoint(args.resume)
        state = restore_train_state(state, checkpoint, mesh,
                                    load_optimizer=True, log=logger.write)
        start_epoch = int(checkpoint.get("epoch", -1)) + 1
    elif args.pretrain:
        state = restore_train_state(state, load_checkpoint(args.pretrain),
                                    mesh, teacher_source="student")

    def visualize(image, keypoint2d, name):
        denorm = np.asarray(image) + np.asarray(ANIMAL_MEAN)
        img_u8 = np.clip(denorm * 255.0, 0, 255).astype(np.uint8)
        train_source_dataset.visualize(img_u8, keypoint2d,
                                       logger.get_image_path("{}.jpg".format(name)))

    if not dist.is_primary():
        visualize = None  # debug/val overlays are written by process 0 only

    def validate_all(params, stats, debug_visualize):
        source_acc = run_validate(eval_step, params, stats, val_source_loader, args, mesh=mesh)
        target_acc = run_validate(eval_step, params, stats, val_target_loader, args, mesh=mesh,
                                  visualize=debug_visualize)
        cat_accs = [(cat, run_validate(eval_step, params, stats, loader, args, mesh=mesh,
                                       visualize=debug_visualize))
                    for cat, loader in per_cat_loaders]
        return source_acc, target_acc, cat_accs

    if args.phase == "test":
        source_acc, target_acc, cat_accs = validate_all(
            state.teacher_params, state.teacher_stats, visualize)
        parts = " ".join("{}: {:4.3f}".format(cat.capitalize(), acc["all"])
                         for cat, acc in cat_accs)
        logger.write("Source: {:4.3f} Target: {:4.3f} {}".format(
            source_acc["all"], target_acc["all"], parts))
        for name, acc in target_acc.items():
            logger.write("{}: {:4.3f}".format(name, acc))
        for cat, acc_d in cat_accs:
            logger.write("{}:".format(cat.capitalize()))
            for name, acc in acc_d.items():
                logger.write("{}: {:4.3f}".format(name, acc))
        return

    best_acc = 0
    for epoch in range(start_epoch, args.epochs):
        logger.set_epoch(epoch)
        lr = multistep_lr(args.lr, epoch, args.lr_step, args.lr_factor)

        if epoch < args.pretrain_epoch:
            state = run_pretrain_epoch(
                state, style_params, pretrain_step, mesh, train_source_iter,
                train_target_iter, epoch, lr, args,
                visualize if args.debug else None,
                style_enabled=style_model is not None,
                device_aug=device_aug if source_on_device else None,
                bundler=pretrain_bundler)
        else:
            if epoch == args.pretrain_epoch:
                # multi-process: wait for process 0's best_pt write (shared
                # filesystem) before every process loads it
                dist.barrier("best_pt")
                state = restore_train_state(
                    state, load_checkpoint(logger.get_checkpoint_path("best_pt")),
                    mesh, teacher_source="student")
            state = run_adapt_epoch(
                state, style_params, adapt_step, mesh, train_source_iter,
                train_target_iter, epoch, lr, args,
                visualize if args.debug else None,
                style_enabled=style_model is not None,
                device_aug=device_aug, bundler=bundler)

        if epoch < args.pretrain_epoch:
            eval_params, eval_stats = state.student_params, state.student_stats
        else:
            eval_params, eval_stats = state.teacher_params, state.teacher_stats
        source_acc, target_acc, cat_accs = validate_all(
            eval_params, eval_stats, visualize if args.debug else None)

        if target_acc["all"] > best_acc:
            if dist.is_primary():  # metrics are replicated; one writer
                save_checkpoint(
                    logger.get_checkpoint_path(
                        "best_pt" if epoch < args.pretrain_epoch else "best"),
                    {"student": {"params": state.student_params,
                                 "batch_stats": state.student_stats},
                     "teacher": {"params": state.teacher_params,
                                 "batch_stats": state.teacher_stats},
                     "stu_optimizer": state.opt_state,
                     "lr_scheduler": {"epoch": epoch, "milestones": list(args.lr_step),
                                      "gamma": args.lr_factor},
                     "epoch": epoch,
                     "args": args})
            best_acc = target_acc["all"]

        parts = " ".join("{}: {:4.3f}".format(cat.capitalize(), acc["all"])
                         for cat, acc in cat_accs)
        logger.write("Epoch: {} Source: {:4.3f} Target: {:4.3f} {} Target(best): {:4.3f}".format(
            epoch, source_acc["all"], target_acc["all"], parts, best_acc))
        logger.write("Source:")
        for name, acc in source_acc.items():
            logger.write("{}: {:4.3f}".format(name, acc))
        logger.write("Target:")
        for name, acc in target_acc.items():
            logger.write("{}: {:4.3f}".format(name, acc))
        for cat, acc_d in cat_accs:
            logger.write("{}:".format(cat.capitalize()))
            for name, acc in acc_d.items():
                logger.write("{}: {:4.3f}".format(name, acc))

    logger.close()


def build_parser():
    architecture_names = sorted(
        name for name in models.__dict__
        if name.islower() and not name.startswith("__") and callable(models.__dict__[name]))

    parser = argparse.ArgumentParser(
        description="Source Only for Keypoint Detection Domain Adaptation")
    parser.add_argument("--source", default="synthetic_animal_sp", type=str)
    parser.add_argument("--target", default="real_animal", type=str)
    parser.add_argument("--target_ssl", default="real_animal", type=str)
    parser.add_argument("--image-path", default="./animal_data", type=str,
                        help="path to images")
    parser.add_argument("--animal", default="all", type=str,
                        help="horse | tiger | sheep | hound | elephant")
    parser.add_argument("--year", default=2014, type=int, metavar="N",
                        help="year of coco dataset: 2014 (default) | 2017)")
    parser.add_argument("--inp-res", default=256, type=int,
                        help="input resolution (default: 256)")
    parser.add_argument("--out-res", default=64, type=int,
                        help="output resolution (default: 64, to gen GT)")
    parser.add_argument("-f", "--flip", dest="flip", action="store_true",
                        help="flip the input during validation")
    parser.add_argument("--sigma", type=float, default=1, help="")
    parser.add_argument("--scale-factor", type=float, default=0.25,
                        help="Scale factor (data aug).")
    parser.add_argument("--rot-factor", type=float, default=30,
                        help="Rotation factor (data aug).")
    parser.add_argument("--sigma-decay", type=float, default=0,
                        help="Sigma decay rate for each epoch.")
    parser.add_argument("--label-type", metavar="LABELTYPE", default="Gaussian",
                        choices=["Gaussian", "Cauchy"],
                        help="Labelmap dist type: (default=Gaussian)")
    parser.add_argument("--train_on_all_cat", action="store_true",
                        help="whether train on all categories")
    parser.add_argument("--image-size", type=int, default=256, help="input image size")
    parser.add_argument("--heatmap-size", type=int, default=64, help="output heatmap size")
    parser.add_argument("--k", type=int, default=1, help="")

    parser.add_argument("--rotation_stu", type=int, default=180,
                        help="rotation range of the RandomRotation augmentation")
    parser.add_argument("--color_stu", type=float, default=0.25,
                        help="color range of the jitter augmentation")
    parser.add_argument("--blur_stu", type=float, default=0,
                        help="blur range of the jitter augmentation")
    parser.add_argument("--shear_stu", nargs="+", type=float, default=(-30, 30),
                        help="shear range for the RandomResizeCrop augmentation")
    parser.add_argument("--translate_stu", nargs="+", type=float, default=(0.05, 0.05),
                        help="tranlate range for the RandomResizeCrop augmentation")
    parser.add_argument("--scale_stu", nargs="+", type=float, default=(0.6, 1.3),
                        help="scale range for the RandomResizeCrop augmentation")
    parser.add_argument("--rotation_tea", type=int, default=180,
                        help="rotation range of the RandomRotation augmentation")
    parser.add_argument("--color_tea", type=float, default=0.25,
                        help="color range of the jitter augmentation")
    parser.add_argument("--blur_tea", type=float, default=0,
                        help="blur range of the jitter augmentation")
    parser.add_argument("--shear_tea", nargs="+", type=float, default=(-30, 30),
                        help="shear range for the RandomResizeCrop augmentation")
    parser.add_argument("--translate_tea", nargs="+", type=float, default=(0.05, 0.05),
                        help="tranlate range for the RandomResizeCrop augmentation")
    parser.add_argument("--scale_tea", nargs="+", type=float, default=(0.6, 1.3),
                        help="scale range for the RandomResizeCrop augmentation")
    parser.add_argument("--s2t-freq", type=float, default=0.5)
    parser.add_argument("--s2t-alpha", nargs="+", type=float, default=(0, 1))
    parser.add_argument("--t2s-freq", type=float, default=0.5)
    parser.add_argument("--t2s-alpha", nargs="+", type=float, default=(0, 1))

    parser.add_argument("-a", "--arch", metavar="ARCH", default="pose_resnet101",
                        choices=architecture_names,
                        help="backbone architecture: " + " | ".join(architecture_names)
                             + " (default: pose_resnet101)")
    parser.add_argument("--resume", type=str, default=None,
                        help="where restore model parameters from.")
    parser.add_argument("--pretrain", type=str, default=None,
                        help="where restore model parameters from.")
    parser.add_argument("--decoder-name", type=str, default=None,
                        help="where restore style_net model parameters from.")

    parser.add_argument("-b", "--batch-size", default=16, type=int, metavar="N",
                        help="mini-batch size (default: 32)")
    parser.add_argument("--test-batch", default=1, type=int, metavar="N",
                        help="mini-batch size (default: 1)")
    parser.add_argument("--lr", "--learning-rate", default=0.0001, type=float,
                        metavar="LR", help="initial learning rate", dest="lr")
    parser.add_argument("--lambda_c", default=1.0, type=float)
    parser.add_argument("--lambda_t", default=0.0, type=float,
                        help="ignored legacy flag kept for command-line parity")
    parser.add_argument("--teacher_alpha", default=0.999, type=float)
    parser.add_argument("--lr-step", default=[45, 60], type=tuple,
                        help="parameter for lr scheduler")
    parser.add_argument("--lr-factor", default=0.1, type=float,
                        help="parameter for lr scheduler")
    parser.add_argument("-j", "--workers", default=1, type=int, metavar="N",
                        help="number of data loading workers (default: 2)")
    parser.add_argument("--epochs", default=70, type=int, metavar="N",
                        help="number of total epochs to run")
    parser.add_argument("-i", "--iters-per-epoch", default=500, type=int,
                        help="Number of iterations per epoch")
    parser.add_argument("-p", "--print-freq", default=100, type=int, metavar="N",
                        help="print frequency (default: 100)")
    parser.add_argument("--val-print-freq", default=500, type=int, metavar="N",
                        help="print frequency (default: 100)")
    parser.add_argument("--seed", default=None, type=int,
                        help="seed for initializing training. ")
    parser.add_argument("--log", type=str, default="src_only",
                        help="Where to save logs, checkpoints and debugging images.")
    parser.add_argument("--phase", type=str, default="train", choices=["train", "test"],
                        help="When phase is 'test', only test the model.")
    parser.add_argument("--debug", action="store_true",
                        help="In the debug mode, save images and predictions")
    parser.add_argument("--mask-ratio", type=float, default=0.5, help="")
    parser.add_argument("--SGD", action="store_true", help="")
    parser.add_argument("--finetune", action="store_true",
                        help="0.1x learning rate on the backbone (the reference's\n"
                             "get_parameters finetune param groups)")
    parser.add_argument("--pretrain-epoch", type=int, default=-1, help="pretrain-epoch")
    parser.add_argument("--occlude-rate", type=float, default=0.5)
    parser.add_argument("--occlude-thresh", type=float, default=0.9, help="")
    parser.add_argument("--occlude-size", type=int, default=10, help="")
    parser.add_argument("--device-aug", action="store_true",
                        help="generate ALL random views on device — target mt "
                             "student/teacher views and (for raw_mode-capable "
                             "sources) the imgaug/flip/crop source pipeline "
                             "(TPU fast path; ops/device_aug.py deviation note)")
    parser.add_argument("--decode-cache", type=float, default=0.0,
                        help="GB of decoded-frame cache: raw-mode source "
                             "items under --device-aug, plus frame-level "
                             "caches inside the TigDog/animal-pose/synthetic "
                             "datasets (any mode); 0 disables")
    parser.add_argument("--steps-per-dispatch", type=int, default=1,
                        help="adaptation iterations fused per XLA dispatch "
                             "(lax.scan over pre-staged batches); 1 disables")
    from uda_poseestimation_tpu.parallel.distributed import add_distributed_args
    add_distributed_args(parser)
    return parser


if __name__ == "__main__":
    main(build_parser().parse_args())
