"""Training CLI flags.

Mirrors the reference's TrainOptions surface exactly
(reference: utils/train_options.py:7-93; SURVEY.md §5.6), including the
--from_json whole-config override and the merged-config dump to
logs/<name>/config.json.  TPU-specific additions are grouped under `tpu`.
"""

from __future__ import annotations

import argparse
import json
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="inbed_pose_estimation_tpu training")
    req = p.add_argument_group("Required")
    req.add_argument("--name", required=True, help="Name of the experiment")

    gen = p.add_argument_group("General")
    gen.add_argument("--time_to_run", type=int, default=3600000,
                     help="Total time to run in seconds (graceful checkpoint+exit)")
    gen.add_argument("--resume", dest="resume", default=False, action="store_true",
                     help="Resume from latest checkpoint (incl. mid-epoch position)")
    gen.add_argument("--num_workers", type=int, default=8, help="Host decode threads")
    gen.add_argument("--ngpu", type=int, default=1, help="(parity flag; unused on TPU)")
    gen.add_argument("--pin_memory", dest="pin_memory", default=True, action="store_true")
    gen.add_argument("--no_pin_memory", dest="pin_memory", action="store_false")
    gen.add_argument("--allow_synthetic_assets", default=False, action="store_true",
                     help="Run with synthetic SMPL/prior stand-ins when real "
                          "assets are missing (training NOT reference-comparable)")

    io = p.add_argument_group("io")
    io.add_argument("--log_dir", default="logs", help="Directory to store logs")
    io.add_argument("--checkpoint", default=None, help="Path to checkpoint")
    io.add_argument("--from_json", default=None, help="Load options from json file")
    io.add_argument("--pretrained_checkpoint", default=None,
                    help="Load a pretrained checkpoint at the beginning of training")
    io.add_argument("--pretrained_fusion_checkpoint", default=None,
                    help="Pretrained ir_depth_fusion checkpoint (.pt or native "
                         ".npz) grafted as the FROZEN guide of the "
                         "ir_depth_pm_fusion / ir_depth_pm_rgb_fusion pipelines "
                         "(the reference hard-codes this path, "
                         "train/trainer.py:32)")

    tr = p.add_argument_group("Training Options")
    tr.add_argument("--model", default="cashmrV2", help="Model architecture name")
    tr.add_argument("--data_train", default="slp-4mod-train")
    tr.add_argument("--data_test", default="slp-4mod-uncover+slp-4mod-cover1+slp-4mod-cover2",
                    help="'+'-joined eval split names")
    tr.add_argument("--num_epochs", type=int, default=200)
    tr.add_argument("--lr", type=float, default=5e-5)
    tr.add_argument("--batch_size", type=int, default=64)
    tr.add_argument("--summary_steps", type=int, default=25)
    tr.add_argument("--test_steps", type=int, default=200000)
    tr.add_argument("--checkpoint_steps", type=int, default=200000)
    tr.add_argument("--img_res", type=int, default=224)
    tr.add_argument("--rot_factor", type=float, default=15)
    tr.add_argument("--noise_factor", type=float, default=0.4)
    tr.add_argument("--scale_factor", type=float, default=0.15)
    tr.add_argument("--ignore_3d", default=False, action="store_true")
    tr.add_argument("--shape_loss_weight", type=float, default=0)
    tr.add_argument("--keypoint_loss_weight", type=float, default=5.0)
    tr.add_argument("--pose_loss_weight", type=float, default=1.0)
    tr.add_argument("--beta_loss_weight", type=float, default=0.001)
    tr.add_argument("--openpose_train_weight", type=float, default=0.0)
    tr.add_argument("--gt_train_weight", type=float, default=1.0)
    tr.add_argument("--run_smplify", default=False, action="store_true")
    tr.add_argument("--smplify_threshold", type=float, default=100.0)
    tr.add_argument("--num_smplify_iters", type=int, default=100)
    tr.add_argument("--no_render", default=False, action="store_true")
    tr.add_argument("--num_cas_iters", type=int, default=2)
    tr.add_argument("--mod1_epoch", type=int, default=50)
    shuf = tr.add_mutually_exclusive_group()
    shuf.add_argument("--shuffle_train", dest="shuffle_train", action="store_true")
    shuf.add_argument("--no_shuffle_train", dest="shuffle_train", action="store_false")
    p.set_defaults(shuffle_train=True)

    tpu = p.add_argument_group("TPU Options")
    tpu.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"],
                     help="Model compute dtype (params stay float32)")
    tpu.add_argument("--seed", type=int, default=0)
    tpu.add_argument("--remat", nargs="?", const="stage", default=False,
                     choices=["stage", "decoder"],
                     help="Rematerialize on backward (memory for FLOPs): bare "
                          "--remat (= 'stage') checkpoints whole cascade "
                          "stages; '--remat decoder' checkpoints only the "
                          "reconstruction decoders, whose 112^2-224^2 "
                          "activations dominate memory while their FLOPs are "
                          "a minority (HBM-bound) — most of the memory relief "
                          "at a fraction of the recompute tax")
    tpu.add_argument("--fast_preprocess", default=False, action="store_true",
                     help="Use the native C++ fused crop+resize+rotate kernel for "
                          "host preprocessing — covers the full augmentation "
                          "distribution (not bit-identical to the reference "
                          "resampler)")
    tpu.add_argument("--crop_cache", default=None,
                     help="Directory of a pre-decoded crop cache built by "
                          "tools/build_crop_cache.py: replaces the 9 image "
                          "decodes per sample with memmap patch reads "
                          "(bit-exact; kills the host decode bound)")
    tpu.add_argument("--uint8_feed", default=True,
                     action=argparse.BooleanOptionalAction,
                     help="Ship post-crop uint8 images to the device and fuse "
                          "noise+normalize into the train step (4x less H2D "
                          "traffic; matches the f32 feed to 1 ulp — except under "
                          "--fast_preprocess, whose kernel output is "
                          "re-quantized to bytes).  --no-uint8_feed "
                          "restores the host-normalized float32 feed")
    return p


def parse_args(argv=None):
    p = build_parser()
    args = p.parse_args(argv)
    if args.from_json:
        with open(args.from_json) as f:
            json_args = json.load(f)
        for k, v in json_args.items():
            if k != "name":
                setattr(args, k, v)
    args.log_dir = os.path.join(os.path.abspath(args.log_dir), args.name)
    args.summary_dir = os.path.join(args.log_dir, "tensorboard")
    args.checkpoint_dir = os.path.join(args.log_dir, "checkpoints")
    os.makedirs(args.log_dir, exist_ok=True)
    os.makedirs(args.summary_dir, exist_ok=True)
    os.makedirs(args.checkpoint_dir, exist_ok=True)
    save_dump(args)
    return args


def save_dump(args) -> None:
    """Dump merged config to logs/<name>/config.json
    (utils/train_options.py:85-93)."""
    with open(os.path.join(args.log_dir, "config.json"), "w") as f:
        json.dump(vars(args), f, indent=4)
