#!/usr/bin/env python
"""Evaluation CLI with reference parity.

Mirrors the reference eval entry (reference: eval.py:44-52, 525-565):
    python eval.py --model cashmrV2 --checkpoint <ckpt> [--dataset ...]
Evaluates the slp-4mod cover2/uncover/cover1 splits by default.  Accepts
both native .npz checkpoints and reference .pt checkpoints (converted on
load, SURVEY.md §5.4).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--model", type=str, default="hmr", help="model architecture name")
parser.add_argument("--checkpoint", default=None, help="Path to network checkpoint (.npz or .pt)")
parser.add_argument("--dataset", default=None,
                    help="Evaluate a single split instead of the default three")
parser.add_argument("--log_freq", default=50, type=int)
parser.add_argument("--batch_size", default=32, type=int)
parser.add_argument("--shuffle", default=False, action="store_true")
parser.add_argument("--num_workers", default=8, type=int)
parser.add_argument("--result_file", default=None, help="If set, save detections under this dir")
parser.add_argument("--num_cas_iters", default=2, type=int)
parser.add_argument("--img_res", default=224, type=int)
parser.add_argument("--no_masks", default=False, action="store_true")
parser.add_argument("--crop_cache", default=None,
                    help="Pre-decoded crop cache dir (tools/build_crop_cache.py)")
parser.add_argument("--device_preprocess", default=False, action="store_true",
                    help="Fused on-device crop/normalize (raw uint8 decode on "
                         "host, one jit preprocess program per batch)")
parser.add_argument("--allow_synthetic_assets", default=False, action="store_true",
                    help="Run with synthetic SMPL/regressor stand-ins when real "
                         "assets are missing (metrics NOT reference-comparable)")
parser.add_argument("--pretrained_fusion_checkpoint", default=None,
                    help="ir_depth_fusion guide weights for the "
                         "ir_depth_pm_fusion pipelines (.npz or .pt); the "
                         "reference loads this separately too (eval.py:534-538)")


def main():
    args = parser.parse_args()

    import jax

    from inbed_pose_estimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from inbed_pose_estimation_tpu import config
    from inbed_pose_estimation_tpu.data import BaseDataset
    from inbed_pose_estimation_tpu.evaluation import run_evaluation
    from inbed_pose_estimation_tpu.models import build_model
    from inbed_pose_estimation_tpu.smpl import load_or_synthesize
    from inbed_pose_estimation_tpu.train.checkpoint import load_checkpoint, load_torch_checkpoint

    from inbed_pose_estimation_tpu.utils.assets_check import check_assets

    # Hard-fail on missing parity-critical assets unless explicitly waived
    # (synthetic fallbacks are for hermetic tests, not production metrics).
    check_assets(
        allow_synthetic=args.allow_synthetic_assets,
        smpl_model_dir=config.SMPL_MODEL_DIR,
        smpl_mean_params=config.SMPL_MEAN_PARAMS,
        j_regressor_h36m=config.JOINT_REGRESSOR_H36M,
    )

    model, spec = build_model(args.model, smpl_mean_params=config.SMPL_MEAN_PARAMS)
    smpl_model = load_or_synthesize(config.SMPL_MODEL_DIR)

    # Gendered SMPL models for datasets whose GT joints come from gendered
    # GT meshes (3dpw-style; reference loads male/female at eval.py:66-73).
    smpl_gendered = None
    try:
        from inbed_pose_estimation_tpu.smpl.assets import load_smpl_model

        smpl_gendered = (
            load_smpl_model(config.SMPL_MODEL_DIR, "male"),
            load_smpl_model(config.SMPL_MODEL_DIR, "female"),
        )
    except (FileNotFoundError, OSError, KeyError):
        if args.allow_synthetic_assets:
            from inbed_pose_estimation_tpu.smpl import synthetic_smpl_model

            # Distinct seeds so the gender switch is observable in tests.
            smpl_gendered = (synthetic_smpl_model(seed=1), synthetic_smpl_model(seed=2))
            print("WARNING: gendered SMPL models are SYNTHETIC stand-ins "
                  "(seeds 1/2, unrelated to the neutral model) — gendered-GT "
                  "metrics (3dpw-style MPJPE/PA/PVE) are meaningless outside "
                  "tests.")

    frozen_guided = args.model in ("ir_depth_pm_fusion", "ir_depth_pm_rgb_fusion")
    loaded = None
    if args.checkpoint:
        if args.checkpoint.endswith(".pt"):
            # .pt checkpoints of the FrozenGuidedFusion names hold the main
            # 5/6-ch stage only; the converter nests them under 'main' and
            # the guide is grafted from --pretrained_fusion_checkpoint.
            loaded, _ = load_torch_checkpoint(args.checkpoint, target_model=args.model)
        else:
            loaded, _, _ = load_checkpoint(args.checkpoint)

    needs_init = (
        loaded is None
        or (frozen_guided and args.checkpoint.endswith(".pt"))
        or args.pretrained_fusion_checkpoint is not None
    )
    if loaded is not None and not needs_init:
        variables = loaded
    else:
        import jax.numpy as jnp

        res = args.img_res
        mods = tuple(
            jnp.zeros((1, res, res, {"img": 3}.get(m, 1))) for m in spec.modalities
        )
        if spec.input_mode == "multi":
            variables = model.init(jax.random.PRNGKey(0), mods)
        elif spec.input_mode == "fusion":
            variables = model.init(jax.random.PRNGKey(0), mods, smpl_model)
        elif spec.input_mode == "pm_contact":
            contact = jnp.zeros((1, res, res, 2))
            stacked = jnp.concatenate(list(mods) + [contact], axis=-1)
            variables = model.init(jax.random.PRNGKey(0), stacked, mode="0")
            if args.model == "bodiesAtRest4mod":
                # mode-2 refinement stack has one extra (estimated-map) channel.
                v2 = model.init(
                    jax.random.PRNGKey(0),
                    jnp.concatenate([stacked, jnp.zeros((1, res, res, 1))], axis=-1),
                    mode="2",
                )
                variables = {"params": {**v2["params"], **variables["params"]}}
        else:
            variables = model.init(
                jax.random.PRNGKey(0), jnp.concatenate(mods, axis=-1)
            )
        from inbed_pose_estimation_tpu.train.checkpoint import merge_tolerant

        variables = dict(variables)
        # Merge order: checkpoint first, EXPLICIT guide last — like the
        # reference, which loads the main checkpoint and then separately
        # loads the fusion guide over it (eval.py:529-538).  Grafting the
        # guide before the checkpoint would let a flax checkpoint's own
        # (possibly random-init) guide subtree silently win.
        if loaded is not None:
            variables = merge_tolerant(variables, loaded)
        if args.pretrained_fusion_checkpoint:
            if not frozen_guided:
                print(f"WARNING: --pretrained_fusion_checkpoint is only "
                      f"consumed by the FrozenGuidedFusion pipelines "
                      f"(ir_depth_pm_fusion / ir_depth_pm_rgb_fusion); "
                      f"'{args.model}' has no 'guide' submodule, so the "
                      f"flag is IGNORED")
            gck = args.pretrained_fusion_checkpoint
            if gck.endswith(".pt"):
                guide_vars, _ = load_torch_checkpoint(gck)
            else:
                guide_vars, _, _ = load_checkpoint(gck)
            variables = merge_tolerant(
                variables, {coll: {"guide": tree} for coll, tree in guide_vars.items()}
            )
        elif frozen_guided and loaded is not None and args.checkpoint.endswith(".pt"):
            print("WARNING: no --pretrained_fusion_checkpoint — the frozen "
                  "ir_depth_fusion guide keeps random init; metrics are "
                  "meaningless for this pipeline")

    splits = [args.dataset] if args.dataset else [
        "slp-4mod-cover2", "slp-4mod-uncover", "slp-4mod-cover1"
    ]

    # Device preprocessing covers the modality-image families; fusion /
    # Bodies-At-Rest eval needs host-side pm_contact/mask work.
    use_device_pre = args.device_preprocess and spec.input_mode in ("concat", "multi")
    if args.device_preprocess and not use_device_pre:
        print(f"--device_preprocess ignored for input mode '{spec.input_mode}'")

    class _Opt:
        img_res = args.img_res
        device_preprocess = use_device_pre
        crop_cache = args.crop_cache

    for d in splits:
        ds = BaseDataset(_Opt(), d, is_train=False)
        run_evaluation(
            model, spec, variables, d, ds, smpl_model,
            smpl_gendered=smpl_gendered,
            result_file=args.result_file,
            batch_size=args.batch_size,
            img_res=args.img_res,
            num_workers=args.num_workers,
            shuffle=args.shuffle,
            log_freq=args.log_freq,
            num_cas_iters=args.num_cas_iters,
            eval_masks_enabled=not args.no_masks,
            device_preprocess=use_device_pre,
        )


if __name__ == "__main__":
    main()
