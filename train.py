#!/usr/bin/env python
"""Training CLI with reference parity (reference: train.py:1-7):

    python train.py --name exp --model cashmrV2 --run_smplify ...
"""

from __future__ import annotations


def main():
    from inbed_pose_estimation_tpu.train.options import parse_args

    options = parse_args()

    from inbed_pose_estimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from tensorboardX import SummaryWriter

    from inbed_pose_estimation_tpu import config
    from inbed_pose_estimation_tpu.data import BaseDataset, MixedDataset
    from inbed_pose_estimation_tpu.evaluation import run_evaluation
    from inbed_pose_estimation_tpu.fitting import load_gmm_prior
    from inbed_pose_estimation_tpu.models import build_model
    from inbed_pose_estimation_tpu.smpl import load_or_synthesize
    from inbed_pose_estimation_tpu.train import Trainer

    from inbed_pose_estimation_tpu.utils.assets_check import check_assets

    check_assets(
        allow_synthetic=getattr(options, "allow_synthetic_assets", False),
        smpl_model_dir=config.SMPL_MODEL_DIR,
        smpl_mean_params=config.SMPL_MEAN_PARAMS,
        gmm_prior_file=config.GMM_PRIOR_FILE if options.run_smplify else None,
    )

    # --dtype bfloat16: compute dtype for the model graph (flax param_dtype
    # stays float32, as do the geometry/loss paths, which pin f32 — the
    # standard TPU operating point).  Measured f32-vs-bf16 train rows live
    # in PARITY.md; the loss-trajectory guardrail is tests/test_bf16_train.py.
    import jax.numpy as _jnp
    compute_dtype = _jnp.bfloat16 if getattr(options, "dtype", "float32") == "bfloat16" else _jnp.float32
    model, spec = build_model(options.model, smpl_mean_params=config.SMPL_MEAN_PARAMS,
                              dtype=compute_dtype,
                              remat_decoder=getattr(options, "remat", False) == "decoder")
    smpl_model = load_or_synthesize(config.SMPL_MODEL_DIR)
    prior = load_gmm_prior(config.GMM_PRIOR_FILE)
    train_ds = MixedDataset(options, ignore_3d=options.ignore_3d, is_train=True)
    writer = SummaryWriter(options.summary_dir)

    test_splits = [s for s in options.data_test.split("+") if s]
    test_datasets = {s: BaseDataset(options, s, is_train=False) for s in test_splits}

    def eval_fn(trainer):
        variables = {
            "params": trainer.state.params,
            "batch_stats": trainer.state.batch_stats,
        }
        for name, ds in test_datasets.items():
            run_evaluation(
                model, spec, variables, name, ds, smpl_model,
                checkpoint_dir=options.checkpoint_dir,
                batch_size=min(options.batch_size, 32),
                img_res=options.img_res,
                num_workers=options.num_workers,
                num_cas_iters=options.num_cas_iters,
                eval_masks_enabled=not options.no_render,
            )

    trainer = Trainer(options, model, spec, smpl_model, prior, train_ds, summary_writer=writer)
    trainer.train(eval_fn=eval_fn)
    trainer.fits_store.array = trainer.state.fits
    trainer.fits_store.save()


if __name__ == "__main__":
    main()
