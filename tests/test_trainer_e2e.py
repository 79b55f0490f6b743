"""Trainer-level end-to-end smoke: the full epoch driver over the synthetic
SLP tree — loader, compiled train step, checkpointing, and resume."""

import importlib
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    from inbed_pose_estimation_tpu.data.synthetic import write_synthetic_environment

    base = tmp_path_factory.mktemp("trainer_e2e")
    env = write_synthetic_environment(str(base), num_subjects=1, samples_per_subject=4)
    os.environ["INBED_DATA_ROOT"] = env["data_root"]
    os.environ["INBED_NPZ_PATH"] = env["npz_path"]
    from inbed_pose_estimation_tpu import config

    importlib.reload(config)
    import inbed_pose_estimation_tpu.data.dataset as ds_mod

    importlib.reload(ds_mod)
    return env, ds_mod, str(base)


class _Options:
    model = "cashmrV2"
    data_train = "slp-4mod-train"
    img_res = 64
    lr = 5e-5
    batch_size = 4
    num_epochs = 1
    num_workers = 1
    shuffle_train = True
    seed = 0
    resume = False
    run_smplify = False
    num_cas_iters = 2
    num_smplify_iters = 2
    smplify_threshold = 100.0
    shape_loss_weight = 0.0
    keypoint_loss_weight = 5.0
    beta_loss_weight = 0.001
    openpose_train_weight = 0.0
    gt_train_weight = 1.0
    summary_steps = 1
    checkpoint_steps = 10**9
    test_steps = 0
    time_to_run = 10**9
    pretrained_checkpoint = None


@pytest.mark.slow
def test_trainer_one_epoch_and_resume(env, tmp_path):
    _, ds_mod, _ = env
    from inbed_pose_estimation_tpu.fitting import synthetic_gmm_prior
    from inbed_pose_estimation_tpu.models import build_model
    from inbed_pose_estimation_tpu.smpl import synthetic_smpl_model
    from inbed_pose_estimation_tpu.train import Trainer
    from inbed_pose_estimation_tpu.train.checkpoint import latest_checkpoint, load_checkpoint

    opts = _Options()
    opts.checkpoint_dir = str(tmp_path / "ckpt")
    os.makedirs(opts.checkpoint_dir, exist_ok=True)

    model, spec = build_model(opts.model)
    smpl = synthetic_smpl_model(seed=0)
    prior = synthetic_gmm_prior()
    train_ds = ds_mod.BaseDataset(opts, opts.data_train, is_train=True)
    assert len(train_ds) == 8  # 4 samples x 2 covers

    trainer = Trainer(opts, model, spec, smpl, prior, train_ds)
    trainer.train(eval_fn=None)
    assert trainer.step_count == 2  # 8 samples / batch 4

    ck = latest_checkpoint(opts.checkpoint_dir)
    assert ck is not None and ck.endswith("epoch_1_0.npz")
    _, _, meta = load_checkpoint(ck)
    assert meta["total_step_count"] == 2
    # Fits store persisted alongside.
    assert os.path.exists(os.path.join(opts.checkpoint_dir, "slp-4mod-train_fits.npy"))

    # Resume: picks up epoch 1, runs zero further epochs (num_epochs=1).
    opts2 = _Options()
    opts2.checkpoint_dir = opts.checkpoint_dir
    opts2.resume = True
    trainer2 = Trainer(opts2, model, spec, smpl, prior, train_ds)
    assert trainer2.epoch0 == 1
    assert trainer2.step_count == 2
    trainer2.train(eval_fn=None)  # no-op epoch range
    assert trainer2.step_count == 2
