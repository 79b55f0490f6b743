"""Training-step tests: one full cashmrV2 train step (cascade + losses +
Adam + fits update) compiles and runs, loss decreases over steps, fits
get/set round-trips, and the whole thing works on an 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from inbed_pose_estimation_tpu.fitting import synthetic_gmm_prior
from inbed_pose_estimation_tpu.models import build_model
from inbed_pose_estimation_tpu.parallel import batch_sharding, make_mesh, replicated
from inbed_pose_estimation_tpu.smpl import synthetic_smpl_model
from inbed_pose_estimation_tpu.train.fits_dict import fits_get, fits_set
from inbed_pose_estimation_tpu.train.trainer import TrainState, make_train_step

RES = 64


class Opt:
    img_res = RES
    lr = 5e-5
    run_smplify = False
    num_cas_iters = 2
    num_smplify_iters = 3
    smplify_threshold = 100.0
    shape_loss_weight = 0.0
    keypoint_loss_weight = 5.0
    beta_loss_weight = 0.001
    openpose_train_weight = 0.0
    gt_train_weight = 1.0


def _fake_batch(B, rng, n_samples=16):
    r = np.random.default_rng(rng)
    batch = {
        "img": r.normal(0, 1, (B, RES, RES, 3)).astype(np.float32),
        "ir_img": r.normal(0, 1, (B, RES, RES, 1)).astype(np.float32),
        "depth_img": r.normal(0, 1, (B, RES, RES, 1)).astype(np.float32),
        "pm_img": r.normal(0, 1, (B, RES, RES, 1)).astype(np.float32),
        "depth_img_uncover": r.normal(0, 1, (B, RES, RES, 1)).astype(np.float32),
        "keypoints": np.concatenate(
            [r.uniform(-1, 1, (B, 49, 2)), np.ones((B, 49, 1))], -1
        ).astype(np.float32),
        "pose": r.normal(0, 0.2, (B, 72)).astype(np.float32),
        "betas": r.normal(0, 0.5, (B, 10)).astype(np.float32),
        "pose_3d": np.concatenate(
            [r.normal(0, 0.3, (B, 24, 3)), np.ones((B, 24, 1))], -1
        ).astype(np.float32),
        "has_smpl": np.ones(B, np.float32),
        "has_pose_3d": np.ones(B, np.float32),
        "is_flipped": np.zeros(B, np.float32),
        "rot_angle": np.zeros(B, np.float32),
        "sample_index": np.arange(B, dtype=np.int32) % n_samples,
    }
    return {k: jnp.asarray(v) for k, v in batch.items()}


def _make_state(model, spec, opt, n_samples=16, seed=0):
    import optax

    x = jnp.zeros((2, RES, RES, 6))
    variables = model.init(jax.random.PRNGKey(seed), x)
    tx = optax.adam(opt.lr)
    return TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        fits=jnp.zeros((n_samples, 82)),
        rng=jax.random.PRNGKey(seed + 1),
        step=jnp.zeros((), jnp.int32),
    )


def test_fits_get_set_roundtrip():
    rng = np.random.default_rng(0)
    fits = jnp.asarray(rng.normal(0, 0.3, (8, 82)).astype(np.float32))
    idx = jnp.asarray([1, 3, 5], jnp.int32)
    rot = jnp.asarray([10.0, -20.0, 0.0])
    flip = jnp.asarray([1.0, 0.0, 1.0])

    pose, betas = fits_get(fits, idx, rot, flip)
    fits2 = fits_set(fits, idx, rot, flip, jnp.ones(3), pose, betas)
    np.testing.assert_allclose(np.asarray(fits2), np.asarray(fits), atol=1e-4)


def test_train_step_runs_and_improves():
    model, spec = build_model("cashmrV2")
    smpl = synthetic_smpl_model(seed=0)
    prior = synthetic_gmm_prior()
    opt = Opt()
    step_fn, _ = make_train_step(model, spec, smpl, prior, opt)
    step = jax.jit(step_fn)

    state = _make_state(model, spec, opt)
    batch = _fake_batch(4, 0)
    losses = []
    for i in range(4):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 4


@pytest.mark.slow
def test_train_step_with_smplify():
    model, spec = build_model("cashmrV2")
    smpl = synthetic_smpl_model(seed=0)
    prior = synthetic_gmm_prior()

    class OptS(Opt):
        run_smplify = True
        num_smplify_iters = 2

    step_fn, _ = make_train_step(model, spec, smpl, prior, OptS())
    step = jax.jit(step_fn)
    state = _make_state(model, spec, OptS())
    fits_before = np.asarray(state.fits).copy()
    batch = _fake_batch(2, 1)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # SMPLify should have improved at least one fit entry (store changed).
    assert not np.allclose(np.asarray(state.fits), fits_before)


def test_train_step_on_8_device_mesh():
    """The full train step executes with the batch sharded over 8 CPU
    devices and replicated state (SURVEY.md §2.3 DP semantics)."""
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    model, spec = build_model("cashmrV2")
    smpl = synthetic_smpl_model(seed=0)
    prior = synthetic_gmm_prior()
    opt = Opt()
    step_fn, _ = make_train_step(model, spec, smpl, prior, opt)

    mesh = make_mesh(jax.devices()[:8])
    bsharding = batch_sharding(mesh)
    rep = replicated(mesh)

    state = _make_state(model, spec, opt)
    state = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)
    batch = jax.device_put(_fake_batch(8, 2), bsharding)

    step = jax.jit(step_fn)
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # Params remain replicated after the step.
    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_remat_matches_no_remat():
    """jax.checkpoint'd cascade stages give the identical loss."""
    model, spec = build_model("cashmrV2")
    smpl = synthetic_smpl_model(seed=0)
    prior = synthetic_gmm_prior()

    class OptR(Opt):
        remat = True

    batch = _fake_batch(2, 5)
    losses = []
    for opt_cls in (Opt, OptR):
        step_fn, _ = make_train_step(model, spec, smpl, prior, opt_cls())
        state = _make_state(model, spec, opt_cls(), seed=3)
        _, metrics = jax.jit(step_fn)(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[0] == pytest.approx(losses[1], rel=1e-5), losses


def test_remat_decoder_matches_no_remat():
    """`--remat decoder` (nn.remat on the Reconstruct modules only) keeps
    the param tree IDENTICAL (checkpoints interchangeable) and the train
    step numerically equivalent — remat changes memory, not math."""
    smpl = synthetic_smpl_model(seed=0)
    prior = synthetic_gmm_prior()

    losses, structs = [], []
    for remat_decoder in (False, True):
        model, spec = build_model("cashmrV2", remat_decoder=remat_decoder)
        step_fn, _ = make_train_step(model, spec, smpl, prior, Opt())
        state = _make_state(model, spec, Opt(), seed=3)
        structs.append(jax.tree_util.tree_structure(state.params))
        _, metrics = jax.jit(step_fn)(state, _fake_batch(2, 5))
        losses.append(float(metrics["loss"]))
    assert structs[0] == structs[1]
    assert losses[0] == pytest.approx(losses[1], rel=1e-5), losses


def test_sync_bn_device_count_equivalence():
    """Pin the sync-BN semantics choice (VERDICT Weak #1/#8): the SAME step
    on a 1-device and an 8-device mesh must produce matching loss, updated
    params, and batch_stats — i.e. BN statistics are global, so training
    numerics are independent of the device count."""
    assert jax.device_count() >= 8
    model, spec = build_model("cashmrV2")
    smpl = synthetic_smpl_model(seed=0)
    prior = synthetic_gmm_prior()
    opt = Opt()
    step_fn, _ = make_train_step(model, spec, smpl, prior, opt)
    step = jax.jit(step_fn)

    state0 = _make_state(model, spec, opt, seed=11)
    batch0 = _fake_batch(8, 7)

    outs = []
    for ndev in (1, 8):
        mesh = make_mesh(jax.devices()[:ndev])
        rep = replicated(mesh)
        st = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state0)
        b = jax.device_put(batch0, batch_sharding(mesh))
        st2, metrics = step(st, b)
        outs.append((float(metrics["loss"]),
                     jax.device_get(st2.params),
                     jax.device_get(st2.batch_stats)))

    (l1, p1, s1), (l8, p8, s8) = outs
    # Sync-BN makes the math device-count independent, but float32 psum
    # reduction order is NOT: cross-device reductions reassociate, so the
    # guarantee is numerical equivalence up to reduction order (~1e-4 rel
    # through a full ResNet-50 fwd+bwd), not bit equality.
    assert l1 == pytest.approx(l8, rel=1e-4), (l1, l8)
    # Updated params: Adam's first-step update is +-lr elementwise
    # (m_hat/sqrt(v_hat) == +-1 at step 1), so a reduction-order sign flip
    # on a near-zero gradient legitimately moves a param by up to 2*lr
    # (observed: exactly 9.9999e-5 == 2 * 5e-5 on 1/3072 elements).
    two_lr = 2 * Opt.lr
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1.2 * two_lr)
    # Batch statistics see the LARGEST reduction-order divergence: a psum
    # rounding flip on a near-zero pre-activation flips its ReLU branch,
    # and those O(1) elementwise changes seed activation divergence that
    # compounds through ~50 layers — deep-layer batch means differ by
    # ~1e-3 rel between shardings (observed 1.3e-4 abs on running stats,
    # which move 0.1x the batch stat per step).  BN uses two-pass variance
    # (models/backbone.py::batch_norm) precisely to keep this bounded —
    # one-pass E[x^2]-E[x]^2 cancellation was 4x worse (4.9e-4).
    for a, b in zip(jax.tree_util.tree_leaves(s1), jax.tree_util.tree_leaves(s8)):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-4)
