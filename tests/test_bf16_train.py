"""bf16-compute training guardrail (PARITY.md train table): the
--dtype bfloat16 operating point (bf16 model compute, f32 params/optimizer/
geometry) must track the f32 loss trajectory — no NaN, same descent."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from inbed_pose_estimation_tpu.fitting import synthetic_gmm_prior
from inbed_pose_estimation_tpu.models import build_model
from inbed_pose_estimation_tpu.smpl import synthetic_smpl_model
from inbed_pose_estimation_tpu.train.trainer import TrainState, make_train_step

RES = 64
B = 4
N_STEPS = 5


class Opt:
    img_res = RES
    lr = 1e-4
    run_smplify = False
    num_cas_iters = 2
    num_smplify_iters = 3
    smplify_threshold = 100.0
    shape_loss_weight = 0.0
    keypoint_loss_weight = 5.0
    beta_loss_weight = 0.001
    openpose_train_weight = 0.0
    gt_train_weight = 1.0
    remat = False


def _batches():
    r = np.random.default_rng(0)
    out = []
    for _ in range(N_STEPS):
        out.append({
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
            "sample_index": np.arange(B, dtype=np.int32),
        })
    return out


def _run(dtype, batches):
    model, spec = build_model("cashmrV2", dtype=dtype)
    smpl = synthetic_smpl_model(seed=0)
    prior = synthetic_gmm_prior()
    step_fn, tx = make_train_step(model, spec, smpl, prior, Opt())
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, RES, RES, 6)))
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        fits=jnp.zeros((16, 82)),
        rng=jax.random.PRNGKey(1),
        step=jnp.zeros((), jnp.int32),
    )
    step = jax.jit(step_fn)
    losses = []
    for b in batches:
        state, metrics = step(state, {k: jnp.asarray(v) for k, v in b.items()})
        losses.append(float(metrics["loss"]))
    return np.asarray(losses), state


def test_bf16_train_tracks_f32():
    batches = _batches()
    f32, _ = _run(jnp.float32, batches)
    bf16, state = _run(jnp.bfloat16, batches)
    print(f"f32 losses:  {np.round(f32, 4).tolist()}")
    print(f"bf16 losses: {np.round(bf16, 4).tolist()}")

    assert np.isfinite(bf16).all(), "bf16 training produced non-finite loss"
    # Same descent: both strictly improve over the run.
    assert f32[-1] < f32[0]
    assert bf16[-1] < bf16[0]
    # Trajectories track: bf16 rounding perturbs each step's loss by well
    # under the descent signal at this scale.
    rel = np.abs(bf16 - f32) / np.abs(f32)
    assert rel.max() < 0.05, f"bf16 diverged from f32: rel={rel}"

    # Params and optimizer state stay f32 (only compute is bf16).
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(l.dtype == jnp.float32 for l in leaves)
    opt_leaves = [l for l in jax.tree_util.tree_leaves(state.opt_state)
                  if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)]
    assert all(l.dtype == jnp.float32 for l in opt_leaves)


def test_train_cli_threads_dtype(monkeypatch, tmp_path):
    """train.py passes --dtype through to build_model (the flag is live)."""
    import inbed_pose_estimation_tpu.models as models_mod
    import train as train_cli

    seen = {}

    def spy(name, **kw):
        seen["dtype"] = kw.get("dtype")
        raise RuntimeError("stop after build")

    monkeypatch.setattr(models_mod, "build_model", spy)
    monkeypatch.setattr("sys.argv", [
        "train.py", "--name", "dt", "--log_dir", str(tmp_path),
        "--model", "hmr", "--dtype", "bfloat16", "--allow_synthetic_assets",
    ])
    with pytest.raises(RuntimeError, match="stop after build"):
        train_cli.main()
    assert seen["dtype"] == jnp.bfloat16
