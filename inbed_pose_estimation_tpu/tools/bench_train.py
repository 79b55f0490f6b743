"""Training-step throughput benchmark (not driver-run; see bench.py for the
headline inference metric).

Measures the FULL compiled cashmrV2 training step — fits gather, SMPL LBS
x(2+num_cas), batched camera LSQ, cascade fwd+bwd, Adam — at the reference
train configuration (224x224, configurable batch / num_cas_iters /
run_smplify) on the current default device.

Usage: python -m inbed_pose_estimation_tpu.tools.bench_train [--batch 32]
       [--num_cas_iters 2] [--run_smplify] [--remat] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--num_cas_iters", type=int, default=2)
    ap.add_argument("--run_smplify", action="store_true")
    ap.add_argument("--num_smplify_iters", type=int, default=100)
    ap.add_argument("--remat", nargs="?", const="stage", default=False,
                    choices=["stage", "decoder"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ..fitting import synthetic_gmm_prior
    from ..models import build_model
    from ..smpl import synthetic_smpl_model
    from ..train.trainer import TrainState, make_train_step
    import optax

    class Opt:
        img_res = args.res
        lr = 5e-5
        run_smplify = args.run_smplify
        num_cas_iters = args.num_cas_iters
        num_smplify_iters = args.num_smplify_iters
        smplify_threshold = 100.0
        shape_loss_weight = 0.0
        keypoint_loss_weight = 5.0
        beta_loss_weight = 0.001
        openpose_train_weight = 0.0
        gt_train_weight = 1.0
        remat = args.remat

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model, spec = build_model("cashmrV2", dtype=dtype,
                              remat_decoder=(args.remat == "decoder"))
    smpl = synthetic_smpl_model(seed=0)
    prior = synthetic_gmm_prior()
    step_fn, tx = make_train_step(model, spec, smpl, prior, Opt())

    B, RES = args.batch, args.res
    rng = np.random.default_rng(0)
    batch = {
        "img": rng.normal(0, 1, (B, RES, RES, 3)),
        "ir_img": rng.normal(0, 1, (B, RES, RES, 1)),
        "depth_img": rng.normal(0, 1, (B, RES, RES, 1)),
        "pm_img": rng.normal(0, 1, (B, RES, RES, 1)),
        "depth_img_uncover": rng.normal(0, 1, (B, RES, RES, 1)),
        "keypoints": np.concatenate([rng.uniform(-1, 1, (B, 49, 2)), np.ones((B, 49, 1))], -1),
        "pose": rng.normal(0, 0.2, (B, 72)),
        "betas": rng.normal(0, 0.5, (B, 10)),
        "pose_3d": np.concatenate([rng.normal(0, 0.3, (B, 24, 3)), np.ones((B, 24, 1))], -1),
        "has_smpl": np.ones(B),
        "has_pose_3d": np.ones(B),
        "is_flipped": np.zeros(B),
        "rot_angle": np.zeros(B),
        "sample_index": np.arange(B),
    }
    batch = {
        k: jnp.asarray(v, jnp.int32 if k == "sample_index" else jnp.float32)
        for k, v in batch.items()
    }

    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, RES, RES, 6)))
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        fits=jnp.zeros((max(B, 64), 82)),
        rng=jax.random.PRNGKey(1),
        step=jnp.zeros((), jnp.int32),
    )

    step = jax.jit(step_fn, donate_argnums=(0,))
    t0 = time.perf_counter()
    state, metrics = step(state, batch)
    float(metrics["loss"])
    compile_s = time.perf_counter() - t0

    # Fetch the loss every step: on the remote-TPU platform
    # block_until_ready alone under-synchronizes (measured 4.9ms/step
    # "throughput" that was pure dispatch).
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, batch)
        _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({
        "metric": f"train images/sec/chip (cashmrV2 {args.res}^2 cas{args.num_cas_iters}"
                  + (" +smplify" if args.run_smplify else "")
                  + (f" +remat:{args.remat}" if args.remat else "") + f" {args.dtype})",
        "value": round(B / dt, 2),
        "unit": "images/sec/chip",
        "step_ms": round(dt * 1000, 1),
        "compile_s": round(compile_s, 1),
        "loss": float(metrics["loss"]),
    }))


if __name__ == "__main__":
    main()
