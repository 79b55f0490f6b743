#!/usr/bin/env python
"""Measured phase breakdown of the training step (the 27%-MFU question).

Round 4 attributed the 215ms-measured vs 85.5ms-conv-floor train-step gap
to "BN statistics, elementwise loss math, Adam — pure HBM traffic — and XLA
scheduling" without measuring the split.  This tool measures it, on chip,
using the same device-side K-scan machinery as segment_timing.py (dispatch
costs amortized out):

  * fwd       — loss_fn forward only (cascade fwd + SMPL LBS + cam LSQ +
                losses + BN batch statistics)
  * fwd+bwd   — jax.value_and_grad(loss_fn): adds the backward cascade
                (input- and weight-gradient convolutions)
  * full      — the real train step: adds Adam + state rebuild + fits
                scatter
  * adam      — tx.update + apply_updates alone on the real param tree
                (pure optimizer HBM traffic, measured directly)
  * net fwd   — the bare model cascade fwd (no losses/LBS/BN-stat use),
                so "loss machinery" = fwd − net_fwd

Derived rows: bwd = (fwd+bwd) − fwd; step overhead = full − (fwd+bwd).
Each phase is also bounded by its own conv/dot speed-of-light
(conv_efficiency._analyze_hlo on the phase's lowered HLO).

Usage: python -m inbed_pose_estimation_tpu.tools.train_breakdown
       [--batch 32] [--k 4] [--dispatches 4] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from .segment_timing import _sol_ms, _time_scan


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--dispatches", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from ..fitting import synthetic_gmm_prior
    from ..models import build_model
    from ..smpl import synthetic_smpl_model
    from ..train.trainer import TrainState, make_train_step

    class Opt:
        img_res = args.res
        lr = 5e-5
        run_smplify = False
        num_cas_iters = 2
        num_smplify_iters = 100
        smplify_threshold = 100.0
        shape_loss_weight = 0.0
        keypoint_loss_weight = 5.0
        beta_loss_weight = 0.001
        openpose_train_weight = 0.0
        gt_train_weight = 1.0
        remat = False

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model, spec = build_model("cashmrV2", dtype=dt)
    smpl = synthetic_smpl_model(seed=0)
    prior = synthetic_gmm_prior()
    step_fn, tx = make_train_step(model, spec, smpl, prior, Opt())
    loss_fn = step_fn._loss_fn

    B, res = args.batch, args.res
    rng = np.random.default_rng(0)
    host = {
        "img": rng.normal(0, 1, (B, res, res, 3)),
        "ir_img": rng.normal(0, 1, (B, res, res, 1)),
        "depth_img": rng.normal(0, 1, (B, res, res, 1)),
        "pm_img": rng.normal(0, 1, (B, res, res, 1)),
        "depth_img_uncover": rng.normal(0, 1, (B, res, res, 1)),
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
    data = {k: jnp.asarray(v, jnp.int32 if k == "sample_index" else jnp.float32)
            for k, v in host.items()}
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, res, res, 6)))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    fits = jnp.zeros((max(B, 64), 82))
    key = jax.random.PRNGKey(1)
    state = TrainState(params=params, batch_stats=batch_stats,
                       opt_state=tx.init(params), fits=fits, rng=key,
                       step=jnp.zeros((), jnp.int32))

    rows = {}

    def perturb(tree, acc):
        # Hoisting guard: every float leaf must depend on the scan carry, or
        # XLA's while-loop invariant code motion executes the loop-invariant
        # part (e.g. the whole cascade forward, whose activations do not
        # depend on `fits`) ONCE per dispatch and the ms/body reading is a
        # K-fold under-measurement.  Measured before this guard: fwd 29.7 ms
        # < net_fwd 46.9 ms — the forward was being hoisted out of its own
        # benchmark loop.
        return jax.tree_util.tree_map(
            lambda l: l + acc.astype(l.dtype) * 1e-30
            if jnp.issubdtype(l.dtype, jnp.floating) else l, tree)

    def report(name, ms, sol=None):
        row = {"phase": name, "measured_ms": round(ms, 2)}
        if sol is not None:
            row["conv_dot_sol_ms"] = round(sol, 2)
        rows[name] = row
        print(json.dumps(row), flush=True)

    # ---- net fwd: bare cascade forward, batch stats mutable --------------
    # Mirrors loss_fn's cascade exactly (per-modality inputs, threaded
    # batch_stats, per-stage dropout rngs) so fwd - net_fwd isolates the
    # loss machinery rather than a layout difference.
    stage_rngs = jax.random.split(key, 2)

    def net_fwd(params, batch_stats, img, ir, depth, pm):
        current = [img, ir, depth, pm]
        bs = {"batch_stats": batch_stats}
        out = None
        for stage in range(2):
            net_in = jnp.concatenate(current, axis=-1)
            out, bs = model.apply({"params": params, **bs}, net_in,
                                  train=True, mutable=["batch_stats"],
                                  rngs={"dropout": stage_rngs[stage]})
            current[2] = out.recon["depth"]
        return {"rot": out.rotmat, "b": out.betas, "c": out.cam,
                "r": out.recon["depth"], "bs": bs}

    net_args = (params, batch_stats, data["img"], data["ir_img"],
                data["depth_img"], data["pm_img"])
    guard = lambda a, acc: a[:2] + perturb(a[2:], acc)
    ms = _time_scan(net_fwd, net_args, guard, args.k, args.dispatches)
    sol = _sol_ms(jax.jit(net_fwd).lower(*net_args).as_text())
    report("net_fwd", ms, sol)

    # ---- loss fwd --------------------------------------------------------
    def fwd(params, batch_stats, fits, batch, key):
        total, aux = loss_fn(params, batch_stats, fits, batch, key)
        return {"total": total, "bs": aux[0], "fits": aux[1]}

    guard = lambda a, acc: a[:2] + (a[2] + acc * 1e-30, perturb(a[3], acc)) + a[4:]
    ms = _time_scan(fwd, (params, batch_stats, fits, data, key), guard,
                    args.k, args.dispatches)
    sol = _sol_ms(jax.jit(fwd).lower(params, batch_stats, fits, data, key).as_text())
    report("fwd", ms, sol)

    # ---- fwd + bwd -------------------------------------------------------
    def fwdbwd(params, batch_stats, fits, batch, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (total, (bs, new_fits, _)), grads = grad_fn(params, batch_stats, fits, batch, key)
        return {"total": total, "bs": bs, "fits": new_fits, "g": grads}

    ms = _time_scan(fwdbwd, (params, batch_stats, fits, data, key), guard,
                    args.k, args.dispatches)
    sol = _sol_ms(jax.jit(fwdbwd).lower(params, batch_stats, fits, data, key).as_text())
    report("fwd_bwd", ms, sol)

    # ---- adam alone ------------------------------------------------------
    opt_state = tx.init(params)

    def adam(params, opt_state, grads):
        import optax

        updates, new_opt = tx.update(grads, opt_state, params)
        return {"p": optax.apply_updates(params, updates), "o": new_opt}

    grads = jax.tree_util.tree_map(lambda p: jnp.full_like(p, 1e-8), params)
    # Guard the GRADS (not just params): plain Adam's update ignores params,
    # so a params-only guard leaves the moment updates loop-invariant.
    guard = lambda a, acc: (perturb(a[0], acc), a[1], perturb(a[2], acc))
    ms = _time_scan(adam, (params, opt_state, grads), guard,
                    args.k, args.dispatches)
    report("adam", ms)

    # ---- full step -------------------------------------------------------
    # The output must depend on EVERY updated param and opt-state leaf:
    # returning a single leaf lets XLA dead-code-eliminate the rest of the
    # Adam update AND the weight-gradient convolutions feeding it (measured
    # 19.6 ms — faster than the forward alone — before this reduction).
    def full(state, batch):
        new_state, metrics = step_fn(state, batch)
        touched = sum(
            jnp.sum(l.astype(jnp.float32) * 1e-12)
            for l in jax.tree_util.tree_leaves(
                (new_state.params, new_state.opt_state)))
        return {"loss": metrics["loss"], "fits": new_state.fits,
                "touched": touched}

    guard = lambda a, acc: (a[0]._replace(
        fits=a[0].fits + acc * 1e-30), perturb(a[1], acc))
    ms = _time_scan(full, (state, data), guard, args.k, args.dispatches)
    sol = _sol_ms(jax.jit(full).lower(state, data).as_text())
    report("full_step", ms, sol)

    print(json.dumps({
        "phase": "derived",
        "bwd_ms": round(rows["fwd_bwd"]["measured_ms"] - rows["fwd"]["measured_ms"], 2),
        "loss_machinery_ms": round(rows["fwd"]["measured_ms"] - rows["net_fwd"]["measured_ms"], 2),
        "optimizer_and_state_ms": round(
            rows["full_step"]["measured_ms"] - rows["fwd_bwd"]["measured_ms"], 2),
        "adam_alone_ms": rows["adam"]["measured_ms"],
    }), flush=True)


if __name__ == "__main__":
    main()
