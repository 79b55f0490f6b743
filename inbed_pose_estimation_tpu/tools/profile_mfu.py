#!/usr/bin/env python
"""Chip-efficiency profiler: MFU estimate + batch-size sweep for the
flagship inference and train-step programs.

The profiling subsystem exists (utils/profiling.py) — this driver uses it to
answer "how close to the hardware ceiling is the flagship graph?" honestly:
  * FLOPs come from XLA's own cost model (compiled.cost_analysis()), with a
    closed-form fallback for platforms whose PJRT plugin doesn't expose it;
  * time comes from per-iteration host fetches (on the axon remote platform
    block_until_ready on one buffer does NOT imply earlier dispatches
    finished — see bench.py);
  * MFU = achieved FLOP/s over the chip's bf16 peak.

Run:  python -m inbed_pose_estimation_tpu.tools.profile_mfu [--train]
      [--batches 32,64,128,256] [--trace_dir DIR]
`--train` profiles the FULL compiled training step (cascade fwd+bwd + Adam +
fits scatter) instead of inference.  Writes one JSON line per configuration;
summarized into PARITY.md's MFU table.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

# bf16 peak matmul throughput per chip, by platform guess.
PEAK_FLOPS = {
    "tpu v5e": 197e12,
    "tpu v5 lite": 197e12,
    "tpu v4": 275e12,
    "tpu v6e": 918e12,
    "cpu": 1e11,  # nominal, so MFU stays defined in CPU smoke runs
}


def guess_peak() -> float:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, val in PEAK_FLOPS.items():
        if key.replace("tpu ", "") in kind or key == kind:
            return val
    return 197e12


def _flops_from_cost_analysis(compiled) -> float | None:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def _analytic_inference_flops(batch: int, res: int, num_cas: int) -> float:
    """Closed-form fallback: ResNet-50 fwd ~= 4.1 GFLOP per 224^2 3ch image
    (scales with res^2); the 6ch stem adds ~2%; decoder ~= 3.4 GFLOP; LBS
    ~= 2 * 6890 * (4*10 + 24*12) GFLOP-ish (negligible)."""
    scale = (res / 224.0) ** 2
    per_image = (4.1e9 + 3.4e9) * scale
    stages = num_cas  # decoder lazily skipped on the last stage, keep as upper bound
    return batch * per_image * stages


def profile_inference(batch: int, res: int = 224, num_cas: int = 2, iters: int = 20):
    import jax
    import jax.numpy as jnp

    from ..evaluation.evaluate import load_j_regressor_h36m
    from ..evaluation.pipeline import make_inference_fn
    from ..models import build_model
    from ..smpl import synthetic_smpl_model

    model, spec = build_model("cashmrV2", dtype=jnp.bfloat16)
    smpl_model = synthetic_smpl_model(seed=0)
    rng = np.random.default_rng(0)
    inputs = tuple(
        jnp.asarray(rng.normal(0, 1, (batch, res, res, {"img": 3}.get(m, 1))).astype(np.float32))
        for m in spec.modalities
    )
    # init at batch 2: params are batch-independent, and EAGER init at the
    # full sweep batch (256) resource-exhausts the chip before the jitted
    # (memory-scheduled) program ever runs.
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, res, res, sum({"img": 3}.get(m, 1) for m in spec.modalities)),
                  jnp.float32),
    )
    fn = make_inference_fn(
        model, spec, smpl_model,
        j_regressor_h36m=load_j_regressor_h36m(num_vertices=smpl_model.v_template.shape[0]),
        num_cas_iters=num_cas, final_recon=False,
    )
    # One AOT compile, used for BOTH the cost analysis and the timing
    # loop — calling the jitted wrapper after .lower().compile() would
    # trace+compile the same program a second time (cold sweeps paid every
    # multi-minute compile twice).
    compiled = jax.jit(fn).lower(variables, inputs).compile()
    flops = _flops_from_cost_analysis(compiled)
    flops_src = "xla_cost_analysis"
    if flops is None:
        flops = _analytic_inference_flops(batch, res, num_cas)
        flops_src = "analytic"

    out = compiled(variables, inputs)
    float(jnp.sum(out["cam"]))
    acc, pending = 0.0, None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(variables, inputs)
        if pending is not None:
            acc += float(jnp.sum(pending))
        pending = out["cam"]
    acc += float(jnp.sum(pending))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(acc)

    peak = guess_peak()
    return {
        "what": "cashmrV2 inference",
        "batch": batch,
        "res": res,
        "step_ms": round(dt * 1000, 2),
        "images_per_sec": round(batch / dt, 1),
        "gflops_per_step": round(flops / 1e9, 1),
        "flops_source": flops_src,
        "achieved_tflops": round(flops / dt / 1e12, 2),
        "mfu": round(flops / dt / peak, 4),
        "device": __import__("jax").devices()[0].device_kind,
    }


def profile_train(batch: int, res: int = 224, num_cas: int = 2, iters: int = 10,
                  run_smplify: bool = False, remat=False,
                  dtype: str = "bfloat16"):
    """MFU of the full compiled training step (fwd+bwd cascade, SMPL LBS,
    camera LSQ, losses, Adam, fits scatter) — FLOPs from XLA's cost model on
    the lowered step program."""
    import jax
    import jax.numpy as jnp
    import optax  # noqa: F401  (train step construction pulls it in)

    from ..fitting import synthetic_gmm_prior
    from ..models import build_model
    from ..smpl import synthetic_smpl_model
    from ..train.trainer import TrainState, make_train_step

    class Opt:
        img_res = res
        lr = 5e-5
        num_cas_iters = num_cas
        num_smplify_iters = 100
        smplify_threshold = 100.0
        shape_loss_weight = 0.0
        keypoint_loss_weight = 5.0
        beta_loss_weight = 0.001
        openpose_train_weight = 0.0
        gt_train_weight = 1.0

    Opt.run_smplify = run_smplify
    # remat in (True, "stage"): jax.checkpoint on whole cascade stages —
    # fwd+bwd at 224^2 batch >= 128 holds the full decoder activation
    # pyramid otherwise (OOMs on 16G HBM).  remat == "decoder": checkpoint
    # only the reconstruction decoders (handled inside the model).
    Opt.remat = remat
    model, spec = build_model(
        "cashmrV2", dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
        remat_decoder=(remat == "decoder"),
    )
    smpl = synthetic_smpl_model(seed=0)
    prior = synthetic_gmm_prior()
    step_fn, tx = make_train_step(model, spec, smpl, prior, Opt())

    rng = np.random.default_rng(0)
    B = batch
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
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        fits=jnp.zeros((max(B, 64), 82)),
        rng=jax.random.PRNGKey(1),
        step=jnp.zeros((), jnp.int32),
    )

    # no donation (we re-feed the same state); single AOT compile serves
    # cost analysis AND the timing loop (see profile_inference).
    compiled = jax.jit(step_fn).lower(state, data).compile()
    flops = _flops_from_cost_analysis(compiled)
    flops_src = "xla_cost_analysis"
    if flops is None:
        # fwd ~= inference flops, bwd ~= 2x fwd.
        flops = 3.0 * _analytic_inference_flops(B, res, num_cas)
        flops_src = "analytic"

    new_state, metrics = compiled(state, data)
    float(metrics["loss"])  # warmup + force completion
    # One-deep pipelined fetch: dispatch step i, then fetch step i-1's loss
    # while i computes — the real trainer's protocol (StepTimer windows +
    # deferred metric fetches), and bench.py's.  A serial per-iter fetch
    # adds a full host<->device round trip to every step (+~31 ms on this
    # tunneled host, measured by tools/latency_mode.py), which mis-charges
    # tunnel RTT to the chip.  The data-dependent sync is preserved: the
    # fetched loss from step i-1 forces that step's completion.
    prev = None
    t0 = time.perf_counter()
    for _ in range(iters):
        new_state, metrics = compiled(state, data)
        if prev is not None:
            _ = float(prev)
        prev = metrics["loss"]
    _ = float(prev)
    dt = (time.perf_counter() - t0) / iters

    peak = guess_peak()
    return {
        "what": ("cashmrV2 train step" + (" +smplify" if run_smplify else "")
                 + (f" +remat:{'stage' if remat is True else remat}" if remat else "")
                 + f" {dtype}"),
        "batch": B,
        "res": res,
        "step_ms": round(dt * 1000, 2),
        "images_per_sec": round(B / dt, 1),
        "gflops_per_step": round(flops / 1e9, 1),
        "flops_source": flops_src,
        "achieved_tflops": round(flops / dt / 1e12, 2),
        "mfu": round(flops / dt / peak, 4),
        "device": __import__("jax").devices()[0].device_kind,
    }


def capture_trace(logdir: str, batch: int = 32, res: int = 224):
    """xprof trace of a few inference steps (view with tensorboard)."""
    import jax

    from ..utils.profiling import trace

    with trace(logdir):
        profile_inference(batch, res, iters=3)
    return logdir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,64,128,256")
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--train", action="store_true",
                    help="profile the full training step instead of inference")
    ap.add_argument("--num_cas_iters", type=int, default=2)
    ap.add_argument("--run_smplify", action="store_true")
    ap.add_argument("--remat", nargs="?", const="stage", default=False,
                    choices=["stage", "decoder"],
                    help="bare --remat: jax.checkpoint whole cascade stages "
                         "(needed to fit train batches >= 128 in HBM); "
                         "'--remat decoder': checkpoint only the recon "
                         "decoders (cheaper recompute, fits batch 64)")
    ap.add_argument("--trace_dir", default=None,
                    help="Also capture a jax.profiler trace here")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"],
                    help="Train-step compute dtype (params stay f32); "
                         "inference is always profiled in bf16")
    args = ap.parse_args()

    # Persistent compilation cache — without it a cold 4-point batch sweep
    # spends >9 min compiling before the first output line.
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()

    for b in [int(x) for x in args.batches.split(",")]:
        if args.train:
            print(json.dumps(profile_train(
                b, args.res, num_cas=args.num_cas_iters,
                iters=max(3, args.iters // 2), run_smplify=args.run_smplify,
                remat=args.remat, dtype=args.dtype)),
                flush=True)
        else:
            print(json.dumps(profile_inference(
                b, args.res, num_cas=args.num_cas_iters, iters=args.iters)),
                flush=True)
    if args.trace_dir:
        capture_trace(args.trace_dir, res=args.res)
        print(json.dumps({"trace": args.trace_dir}))


if __name__ == "__main__":
    main()
