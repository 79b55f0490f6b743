#!/usr/bin/env python
"""Per-op speed-of-light analysis of the flagship inference (or training)
program.

Answers "where does the remaining (1 - MFU) go?" with numbers instead of
hand-waving: lowers the REAL jitted cashmrV2 inference graph, extracts every
`stablehlo.convolution` / `stablehlo.dot_general` with its actual shapes,
and computes for each
  * FLOPs and bf16 bytes moved,
  * an MXU-fill upper bound from the contraction/output-channel dims
    (a 128x128 systolic array multiplies rup(K,128) x rup(N,128) tiles —
    a conv with K = KH*KW*IC contraction and OC outputs cannot exceed
    (K/rup(K,128)) * (OC/rup(OC,128)) utilization),
  * an HBM roofline bound from arithmetic intensity,
  * the resulting speed-of-light time  max(flops / (peak * fill), bytes / bw).

The sum of per-op SOL times is the analytic floor for the whole graph; the
measured marginal per-image cost (PARITY.md MFU section) sits against it.
Shapes are platform-independent, so the analysis runs anywhere (CPU lowering
is fine); peaks default to TPU v5e (197 bf16 TFLOP/s, ~819 GB/s HBM).

Run:  python -m inbed_pose_estimation_tpu.tools.conv_efficiency [--batch 32]
Prints one line per op class (aggregated by shape) + a JSON totals line.

`--train` lowers the FULL compiled train step instead (fwd+bwd cascade +
SMPL + losses + Adam) — everything is abstract (jax.eval_shape / lowering
only), so no device time is spent.  The train floor counts convolutions
and dot_generals only; BN statistics, elementwise loss math and the Adam
update are pure HBM traffic not in the bound, so it is an OPTIMISTIC
floor — useful as a ceiling statement for the measured train MFU, not as
an achievable target.
"""

from __future__ import annotations

import argparse
import json
import re
from collections import defaultdict

PEAK_FLOPS = 197e12  # v5e bf16
HBM_BW = 819e9       # v5e bytes/s


def _rup(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _parse_ops(hlo_text: str):
    """Yield (kind, shapes) for every convolution / dot_general, where
    shapes is the list of tensor<...> dims on the line (operands, result)."""
    for line in hlo_text.splitlines():
        kind = None
        if "stablehlo.convolution" in line:
            kind = "conv"
        elif "stablehlo.dot_general" in line:
            kind = "dot"
        if kind is None:
            continue
        tensors = re.findall(r"tensor<([0-9x]+)x[a-z0-9]+>", line)
        if len(tensors) < 3:
            continue
        dims = [tuple(int(d) for d in t.split("x")) for t in tensors]
        yield kind, dims


def analyze(batch: int = 32, res: int = 224, num_cas: int = 2,
            peak: float = PEAK_FLOPS, bw: float = HBM_BW):
    import jax
    import jax.numpy as jnp

    from ..evaluation.evaluate import load_j_regressor_h36m
    from ..evaluation.pipeline import make_inference_fn
    from ..models import build_model
    from ..smpl import synthetic_smpl_model

    model, spec = build_model("cashmrV2", dtype=jnp.bfloat16)
    smpl_model = synthetic_smpl_model(seed=0)
    inputs = tuple(
        jnp.zeros((batch, res, res, {"img": 3}.get(m, 1)), jnp.float32)
        for m in spec.modalities
    )
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, res, res, 6), jnp.float32)))
    fn = make_inference_fn(
        model, spec, smpl_model,
        j_regressor_h36m=load_j_regressor_h36m(
            num_vertices=smpl_model.v_template.shape[0]),
        num_cas_iters=num_cas, final_recon=False,
    )
    txt = jax.jit(fn).lower(variables, inputs).as_text()
    return _analyze_hlo(txt, peak, bw)


def _prod(t):
    p = 1
    for d in t:
        p *= d
    return p


def _analyze_hlo(txt: str, peak: float = PEAK_FLOPS, bw: float = HBM_BW):
    """Shared per-op aggregation over a lowered StableHLO text."""
    groups = defaultdict(lambda: {"count": 0, "flops": 0.0, "bytes": 0.0,
                                  "fill": 1.0, "sol_s": 0.0})
    for kind, dims in _parse_ops(txt):
        *operands, out = dims
        if kind == "conv":
            x, w = operands[0], operands[1]
            kh, kw, ic, oc = w
            n = out[0]
            spatial = 1
            for d in out[1:-1]:
                spatial *= d
            k_dim = kh * kw * ic
            flops = 2.0 * n * spatial * oc * k_dim
            label = f"conv {kh}x{kw} {ic}->{oc} @{out[1]}x{out[2] if len(out) > 3 else 1}"
        else:
            a, b = operands[0], operands[1]
            k_dim = a[-1]
            oc = out[-1]
            rows = 1
            for d in out[:-1]:
                rows = rows * d
            flops = 2.0 * rows * oc * k_dim
            n, spatial = rows, 1
            label = f"dot {k_dim}->{oc} rows={rows}"
        bytes_moved = 2.0 * (sum(_prod(o) for o in operands) + _prod(out))
        fill = (k_dim / _rup(k_dim, 128)) * (oc / _rup(oc, 128))
        rows_total = n * spatial
        fill *= min(1.0, rows_total / 8.0)
        sol = max(flops / (peak * fill), bytes_moved / bw)
        g = groups[label]
        g["count"] += 1
        g["flops"] += flops
        g["bytes"] += bytes_moved
        g["fill"] = fill
        g["sol_s"] += sol
    return groups


def analyze_train(batch: int = 32, res: int = 224, num_cas: int = 2,
                  peak: float = PEAK_FLOPS, bw: float = HBM_BW):
    """Speed-of-light bound for the FULL train step's convs/dots (fwd + bwd
    + weight-gradient convolutions), lowered fully abstractly."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ..fitting import synthetic_gmm_prior
    from ..models import build_model
    from ..smpl import synthetic_smpl_model
    from ..train.trainer import TrainState, make_train_step

    class Opt:
        img_res = res
        lr = 5e-5
        run_smplify = False
        num_cas_iters = num_cas
        num_smplify_iters = 100
        smplify_threshold = 100.0
        shape_loss_weight = 0.0
        keypoint_loss_weight = 5.0
        beta_loss_weight = 0.001
        openpose_train_weight = 0.0
        gt_train_weight = 1.0
        remat = False

    model, spec = build_model("cashmrV2", dtype=jnp.bfloat16)
    smpl = synthetic_smpl_model(seed=0)
    prior = synthetic_gmm_prior()
    step_fn, tx = make_train_step(model, spec, smpl, prior, Opt())

    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, res, res, 6), jnp.float32)))
    params = variables["params"]
    opt_state = jax.eval_shape(tx.init, params)
    sds = jax.ShapeDtypeStruct
    B = batch
    state = TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=opt_state,
        fits=sds((max(B, 64), 82), jnp.float32),
        rng=jax.eval_shape(lambda: jax.random.PRNGKey(1)),
        step=sds((), jnp.int32),
    )
    batch_abs = {
        "img": sds((B, res, res, 3), jnp.float32),
        "ir_img": sds((B, res, res, 1), jnp.float32),
        "depth_img": sds((B, res, res, 1), jnp.float32),
        "pm_img": sds((B, res, res, 1), jnp.float32),
        "depth_img_uncover": sds((B, res, res, 1), jnp.float32),
        "keypoints": sds((B, 49, 3), jnp.float32),
        "pose": sds((B, 72), jnp.float32),
        "betas": sds((B, 10), jnp.float32),
        "pose_3d": sds((B, 24, 4), jnp.float32),
        "has_smpl": sds((B,), jnp.float32),
        "has_pose_3d": sds((B,), jnp.float32),
        "is_flipped": sds((B,), jnp.float32),
        "rot_angle": sds((B,), jnp.float32),
        "sample_index": sds((B,), jnp.int32),
    }
    txt = jax.jit(step_fn).lower(state, batch_abs).as_text()
    return _analyze_hlo(txt, peak, bw)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--num_cas_iters", type=int, default=2)
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--train", action="store_true",
                    help="bound the FULL train step (fwd+bwd+Adam) instead "
                         "of inference — abstract lowering, no device time")
    args = ap.parse_args()

    analyze_fn = analyze_train if args.train else analyze
    groups = analyze_fn(args.batch, args.res, args.num_cas_iters)
    rows = sorted(groups.items(), key=lambda kv: -kv[1]["sol_s"])
    print(f"{'op (xN)':<44} {'GFLOP':>9} {'MB':>8} {'MXU fill':>9} {'SOL ms':>8}")
    for label, g in rows[: args.top]:
        print(f"{label + ' x' + str(g['count']):<44} {g['flops'] / 1e9:>9.1f} "
              f"{g['bytes'] / 1e6:>8.1f} {g['fill']:>9.2f} {g['sol_s'] * 1e3:>8.2f}")
    total_flops = sum(g["flops"] for g in groups.values())
    total_sol = sum(g["sol_s"] for g in groups.values())
    mxu_weighted = total_flops / PEAK_FLOPS / total_sol if total_sol else 0.0
    print(json.dumps({
        "what": "train step" if args.train else "inference",
        "batch": args.batch,
        "total_gflops": round(total_flops / 1e9, 1),
        "sol_ms": round(total_sol * 1e3, 2),
        "sol_images_per_sec": round(args.batch / total_sol, 1) if total_sol else None,
        "shape_bound_mfu": round(mxu_weighted, 4),
    }))


if __name__ == "__main__":
    main()
