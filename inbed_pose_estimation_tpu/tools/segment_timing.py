#!/usr/bin/env python
"""Per-segment on-chip timing vs speed-of-light for the flagship inference.

The round-4 gap statement — measured 28.2 ms steady at batch 32 vs the
16.3 ms per-op speed-of-light floor (tools/conv_efficiency.py) — named the
HBM-bound decoder convs as culprits but never LOCALIZED the gap with a
measurement.  This tool does: it times each pipeline segment as its own
device-side `lax.scan` loop (K bodies per dispatch, hoisting-guarded, one
fetch — the dispatch_gap.py machinery, so host/tunnel costs are amortized
out) and compares each segment's measured time against ITS OWN analytic
speed-of-light (conv_efficiency._analyze_hlo on the segment's lowered HLO).

Segments (batch 32, 224^2, cashmrV2 inference = 2 cascade passes):
  * trunk    — one ResNet-50 forward over the 6-ch concat (runs 2x in full)
  * decoder  — one Reconstruct pass over the skip pyramid (runs 1x: the
               final cascade stage skips it, final_recon=False)
  * head     — one IEFHead (3 IEF iterations) on pooled features (runs 2x)
  * smpl     — SMPL LBS + 17-joint regression einsum (runs 1x)
  * full     — the whole inference program, same loop machinery

sum(measured segments, weighted by multiplicity) vs full shows how much
XLA's whole-graph schedule gains/loses vs the parts; measured-vs-SOL per
segment shows WHERE the 28-vs-16 ms lives.

Usage: python -m inbed_pose_estimation_tpu.tools.segment_timing
       [--batch 32] [--k 8] [--dispatches 6] [--dec_stages]
Prints one JSON line per segment.  --dec_stages instead drills into the
decoder: each level (dec1..dec4, the final reduce+ResBlock x2 trunk,
final_up, proj) timed as its own sound-guarded device loop vs its own
SOL, so the decoder's measured-vs-floor gap is attributed per stage.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _time_scan(fn, args_tuple, guard_leaf, k, dispatches, warm=2):
    """On-chip ms/body of `fn(*args_tuple)` via a K-deep lax.scan.

    guard_leaf: callable (args_tuple, acc) -> args_tuple with a carry-
    dependent perturbation on one input so XLA cannot hoist the body.
    fn must return a dict/array; we reduce everything to a scalar so no
    stage is dead-code-eliminated.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    def reduce_all(out):
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    def k_loop(args_tuple, acc):
        def body(acc, _):
            a = guard_leaf(args_tuple, acc)
            return acc + reduce_all(fn(*a)), None

        acc, _ = lax.scan(body, acc, None, length=k)
        return acc

    kj = jax.jit(k_loop, donate_argnums=(1,))

    def one_pass(n):
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(n):
            acc = kj(args_tuple, acc)
        total = float(acc)
        assert np.isfinite(total), "segment produced non-finite output"
        return (time.perf_counter() - t0) / (n * k) * 1e3  # ms per body

    one_pass(warm)
    one_pass(max(2, dispatches // 2))
    return min(one_pass(dispatches) for _ in range(3))


def _sol_ms(jitted_lowered_text):
    from .conv_efficiency import _analyze_hlo

    groups = _analyze_hlo(jitted_lowered_text)
    return sum(g["sol_s"] for g in groups.values()) * 1e3


def _dec_stages(args):
    """Per-decoder-level drill-down (see module docstring)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from ..models.decoder import (ResBlock, SmallOCConv3x3, Split1x1,
                                  Upsampler, _DecStage)

    B, K = args.batch, args.k
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    class _FinalTrunk(nn.Module):
        """final_reduce (split 1x1 [64|128]->128) + ResBlock x2 at 112^2."""

        @nn.compact
        def __call__(self, x, skip=None, train: bool = False):
            h = Split1x1(128, dt, name="final_reduce")(x, skip)
            h = ResBlock(128, dt, name="final_res0")(h, train)
            return ResBlock(128, dt, name="final_res1")(h, train)

    s = args.res // 32  # 7 at 224^2
    # (x_shape, skip_shape): skips are fused into each level's 1x1 reduce
    # (Split1x1) instead of a materialized concat.
    stages = [
        ("dec1", _DecStage(1024, dt), (B, s, s, 2048), None),
        ("dec2", _DecStage(512, dt), (B, 2 * s, 2 * s, 1024),
         (B, 2 * s, 2 * s, 1024)),
        ("dec3", _DecStage(256, dt), (B, 4 * s, 4 * s, 512),
         (B, 4 * s, 4 * s, 512)),
        ("dec4", _DecStage(128, dt), (B, 8 * s, 8 * s, 256),
         (B, 8 * s, 8 * s, 256)),
        ("final_trunk", _FinalTrunk(), (B, 16 * s, 16 * s, 128),
         (B, 16 * s, 16 * s, 64)),
        ("final_up", Upsampler(128, dt), (B, 16 * s, 16 * s, 128), None),
        ("proj", SmallOCConv3x3(1, dt), (B, 32 * s, 32 * s, 128), None),
    ]
    total_ms, total_sol = 0.0, 0.0
    for name, mod, shape, skip_shape in stages:
        x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32), dtype=dt)
        has_skip = skip_shape is not None
        if has_skip:
            sk = jnp.asarray(rng.normal(0, 1, skip_shape).astype(np.float32),
                             dtype=dt)
            v = mod.init(jax.random.PRNGKey(0), x[:2], skip=sk[:2])

            def fn(v, x, sk, _mod=mod):
                return _mod.apply(v, x, skip=sk)

            guard = lambda a, acc: (a[0], a[1] + acc.astype(dt) * 1e-30,
                                    a[2] + acc.astype(dt) * 1e-30)
            ms = _time_scan(fn, (v, x, sk), guard, K, args.dispatches)
            sol = _sol_ms(jax.jit(fn).lower(v, x, sk).as_text())
        else:
            v = mod.init(jax.random.PRNGKey(0), x[:2])

            def fn(v, x, _mod=mod):
                return _mod.apply(v, x)

            guard = lambda a, acc: (a[0], a[1] + acc.astype(dt) * 1e-30)
            ms = _time_scan(fn, (v, x), guard, K, args.dispatches)
            sol = _sol_ms(jax.jit(fn).lower(v, x).as_text())
        total_ms += ms
        total_sol += sol
        print(json.dumps({
            "stage": name, "in_shape": list(shape),
            "measured_ms": round(ms, 2), "sol_ms": round(sol, 2),
            "sol_fraction": round(sol / ms, 3) if ms else None,
        }), flush=True)
    print(json.dumps({
        "stage": "sum_of_stages", "measured_ms": round(total_ms, 2),
        "sol_ms": round(total_sol, 2),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--dispatches", type=int, default=6)
    ap.add_argument("--dec_stages", action="store_true",
                    help="per-decoder-level drill-down instead of the "
                         "segment table")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if args.dec_stages:
        _dec_stages(args)
        return

    from ..evaluation.evaluate import load_j_regressor_h36m
    from ..evaluation.pipeline import make_inference_fn
    from ..models import build_model
    from ..models.backbone import ResNet50Trunk
    from ..models.decoder import Reconstruct
    from ..models.heads import IEFHead
    from ..smpl import synthetic_smpl_model
    from ..smpl.model import smpl_forward

    B, RES, K = args.batch, args.res, args.k
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    results = {}

    def report(name, measured_ms, sol_ms, mult):
        row = {
            "segment": name,
            "multiplicity_in_full": mult,
            "measured_ms": round(measured_ms, 2),
            "sol_ms": round(sol_ms, 2),
            "sol_fraction": round(sol_ms / measured_ms, 3) if measured_ms else None,
        }
        results[name] = row
        print(json.dumps(row), flush=True)

    # ---- trunk ---------------------------------------------------------
    trunk = ResNet50Trunk(dtype=dt)
    x6 = jnp.asarray(rng.normal(0, 1, (B, RES, RES, 6)).astype(np.float32))
    tvars = trunk.init(jax.random.PRNGKey(0), x6[:2])

    def trunk_fn(v, x):
        return trunk.apply(v, x)

    guard = lambda a, acc: (a[0], a[1] + acc * 1e-30)
    tm = _time_scan(trunk_fn, (tvars, x6), guard, K, args.dispatches)
    sol = _sol_ms(jax.jit(trunk_fn).lower(tvars, x6).as_text())
    report("trunk", tm, sol, 2)

    # ---- decoder -------------------------------------------------------
    dec = Reconstruct(dtype=dt)
    r = RES // 2
    pyr = tuple(
        jnp.asarray(rng.normal(0, 1, (B, r // (2 ** i), r // (2 ** i), c)).astype(np.float32),
                    dtype=dt)
        for i, c in enumerate((64, 256, 512, 1024, 2048))
    )
    dvars = dec.init(jax.random.PRNGKey(0), *tuple(p[:2] for p in pyr))

    def dec_fn(v, *p):
        return dec.apply(v, *p)

    # Perturb EVERY pyramid level: the decoder's deep stages depend only on
    # the deeper skips, so a shallowest-level-only guard leaves them
    # loop-invariant and hoistable out of the scan.
    guard = lambda a, acc: (a[0],) + tuple(
        p + acc.astype(dt) * 1e-30 for p in a[1:])
    dm = _time_scan(dec_fn, (dvars,) + pyr, guard, K, args.dispatches)
    sol = _sol_ms(jax.jit(dec_fn).lower(dvars, *pyr).as_text())
    report("decoder", dm, sol, 1)

    # ---- head (IEF x3) -------------------------------------------------
    head = IEFHead(dtype=dt)
    xf = jnp.asarray(rng.normal(0, 1, (B, 2048)).astype(np.float32), dtype=dt)
    ip = jnp.zeros((B, 144), dt)
    ish = jnp.zeros((B, 10), dt)
    ic = jnp.zeros((B, 3), dt)
    hvars = head.init(jax.random.PRNGKey(0), xf[:2], ip[:2], ish[:2], ic[:2])

    def head_fn(v, f, p, s, c):
        return head.apply(v, f, p, s, c)

    guard = lambda a, acc: (a[0],) + tuple(
        x + acc.astype(dt) * 1e-30 for x in a[1:])
    hm = _time_scan(head_fn, (hvars, xf, ip, ish, ic), guard, K, args.dispatches)
    sol = _sol_ms(jax.jit(head_fn).lower(hvars, xf, ip, ish, ic).as_text())
    report("head", hm, sol, 2)

    # ---- smpl (LBS + 17-joint regression) ------------------------------
    smpl = synthetic_smpl_model(seed=0)
    jreg = load_j_regressor_h36m(num_vertices=smpl.v_template.shape[0])
    rotmat = jnp.tile(jnp.eye(3)[None, None], (B, 24, 1, 1))
    betas = jnp.asarray(rng.normal(0, 0.3, (B, 10)).astype(np.float32))

    def smpl_fn(rm, bt):
        out = smpl_forward(smpl, bt, rot_mats=rm)
        k17 = jnp.einsum("jv,bvc->bjc", jreg, out.vertices)
        return {"v": out.vertices, "k17": k17}

    guard = lambda a, acc: (a[0] + acc * 1e-30, a[1] + acc * 1e-30)
    sm = _time_scan(smpl_fn, (rotmat, betas), guard, K, args.dispatches)
    sol = _sol_ms(jax.jit(smpl_fn).lower(rotmat, betas).as_text())
    report("smpl", sm, sol, 1)

    # ---- full ----------------------------------------------------------
    model, spec = build_model("cashmrV2", dtype=dt)
    inputs = tuple(
        jnp.asarray(rng.normal(0, 1, (B, RES, RES, {"img": 3}.get(m, 1))).astype(np.float32))
        for m in spec.modalities
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.concatenate(inputs, axis=-1))
    core = make_inference_fn(
        model, spec, smpl, j_regressor_h36m=jreg, num_cas_iters=2, final_recon=False,
    )

    def full_fn(v, ins):
        out = core(v, ins)
        return {"cam": out["cam"], "k17": out["keypoints_3d_17"]}

    guard = lambda a, acc: (a[0], tuple(x + acc * 1e-30 for x in a[1]))
    fm = _time_scan(full_fn, (variables, inputs), guard, K, args.dispatches)
    sol = _sol_ms(jax.jit(full_fn).lower(variables, inputs).as_text())
    report("full", fm, sol, 1)

    weighted = sum(r["measured_ms"] * r["multiplicity_in_full"]
                   for n, r in results.items() if n != "full")
    print(json.dumps({
        "segment": "sum_of_parts",
        "measured_ms": round(weighted, 2),
        "full_ms": results["full"]["measured_ms"],
        "unattributed_ms": round(results["full"]["measured_ms"] - weighted, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
