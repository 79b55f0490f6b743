"""Dispatch-gap attribution experiment (PARITY.md MFU section).

Question: bench.py's host-driven pipelined loop sustains ~1093 img/s at
batch 32, while the batch-sweep fit suggested a 1314 img/s "marginal rate"
(0.761 ms/image slope).  Is the ~17% residual host/tunnel dispatch
overhead, or is it on-chip?

Method: run K cascade batches per dispatch with a device-side `lax.scan`
loop, amortizing ALL host/tunnel per-dispatch costs by K.  If the gap were
dispatch-bound, throughput would jump toward the fitted rate; if it is
chip-bound, it stays put.

Hoisting guard: the scan body's input gets a carry-dependent perturbation
(`x0 + acc * 1e-30`, far below f32 ulp of the data) so XLA cannot hoist the
loop-invariant cascade out of the loop and run it once.

Measured (v5e via tunnel, 2026-08-17): K=8 -> 1136 img/s steady
(28.2 ms/batch) vs 1093 host-driven — only +4% with dispatch amortized 8x.
Conclusion: the chip's true steady batch-32 rate is ~28 ms/batch; the
batch-sweep "marginal" slope mixed batch-efficiency (bigger batches are
more HBM/fusion-efficient per image) into what looked like fixed overhead.
The host-driven pipeline already runs at 96% of the chip's ceiling; the
remaining 28.2-vs-16.3 ms gap to the analytic speed-of-light floor is
on-chip (HBM-bound decoder convs + fusion scheduling at batch 32 —
tools/conv_efficiency.py), not dispatch.

Usage: python -m inbed_pose_estimation_tpu.tools.dispatch_gap [--k 8]
       [--batch 32] [--dispatches 8]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8, help="scan depth per dispatch")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--dispatches", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from ..evaluation.evaluate import load_j_regressor_h36m
    from ..evaluation.pipeline import make_inference_fn
    from ..models import build_model
    from ..smpl import synthetic_smpl_model

    B, RES, K = args.batch, args.res, args.k
    model, spec = build_model("cashmrV2", dtype=jnp.bfloat16)
    smpl = synthetic_smpl_model(seed=0)
    rng = np.random.default_rng(0)
    inputs = tuple(
        jnp.asarray(rng.normal(0, 1, (B, RES, RES, {"img": 3}.get(m, 1))).astype(np.float32))
        for m in spec.modalities
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.concatenate(inputs, axis=-1))
    core = make_inference_fn(
        model, spec, smpl,
        j_regressor_h36m=load_j_regressor_h36m(num_vertices=smpl.v_template.shape[0]),
        num_cas_iters=2, final_recon=False,
    )

    def k_loop(variables, inputs, acc):
        def body(acc, _):
            x0 = inputs[0] + acc * 1e-30  # hoisting guard (see module doc)
            out = core(variables, (x0,) + inputs[1:])
            # Sum a value that depends on every stage (see bench.py:
            # cam alone lets XLA prune LBS + the joint-regression einsum).
            return acc + jnp.sum(out["cam"]) + jnp.sum(out["keypoints_3d_17"]), None

        acc, _ = lax.scan(body, acc, None, length=K)
        return acc

    kj = jax.jit(k_loop, donate_argnums=(2,))

    def pass_k(n_dispatch):
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(n_dispatch):
            acc = kj(variables, inputs, acc)
        total = float(acc)
        assert np.isfinite(total)
        return B * K * n_dispatch / (time.perf_counter() - t0)

    pass_k(3)  # warm: compile + dispatch-path warmup
    pass_k(5)
    for _ in range(3):
        print(f"K={K} batch={B} device-side scan loop: "
              f"{pass_k(args.dispatches):.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
