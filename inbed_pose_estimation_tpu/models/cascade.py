"""Cascade-in-graph: the cashmrV2 multi-pass refinement as one XLA program.

The reference orchestrates the cascade *outside* the model with a python
loop of separate CUDA launches (reference: train/trainer.py:503-531,
eval.py:171-178): each iteration re-runs the full network with the depth
input replaced by the previous iteration's reconstructed (uncovered) depth.
Here the loop is unrolled inside one jit graph (num_cas_iters is small and
static), so XLA schedules all ResNet-50 passes back-to-back with no host
round-trips, and the intermediate depth maps never leave HBM.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax.numpy as jnp

from .hmr import HMROutput


def cascade_apply(
    apply_fn: Callable[..., HMROutput],
    inputs: Sequence[jnp.ndarray],
    num_cas_iters: int,
    feed_map: Sequence[tuple] = (("depth", 2),),
    final_recon: bool = True,
) -> List[HMROutput]:
    """Run the depth-feedback cascade.

    Args:
      apply_fn: closure of (modality tuple) -> HMROutput (variables bound).
      inputs: modality tuple; per `feed_map`, each named reconstruction
        replaces its input slot from stage 1 on (cashmrV2: recovered depth
        into slot 2; ir_depth variants: both recovered modalities).
      num_cas_iters: total number of forward passes (reference semantics:
        both trainer and eval run exactly num_cas_iters model calls).
    Returns:
      List of per-stage HMROutputs (last element is the final prediction).
    """
    outs: List[HMROutput] = []
    current = list(inputs)
    n = max(int(num_cas_iters), 1)
    for stage in range(n):
        last = stage == n - 1
        if last and not final_recon:
            out = apply_fn(tuple(current), compute_recon=False)
        else:
            out = apply_fn(tuple(current))
        outs.append(out)
        for name, slot in feed_map:
            if name in out.recon:
                current[slot] = out.recon[name]
    return outs
