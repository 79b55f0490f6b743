"""Iterative-error-feedback SMPL regression head.

Re-design of the IEF loop shared by every reference model
(reference: models/hmr.py:156-165,225-238): a 2048k-d pooled feature is
concatenated with the current (pose6d, betas, cam) estimate and refined
additively for n_iter steps through fc1 -> drop -> fc2 -> drop -> three
decoders.  The loop is unrolled (n_iter=3 is static) so XLA fuses all three
refinement matmuls into one program.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

NPOSE = 24 * 6
Dtype = Any


def small_xavier(gain: float = 0.01):
    """Xavier-uniform scaled by `gain`, matching
    nn.init.xavier_uniform_(w, gain=0.01) on the decoder layers
    (models/hmr.py:163-165)."""

    base = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")

    def init(key, shape, dtype):
        return base(key, shape, dtype) * gain

    return init


class IEFHead(nn.Module):
    """Iterative error feedback regressor.

    Call with the pooled feature xf [B, 2048*k] and the initial estimates;
    returns (pose6d [B,144], betas [B,10], cam [B,3]).
    """

    feat_dim: int = 2048
    n_iter: int = 3
    dropout_rate: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xf, init_pose, init_shape, init_cam, train: bool = False):
        fc1 = nn.Dense(1024, dtype=self.dtype, name="fc1")
        fc2 = nn.Dense(1024, dtype=self.dtype, name="fc2")
        decpose = nn.Dense(NPOSE, kernel_init=small_xavier(), dtype=self.dtype, name="decpose")
        decshape = nn.Dense(10, kernel_init=small_xavier(), dtype=self.dtype, name="decshape")
        deccam = nn.Dense(3, kernel_init=small_xavier(), dtype=self.dtype, name="deccam")
        drop1 = nn.Dropout(self.dropout_rate, deterministic=not train, name="drop1")
        drop2 = nn.Dropout(self.dropout_rate, deterministic=not train, name="drop2")

        pred_pose, pred_shape, pred_cam = init_pose, init_shape, init_cam
        for _ in range(self.n_iter):
            xc = jnp.concatenate([xf, pred_pose, pred_shape, pred_cam], axis=1)
            xc = fc1(xc)
            xc = drop1(xc)
            xc = fc2(xc)
            xc = drop2(xc)
            pred_pose = decpose(xc) + pred_pose
            pred_shape = decshape(xc) + pred_shape
            pred_cam = deccam(xc) + pred_cam
        return pred_pose, pred_shape, pred_cam
