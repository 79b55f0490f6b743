"""Bodies-At-Rest CNN regressor (pressure-map specialist baseline).

Re-design of the reference's Bodies_At_Rest reimplementation
(reference: models/hmr.py:2542-2730): a tanh conv stack over the pressure
map (+contact/edge channels), a single 55296->1024 linear, and direct
(non-iterative) pose/shape/cam decoders.  Three modes:
  mode 0 — direct regression from the mod1 stack,
  mode 1 — same but gradient-stopped (the reference wraps in no_grad),
  mode 2 — regression from the mod2 stack (inputs + estimated body-mask map).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..geometry import rot6d_to_rotmat
from .heads import NPOSE, small_xavier
from .hmr import HMROutput

Dtype = Any


class _TanhStack(nn.Module):
    """conv7s2-tanh-drop-maxpool3s2-conv3s2-tanh-drop-conv3-tanh-drop-
    conv3s2-tanh-drop (reference models/hmr.py:2549-2563), VALID paddings
    matching torch's default padding=0."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        drop = lambda h, name: nn.Dropout(0.1, deterministic=not train, name=name)(h)
        h = nn.Conv(192, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    dtype=self.dtype, name="conv0")(x)
        h = jnp.tanh(h)
        h = drop(h, "drop0")
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="VALID")
        h = nn.Conv(192, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype, name="conv1")(h)
        h = jnp.tanh(h)
        h = drop(h, "drop1")
        h = nn.Conv(384, (3, 3), strides=(1, 1), padding="VALID", dtype=self.dtype, name="conv2")(h)
        h = jnp.tanh(h)
        h = drop(h, "drop2")
        h = nn.Conv(384, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype, name="conv3")(h)
        h = jnp.tanh(h)
        h = drop(h, "drop3")
        return h.reshape(h.shape[0], -1)  # [B, 55296] for 224^2 input


class _DirectHead(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        scores = nn.Dense(1024, dtype=self.dtype, name="fc1")(feats)
        pose = nn.Dense(NPOSE, kernel_init=small_xavier(), dtype=self.dtype, name="decpose")(scores)
        shape = nn.Dense(10, kernel_init=small_xavier(), dtype=self.dtype, name="decshape")(scores)
        cam = nn.Dense(3, kernel_init=small_xavier(), dtype=self.dtype, name="deccam")(scores)
        return pose, shape, cam


class BodiesAtRest(nn.Module):
    mean_pose: Tuple[float, ...]
    mean_shape: Tuple[float, ...]
    mean_cam: Tuple[float, ...]
    mod1_input_dim: int = 3
    mod2_input_dim: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, mode: str = "0", train: bool = False) -> HMROutput:
        batch = images.shape[0]
        if mode in ("0", "1"):
            feats = _TanhStack(dtype=self.dtype, name="stack_mode1")(images, train)
            pose, shape, cam = _DirectHead(dtype=self.dtype, name="head_mode1")(feats)
            if mode == "1":
                pose = jax.lax.stop_gradient(pose)
                shape = jax.lax.stop_gradient(shape)
                cam = jax.lax.stop_gradient(cam)
        elif mode == "2":
            feats = _TanhStack(dtype=self.dtype, name="stack_mode2")(images, train)
            pose, shape, cam = _DirectHead(dtype=self.dtype, name="head_mode2")(feats)
        else:
            raise ValueError(f"unknown mode {mode!r}")

        rotmat = rot6d_to_rotmat(pose.astype(jnp.float32)).reshape(batch, 24, 3, 3)
        return HMROutput(
            rotmat=rotmat,
            betas=shape.astype(jnp.float32),
            cam=cam.astype(jnp.float32),
            pose6d=pose.astype(jnp.float32),
            recon={},
        )
