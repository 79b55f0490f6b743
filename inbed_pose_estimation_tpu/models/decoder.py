"""U-Net-style image reconstruction decoder (depth/IR/PM recovery heads).

TPU-native re-design of the reference decoder stack
(reference: models/hmr.py:50-135 — ResBlock, PixelShuffle Upsampler, and the
5-stage Reconstruct module that consumes the ResNet skip pyramid and emits a
full-resolution 1-channel image).  NHWC; PixelShuffle is a reshape/transpose
(free on TPU — fused into the surrounding convs by XLA).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .backbone import batch_norm

Dtype = Any


def pixel_shuffle(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """NHWC depth-to-space matching torch.nn.PixelShuffle channel ordering:
    channel index c*r*r + s1*r + s2 maps to (h*r+s1, w*r+s2, c)."""
    b, h, w, c = x.shape
    oc = c // (r * r)
    x = x.reshape(b, h, w, oc, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, r1, w, r2, oc
    return x.reshape(b, h * r, w * r, oc)


class ResBlock(nn.Module):
    """conv3-BN-ReLU-conv3-BN with identity residual (models/hmr.py:50-72)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return batch_norm(train, self.dtype, name)

        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv0")(x)
        h = bn("bn0")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv1")(h)
        h = bn("bn1")(h)
        return h + x


class Upsampler(nn.Module):
    """conv3 (n -> 4n) + PixelShuffle(2) + BN (models/hmr.py:74-91, scale=2)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(4 * self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        h = pixel_shuffle(h, 2)
        h = batch_norm(train, self.dtype, "bn")(h)
        return h


class _DecStage(nn.Module):
    """1x1 channel-reduce + ResBlock + Upsampler — one decoder level."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="reduce")(x)
        h = ResBlock(self.features, self.dtype, name="res")(h, train)
        h = Upsampler(self.features, self.dtype, name="up")(h, train)
        return h


class Reconstruct(nn.Module):
    """Skip-connected decoder: (x0..x4) pyramid -> full-res image.

    Mirrors models/hmr.py:93-135: 2048*k -> 1024 -> 512 -> 256 -> 128 with
    skip concatenation at each level, then a final double-ResBlock stage and a
    3x3 projection to `out_dim` channels.  `num_feat` scales the expected
    pyramid channel widths for multi-trunk models (featcat variants).
    """

    num_feat: int = 1
    out_dim: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x0, x1, x2, x3, x4, train: bool = False):
        h = _DecStage(1024, self.dtype, name="dec1")(x4, train)       # 14^2
        h = jnp.concatenate([x3, h], axis=-1)
        h = _DecStage(512, self.dtype, name="dec2")(h, train)         # 28^2
        h = jnp.concatenate([x2, h], axis=-1)
        h = _DecStage(256, self.dtype, name="dec3")(h, train)         # 56^2
        h = jnp.concatenate([x1, h], axis=-1)
        h = _DecStage(128, self.dtype, name="dec4")(h, train)         # 112^2
        h = jnp.concatenate([x0, h], axis=-1)

        h = nn.Conv(128, (1, 1), use_bias=False, dtype=self.dtype, name="final_reduce")(h)
        h = ResBlock(128, self.dtype, name="final_res0")(h, train)
        h = ResBlock(128, self.dtype, name="final_res1")(h, train)
        h = Upsampler(128, self.dtype, name="final_up")(h, train)     # 224^2
        h = nn.Conv(self.out_dim, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="proj")(h)
        return h
