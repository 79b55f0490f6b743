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
import jax
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


class SmallOCConv3x3(nn.Module):
    """3x3 SAME conv with a tiny output-channel count, computed tap-major.

    The decoder's projection head (3x3, 128 -> out_dim=1 at 224^2) is the
    single worst op in the inference program's speed-of-light table: a
    direct conv runs the 128x128 MXU at OC/128 = 0.8% output fill — 2.4 ms
    of an 11.5 ms decoder floor at batch 32 (tools/conv_efficiency.py).
    Reassociating the reduction fixes the fill without changing the math:

      1. contract CHANNELS per tap:  a 1x1 conv to 9*OC "tap channels"
         (fill 9*OC/128 — 9x better, and it is a plain dot_general), then
      2. sum the 9 taps over their spatial shifts (one fused elementwise
         pass on the VPU, f32 accumulation).

    Exactly the same products as the direct conv, summed in a different
    order (channels first, taps second) — bit-differences are at f32
    rounding level (tests/test_decoder_proj.py).  Parameter tree is
    identical to nn.Conv(features, (3,3), use_bias=False): one `kernel`
    of shape [3, 3, C, OC], so checkpoints and the torch converter are
    unaffected.
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        oc = self.features
        kernel = self.param(
            "kernel",
            nn.linear.default_kernel_init,
            (3, 3, c, oc),
            jnp.float32,
        )
        k = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        # [3,3,C,OC] -> [C, 9*OC], tap-major: column t*OC+o holds k[dy,dx,:,o]
        # with t = dy*3+dx.
        w1 = k.reshape(9, c, oc).transpose(1, 0, 2).reshape(c, 9 * oc)
        z = jnp.einsum("bhwc,ck->bhwk", x, w1)  # 1x1 conv to tap channels
        b, h, w, _ = x.shape
        zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = jnp.zeros((b, h, w, oc), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                t = dy * 3 + dx
                out = out + zp[:, dy:dy + h, dx:dx + w,
                               t * oc:(t + 1) * oc].astype(jnp.float32)
        return out.astype(self.dtype)


class Split1x1(nn.Module):
    """1x1 conv over `concat([skip, x], -1)` without materializing the concat.

    Each decoder level starts by concatenating its skip input with the
    upsampled stream and reducing channels with a 1x1 conv
    (reference models/hmr.py:115-127).  The concatenate is pure HBM
    traffic: XLA must materialize the conv's operand, so the fused tensor
    is written once and read back — ~670 MB/batch-32 across the four
    levels, measured as the decoder's ~1.9 ms "interface glue"
    (PARITY.md round-5 drill-down).  A 1x1 conv over concatenated
    channels is exactly the sum of two 1x1 convs with the kernel split at
    the concat boundary, so computing `skip @ k[:c1] + x @ k[c1:]` reads
    each operand directly and never forms the concat; the add fuses into
    the second dot's epilogue.

    Numerics: the channel reduction is split at c1 and each partial is
    rounded to `dtype` before the add (one extra rounding vs the single
    f32 accumulator of the fused conv) — at f32 this is reassociation-
    level (~1e-6, covered by the golden-parity tolerances); at bf16 it
    adds one rounding on activations that are already bf16 everywhere.

    Parameter tree is identical to nn.Conv(features, (1,1),
    use_bias=False): one `kernel` [1, 1, c_skip + c_x, features], skip
    channels first — checkpoints and the torch converter are unaffected
    (tests/test_decoder_proj.py pins split-vs-concat equality).
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        cin = x.shape[-1] + (0 if skip is None else skip.shape[-1])
        kernel = self.param(
            "kernel",
            nn.linear.default_kernel_init,
            (1, 1, cin, self.features),
            jnp.float32,
        )
        k = kernel[0, 0].astype(self.dtype)
        x = x.astype(self.dtype)
        if skip is None:
            return jnp.einsum("bhwc,cf->bhwf", x, k)
        c1 = skip.shape[-1]
        a = jnp.einsum("bhwc,cf->bhwf", skip.astype(self.dtype), k[:c1])
        return a + jnp.einsum("bhwc,cf->bhwf", x, k[c1:])


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


class PhaseGroupedBN(nn.Module):
    """BatchNorm over post-PixelShuffle channels, computed pre-shuffle.

    Mathematically identical to `nn.BatchNorm` applied AFTER
    `pixel_shuffle(h, r)`: post-shuffle channel c's pixels are exactly the
    pre-shuffle channels [c*r^2, (c+1)*r^2) (c-major PixelShuffle layout),
    so grouped statistics over those channels equal the post-shuffle batch
    statistics, and the affine is the per-channel affine repeated r^2
    times.  Computing it pre-shuffle matters twice on TPU:
      * the normalize stays a FLAT per-channel multiply-add on the NHWC
        conv output, so XLA fuses it into the convolution's epilogue —
        applied after the transpose it is a separate full-tensor HBM pass
        (measured on the 224^2 final_up at batch 32: 7.33 ms as
        conv->shuffle->BN vs 3.28 ms with the flat pre-shuffle affine);
      * no [*, features, r^2] reshape is ever materialized (a trailing
        dim of 4 pads to the 128-wide lane tile — a 5-D grouped-BN variant
        measured just as slow as the post-shuffle form).
    Parameter/stat names, shapes, and values match nn.BatchNorm
    (scale/bias/mean/var, all [features]), so checkpoints, the torch
    converter, and the golden-parity tests are unaffected
    (tests/test_decoder_proj.py pins old==new in both modes, stats
    included).
    """

    features: int
    phases: int = 4  # r^2
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h, train: bool = False):
        f, p = self.features, self.phases
        scale = self.param("scale", nn.initializers.ones_init(), (f,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (f,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((f,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((f,), jnp.float32))
        if train:
            x32 = h.astype(jnp.float32)
            mean = jnp.mean(x32, axis=(0, 1, 2)).reshape(f, p).mean(axis=1)
            # two-pass variance, matching use_fast_variance=False (see
            # backbone.batch_norm); the centered square is a fused
            # reduction, never materialized.
            d = x32 - jnp.repeat(mean, p)
            var = jnp.mean(d * d, axis=(0, 1, 2)).reshape(f, p).mean(axis=1)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        mul = scale * jax.lax.rsqrt(var + self.epsilon)
        add = bias - mean * mul
        return (h * jnp.repeat(mul, p).astype(self.dtype)
                + jnp.repeat(add, p).astype(self.dtype))


class Upsampler(nn.Module):
    """conv3 (n -> 4n) + PixelShuffle(2) + BN (models/hmr.py:74-91, scale=2).

    The BN runs pre-shuffle with phase-grouped statistics — identical math,
    fused normalize (see PhaseGroupedBN).
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(4 * self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        h = PhaseGroupedBN(self.features, dtype=self.dtype, name="bn")(h, train)
        return pixel_shuffle(h, 2)


class _DecStage(nn.Module):
    """1x1 channel-reduce + ResBlock + Upsampler — one decoder level.

    `skip` (when given) is the level's skip input, reduced jointly with
    `x` as if `concat([skip, x], -1)` had been fed to the 1x1 conv — but
    without materializing the concat (see Split1x1)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, skip=None):
        h = Split1x1(self.features, self.dtype, name="reduce")(x, skip)
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
        # Skip "concatenation" at each level is fused into the level's 1x1
        # reduce (Split1x1) — same math, no materialized concat tensors.
        h = _DecStage(1024, self.dtype, name="dec1")(x4, train)            # 14^2
        h = _DecStage(512, self.dtype, name="dec2")(h, train, skip=x3)     # 28^2
        h = _DecStage(256, self.dtype, name="dec3")(h, train, skip=x2)     # 56^2
        h = _DecStage(128, self.dtype, name="dec4")(h, train, skip=x1)     # 112^2

        h = Split1x1(128, self.dtype, name="final_reduce")(h, skip=x0)
        h = ResBlock(128, self.dtype, name="final_res0")(h, train)
        h = ResBlock(128, self.dtype, name="final_res1")(h, train)
        h = Upsampler(128, self.dtype, name="final_up")(h, train)     # 224^2
        # Tap-major projection: same parameters and same math as
        # nn.Conv(out_dim, (3,3), use_bias=False, name="proj"), but ~9x
        # better MXU fill (see SmallOCConv3x3).
        h = SmallOCConv3x3(self.out_dim, self.dtype, name="proj")(h)
        return h
