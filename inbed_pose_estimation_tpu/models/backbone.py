"""ResNet-50 feature trunk in flax.linen, NHWC, TPU-native.

Re-designs the reference's vendored torchvision Bottleneck trunk
(reference: models/hmr.py:9-48 and the stem/stage construction repeated in
every model class, e.g. models/hmr.py:146-155,184-199).  Differences are
deliberate TPU choices, not behavioral changes:
  * NHWC layout (XLA:TPU's native conv layout — avoids transposes),
  * a single parameterized trunk shared by every model in the zoo,
  * optional bfloat16 compute dtype with float32 params/statistics,
  * BatchNorm momentum/eps matched to torch defaults (0.9 / 1e-5).  Under
    data parallelism the batch-mean/var reductions are GLOBAL (sync-BN):
    the train step is jit-ed over the batch-sharded input, so flax BN's
    `mean over axis 0` lowers to a cross-device psum under GSPMD.  This is
    a deliberate departure from the reference's per-replica DataParallel-BN
    (SURVEY.md §2.3): sync-BN makes training numerics INDEPENDENT of device
    count (1-chip and 8-chip runs match up to float32 reduction order:
    loss ~1e-5 rel, deep-layer batch stats up to ~1e-3 rel via
    ReLU-boundary divergence — pinned by
    tests/test_train_step.py::test_sync_bn_device_count_equivalence),
    whereas per-shard stats would change with the mesh size.  Inference/eval
    uses running statistics and is unaffected either way.

Returns the full skip pyramid (x0..x4) used by the Reconstruct decoders.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def batch_norm(train: bool, dtype, name: str) -> nn.BatchNorm:
    """The one BatchNorm configuration used framework-wide.

    momentum/eps match torch defaults (0.9 / 1e-5, like the reference's
    nn.BatchNorm2d).  `use_fast_variance=False` computes the batch variance
    two-pass as mean((x - mean)^2) instead of E[x^2] - E[x]^2: the one-pass
    form cancels catastrophically when var << mean^2, amplifying the psum
    reduction-order noise of the sharded sync-BN path ~1000x (observed
    4.9e-4 abs on running stats after one step at 1 vs 8 devices; two-pass
    is ~1e-6).  torch also computes variance directly, so this is the
    parity-faithful form as well.
    """
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        use_fast_variance=False,
        name=name,
    )


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1(x4) residual block with projection shortcut."""

    planes: int
    stride: int = 1
    project: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return batch_norm(train, self.dtype, name)

        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = bn("bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        out = bn("bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)

        if self.project:
            residual = nn.Conv(
                self.planes * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(out + residual)


class ResNetStage(nn.Module):
    planes: int
    blocks: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Bottleneck(
            self.planes, stride=self.stride, project=True, dtype=self.dtype, name="block0"
        )(x, train)
        for i in range(1, self.blocks):
            x = Bottleneck(self.planes, dtype=self.dtype, name=f"block{i}")(x, train)
        return x


class ResNet50Trunk(nn.Module):
    """Stem + 4 stages; emits the (x0..x4) skip pyramid.

    x0 is the *pre-BN* stem conv output (64ch, H/2) exactly as the reference
    decoders consume it (models/hmr.py:804-814).
    For a 224 input: x0 112^2x64, x1 56^2x256, x2 28^2x512, x3 14^2x1024,
    x4 7^2x2048.
    """

    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x0 = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        h = batch_norm(train, self.dtype, "bn1")(x0)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        x1 = ResNetStage(64, self.layers[0], 1, self.dtype, name="layer1")(h, train)
        x2 = ResNetStage(128, self.layers[1], 2, self.dtype, name="layer2")(x1, train)
        x3 = ResNetStage(256, self.layers[2], 2, self.dtype, name="layer3")(x2, train)
        x4 = ResNetStage(512, self.layers[3], 2, self.dtype, name="layer4")(x3, train)
        return x0, x1, x2, x3, x4
