"""SmallOCConv3x3 (tap-major projection) == nn.Conv, params and math.

The decoder's proj head was rewritten tap-major for MXU fill (decoder.py:
SmallOCConv3x3).  These tests pin the rewrite to the direct convolution it
replaces: identical parameter tree (checkpoint/converter compatibility) and
identical outputs up to f32 addition-order rounding.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inbed_pose_estimation_tpu.models.decoder import Reconstruct, SmallOCConv3x3


def _direct_conv(features, dtype=jnp.float32):
    return nn.Conv(features, (3, 3), padding=((1, 1), (1, 1)),
                   use_bias=False, dtype=dtype)


@pytest.mark.parametrize("oc", [1, 3])
def test_matches_direct_conv_f32(oc):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 14, 17, 32)).astype(np.float32))
    tap = SmallOCConv3x3(oc)
    v = tap.init(jax.random.PRNGKey(0), x)
    # identical param tree: one 'kernel' of nn.Conv's shape
    assert set(v["params"].keys()) == {"kernel"}
    assert v["params"]["kernel"].shape == (3, 3, 32, oc)

    direct = _direct_conv(oc)
    ref = direct.apply(v, x)  # same variables drop straight in
    got = tap.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_matches_direct_conv_bf16_tolerance():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 64)).astype(np.float32))
    tap = SmallOCConv3x3(1, dtype=jnp.bfloat16)
    v = tap.init(jax.random.PRNGKey(0), x)
    ref = _direct_conv(1, jnp.float32).apply(v, x)
    got = tap.apply(v, x).astype(jnp.float32)
    # bf16 tap channels round once before the f32 shift-add; scale of the
    # output here is O(sqrt(9*64)) ~ 24, so 2e-2 abs is ~bf16 ulp level.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_edges_zero_padding_semantics():
    # An input that is nonzero only on the border exercises the pad path.
    x = np.zeros((1, 5, 5, 4), np.float32)
    x[0, 0, :, :] = 1.0
    x[0, :, -1, :] = -2.0
    x = jnp.asarray(x)
    tap = SmallOCConv3x3(2)
    v = tap.init(jax.random.PRNGKey(2), x)
    ref = _direct_conv(2).apply(v, x)
    got = tap.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_reconstruct_param_tree_unchanged_and_finite():
    """Reconstruct's proj param path/shape is what checkpoints expect."""
    rng = np.random.default_rng(3)
    pyr = tuple(
        jnp.asarray(rng.normal(0, 1, (1, 14 // (2 ** i) if i else 14, 14 // (2 ** i) if i else 14, c)).astype(np.float32))
        for i, c in enumerate((64, 256, 512, 1024, 2048))
    )
    # realistic pyramid spatial dims: x0 at 2*14=28 ... keep tiny: use 16/8/4/2/1
    pyr = tuple(
        jnp.asarray(rng.normal(0, 1, (1, s, s, c)).astype(np.float32))
        for s, c in zip((16, 8, 4, 2, 1), (64, 256, 512, 1024, 2048))
    )
    dec = Reconstruct()
    v = dec.init(jax.random.PRNGKey(0), *pyr)
    assert v["params"]["proj"]["kernel"].shape == (3, 3, 128, 1)
    out = dec.apply(v, *pyr, mutable=False)
    assert np.isfinite(np.asarray(out)).all()
    assert out.shape == (1, 32, 32, 1)


@pytest.mark.parametrize("c_skip,c_x,f", [(16, 16, 8), (5, 11, 4)])
def test_split1x1_matches_concat_conv_f32(c_skip, c_x, f):
    """Split1x1(x, skip) == nn.Conv(1x1)(concat([skip, x])): same param
    tree (one [1,1,c_skip+c_x,f] kernel, skip channels first), same math
    up to f32 reassociation at the split boundary."""
    from inbed_pose_estimation_tpu.models.decoder import Split1x1

    rng = np.random.default_rng(11)
    skip = jnp.asarray(rng.normal(0, 1, (2, 6, 7, c_skip)).astype(np.float32))
    x = jnp.asarray(rng.normal(0, 1, (2, 6, 7, c_x)).astype(np.float32))
    mod = Split1x1(f)
    v = mod.init(jax.random.PRNGKey(0), x, skip)
    assert set(v["params"].keys()) == {"kernel"}
    assert v["params"]["kernel"].shape == (1, 1, c_skip + c_x, f)

    direct = nn.Conv(f, (1, 1), use_bias=False)
    ref = direct.apply(v, jnp.concatenate([skip, x], axis=-1))
    got = mod.apply(v, x, skip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_split1x1_no_skip_is_plain_1x1_conv():
    from inbed_pose_estimation_tpu.models.decoder import Split1x1

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(0, 1, (3, 4, 5, 24)).astype(np.float32))
    mod = Split1x1(6)
    v = mod.init(jax.random.PRNGKey(1), x)
    assert v["params"]["kernel"].shape == (1, 1, 24, 6)
    ref = nn.Conv(6, (1, 1), use_bias=False).apply(v, x)
    got = mod.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_split1x1_bf16_tolerance():
    """bf16 partials round once before the add — ~bf16-ulp level drift vs
    the f32 concat-conv oracle on unit-scale inputs."""
    from inbed_pose_estimation_tpu.models.decoder import Split1x1

    rng = np.random.default_rng(13)
    skip = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 32)).astype(np.float32))
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 32)).astype(np.float32))
    mod = Split1x1(16, dtype=jnp.bfloat16)
    v = mod.init(jax.random.PRNGKey(2), x, skip)
    ref = nn.Conv(16, (1, 1), use_bias=False, dtype=jnp.float32).apply(
        v, jnp.concatenate([skip, x], axis=-1))
    got = mod.apply(v, x, skip).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)


class _PostShuffleUpsampler(nn.Module):
    """The original formulation: conv -> PixelShuffle -> BN (post-shuffle).

    Kept as the oracle for the pre-shuffle grouped-BN rewrite in
    decoder.Upsampler (same params, same math, different op order)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        from inbed_pose_estimation_tpu.models.decoder import pixel_shuffle

        h = nn.Conv(4 * self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=jnp.float32, name="conv")(x)
        h = pixel_shuffle(h, 2)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         use_fast_variance=False, name="bn")(h)
        return h


@pytest.mark.parametrize("train", [False, True])
def test_upsampler_pre_shuffle_bn_equivalence(train):
    """Pre-shuffle grouped BN == post-shuffle BN: outputs AND updated
    running statistics, with an identical parameter/stat tree."""
    from inbed_pose_estimation_tpu.models.decoder import Upsampler

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 1, (4, 10, 12, 16)).astype(np.float32))
    new = Upsampler(16)
    old = _PostShuffleUpsampler(16)
    v_new = new.init(jax.random.PRNGKey(0), x, train=True)
    v_old = old.init(jax.random.PRNGKey(0), x, train=True)
    # identical trees -> swap variables freely
    assert jax.tree_util.tree_structure(v_new) == jax.tree_util.tree_structure(v_old)
    for leaf_new, leaf_old in zip(jax.tree_util.tree_leaves(v_new),
                                  jax.tree_util.tree_leaves(v_old)):
        assert leaf_new.shape == leaf_old.shape

    # randomize stats so eval mode is nontrivial
    stats = {"mean": jnp.asarray(rng.normal(0, 0.2, (16,)).astype(np.float32)),
             "var": jnp.asarray(rng.uniform(0.5, 2.0, (16,)).astype(np.float32))}
    variables = {"params": v_old["params"],
                 "batch_stats": {"bn": stats}}

    if train:
        out_new, mut_new = new.apply(variables, x, train=True,
                                     mutable=["batch_stats"])
        out_old, mut_old = old.apply(variables, x, train=True,
                                     mutable=["batch_stats"])
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(mut_new["batch_stats"]["bn"][k]),
                np.asarray(mut_old["batch_stats"]["bn"][k]),
                rtol=1e-5, atol=1e-6)
    else:
        out_new = new.apply(variables, x, train=False)
        out_old = old.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out_new), np.asarray(out_old),
                               rtol=1e-5, atol=1e-5)
