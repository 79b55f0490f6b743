"""Bit-parity of data/transforms.py against the vendored scipy-1.2 resampler.

The reference's crop pipeline is scipy.misc (bytescale + PIL); scipy 1.2 is
uninstallable here, so tests/oracles/scipy_pilutil.py vendors the original
BSD source and these tests bit-compare our work-alikes against it across
dtypes, the hi==lo edge, odd sizes, value ranges outside [0,255], and
rotations — closing the "not yet bit-compared" caveat.

Reference call sites: utils/imutils.py:76 (imrotate), :79 (imresize
bilinear), :104 (imresize nearest); float32 inputs from
datasets/base_dataset.py:259.
"""

import numpy as np
import pytest

from inbed_pose_estimation_tpu.data import transforms
from tests.oracles import scipy_pilutil as oracle


def _rng(seed=0):
    return np.random.RandomState(seed)


def _cases():
    r = _rng(7)
    yield "u8_2d", r.randint(0, 256, (37, 53)).astype(np.uint8)
    yield "u8_3d", r.randint(0, 256, (24, 31, 3)).astype(np.uint8)
    # float32 pixel values from uint8 (the reference's live path)
    yield "f32_2d", r.randint(0, 256, (37, 53)).astype(np.float32)
    yield "f32_3d", r.randint(0, 256, (24, 31, 3)).astype(np.float32)
    # float ranges that trigger the contrast stretch / clip paths
    yield "f32_dark", r.randint(3, 180, (33, 29)).astype(np.float32)
    yield "f32_neg", (r.randn(21, 27) * 90).astype(np.float32)
    yield "f64_2d", r.rand(19, 23) * 1000 - 200
    yield "f32_const", np.full((16, 18), 42.0, np.float32)
    yield "f32_zeros", np.zeros((11, 13), np.float32)
    yield "f32_frac", (r.rand(25, 25) * 255).astype(np.float32)


@pytest.mark.parametrize("name,arr", list(_cases()))
def test_bytescale_bit_parity(name, arr):
    ours = transforms._bytescale(arr)
    ref = oracle.bytescale(arr)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("name,arr", list(_cases()))
@pytest.mark.parametrize("size", [(224, 224), (17, 31), (64, 9), (100, 100)])
def test_imresize_bilinear_bit_parity(name, arr, size):
    ours = transforms._imresize_uint8(arr, size)
    ref = oracle.imresize(arr, size)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("name,arr", list(_cases()))
def test_imresize_nearest_bit_parity(name, arr):
    size = (13, 29)
    ours = transforms._imresize_uint8(arr, size, interp="nearest")
    ref = oracle.imresize(arr, size, interp="nearest")
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("name,arr", list(_cases()))
@pytest.mark.parametrize("angle", [-37.5, -5.0, 11.0, 30.0, 90.0])
def test_imrotate_bit_parity(name, arr, angle):
    ours = transforms._imrotate_uint8(arr, angle)
    ref = oracle.imrotate(arr, angle)
    np.testing.assert_array_equal(ours, ref)


def _oracle_resize(img, size, interp="bilinear"):
    return oracle.imresize(img, tuple(int(s) for s in size), interp=interp)


def _oracle_rotate(img, angle):
    return oracle.imrotate(img, angle)


@pytest.mark.parametrize("rot", [0.0, 17.0, -30.0])
@pytest.mark.parametrize(
    "dtype,shape",
    [(np.float32, (155, 120, 3)), (np.float32, (90, 140)), (np.uint8, (101, 99, 3))],
)
def test_crop_bit_parity_vs_oracle_resampler(monkeypatch, rot, dtype, shape):
    """transforms.crop with OUR resampler == transforms.crop with the
    vendored scipy resampler substituted in — isolates exactly the
    resampler work-alike while sharing the (parity-mandated) box math."""
    r = _rng(int(abs(rot)) + shape[0])
    img = r.randint(0, 231, shape).astype(dtype)  # max<255: stretch active
    center = [shape[1] * 0.45, shape[0] * 0.55]
    scale = 0.62 * max(shape[:2]) / 200.0

    ours = transforms.crop(img, center, scale, [64, 64], rot=rot)

    monkeypatch.setattr(transforms, "_imresize_uint8", _oracle_resize)
    monkeypatch.setattr(transforms, "_imrotate_uint8", _oracle_rotate)
    ref = transforms.crop(img, center, scale, [64, 64], rot=rot)
    np.testing.assert_array_equal(ours, ref)


def test_uncrop_bit_parity_vs_oracle_resampler(monkeypatch):
    r = _rng(3)
    img = r.randint(0, 256, (64, 64, 3)).astype(np.uint8)
    center, scale, orig = [70.0, 90.0], 0.5, (160, 140, 3)
    ours = transforms.uncrop(img, center, scale, orig)
    monkeypatch.setattr(transforms, "_imresize_uint8", _oracle_resize)
    ref = transforms.uncrop(img, center, scale, orig)
    np.testing.assert_array_equal(ours, ref)
