"""Fused on-device preprocessing: crop_resize geometry matches the host
path on smooth images, and the batch preprocess normalizes correctly."""

import numpy as np

import jax.numpy as jnp

from inbed_pose_estimation_tpu import constants
from inbed_pose_estimation_tpu.data.device_preprocess import (
    crop_resize,
    make_device_preprocess,
)
from inbed_pose_estimation_tpu.data.transforms import crop


def test_crop_resize_matches_host_crop_on_smooth_image():
    """On a smooth gradient the device bilinear crop matches the host
    (PIL) crop to a few gray levels despite different resamplers."""
    H, W = 120, 160
    yy, xx = np.mgrid[0:H, 0:W]
    img = ((xx * 1.3 + yy * 0.7) % 256).astype(np.uint8)

    center = np.array([80.0, 60.0])
    scale = 0.4  # box = 80 px
    res = 32

    host = crop(img, center, scale, [res, res]).astype(np.float32) / 255.0
    dev = np.asarray(
        crop_resize(jnp.asarray(img[:, :, None], jnp.float32) / 255.0,
                    jnp.asarray(center), jnp.asarray(scale), res)
    )[:, :, 0]
    # Ignore a 2px border (boundary handling differs).
    diff = np.abs(host[2:-2, 2:-2] - dev[2:-2, 2:-2])
    assert diff.mean() < 0.02, diff.mean()


def test_device_preprocess_batch_normalization():
    B, H, W = 2, 96, 96
    rng = np.random.default_rng(0)
    raw = {
        "img": jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)),
        "depth_img": jnp.asarray(rng.uniform(0, 1, (B, H, W, 1)).astype(np.float32)),
    }
    center = jnp.full((B, 2), 48.0)
    scale = jnp.full((B,), 96 / 200.0)
    flip = jnp.asarray([0.0, 1.0])
    noise = jnp.ones((B, 3))

    pp = make_device_preprocess(res=32)
    out = pp(raw, center, scale, flip, noise)
    assert out["img"].shape == (B, 32, 32, 3)
    assert out["depth_img"].shape == (B, 32, 32, 1)

    # Undo normalization: values should return to [0, 1].
    img0 = np.asarray(out["img"][0]) * np.asarray(constants.IMG_NORM_STD) + np.asarray(
        constants.IMG_NORM_MEAN
    )
    assert img0.min() > -0.05 and img0.max() < 1.05

    # Flip semantics: sample 1 flipped == flip of unflipped run.
    out_noflip = pp(raw, center, scale, jnp.zeros(2), noise)
    np.testing.assert_allclose(
        np.asarray(out["img"][1]),
        np.asarray(out_noflip["img"][1])[:, ::-1],
        atol=1e-5,
    )
