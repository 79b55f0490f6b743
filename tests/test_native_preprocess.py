"""Native C++ preprocessing kernel: build, run, and cross-check against the
pure-numpy/JAX device path."""

import numpy as np
import pytest

from inbed_pose_estimation_tpu.ops import native


@pytest.mark.skipif(not native.available(), reason="no g++ / build failed")
def test_native_matches_reference_math():
    rng = np.random.default_rng(0)
    B, H, W, C = 3, 96, 128, 3
    RES = 32
    imgs = rng.integers(0, 256, (B, H, W, C), dtype=np.uint8)
    centers = np.stack([rng.uniform(30, 90, B), rng.uniform(30, 60, B)], 1)
    scales = rng.uniform(0.2, 0.4, B)
    flips = np.array([0, 1, 0], np.float32)
    noise = rng.uniform(0.8, 1.2, (B, 3)).astype(np.float32)
    mean = np.array([0.4, 0.45, 0.4], np.float32)
    std = np.array([0.2, 0.25, 0.2], np.float32)

    out = native.preprocess_batch(imgs, centers, scales, flips, noise, RES, mean, std)
    assert out.shape == (B, RES, RES, C)
    assert np.isfinite(out).all()

    # Independent numpy bilinear reference for one interior pixel.
    def sample(img, x, y, ch):
        x0, y0 = int(np.floor(x)), int(np.floor(y))
        fx, fy = x - x0, y - y0
        v = 0.0
        for dy in (0, 1):
            yy = y0 + dy
            if not (0 <= yy < img.shape[0]):
                continue
            wy = fy if dy else 1 - fy
            for dx in (0, 1):
                xx = x0 + dx
                if not (0 <= xx < img.shape[1]):
                    continue
                wx = fx if dx else 1 - fx
                v += wy * wx * float(img[yy, xx, ch])
        return v

    b = 0
    box = 200 * scales[b]
    step = box / RES
    oy, ox, ch = RES // 2, RES // 3, 1
    sx = centers[b, 0] - box / 2 + (ox + 0.5) * step - 0.5
    sy = centers[b, 1] - box / 2 + (oy + 0.5) * step - 0.5
    v = min(255.0, max(0.0, sample(imgs[b], sx, sy, ch) * noise[b, ch]))
    expected = (v / 255.0 - mean[ch]) / std[ch]
    np.testing.assert_allclose(out[b, oy, ox, ch], expected, atol=1e-4)


@pytest.mark.skipif(not native.available(), reason="no g++ / build failed")
def test_native_flip():
    imgs = np.zeros((1, 64, 64, 1), np.uint8)
    imgs[0, :, :16] = 200  # bright left strip
    out_noflip = native.preprocess_batch(
        imgs, np.array([[32, 32]]), np.array([0.32]), np.array([0.0]),
        np.ones((1, 3), np.float32), 32, np.zeros(1, np.float32), np.ones(1, np.float32),
    )
    out_flip = native.preprocess_batch(
        imgs, np.array([[32, 32]]), np.array([0.32]), np.array([1.0]),
        np.ones((1, 3), np.float32), 32, np.zeros(1, np.float32), np.ones(1, np.float32),
    )
    np.testing.assert_allclose(out_flip[0, :, ::-1], out_noflip[0], atol=1e-5)


@pytest.mark.skipif(not native.available(), reason="no g++ / build failed")
def test_dataset_fast_preprocess_close_to_reference_path(tmp_path):
    """The native fast path approximates the PIL bit-parity path (different
    resamplers, so tolerance is loose) and produces the same schema."""
    import importlib
    import os as _os

    from inbed_pose_estimation_tpu.data.synthetic import write_synthetic_environment

    env = write_synthetic_environment(str(tmp_path), num_subjects=1, samples_per_subject=2)
    _os.environ["INBED_DATA_ROOT"] = env["data_root"]
    _os.environ["INBED_NPZ_PATH"] = env["npz_path"]
    from inbed_pose_estimation_tpu import config as cfg

    importlib.reload(cfg)
    import inbed_pose_estimation_tpu.data.dataset as ds_mod

    importlib.reload(ds_mod)

    class Slow:
        img_res = 64

    class Fast:
        img_res = 64
        fast_preprocess = True

    ds_slow = ds_mod.BaseDataset(Slow(), "slp-4mod-uncover", is_train=False)
    ds_fast = ds_mod.BaseDataset(Fast(), "slp-4mod-uncover", is_train=False)
    assert ds_fast._native is not None
    a = ds_slow[0]
    b = ds_fast[0]
    assert b["img"].shape == a["img"].shape
    # Same image content modulo resampler differences.
    assert np.abs(a["img"] - b["img"]).mean() < 0.2
    corr = np.corrcoef(a["img"].ravel(), b["img"].ravel())[0, 1]
    assert corr > 0.95, corr


@pytest.mark.skipif(not native.available(), reason="no g++ / build failed")
def test_native_rotation_matches_host_crop():
    """The C++ kernel's rotation path matches the host crop() affine (the
    fast lane now covers the rot != 0 ~40% of train samples too).  Different
    resamplers (uint8 PIL vs direct bilinear) -> loose tolerance on a smooth
    image."""
    from inbed_pose_estimation_tpu.data.transforms import crop

    H, W = 128, 128
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    smooth = (127 + 80 * np.sin(xx / 9.0) * np.cos(yy / 11.0)).astype(np.uint8)
    img = smooth[:, :, None]
    center = np.array([64.0, 64.0])
    scale, rot, res = 0.4, 25.0, 32

    host = crop(smooth, center, scale, [res, res], rot=rot).astype(np.float32) / 255.0
    nat = native.preprocess_batch(
        img[None], center[None], np.array([scale]), np.array([0.0]),
        np.ones((1, 3), np.float32), res, np.zeros(1, np.float32),
        np.ones(1, np.float32), rots=np.array([rot], np.float32),
    )[0, :, :, 0]

    # Compare away from the border (rotation padding differs at edges).
    inner = (slice(4, -4), slice(4, -4))
    diff = np.abs(nat[inner] - host[inner])
    assert diff.mean() < 0.02, diff.mean()
    assert np.corrcoef(nat[inner].ravel(), host[inner].ravel())[0, 1] > 0.99
