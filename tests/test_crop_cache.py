"""Pre-decoded crop cache (data/crop_cache.py): bit-exactness vs the disk
read path across the full augmentation distribution, margin refusal, and
the border zero-padding edge."""

import importlib
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    from inbed_pose_estimation_tpu.data.synthetic import write_synthetic_environment

    base = tmp_path_factory.mktemp("cc_env")
    env = write_synthetic_environment(str(base), num_subjects=1, samples_per_subject=4)
    os.environ["INBED_DATA_ROOT"] = env["data_root"]
    os.environ["INBED_NPZ_PATH"] = env["npz_path"]
    from inbed_pose_estimation_tpu import config

    importlib.reload(config)
    import inbed_pose_estimation_tpu.data.dataset as ds_mod

    importlib.reload(ds_mod)
    return env, ds_mod


RES = 64


class _Opt:
    img_res = RES
    noise_factor = 0.4
    rot_factor = 15.0
    scale_factor = 0.15
    crop_cache = None


def _item_pair(ds_mod, cache_dir, dataset="slp-4mod-train", is_train=True,
               uint8_feed=False, seeds=(0, 1, 2, 3, 7)):
    """Yield (disk_item, cached_item) under identical augmentation draws."""
    opt_disk = _Opt()
    opt_cache = _Opt()
    opt_cache.crop_cache = cache_dir
    if uint8_feed:
        opt_disk.uint8_feed = opt_cache.uint8_feed = True
    ds_disk = ds_mod.BaseDataset(opt_disk, dataset, is_train=is_train)
    ds_cache = ds_mod.BaseDataset(opt_cache, dataset, is_train=is_train)
    assert ds_cache._cache is not None, "cache was refused"
    for s in seeds:
        for i in range(len(ds_disk)):
            a = ds_disk.__getitem__(i, rng=np.random.default_rng(s))
            b = ds_cache.__getitem__(i, rng=np.random.default_rng(s))
            yield a, b


def _build(ds_mod, tmp_path, dataset="slp-4mod-train", is_train=True):
    from inbed_pose_estimation_tpu.data.crop_cache import build_crop_cache

    ds = ds_mod.BaseDataset(_Opt(), dataset, is_train=is_train)
    build_crop_cache(ds, str(tmp_path), scale_margin=1.15)
    return ds


def test_cache_bit_exact_train(env, tmp_path):
    _, ds_mod = env
    _build(ds_mod, tmp_path)
    n = 0
    for a, b in _item_pair(ds_mod, str(tmp_path)):
        for k in a:
            if isinstance(a[k], np.ndarray):
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)
            else:
                assert a[k] == b[k], k
        n += 1
    assert n >= 20


def test_cache_bit_exact_uint8_feed(env, tmp_path):
    _, ds_mod = env
    _build(ds_mod, tmp_path)
    for a, b in _item_pair(ds_mod, str(tmp_path), uint8_feed=True, seeds=(3, 11)):
        for k in ("img", "ir_img", "depth_img", "pm_img", "mask_uncover",
                  "pm_contact", "pixel_noise"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_cache_bit_exact_eval(env, tmp_path):
    _, ds_mod = env
    _build(ds_mod, tmp_path, is_train=False)
    for a, b in _item_pair(ds_mod, str(tmp_path), is_train=False, seeds=(0,)):
        for k in ("img", "ir_img", "depth_img", "pm_img", "keypoints",
                  "pose_3d", "center", "scale", "orig_shape"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_cache_border_center_zero_padding(env, tmp_path):
    """A crop box hanging off the image edge: the patch's stored zeros must
    reproduce crop()'s own out-of-image zero padding exactly."""
    from inbed_pose_estimation_tpu.data.crop_cache import CropCache, build_crop_cache

    _, ds_mod = env
    ds = ds_mod.BaseDataset(_Opt(), "slp-4mod-train", is_train=True)
    ds.center[0] = np.array([3.0, 2.0])  # box mostly outside the image
    ds.center[1] = np.array([1000.0, 800.0])  # fully outside
    build_crop_cache(ds, str(tmp_path), scale_margin=1.15)

    opt = _Opt()
    ds_c = ds_mod.BaseDataset(opt, "slp-4mod-train", is_train=True)
    ds_c.center[0] = np.array([3.0, 2.0])
    ds_c.center[1] = np.array([1000.0, 800.0])
    # Attach the cache directly: the constructor's index-fingerprint check
    # would (correctly) refuse it against the UNMUTATED npz centers; this
    # test targets the pixel semantics of edge boxes, not the refusal.
    ds_c._cache = CropCache(str(tmp_path), "slp-4mod-train", True)
    for i in (0, 1):
        for s in (0, 5):
            a = ds.__getitem__(i, rng=np.random.default_rng(s))
            b = ds_c.__getitem__(i, rng=np.random.default_rng(s))
            for k in ("img", "ir_img", "depth_img", "pm_img", "img_uncover",
                      "mask_uncover", "pm_contact"):
                np.testing.assert_array_equal(a[k], b[k], err_msg=f"{k} i={i} s={s}")


def test_cache_refused_when_margin_too_small(env, tmp_path, capsys):
    from inbed_pose_estimation_tpu.data.crop_cache import build_crop_cache

    _, ds_mod = env
    ds = ds_mod.BaseDataset(_Opt(), "slp-4mod-train", is_train=True)
    build_crop_cache(ds, str(tmp_path), scale_margin=1.05)

    opt = _Opt()  # scale_factor 0.15 > cached margin 1.05
    opt.crop_cache = str(tmp_path)
    ds_c = ds_mod.BaseDataset(opt, "slp-4mod-train", is_train=True)
    assert ds_c._cache is None
    assert "smaller augmentation range" in capsys.readouterr().out


def test_cache_refused_when_index_changed(env, tmp_path, capsys):
    """Re-extracting the npz index (same length, different centers) must
    refuse the cache — the stored patch extents would under-cover."""
    _, ds_mod = env
    _build(ds_mod, tmp_path)
    opt = _Opt()
    opt.crop_cache = str(tmp_path)
    ds_c = ds_mod.BaseDataset(opt, "slp-4mod-train", is_train=True)
    assert ds_c._cache is not None  # unchanged index: accepted

    from inbed_pose_estimation_tpu.data.crop_cache import CropCache

    cc = CropCache(str(tmp_path), "slp-4mod-train", True)
    assert cc.matches_index(ds_c)
    ds_c.center[0] += 50.0
    assert not cc.matches_index(ds_c)
    ds_c.center[0] -= 50.0
    assert cc.matches_index(ds_c)


def test_cache_refused_when_image_files_change(env, tmp_path, capsys):
    """Images re-generated ON DISK under the same names must refuse the
    cache (ADVICE r4): the fingerprint folds per-file size/mtime of every
    source image, so stale pixels are never silently served."""
    import os

    _, ds_mod = env
    _build(ds_mod, tmp_path)

    from inbed_pose_estimation_tpu.data.crop_cache import (
        CropCache,
        source_paths,
    )

    opt = _Opt()
    ds_c = ds_mod.BaseDataset(opt, "slp-4mod-train", is_train=True)
    cc = CropCache(str(tmp_path), "slp-4mod-train", True)
    assert cc.matches_index(ds_c)

    # Touch one source image (simulates re-generation): refused.
    victim = source_paths(ds_c)[0]
    st = os.stat(victim)
    os.utime(victim, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000_000))
    try:
        assert not cc.matches_index(ds_c)
        opt2 = _Opt()
        opt2.crop_cache = str(tmp_path)
        ds2 = ds_mod.BaseDataset(opt2, "slp-4mod-train", is_train=True)
        assert ds2._cache is None
        assert "source image" in capsys.readouterr().out
    finally:
        os.utime(victim, ns=(st.st_atime_ns, st.st_mtime_ns))
    assert cc.matches_index(ds_c)


def test_cache_corrupt_falls_back(env, tmp_path, capsys):
    """A truncated/corrupt cache must warn and fall back to disk reads,
    not abort dataset construction."""
    from inbed_pose_estimation_tpu.data.crop_cache import cache_paths

    _, ds_mod = env
    _build(ds_mod, tmp_path)
    _, idx_path = cache_paths(str(tmp_path), "slp-4mod-train", True)
    with open(idx_path, "wb") as f:
        f.write(b"not an npz")
    opt = _Opt()
    opt.crop_cache = str(tmp_path)
    ds_c = ds_mod.BaseDataset(opt, "slp-4mod-train", is_train=True)
    assert ds_c._cache is None
    assert "unreadable" in capsys.readouterr().out
    item = ds_c.__getitem__(0, rng=np.random.default_rng(0))
    assert item["img"].shape == (RES, RES, 3)


def test_cache_missing_modality_unc_reads_match_disk(env, tmp_path):
    """With hasIR/hasDEPTH/hasPM False the COVERED reads fall back to the
    RGB image but the UNCOVERED reads stay unconditional grayscale reads of
    the original modality paths (dataset.py) — the cache must mirror both."""
    from inbed_pose_estimation_tpu.data.crop_cache import build_crop_cache

    _, ds_mod = env
    ds = ds_mod.BaseDataset(_Opt(), "slp-4mod-train", is_train=True)
    ds.hasIR = ds.hasDEPTH = ds.hasPM = False
    build_crop_cache(ds, str(tmp_path), scale_margin=1.15)

    opt = _Opt()
    opt.crop_cache = str(tmp_path)
    ds_disk = ds_mod.BaseDataset(_Opt(), "slp-4mod-train", is_train=True)
    ds_cache = ds_mod.BaseDataset(opt, "slp-4mod-train", is_train=True)
    ds_disk.hasIR = ds_disk.hasDEPTH = ds_disk.hasPM = False
    ds_cache.hasIR = ds_cache.hasDEPTH = ds_cache.hasPM = False
    assert ds_cache._cache is not None
    for s in (0, 7):
        for i in range(len(ds_disk)):
            a = ds_disk.__getitem__(i, rng=np.random.default_rng(s))
            b = ds_cache.__getitem__(i, rng=np.random.default_rng(s))
            for k in a:
                if isinstance(a[k], np.ndarray):
                    np.testing.assert_array_equal(a[k], b[k], err_msg=f"{k} i={i} s={s}")


def test_cache_missing_falls_back(env, tmp_path, capsys):
    _, ds_mod = env
    opt = _Opt()
    opt.crop_cache = str(tmp_path / "nothing_here")
    ds_c = ds_mod.BaseDataset(opt, "slp-4mod-train", is_train=True)
    assert ds_c._cache is None
    item = ds_c.__getitem__(0, rng=np.random.default_rng(0))
    assert item["img"].shape == (RES, RES, 3)


def test_cache_composes_with_fast_preprocess(env, tmp_path):
    """--crop_cache + --fast_preprocess: the native kernel consumes the
    cache's pasted canvas (cast back to uint8 — exact, the canvas holds
    integral byte values) and must produce the same items as the kernel on
    the disk reads.  Together the two flags cover the whole data phase:
    the cache removes decode, the kernel removes the crop arithmetic."""
    from inbed_pose_estimation_tpu.ops import native

    if not native.available():
        pytest.skip("no g++ / build failed")
    _, ds_mod = env
    _build(ds_mod, tmp_path)

    opt_disk, opt_cache = _Opt(), _Opt()
    opt_disk.fast_preprocess = opt_cache.fast_preprocess = True
    opt_cache.crop_cache = str(tmp_path)
    ds_disk = ds_mod.BaseDataset(opt_disk, "slp-4mod-train", is_train=True)
    ds_cache = ds_mod.BaseDataset(opt_cache, "slp-4mod-train", is_train=True)
    assert ds_disk._native is not None and ds_cache._cache is not None
    for s in (0, 7):
        for i in range(len(ds_disk)):
            a = ds_disk.__getitem__(i, rng=np.random.default_rng(s))
            b = ds_cache.__getitem__(i, rng=np.random.default_rng(s))
            for k in ("img", "ir_img", "depth_img", "pm_img", "img_uncover",
                      "mask_uncover", "pm_contact", "keypoints"):
                np.testing.assert_array_equal(a[k], b[k], err_msg=f"{k} i={i} s={s}")


def test_cache_dedupes_uncover_split(env, tmp_path):
    """On an uncover split the cover->uncover rewrite is a no-op, so the
    uncovered modalities must alias the covered patches' bytes."""
    from inbed_pose_estimation_tpu.data.crop_cache import MODALITIES, CropCache

    _, ds_mod = env
    _build(ds_mod, tmp_path, dataset="slp-4mod-uncover", is_train=False)
    cc = CropCache(str(tmp_path), "slp-4mod-uncover", False)
    m = {name: i for i, name in enumerate(MODALITIES)}
    assert (cc.offsets[:, m["img_unc"]] == cc.offsets[:, m["img"]]).all()
    assert (cc.offsets[:, m["ir_unc"]] == cc.offsets[:, m["ir"]]).all()
