"""Data layer tests: synthetic SLP tree, dataset schema, resumable loader,
crop/transform invariants (SURVEY.md §4(d))."""

import os

import numpy as np
import pytest

from inbed_pose_estimation_tpu.data.synthetic import write_synthetic_environment
from inbed_pose_estimation_tpu.data.transforms import (
    crop,
    flip_kp,
    flip_pose,
    rot_aa,
    transform,
    uncrop,
)
from inbed_pose_estimation_tpu import constants


@pytest.fixture(scope="module")
def synth_env(tmp_path_factory):
    base = tmp_path_factory.mktemp("synth")
    env = write_synthetic_environment(str(base), num_subjects=1, samples_per_subject=3)
    os.environ["INBED_DATA_ROOT"] = env["data_root"]
    os.environ["INBED_NPZ_PATH"] = env["npz_path"]
    # config reads env at import; reload to pick up the synthetic paths.
    import importlib
    from inbed_pose_estimation_tpu import config

    importlib.reload(config)
    import inbed_pose_estimation_tpu.data.dataset as ds_mod

    importlib.reload(ds_mod)
    return env, ds_mod


def test_dataset_item_schema(synth_env):
    _, ds_mod = synth_env
    ds = ds_mod.BaseDataset(None, "slp-4mod-uncover", is_train=False)
    assert len(ds) == 3
    item = ds[0]
    assert item["img"].shape == (224, 224, 3)
    for k in ("ir_img", "depth_img", "pm_img", "depth_img_uncover", "mask_uncover"):
        assert item[k].shape == (224, 224, 1), k
    assert item["pm_contact"].shape == (224, 224, 2)
    assert item["keypoints"].shape == (49, 3)
    assert item["pose"].shape == (72,)
    assert item["pose_3d"].shape == (24, 4)
    assert np.isfinite(item["img"]).all()
    # Keypoints normalized to [-1, 1] ballpark.
    assert np.abs(item["keypoints"][:, :2]).max() < 3.0


def test_train_augmentation_reproducible(synth_env):
    _, ds_mod = synth_env

    class Opt:
        noise_factor, rot_factor, scale_factor = 0.4, 15.0, 0.15
        data_train = "slp-4mod-train"

    ds = ds_mod.BaseDataset(Opt(), "slp-4mod-train", is_train=True)
    a = ds.__getitem__(0, rng=np.random.default_rng(7))
    b = ds.__getitem__(0, rng=np.random.default_rng(7))
    np.testing.assert_array_equal(a["img"], b["img"])
    np.testing.assert_array_equal(a["pose"], b["pose"])


def test_loader_resume_mid_epoch(synth_env):
    _, ds_mod = synth_env
    from inbed_pose_estimation_tpu.data.loader import CheckpointDataLoader

    ds = ds_mod.BaseDataset(None, "slp-4mod-train", is_train=False, use_augmentation=False)
    loader = CheckpointDataLoader(ds, batch_size=2, shuffle=True, seed=3, num_workers=1)
    batches = [(b, batch["sample_index"]) for b, batch in loader]
    assert len(batches) == len(ds) // 2

    # Resume from batch 1 with the stored permutation.
    ckpt = {"dataset_perm": loader.dataset_perm, "batch_idx": 1}
    loader2 = CheckpointDataLoader(ds, batch_size=2, shuffle=True, checkpoint=ckpt, num_workers=1)
    resumed = [(b, batch["sample_index"]) for b, batch in loader2]
    assert [b for b, _ in resumed] == [b for b, _ in batches][1:]
    for (_, idx1), (_, idx2) in zip(resumed, batches[1:]):
        np.testing.assert_array_equal(idx1, idx2)


def test_crop_uncrop_roundtrip_center():
    """Cropping then uncropping restores the central content approximately."""
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 255, (100, 80)) > 127).astype(np.uint8) * 255
    center, scale = np.array([40, 50]), 0.5  # h = 100
    cropped = crop(img, center, scale, [224, 224])
    restored = uncrop((cropped > 127).astype(np.uint8), center, scale, (100, 80))
    # Compare on the interior crop region.
    inter = (slice(10, 90), slice(10, 70))
    agree = ((restored[inter] > 0) == (img[inter] > 127)).mean()
    assert agree > 0.95


def test_transform_invert_roundtrip():
    center, scale, res = np.array([50.0, 60.0]), 0.9, [224, 224]
    pt = np.array([100, 120])
    fwd = transform(pt, center, scale, res)
    back = transform(fwd, center, scale, res, invert=1)
    assert np.abs(back - pt).max() <= 2  # int rounding through 1-based coords


def test_rot_aa_zero_is_identity():
    aa = np.array([0.3, -0.2, 0.4], np.float32)
    np.testing.assert_allclose(rot_aa(aa, 0.0), aa, atol=1e-6)


def test_flip_kp_involution():
    rng = np.random.default_rng(1)
    kp = rng.normal(size=(49, 3)).astype(np.float32)
    np.testing.assert_allclose(flip_kp(flip_kp(kp.copy())), kp, atol=1e-6)


def test_flip_pose_involution():
    rng = np.random.default_rng(2)
    pose = rng.normal(size=(72,)).astype(np.float32)
    np.testing.assert_allclose(flip_pose(flip_pose(pose.copy())), pose, atol=1e-6)


def test_mixed_dataset_ratio_mixture(synth_env):
    """Ratio-mixed MixedDataset draws from both sources per the partition
    (the reference's commented-out mixture intent, mixed_dataset.py:11-29)."""
    _, ds_mod = synth_env

    class Opt:
        img_res = 64
        data_train = "slp-4mod-uncover:0.5+slp-4mod-cover1:0.5"

    mixed = ds_mod.MixedDataset(Opt(), is_train=False)
    assert set(mixed.dataset_dict) == {"slp-4mod-uncover", "slp-4mod-cover1"}
    names = {mixed[i]["dataset_name"] for i in range(len(mixed))}
    assert names == {"slp-4mod-uncover", "slp-4mod-cover1"}


def test_mixed_dataset_single_default(synth_env):
    _, ds_mod = synth_env

    class Opt:
        img_res = 64
        data_train = "slp-4mod-train"

    mixed = ds_mod.MixedDataset(Opt(), is_train=True)
    assert mixed.dataset_dict == {"slp-4mod-train": 0}
    assert len(mixed) == len(mixed.datasets[0])


def test_mixed_dataset_global_fits_indices(synth_env):
    """Mixture items carry GLOBAL sample indices (dataset block offset +
    local index) so per-dataset fits never collide (VERDICT Weak #5;
    reference keys fits by (dataset, index), train/fits_dict.py:19-32)."""
    _, ds_mod = synth_env

    class Opt:
        img_res = 64
        data_train = "slp-4mod-uncover:0.5+slp-4mod-cover1:0.5"

    mixed = ds_mod.MixedDataset(Opt(), is_train=False)
    n0 = len(mixed.datasets[0])
    assert [n for _, n in mixed.fits_layout] == [len(d) for d in mixed.datasets]
    seen = {}
    for i in range(len(mixed)):
        item = mixed[i]
        seen.setdefault(item["dataset_name"], []).append(item["sample_index"])
    for idx in seen["slp-4mod-uncover"]:
        assert 0 <= idx < n0
    for idx in seen["slp-4mod-cover1"]:
        assert idx >= n0


def test_fits_store_multi_dataset_no_cross_contamination(tmp_path):
    import jax.numpy as jnp

    from inbed_pose_estimation_tpu.train.fits_dict import FitsStore, fits_set

    static = tmp_path / "static"
    static.mkdir()
    seed_a = np.full((4, 82), 7.0, np.float32)
    np.save(static / "a_fits.npy", seed_a)

    store = FitsStore([("a", 4), ("b", 6)], checkpoint_dir=str(tmp_path),
                      static_fits_dir=str(static))
    assert store.array.shape == (10, 82)
    assert store.offsets == {"a": 0, "b": 4}
    np.testing.assert_array_equal(np.asarray(store.array[:4]), seed_a)
    np.testing.assert_array_equal(np.asarray(store.array[4:]), 0.0)

    # Update a row in b's block via its global index; a's block untouched.
    idx = jnp.asarray([5], jnp.int32)  # b's local row 1
    zeros = jnp.zeros(1)
    # Small pose values: the set path round-trips the global orient through
    # rotation matrices, which canonicalizes axis-angle norms beyond pi.
    new = fits_set(store.array, idx, zeros, zeros, jnp.ones(1),
                   jnp.full((1, 72), 0.25), jnp.full((1, 10), 3.0))
    np.testing.assert_array_equal(np.asarray(new[:4]), seed_a)
    assert float(new[5, 0]) == pytest.approx(0.25, abs=1e-5)
    assert float(new[5, 72]) == 3.0

    store.array = new
    store.save()
    a_out = np.load(tmp_path / "a_fits.npy")
    b_out = np.load(tmp_path / "b_fits.npy")
    np.testing.assert_array_equal(a_out, seed_a)
    assert b_out.shape == (6, 82)
    assert float(b_out[1, 0]) == pytest.approx(0.25, abs=1e-5)
    assert float(b_out[1, 72]) == 3.0


def test_uint8_feed_bit_identical_to_host_path(synth_env):
    """The uint8 training feed (post-crop uint8 + device-side
    clip(u8*pn)/255 + normalize, data/device_preprocess.decode_uint8_batch)
    reproduces the host-normalized float32 items to within ONE float32 ulp
    (the host multiplies the noise factor in float64 before rounding into
    the f32 buffer; the device multiplies in f32 — same ops otherwise)."""
    import jax.numpy as jnp

    from inbed_pose_estimation_tpu.data.device_preprocess import decode_uint8_batch

    _, ds_mod = synth_env

    class Opt:
        noise_factor, rot_factor, scale_factor = 0.4, 15.0, 0.15
        data_train = "slp-4mod-train"
        img_res = 64

    class OptU8(Opt):
        uint8_feed = True

    ds_f32 = ds_mod.BaseDataset(Opt(), "slp-4mod-train", is_train=True)
    ds_u8 = ds_mod.BaseDataset(OptU8(), "slp-4mod-train", is_train=True)

    a = ds_f32.__getitem__(0, rng=np.random.default_rng(11))
    b = ds_u8.__getitem__(0, rng=np.random.default_rng(11))

    keys = ("img", "ir_img", "depth_img", "pm_img",
            "ir_img_uncover", "depth_img_uncover", "pm_img_uncover",
            "mask_uncover")
    for k in keys:
        assert b[k].dtype == np.uint8, k
    batch = {k: jnp.asarray(b[k])[None] for k in keys}
    batch["pixel_noise"] = jnp.asarray(b["pixel_noise"])[None]
    decoded = decode_uint8_batch(batch)
    for k in keys:
        # rtol covers normalized channels whose small std amplifies the ulp
        # (|x| up to ~1/std after (x-mean)/std).
        np.testing.assert_allclose(
            np.asarray(decoded[k][0]), a[k], rtol=3e-7, atol=1e-6, err_msg=k)
    # Non-image keys agree too (same aug draws), incl. the host-computed
    # contact map from the noised pm view.
    np.testing.assert_array_equal(a["pm_contact"], b["pm_contact"])
    np.testing.assert_array_equal(a["keypoints"], b["keypoints"])
    # float batches pass through decode untouched.
    f32_batch = {"img": jnp.asarray(a["img"])[None]}
    assert decode_uint8_batch(f32_batch) is f32_batch


def test_step_feed_keys_match_loss_assembly():
    """The trainer's per-family feed filter must cover exactly what the
    step's conditional loss assembly reads — a missing key silently drops
    a loss term (make_train_step keys losses on batch membership)."""
    from inbed_pose_estimation_tpu.models.factory import get_spec
    from inbed_pose_estimation_tpu.train.trainer import step_feed_keys

    ks = step_feed_keys(get_spec("cashmrV2"))
    assert "depth_img_uncover" in ks and "ir_img_uncover" not in ks
    assert "mask_uncover" not in ks and "pm_contact" not in ks

    ks = step_feed_keys(get_spec("irhmr"))
    assert "ir_img" in ks and "img" not in ks

    ks = step_feed_keys(get_spec("rec3hmr"))
    assert {"depth_img_uncover", "ir_img_uncover", "pm_img_uncover"} <= ks

    ks = step_feed_keys(get_spec("ir_depth_fusion"))
    assert {"mask_uncover", "ir_img_uncover", "depth_img_uncover"} <= ks

    ks = step_feed_keys(get_spec("bodiesAtRest"))
    assert {"pm_contact", "mask_uncover", "pm_img"} <= ks

    for name in ("cashmrV2", "bodiesAtRest", "ir_depth_fusion"):
        assert {"keypoints", "sample_index", "pixel_noise"} <= step_feed_keys(get_spec(name))
