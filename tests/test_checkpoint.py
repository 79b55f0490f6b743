"""Checkpoint format tests: save/load round-trip, latest discovery,
metadata (dataset_perm / step) preservation — the reference's resume
semantics (SURVEY.md §5.4)."""

import numpy as np

from inbed_pose_estimation_tpu.train.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)


def _variables():
    rng = np.random.default_rng(0)
    return {
        "params": {
            "trunk": {"conv1": {"kernel": rng.normal(size=(7, 7, 6, 64)).astype(np.float32)}},
            "head": {"fc1": {"kernel": rng.normal(size=(2205, 1024)).astype(np.float32),
                             "bias": np.zeros(1024, np.float32)}},
        },
        "batch_stats": {"trunk": {"bn1": {"mean": np.zeros(64), "var": np.ones(64)}}},
    }


def test_save_load_roundtrip(tmp_path):
    variables = _variables()
    perm = np.random.default_rng(1).permutation(100)
    path = save_checkpoint(
        str(tmp_path), variables,
        metadata={"dataset_perm": perm, "total_step_count": 123, "batch_size": 32},
        epoch=7, batch_idx=42,
    )
    loaded, opt_flat, meta = load_checkpoint(path)
    np.testing.assert_array_equal(
        loaded["params"]["trunk"]["conv1"]["kernel"],
        variables["params"]["trunk"]["conv1"]["kernel"],
    )
    np.testing.assert_array_equal(
        loaded["batch_stats"]["trunk"]["bn1"]["var"],
        variables["batch_stats"]["trunk"]["bn1"]["var"],
    )
    assert meta["epoch"] == 7 and meta["batch_idx"] == 42
    assert meta["total_step_count"] == 123
    np.testing.assert_array_equal(np.asarray(meta["dataset_perm"]), perm)


def test_latest_checkpoint_discovery(tmp_path):
    variables = _variables()
    save_checkpoint(str(tmp_path), variables, epoch=1, batch_idx=0)
    save_checkpoint(str(tmp_path), variables, epoch=2, batch_idx=100)
    save_checkpoint(str(tmp_path), variables, epoch=2, batch_idx=50)
    latest = latest_checkpoint(str(tmp_path))
    assert latest.endswith("epoch_2_100.npz")
    assert latest_checkpoint(str(tmp_path / "nope")) is None


def test_torch_key_mapping_families():
    from inbed_pose_estimation_tpu.train.checkpoint import _map_torch_key

    # HMRCore family.
    assert _map_torch_key("conv1.weight") == (("trunk", "conv1"), "kernel", "params")
    assert _map_torch_key("layer2.1.bn3.running_mean") == (
        ("trunk", "layer2", "block1", "bn3"), "mean", "batch_stats")
    assert _map_torch_key("layer1.0.downsample.0.weight") == (
        ("trunk", "layer1", "block0", "downsample_conv"), "kernel", "params")
    assert _map_torch_key("decpose.bias") == (("head", "decpose"), "bias", "params")
    assert _map_torch_key("Reconstruct_depth.decDepth3.1.body.4.weight") == (
        ("reconstruct_depth", "dec3", "res", "bn1"), "scale", "params")
    assert _map_torch_key("Reconstruct_depth.decDepth.4.weight") == (
        ("reconstruct_depth", "proj"), "kernel", "params")
    # Fusion encoder prefix.
    assert _map_torch_key("encoder_1.fc1.weight") == (
        ("encoder", "head", "fc1"), "kernel", "params")
    # Multi-trunk prefix.
    assert _map_torch_key("feat_extraction_depth.layer4.2.conv2.weight") == (
        ("trunk2", "layer4", "block2", "conv2"), "kernel", "params")
    # Ignored keys.
    assert _map_torch_key("init_pose") is None
    assert _map_torch_key("bn1.num_batches_tracked") is None
