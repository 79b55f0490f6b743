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
    # Deliberately-skipped buffers (distinct from unknown keys, which map
    # to None and get reported by convert_torch_state_dict).
    from inbed_pose_estimation_tpu.train.checkpoint import SKIPPED

    assert _map_torch_key("init_pose") is SKIPPED
    assert _map_torch_key("bn1.num_batches_tracked") is SKIPPED
    assert _map_torch_key("totally.unknown.weight") is None


def test_opt_state_flatten_restore_roundtrip():
    """Optimizer state survives checkpointing exactly (VERDICT Missing #1;
    reference persists the Adam dict, utils/saver.py:24-42)."""
    import jax
    import jax.numpy as jnp
    import optax

    from inbed_pose_estimation_tpu.train.checkpoint import (
        flatten_opt_state,
        restore_opt_state,
    )

    params = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
              "b": {"w": jnp.ones((4,), jnp.float32)}}
    tx = optax.adam(1e-3)
    state = tx.init(params)
    # Take a couple of real steps so moments are non-trivial.
    grads = jax.tree_util.tree_map(lambda x: x * 0.1 + 1.0, params)
    for _ in range(3):
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)

    flat = flatten_opt_state(state)
    restored = restore_opt_state(tx.init(params), flat)
    assert restored is not None
    for got, want in zip(jax.tree_util.tree_leaves(restored),
                         jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert int(restored[0].count) == 3

    # Mismatched shapes -> None (weights-only checkpoint keeps fresh init).
    assert restore_opt_state(tx.init({"a": jnp.zeros((5, 5))}), flat) is None
    assert restore_opt_state(tx.init(params), {}) is None


def test_checkpoint_roundtrip_with_opt_state(tmp_path):
    import optax

    from inbed_pose_estimation_tpu.train.checkpoint import (
        flatten_opt_state,
        restore_opt_state,
    )

    variables = _variables()
    tx = optax.adam(1e-3)
    state = tx.init(variables["params"])
    path = save_checkpoint(
        str(tmp_path), variables, opt_state_flat=flatten_opt_state(state),
        epoch=1, batch_idx=0,
    )
    _, opt_flat, _ = load_checkpoint(path)
    assert opt_flat, "opt/ namespace missing from checkpoint"
    restored = restore_opt_state(tx.init(variables["params"]), opt_flat)
    assert restored is not None


def test_torch_adam_state_conversion():
    """torch Adam exp_avg/exp_avg_sq -> optax mu/nu with the weight-layout
    transposes (VERDICT next-round #1; reference utils/saver.py:24-42)."""
    torch = __import__("pytest").importorskip("torch")

    from inbed_pose_estimation_tpu.smpl.assets import mean_params
    from inbed_pose_estimation_tpu.tools.torch_ref import CASHMRTorch
    from inbed_pose_estimation_tpu.train.checkpoint import (
        convert_torch_adam_state,
        convert_torch_state_dict,
    )

    mp = mean_params(None)
    tw = CASHMRTorch(mp["pose"], mp["shape"], mp["cam"], input_dim=6)
    tw.train()
    opt = torch.optim.Adam(tw.parameters(), lr=5e-5)
    x = torch.randn(2, 6, 64, 64)
    for _ in range(2):
        rot, shape, cam, depth = tw(x)
        loss = rot.square().mean() + shape.square().mean() + depth.square().mean()
        opt.zero_grad()
        loss.backward()
        opt.step()

    mu, nu, count = convert_torch_adam_state(tw.state_dict(), opt.state_dict())
    assert count == 2

    # Converted moment trees are shaped exactly like the converted params.
    params = convert_torch_state_dict(tw.state_dict())["params"]

    def flat(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(flat(v, prefix + k + "/"))
            else:
                out[prefix + k] = np.asarray(v)
        return out

    pf, mf, nf = flat(params), flat(mu), flat(nu)
    assert set(mf) == set(pf) and set(nf) == set(pf)
    for k in pf:
        assert mf[k].shape == pf[k].shape, k
        assert (nf[k] >= 0).all(), k  # second moments are nonnegative

    # Spot-check an exact value incl. the conv transpose: conv1.
    st = opt.state_dict()["state"]
    pkeys = [k for k, p in tw.named_parameters()]
    i = pkeys.index("conv1.weight")
    want = st[i]["exp_avg"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(mf["trunk/conv1/kernel"], want)


def test_fusion_decoder_key_mapping():
    """Fusion recovery decoders (dec1/decIR*/decDepth*/decPM*) convert when
    the state dict is fusion-family (encoder_1. prefix present); the same
    decDepth* names in a RECHMR checkpoint keep the inline-Reconstruct
    mapping (reference models/hmr.py:1643-1673 vs 506-533)."""
    from inbed_pose_estimation_tpu.train.checkpoint import _map_torch_key

    # Fusion layout.
    assert _map_torch_key("dec1.0.weight", fusion_decoders=True) == (
        ("feat_up", "conv0"), "kernel", "params")
    assert _map_torch_key("dec1.6.bias", fusion_decoders=True) == (
        ("feat_up", "conv3"), "kernel" if False else "bias", "params")
    assert _map_torch_key("decIR2.0.weight", fusion_decoders=True) == (
        ("recover_ir", "down"), "kernel", "params")
    assert _map_torch_key("decIR2.1.body.4.running_var", fusion_decoders=True) == (
        ("recover_ir", "res_in", "bn1"), "var", "batch_stats")
    assert _map_torch_key("decDepth3.0.weight", fusion_decoders=True) == (
        ("recover_depth", "mix"), "kernel", "params")
    assert _map_torch_key("decDepth3.1.body.0.weight", fusion_decoders=True) == (
        ("recover_depth", "res_mix", "conv0"), "kernel", "params")
    assert _map_torch_key("decDepth3.3.weight", fusion_decoders=True) == (
        ("recover_depth", "proj"), "kernel", "params")
    assert _map_torch_key("decPM3.3.bias", fusion_decoders=True) == (
        ("recover_pm", "proj"), "bias", "params")
    # RECHMR layout (no fusion flag): inline Reconstruct routing.
    assert _map_torch_key("decDepth3.0.weight") == (
        ("reconstruct_depth", "dec3", "reduce"), "kernel", "params")
    assert _map_torch_key("decDepth.4.weight") == (
        ("reconstruct_depth", "proj"), "kernel", "params")


def test_attention_key_mapping():
    """Self_Attn / Cross_Attn query/key/value convs + gamma (reference
    models/hmr.py:1083-1090, 1120-1124) map onto our attention modules."""
    from inbed_pose_estimation_tpu.train.checkpoint import _map_torch_key

    assert _map_torch_key("cross_att.query_conv.weight") == (
        ("cross_att", "query"), "kernel", "params")
    assert _map_torch_key("cross_att.value_conv.bias") == (
        ("cross_att", "value"), "bias", "params")
    assert _map_torch_key("cross_att.gamma") == (("cross_att",), "gamma", "params")


def test_bodies_at_rest_conversion_covers_every_key():
    """A Bodies-At-Rest state dict (reference models/hmr.py:2549-2612)
    converts with zero unmapped keys, and the converted tree loads into our
    BodiesAtRest module (VERDICT r2 Missing #2)."""
    import numpy as np

    from inbed_pose_estimation_tpu.train.checkpoint import convert_torch_state_dict

    rng = np.random.default_rng(0)

    def conv(cin, cout, k):
        return rng.normal(0, 0.05, (cout, cin, k, k)).astype(np.float32)

    state = {}
    for suffix, cin0 in (("", 3), ("_mode2", 4)):
        chans = [(cin0, 192, 7, "0"), (192, 192, 3, "4"),
                 (192, 384, 3, "7"), (384, 384, 3, "10")]
        for cin, cout, k, idx in chans:
            state[f"module.CNN_packtanh{suffix}.{idx}.weight"] = conv(cin, cout, k)
            state[f"module.CNN_packtanh{suffix}.{idx}.bias"] = np.zeros(cout, np.float32)
        state[f"module.CNN_fc1{suffix}.0.weight"] = rng.normal(0, 0.01, (1024, 55296)).astype(np.float32)
        state[f"module.CNN_fc1{suffix}.0.bias"] = np.zeros(1024, np.float32)
        for head, n in (("decpose", 144), ("decshape", 10), ("deccam", 3)):
            state[f"module.{head}{suffix}.weight"] = rng.normal(0, 0.01, (n, 1024)).astype(np.float32)
            state[f"module.{head}{suffix}.bias"] = np.zeros(n, np.float32)

    variables = convert_torch_state_dict(state, on_unmapped="raise")  # no drops

    import jax
    import jax.numpy as jnp

    from inbed_pose_estimation_tpu.models import build_model

    model, _ = build_model("bodiesAtRest")
    init_vars = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), mode="0")
    v2 = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 4)), mode="2")
    full = {"params": {**v2["params"], **init_vars["params"]}}
    flat_init = jax.tree_util.tree_flatten_with_path(full["params"])[0]
    flat_conv = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    # Converted tree covers the exact same paths with the same shapes.
    assert {jax.tree_util.keystr(p) for p, _ in flat_init} == {
        jax.tree_util.keystr(p) for p, _ in flat_conv}
    shapes_init = {jax.tree_util.keystr(p): v.shape for p, v in flat_init}
    for p, v in flat_conv:
        assert v.shape == shapes_init[jax.tree_util.keystr(p)], jax.tree_util.keystr(p)
    # And the module applies with it.
    out = model.apply({"params": variables["params"]},
                      jnp.zeros((1, 224, 224, 3)), mode="0")
    assert np.isfinite(np.asarray(out.rotmat)).all()


def test_unmapped_keys_reported():
    """Unknown keys are never silently dropped (VERDICT r2 Missing #2)."""
    import numpy as np
    import pytest

    from inbed_pose_estimation_tpu.train.checkpoint import convert_torch_state_dict

    state = {"conv1.weight": np.zeros((64, 3, 7, 7), np.float32),
             "mystery_module.weight": np.zeros((4, 4), np.float32)}
    with pytest.raises(ValueError, match="mystery_module.weight"):
        convert_torch_state_dict(state, on_unmapped="raise")
    # Deliberately-skipped buffers are not reported.
    ok = {"conv1.weight": np.zeros((64, 3, 7, 7), np.float32),
          "bn1.num_batches_tracked": np.zeros((), np.int64),
          "init_pose": np.zeros((1, 144), np.float32)}
    convert_torch_state_dict(ok, on_unmapped="raise")


def test_frozen_guided_pt_nests_under_main(tmp_path):
    """load_torch_checkpoint(target_model='ir_depth_pm_fusion') nests the
    converted main-stage tree under 'main' so it can merge into the
    FrozenGuidedFusion variables (ADVICE r2 #3)."""
    import numpy as np

    torch = __import__("pytest").importorskip("torch")

    from inbed_pose_estimation_tpu.train.checkpoint import load_torch_checkpoint

    state = {"module.encoder_1.conv1.weight": torch.zeros(64, 5, 7, 7)}
    path = str(tmp_path / "ref.pt")
    torch.save({"model": state, "epoch": 3}, path)
    variables, meta = load_torch_checkpoint(path, target_model="ir_depth_pm_fusion")
    assert meta["epoch"] == 3
    kernel = variables["params"]["main"]["encoder"]["trunk"]["conv1"]["kernel"]
    assert kernel.shape == (7, 7, 5, 64)
    # Without target_model the tree stays flat.
    flat, _ = load_torch_checkpoint(path)
    assert "encoder" in flat["params"]
