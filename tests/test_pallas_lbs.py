"""Pallas skinning kernel: interpret-mode parity vs the einsum path, and
vert2map rasterizer behavior."""

import numpy as np

import jax
import jax.numpy as jnp

from inbed_pose_estimation_tpu.geometry import batch_rodrigues
from inbed_pose_estimation_tpu.ops.pallas_lbs import skinning
from inbed_pose_estimation_tpu.ops.vert2map import vert2map


def test_pallas_skinning_matches_einsum():
    rng = np.random.default_rng(0)
    B, V = 2, 700  # non-multiple of the 512 tile to exercise padding
    v_posed = rng.normal(0, 0.3, (B, V, 3)).astype(np.float32)
    W = rng.dirichlet(np.ones(24), size=V).astype(np.float32)
    aa = rng.normal(0, 0.4, (B * 24, 3)).astype(np.float32)
    A_rot = np.asarray(batch_rodrigues(jnp.asarray(aa))).reshape(B, 24, 3, 3)
    A_t = rng.normal(0, 0.2, (B, 24, 3)).astype(np.float32)

    ref_R = np.einsum("vj,bjmn->bvmn", W, A_rot)
    ref_t = np.einsum("vj,bjm->bvm", W, A_t)
    ref = np.einsum("bvmn,bvn->bvm", ref_R, v_posed) + ref_t

    out = np.asarray(
        skinning(jnp.asarray(v_posed), jnp.asarray(W), jnp.asarray(A_rot),
                 jnp.asarray(A_t), interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_vert2map_basic():
    # Two vertices in one cell -> min depth wins; a neighbor hole is patched.
    verts = jnp.asarray(
        [[[5.2, 5.7, 2.0], [5.4, 5.1, 1.0], [50.0, 50.0, 3.0]]], jnp.float32
    )
    depth, contact = vert2map(verts, width=64, height=64, depth_scale=1.0)
    depth, contact = np.asarray(depth[0]), np.asarray(contact[0])
    assert depth[5, 5] == 1.0  # min of the two depths
    assert contact[5, 5] == 1.0
    assert contact[50, 50] == 1.0
    # Hole next to an occupied cell is patched with the neighbor average.
    assert contact[5, 6] == 1.0
    assert depth[5, 6] == 1.0
    # Far-away empty area stays empty.
    assert contact[20, 20] == 0.0
    assert depth[20, 20] == 0.0


def test_pallas_skinning_custom_vjp_matches_einsum_grads():
    """Gradients through the pallas skinning (custom VJP) match the
    einsum-path gradients for all four inputs."""
    rng = np.random.default_rng(1)
    B, V = 2, 300
    v_posed = jnp.asarray(rng.normal(0, 0.3, (B, V, 3)).astype(np.float32))
    W = jnp.asarray(rng.dirichlet(np.ones(24), size=V).astype(np.float32))
    aa = rng.normal(0, 0.4, (B * 24, 3)).astype(np.float32)
    A_rot = batch_rodrigues(jnp.asarray(aa)).reshape(B, 24, 3, 3)
    A_t = jnp.asarray(rng.normal(0, 0.2, (B, 24, 3)).astype(np.float32))
    target = jnp.asarray(rng.normal(0, 1, (B, V, 3)).astype(np.float32))

    def loss_pallas(v, w, r, t):
        return jnp.sum((skinning(v, w, r, t, True) - target) ** 2)

    def loss_einsum(v, w, r, t):
        Rb = jnp.einsum("vj,bjmn->bvmn", w, r)
        tb = jnp.einsum("vj,bjm->bvm", w, t)
        out = jnp.einsum("bvmn,bvn->bvm", Rb, v) + tb
        return jnp.sum((out - target) ** 2)

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(v_posed, W, A_rot, A_t)
    g_e = jax.grad(loss_einsum, argnums=(0, 1, 2, 3))(v_posed, W, A_rot, A_t)
    for a, b in zip(g_p, g_e):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)
