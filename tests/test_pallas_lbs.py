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
