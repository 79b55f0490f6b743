"""Pallas TPU kernel for the LBS skinning application.

The skinning step — for every vertex, blend the 24 joint affines by the
skinning weights and apply to the posed vertex:
    out_v = (sum_j W[v,j] A_rot[b,j]) @ v_posed[v] + sum_j W[v,j] A_t[b,j]
is the hottest SMPL op (LBS runs >= 5x per training step: gt, opt,
per-cascade-stage, pred, and inside every SMPLify iteration — SURVEY.md
§3.1).  The naive einsum formulation materializes the blended rotations
R_blend [B, V, 3, 3] (~25 MB at batch 32) in HBM between contractions; this
kernel keeps everything in VMEM: one pass over vertex tiles accumulating the
24 weighted rotate+translate applications on the VPU, so HBM traffic is just
v_posed in + vertices out + the weights.

Layout: vertices travel as [B, 3, Vpad] (coordinates on the sublane axis,
vertices on the 128-lane axis); weights as [24, Vpad]; the per-joint affines
as an SMEM scalar block [24 * 12].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_V = 512


def _skin_kernel(aff_ref, v_ref, w_ref, out_ref):
    """One (batch, vertex-tile) block.

    aff_ref:  SMEM [24, 12] — per-joint [r00..r22, t0, t1, t2] for this batch.
    v_ref:    VMEM [3, TILE_V] posed vertices (x; y; z rows).
    w_ref:    VMEM [24, TILE_V] skinning weights.
    out_ref:  VMEM [3, TILE_V].
    """
    x = v_ref[0, :]
    y = v_ref[1, :]
    z = v_ref[2, :]

    acc_x = jnp.zeros_like(x)
    acc_y = jnp.zeros_like(y)
    acc_z = jnp.zeros_like(z)
    for j in range(24):
        w = w_ref[j, :]
        r00, r01, r02 = aff_ref[j, 0], aff_ref[j, 1], aff_ref[j, 2]
        r10, r11, r12 = aff_ref[j, 3], aff_ref[j, 4], aff_ref[j, 5]
        r20, r21, r22 = aff_ref[j, 6], aff_ref[j, 7], aff_ref[j, 8]
        t0, t1, t2 = aff_ref[j, 9], aff_ref[j, 10], aff_ref[j, 11]
        acc_x = acc_x + w * (r00 * x + r01 * y + r02 * z + t0)
        acc_y = acc_y + w * (r10 * x + r11 * y + r12 * z + t1)
        acc_z = acc_z + w * (r20 * x + r21 * y + r22 * z + t2)

    out_ref[0, :] = acc_x
    out_ref[1, :] = acc_y
    out_ref[2, :] = acc_z


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def skinning(
    v_posed: jnp.ndarray,
    lbs_weights: jnp.ndarray,
    A_rot: jnp.ndarray,
    A_t: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Blend-skin posed vertices.

    verts[b,v] = sum_j W[v,j] (A_rot[b,j] @ v_posed[b,v] + A_t[b,j])

    Forward runs the fused Pallas kernel; the op is bilinear, so the custom
    VJP below is closed-form einsums (standard XLA ops) — gradients flow
    through SMPLify's scanned optimizer and the training losses.

    Args:
      v_posed: [B, V, 3].
      lbs_weights: [V, 24].
      A_rot: [B, 24, 3, 3] joint rotations (rest-pose corrected).
      A_t: [B, 24, 3] joint translations.
    Returns:
      [B, V, 3] skinned vertices (numerically == the einsum path, f32).
    """
    return _skinning_fwd_impl(v_posed, lbs_weights, A_rot, A_t, interpret)


def _skinning_fwd_impl(v_posed, lbs_weights, A_rot, A_t, interpret):
    B, V = v_posed.shape[0], v_posed.shape[1]
    Vpad = -(-V // TILE_V) * TILE_V

    vt = jnp.swapaxes(v_posed.astype(jnp.float32), 1, 2)  # [B, 3, V]
    vt = jnp.pad(vt, ((0, 0), (0, 0), (0, Vpad - V)))
    wt = jnp.pad(jnp.swapaxes(lbs_weights.astype(jnp.float32), 0, 1),
                 ((0, 0), (0, Vpad - V)))  # [24, Vpad]
    aff = jnp.concatenate(
        [A_rot.reshape(B, 24, 9), A_t.reshape(B, 24, 3)], axis=-1
    ).astype(jnp.float32)  # [B, 24, 12]

    grid = (B, Vpad // TILE_V)
    out = pl.pallas_call(
        _skin_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, 24, 12), lambda b, v: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 3, TILE_V), lambda b, v: (b, 0, v), memory_space=pltpu.VMEM),
            pl.BlockSpec((24, TILE_V), lambda b, v: (0, v), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 3, TILE_V), lambda b, v: (b, 0, v), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, Vpad), jnp.float32),
        interpret=interpret,
    )(aff, vt, wt)
    return jnp.swapaxes(out, 1, 2)[:, :V, :]


_PREC = jax.lax.Precision.HIGHEST


def _skinning_fwd(v_posed, lbs_weights, A_rot, A_t, interpret):
    out = _skinning_fwd_impl(v_posed, lbs_weights, A_rot, A_t, interpret)
    return out, (v_posed, lbs_weights, A_rot, A_t)


def _skinning_bwd(interpret, residuals, g):
    """Closed-form cotangents of the bilinear skinning op."""
    v_posed, W, A_rot, A_t = residuals
    # d v_posed[b,v,n] = sum_j W[v,j] A_rot[b,j,m,n] g[b,v,m]
    R_blend = jnp.einsum("vj,bjmn->bvmn", W, A_rot, precision=_PREC)
    d_v = jnp.einsum("bvmn,bvm->bvn", R_blend, g, precision=_PREC)
    # d A_rot[b,j,m,n] = sum_v W[v,j] g[b,v,m] v_posed[b,v,n]
    d_rot = jnp.einsum("vj,bvm,bvn->bjmn", W, g, v_posed, precision=_PREC)
    # d A_t[b,j,m] = sum_v W[v,j] g[b,v,m]
    d_t = jnp.einsum("vj,bvm->bjm", W, g, precision=_PREC)
    # d W[v,j] = sum_{b,m} g[b,v,m] (A_rot[b,j] @ v + A_t[b,j])[m]
    # (3-operand einsum lets XLA pick the cheapest contraction order).
    d_W = jnp.einsum("bvm,bjmn,bvn->vj", g, A_rot, v_posed, precision=_PREC) + jnp.einsum(
        "bvm,bjm->vj", g, A_t, precision=_PREC
    )
    return d_v, d_W, d_rot, d_t


skinning.defvjp(_skinning_fwd, _skinning_bwd)
