"""Batched orthogonal-Procrustes alignment and reconstruction error on device.

Replaces the reference's per-sample numpy loop (utils/pose_utils.py:10-75,
called from eval.py:411-413) with one batched SVD, so PA-MPJPE for a whole
batch is a single XLA computation instead of B host-side SVDs.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_PREC = lax.Precision.HIGHEST


def compute_similarity_transform(S1: jnp.ndarray, S2: jnp.ndarray) -> jnp.ndarray:
    """Align S1 to S2 with a similarity transform (scale, rotation, translation).

    Args:
      S1, S2: [B, N, 3] point sets.
    Returns:
      [B, N, 3] aligned S1.
    """
    # Work in the [B, 3, N] convention of the classic derivation.
    X1 = jnp.swapaxes(S1, -1, -2)
    X2 = jnp.swapaxes(S2, -1, -2)

    mu1 = X1.mean(axis=-1, keepdims=True)
    mu2 = X2.mean(axis=-1, keepdims=True)
    X1c = X1 - mu1
    X2c = X2 - mu2

    var1 = jnp.sum(X1c ** 2, axis=(-1, -2))

    K = jnp.matmul(X1c, jnp.swapaxes(X2c, -1, -2), precision=_PREC)  # [B, 3, 3]
    U, _, Vh = jnp.linalg.svd(K)
    V = jnp.swapaxes(Vh, -1, -2)

    # Fix reflection so det(R) = +1.
    det = jnp.linalg.det(U @ jnp.swapaxes(V, -1, -2))
    Z = jnp.broadcast_to(jnp.eye(3, dtype=S1.dtype), K.shape)
    Z = Z.at[..., -1, -1].multiply(jnp.sign(det))
    R = jnp.matmul(V, jnp.matmul(Z, jnp.swapaxes(U, -1, -2), precision=_PREC), precision=_PREC)

    scale = jnp.trace(jnp.matmul(R, K, precision=_PREC), axis1=-2, axis2=-1) / var1
    t = mu2 - scale[..., None, None] * jnp.matmul(R, mu1, precision=_PREC)
    X1_hat = scale[..., None, None] * jnp.matmul(R, X1, precision=_PREC) + t
    return jnp.swapaxes(X1_hat, -1, -2)


def reconstruction_error(S1: jnp.ndarray, S2: jnp.ndarray, reduction: str | None = "mean") -> jnp.ndarray:
    """Procrustes-aligned mean per-joint error (PA-MPJPE), batched.

    Matches utils/pose_utils.py:67-75 numerically.
    """
    S1_hat = compute_similarity_transform(S1, S2)
    re = jnp.sqrt(jnp.sum((S1_hat - S2) ** 2, axis=-1)).mean(axis=-1)
    if reduction == "mean":
        return re.mean()
    if reduction == "sum":
        return re.sum()
    return re
