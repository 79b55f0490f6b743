"""Vectorized body-mask rasterization from projected SMPL vertices.

TPU-native replacement for two reference mechanisms:
  * the in-graph per-sample python scatter loop + 5x5 shifted-sum dilation in
    IR_DEPTH_Fusion.get_mask (reference: models/hmr.py:1697-1739), and
  * the neural_renderer CUDA rasterizer used only to produce binary body
    masks for evaluation (reference: utils/part_utils.py:9-54) — the
    reference authors themselves used the scatter splat as the
    differentiable-rasterizer substitute.

Implementation: one batched scatter of vertex splats into a [B, H*W] grid
(out-of-bounds indices dropped, replacing the reference's 500px padding
trick), then a 5x5 max-pool dilation via lax.reduce_window, then an optional
bilinear upsample.  No python loops, fixed shapes, fully jit/vmap/pjit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import FOCAL_LENGTH, IMG_RES
from ..geometry import perspective_projection, weak_perspective_to_cam_t


def splat_points_to_mask(
    xy: jnp.ndarray,
    height: int,
    width: int,
    dilation: int = 5,
) -> jnp.ndarray:
    """Scatter 2D points into a binary mask with box dilation.

    Args:
      xy: [B, N, 2] pixel coordinates (x, y), float; points outside the
        canvas are dropped.
      height, width: output size.
      dilation: box dilation width (odd).
    Returns:
      [B, height, width, 1] float mask in {0, 1}.
    """
    B, N = xy.shape[0], xy.shape[1]
    # The reference splats into a 500px-padded canvas, so points up to
    # dilation//2 px OUTSIDE the output still dilate into its border; a
    # margin-extended canvas reproduces that exactly (points farther out
    # are dropped — the reference would index past its padding there).
    m = dilation // 2
    h2, w2 = height + 2 * m, width + 2 * m
    # Truncation toward zero matches torch .type(LongTensor) used by the
    # reference.
    xi = xy[..., 0].astype(jnp.int32) + m
    yi = xy[..., 1].astype(jnp.int32) + m
    valid = (xi >= 0) & (xi < w2) & (yi >= 0) & (yi < h2)
    flat = yi * w2 + xi
    # Invalid points get an index past the end: mode="drop" discards them
    # (negative indices would WRAP in jnp scatter, silently writing the
    # last pixel).
    flat = jnp.where(valid, flat, h2 * w2)

    canvas = jnp.zeros((B, h2 * w2), dtype=jnp.float32)
    ones = jnp.ones((B, N), dtype=jnp.float32)
    canvas = canvas.at[jnp.arange(B)[:, None], flat].max(ones, mode="drop")
    mask = canvas.reshape(B, h2, w2, 1)

    if dilation > 1:
        mask = jax.lax.reduce_window(
            mask,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(1, dilation, dilation, 1),
            window_strides=(1, 1, 1, 1),
            padding=((0, 0), (m, m), (m, m), (0, 0)),
        )
        mask = jnp.maximum(mask, 0.0)
    if m:
        mask = mask[:, m:-m, m:-m, :]
    return mask


def render_body_mask(
    vertices: jnp.ndarray,
    pred_camera: jnp.ndarray,
    img_res: int = IMG_RES,
    focal_length: float = FOCAL_LENGTH,
    mask_scale: int = 2,
    upsample: bool = True,
) -> jnp.ndarray:
    """SMPL vertices + weak-perspective camera -> [B, img_res, img_res, 1] mask.

    Mirrors models/hmr.py:1697-1739: project all 6890 vertices at half
    resolution, splat, dilate 5x5, binarize, bilinear-upsample to full res.
    """
    B = vertices.shape[0]
    cam_t = weak_perspective_to_cam_t(pred_camera, focal_length, img_res)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=vertices.dtype), (B, 3, 3))
    cc = jnp.zeros((B, 2), dtype=vertices.dtype)
    uv = perspective_projection(vertices, eye, cam_t, focal_length, cc)
    uv = (uv + 0.5 * img_res) / mask_scale

    res = img_res // mask_scale
    mask = splat_points_to_mask(uv, res, res, dilation=5)
    if upsample and mask_scale != 1:
        mask = jax.image.resize(mask, (B, img_res, img_res, 1), method="bilinear")
    return mask
