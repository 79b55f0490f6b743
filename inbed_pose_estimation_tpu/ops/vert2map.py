"""Vertex -> pressure-taxel depth/contact map rasterizer.

TPU-native re-design of the reference's Bodies-At-Rest-style `vert2map`
(reference: utils/geometry.py:185-340).  The reference version sorts the
vertex list per sample with torch.unique inside a python loop ("this takes
the most time", geometry.py:247) and is riddled with debug prints/plots; the
underlying computation is:
  1. bin vertices into a WxH taxel grid, keeping the minimum depth per cell,
  2. patch empty cells with the 8-neighbor average of occupied cells,
  3. derive the binary contact map.
Here that is one batched scatter-min + one 3x3 reduce_window — fully
jit/vmap-safe with static shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def vert2map(
    verts_taxel: jnp.ndarray,
    width: int = 112,
    height: int = 112,
    depth_scale: float = 0.0286,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rasterize vertices (taxel coordinates) into depth + contact maps.

    Args:
      verts_taxel: [B, V, 3] vertices with x/y already in taxel units and z
        the height above the pressure mat.
      width, height: taxel grid size.
      depth_scale: z quantization scale matching the reference's 0.0286
        (geometry.py:287).
    Returns:
      (depth_map [B, height, width], contact [B, height, width]).
    """
    B, V = verts_taxel.shape[0], verts_taxel.shape[1]
    x = verts_taxel[..., 0].astype(jnp.int32)
    y = verts_taxel[..., 1].astype(jnp.int32)
    z = verts_taxel[..., 2]

    valid = (x >= 0) & (x < width) & (y >= 0) & (y < height)
    # OOB sentinel is `size` (one past the end), NOT -1: negative indices
    # WRAP in jnp scatter and would silently paint the row's far edge; the
    # out-of-range sentinel is dropped by mode="drop" (same idiom as
    # ops/mask_raster.py / render/part_renderer.py).
    flat = jnp.where(valid, y * width + x, height * width)
    bidx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, V))

    # Min depth per taxel.
    depth = jnp.full((B, height * width), jnp.inf, verts_taxel.dtype)
    depth = depth.at[bidx, flat].min(jnp.where(valid, z, jnp.inf), mode="drop")
    occupied = jnp.isfinite(depth)
    depth = jnp.where(occupied, depth, 0.0).reshape(B, height, width)
    occ = occupied.astype(verts_taxel.dtype).reshape(B, height, width)

    # Hole patching: fill empty cells with the mean of occupied 8-neighbors
    # (geometry.py:292-310's shifted-sum/8 patching, without the bugs).
    ksum = lambda a: jax.lax.reduce_window(
        a, 0.0, jax.lax.add, (1, 3, 3), (1, 1, 1), ((0, 0), (1, 1), (1, 1))
    )
    neigh_depth = ksum(depth) - depth
    neigh_count = ksum(occ) - occ
    patched = jnp.where(
        (occ == 0) & (neigh_count > 0), neigh_depth / jnp.maximum(neigh_count, 1), depth
    )
    filled = jnp.maximum(occ, jnp.where((occ == 0) & (neigh_count > 0), 1.0, 0.0))

    depth_map = patched * depth_scale
    contact = filled
    return depth_map, contact
