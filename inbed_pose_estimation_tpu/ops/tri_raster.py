"""Filled-triangle z-buffer mesh rasterization as a scatter kernel.

The reference's eval-time masks/parts come from neural_renderer (CUDA
triangle rasterization, reference: utils/part_utils.py:13-54, eval.py:418).
TPU-native equivalent: each face tests a bounded tile of pixels around its
bbox corner with barycentric edge functions and scatter-min's interpolated
depth into a z-buffer — no dynamic shapes, no host loop, vectorized over
faces, sequential over the batch (lax.map) to bound memory at
F x tile^2 per sample.

Coverage note: a face larger than `tile` pixels would be under-filled, so
the mesh's projected vertices are additionally splatted (their depth is on
the surface, so the z-buffer stays correct); at eval scale (SMPL's 13776
faces over a ~150px body) faces are a few pixels and the tile covers them
fully.  Callers that rasterize at other resolutions should scale the tile
with the resolution (render.part_renderer.PartRenderer does this
automatically) — `projected_face_extent` reports the actual requirement
for a given projection so tests/tools can validate coverage.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rasterize_sample(
    uvz: jnp.ndarray,      # [V, 3] pixel-space x, y + camera-space depth z
    faces: jnp.ndarray,    # [F, 3] int vertex ids
    res: int,
    labels: Optional[jnp.ndarray] = None,  # [V] int part labels (1..P)
    tile: int = 16,
    z_eps: float = 1e-3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (mask [res,res] float32, parts [res,res] int32).

    Pixel sample points are integer coordinates (matching the projection
    convention of the point-splat rasterizers).  Winding-invariant; the
    per-pixel part label comes from the max-barycentric vertex of the
    depth-winning face (approximating neural_renderer's interpolated vertex
    texture + round, part_utils.py:28-36).
    """
    tri = uvz[faces]                       # [F, 3(corner), 3(xyz)]
    x = tri[..., 0]
    y = tri[..., 1]
    z = tri[..., 2]

    xmin = jnp.floor(x.min(axis=1)).astype(jnp.int32)   # [F]
    ymin = jnp.floor(y.min(axis=1)).astype(jnp.int32)

    offs = jnp.arange(tile, dtype=jnp.int32)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    ox = ox.reshape(-1)                    # [T2]
    oy = oy.reshape(-1)

    px = xmin[:, None] + ox[None, :]       # [F, T2] int
    py = ymin[:, None] + oy[None, :]
    pxf = px.astype(uvz.dtype)
    pyf = py.astype(uvz.dtype)

    x0, y0 = x[:, 0, None], y[:, 0, None]
    x1, y1 = x[:, 1, None], y[:, 1, None]
    x2, y2 = x[:, 2, None], y[:, 2, None]

    # Edge functions (twice signed area); wi/denom are barycentrics.
    w0 = (x2 - x1) * (pyf - y1) - (y2 - y1) * (pxf - x1)
    w1 = (x0 - x2) * (pyf - y2) - (y0 - y2) * (pxf - x2)
    w2 = (x1 - x0) * (pyf - y0) - (y1 - y0) * (pxf - x0)
    denom = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)  # [F, 1]

    sgn = jnp.sign(denom)
    inside = (w0 * sgn >= 0) & (w1 * sgn >= 0) & (w2 * sgn >= 0) & (denom != 0)

    b0 = w0 / jnp.where(denom == 0, 1.0, denom)
    b1 = w1 / jnp.where(denom == 0, 1.0, denom)
    b2 = w2 / jnp.where(denom == 0, 1.0, denom)
    zpix = b0 * z[:, 0, None] + b1 * z[:, 1, None] + b2 * z[:, 2, None]

    inbounds = (px >= 0) & (px < res) & (py >= 0) & (py < res)
    valid = inside & inbounds & (zpix > 0)
    flat = jnp.where(valid, py * res + px, res * res)  # OOB sentinel -> drop

    zbuf = jnp.full((res * res,), jnp.inf, uvz.dtype)
    zbuf = zbuf.at[flat.reshape(-1)].min(
        jnp.where(valid, zpix, jnp.inf).reshape(-1), mode="drop"
    )

    # Vertex splat: closes holes of any face larger than the tile.
    vx = uvz[:, 0].astype(jnp.int32)
    vy = uvz[:, 1].astype(jnp.int32)
    vz = uvz[:, 2]
    vvalid = (vx >= 0) & (vx < res) & (vy >= 0) & (vy < res) & (vz > 0)
    vflat = jnp.where(vvalid, vy * res + vx, res * res)
    zbuf = zbuf.at[vflat].min(jnp.where(vvalid, vz, jnp.inf), mode="drop")

    mask = jnp.isfinite(zbuf)

    if labels is None:
        return mask.astype(jnp.float32).reshape(res, res), jnp.zeros(
            (res, res), jnp.int32
        )

    # Parts: label of the max-barycentric corner of each depth-winning
    # fragment (ties across faces resolve by max label, deterministic).
    face_lab = labels[faces]               # [F, 3]
    bmax = jnp.argmax(jnp.stack([b0, b1, b2], axis=-1), axis=-1)  # [F, T2]
    pix_lab = jnp.take_along_axis(
        face_lab[:, None, :], bmax[..., None], axis=-1
    )[..., 0]                              # [F, T2]
    win = valid & (jnp.abs(zpix - zbuf[flat]) < z_eps)
    parts = jnp.zeros((res * res,), jnp.int32)
    parts = parts.at[flat.reshape(-1)].max(
        jnp.where(win, pix_lab, 0).reshape(-1), mode="drop"
    )
    vwin = vvalid & (jnp.abs(vz - zbuf[vflat]) < z_eps)
    parts = parts.at[vflat].max(jnp.where(vwin, labels, 0), mode="drop")

    parts = parts * mask.astype(jnp.int32)  # parts *= mask (part_utils.py:34)
    return mask.astype(jnp.float32).reshape(res, res), parts.reshape(res, res)


def projected_face_extent(uvz: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Max projected per-face bbox span in pixels (scalar, batch-max).

    A `rasterize_sample(tile=T)` call fully fills every face whose extent
    is < T (the tile anchors at floor(min corner)); faces at or beyond T
    are only vertex-splatted.  uvz: [..., V, 3]."""
    tri = jnp.take(uvz, faces, axis=-2)          # [..., F, 3, 3]
    span_x = tri[..., 0].max(axis=-1) - tri[..., 0].min(axis=-1)
    span_y = tri[..., 1].max(axis=-1) - tri[..., 1].min(axis=-1)
    return jnp.maximum(span_x, span_y).max()


def rasterize_mesh_batch(
    uvz: jnp.ndarray,      # [B, V, 3]
    faces,
    res: int,
    labels=None,
    tile: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sequential (lax.map) batch wrapper: peak memory stays F*tile^2."""
    faces = jnp.asarray(np.asarray(faces), jnp.int32)
    lab = None if labels is None else jnp.asarray(labels)

    def one(u):
        return rasterize_sample(u, faces, res, labels=lab, tile=tile)

    return jax.lax.map(one, uvz)
