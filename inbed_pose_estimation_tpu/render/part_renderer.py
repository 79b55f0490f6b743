"""Body mask + part-segmentation rasterizer on device.

Replaces the reference's neural_renderer (CUDA) PartRenderer
(reference: utils/part_utils.py:9-54), which rasterizes the SMPL mesh into
a binary mask and a 6-part segmentation using the cube_parts.npy color-cube
lookup.  Two TPU-native modes, selected by whether `faces` are given:

  * mesh mode (eval path): FILLED-TRIANGLE z-buffer rasterization via
    ops/tri_raster.py — matches the reference's eval mechanism (filled,
    z-buffered triangles, anti_aliasing=False);
  * splat mode (fallback, no faces): per-vertex part labels (from
    cube_parts when available, else a synthetic 6-part split along the
    template's vertical axis) splatted with a z-buffer via segment-min
    scatter.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config, constants
from ..geometry import perspective_projection, weak_perspective_to_cam_t


def vertex_part_labels(num_vertices: int, cube_parts_path: Optional[str] = None,
                       vertices_template: Optional[np.ndarray] = None) -> np.ndarray:
    """[V] int labels in 1..6 (0 is background).

    With the reference's cube_parts.npy asset this reproduces its color-cube
    lookup; otherwise labels split the template into 6 vertical bands."""
    path = cube_parts_path or config.CUBE_PARTS_FILE
    if path and os.path.exists(path) and vertices_template is not None:
        cube = np.load(path)  # [R, R, R] part ids over normalized coords
        v = vertices_template
        norm = (v - v.min(0)) / (v.max(0) - v.min(0) + 1e-9)
        idx = np.clip((norm * (np.array(cube.shape) - 1)).astype(int), 0, np.array(cube.shape) - 1)
        return cube[idx[:, 0], idx[:, 1], idx[:, 2]].astype(np.int32)
    bands = np.linspace(0, 1, 7)
    frac = np.linspace(0, 1, num_vertices)
    return (np.digitize(frac, bands[1:-1]) + 1).astype(np.int32)


class PartRenderer:
    """mask, parts = renderer(vertices, camera) — part_utils.py parity API.

    With `faces` given, masks/parts come from FILLED-TRIANGLE z-buffer
    rasterization (ops/tri_raster.py) like the reference's neural_renderer
    (part_utils.py:18-22, anti_aliasing=False, no dilation); without faces
    it falls back to the dilated vertex point-splat."""

    def __init__(self, focal_length: float = constants.FOCAL_LENGTH,
                 render_res: int = 128, num_vertices: int = constants.NUM_VERTICES,
                 part_labels: Optional[np.ndarray] = None,
                 template: Optional[np.ndarray] = None,
                 faces: Optional[np.ndarray] = None,
                 render_labels: bool = True,
                 tile: Optional[int] = None):
        self.focal_length = focal_length
        self.render_res = render_res
        # Triangle-fill tile: projected face extents scale linearly with
        # render_res (same scene geometry, more pixels), so the default
        # tile grows with it — SMPL's largest projected face at the
        # reference's 128px render is ~5px, giving >3x headroom at every
        # resolution instead of silent under-fill past 16px faces.
        # ops/tri_raster.projected_face_extent measures the true need.
        self.tile = tile if tile is not None else max(16, -(-render_res // 8))
        # render_labels=False (mask-only eval, e.g. slp splits) drops the
        # part-labeling work (barycentric argmax / label scatter) from the
        # jit program entirely — parts come back as zeros.
        self.render_labels = bool(render_labels)
        self.labels = jnp.asarray(
            part_labels if part_labels is not None
            else vertex_part_labels(num_vertices, vertices_template=template)
        )
        self.faces = None if faces is None else np.asarray(faces, np.int32)

        @jax.jit
        def _render_tri(vertices, camera):
            from ..ops.tri_raster import rasterize_mesh_batch

            B = vertices.shape[0]
            res = self.render_res
            cam_t = weak_perspective_to_cam_t(camera, self.focal_length, res)
            eye = jnp.broadcast_to(jnp.eye(3, dtype=vertices.dtype), (B, 3, 3))
            cc = jnp.full((B, 2), res / 2.0, vertices.dtype)
            uvz = perspective_projection(vertices, eye, cam_t, self.focal_length, cc, out_3d=True)
            return rasterize_mesh_batch(
                uvz, self.faces, res,
                labels=self.labels if self.render_labels else None,
                tile=self.tile)

        @jax.jit
        def _render(vertices, camera):
            B, V = vertices.shape[0], vertices.shape[1]
            res = self.render_res
            cam_t = weak_perspective_to_cam_t(camera, self.focal_length, res)
            eye = jnp.broadcast_to(jnp.eye(3, dtype=vertices.dtype), (B, 3, 3))
            cc = jnp.full((B, 2), res / 2.0, vertices.dtype)
            uvz = perspective_projection(vertices, eye, cam_t, self.focal_length, cc, out_3d=True)

            xi = uvz[..., 0].astype(jnp.int32)
            yi = uvz[..., 1].astype(jnp.int32)
            z = uvz[..., 2]
            valid = (xi >= 0) & (xi < res) & (yi >= 0) & (yi < res)
            flat = jnp.where(valid, yi * res + xi, res * res)  # OOB -> dropped (negative would wrap)
            bidx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, V))

            # Z-buffer: nearest vertex per pixel wins.
            zbuf = jnp.full((B, res * res), jnp.inf, vertices.dtype)
            zbuf = zbuf.at[bidx, flat].min(jnp.where(valid, z, jnp.inf), mode="drop")
            hit = jnp.isfinite(zbuf)

            mask = hit.astype(jnp.float32).reshape(B, res, res)
            # 3x3 dilation closes point-splat holes.
            m = jax.lax.reduce_window(
                mask, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1),
                (((0, 0)), (1, 1), (1, 1)),
            )
            if not self.render_labels:
                return jnp.maximum(m, 0.0), jnp.zeros((B, res, res), jnp.int32)

            # Scatter labels of depth-winning vertices (within epsilon).
            win = jnp.abs(z - zbuf[bidx, flat]) < 1e-4
            lab = jnp.broadcast_to(self.labels[None, :], (B, V))
            parts = jnp.zeros((B, res * res), jnp.int32)
            parts = parts.at[bidx, flat].max(
                jnp.where(valid & win, lab, 0), mode="drop"
            )
            p = jax.lax.reduce_window(
                parts.reshape(B, res, res).astype(jnp.float32), -jnp.inf, jax.lax.max,
                (1, 3, 3), (1, 1, 1), ((0, 0), (1, 1), (1, 1)),
            )
            return jnp.maximum(m, 0.0), jnp.maximum(p, 0.0).astype(jnp.int32)

        self._render = _render_tri if self.faces is not None else _render

    def __call__(self, vertices, camera) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self._render(jnp.asarray(vertices), jnp.asarray(camera))
