"""Scatter-splat body-mask rasterizer unit tests (ops/mask_raster.py,
replacing reference models/hmr.py:1697-1739 and neural_renderer)."""

import numpy as np

import jax.numpy as jnp

from inbed_pose_estimation_tpu.ops.mask_raster import (
    render_body_mask,
    splat_points_to_mask,
)


def test_splat_marks_and_dilates():
    xy = jnp.asarray([[[10.4, 20.7], [50.0, 50.0]]])  # one sample, two points
    mask = np.asarray(splat_points_to_mask(xy, 64, 64, dilation=5))[0, :, :, 0]
    # Point centers hit (truncation toward zero like the reference's
    # LongTensor cast).
    assert mask[20, 10] == 1.0
    assert mask[50, 50] == 1.0
    # 5x5 dilation extends 2 pixels out.
    assert mask[22, 12] == 1.0
    assert mask[17, 10] == 0.0  # 3 away -> outside the box
    # Empty regions stay zero.
    assert mask[40, 10] == 0.0


def test_splat_drops_out_of_bounds():
    xy = jnp.asarray([[[-5.0, 3.0], [100.0, 3.0], [3.0, 100.0], [3.0, 3.0]]])
    mask = np.asarray(splat_points_to_mask(xy, 32, 32, dilation=1))[0, :, :, 0]
    assert mask.sum() == 1.0  # only the in-bounds point
    assert mask[3, 3] == 1.0


def test_render_body_mask_covers_projected_body():
    """Vertices centered in front of the camera produce a centered blob."""
    rng = np.random.default_rng(0)
    verts = jnp.asarray(rng.normal(0, 0.2, (2, 500, 3)).astype(np.float32))
    cam = jnp.asarray(np.tile([1.0, 0.0, 0.0], (2, 1)).astype(np.float32))
    mask = np.asarray(render_body_mask(verts, cam, img_res=64))
    assert mask.shape == (2, 64, 64, 1)
    assert 0.0 <= mask.min() and mask.max() <= 1.0
    # Center region covered, far corner empty.
    assert mask[0, 28:36, 28:36].mean() > 0.5
    assert mask[0, :4, :4].sum() == 0.0


def test_part_renderer_zbuffer_and_labels():
    """PartRenderer: front vertices win the z-buffer; labels land in 1..6."""
    import numpy as np

    from inbed_pose_estimation_tpu.render.part_renderer import PartRenderer

    V = 200
    labels = ((np.arange(V) % 6) + 1).astype(np.int32)
    renderer = PartRenderer(render_res=64, num_vertices=V, part_labels=labels)

    rng = np.random.default_rng(0)
    verts = rng.normal(0, 0.15, (1, V, 3)).astype(np.float32)
    cam = np.asarray([[1.0, 0.0, 0.0]], np.float32)
    mask, parts = renderer(jnp.asarray(verts), jnp.asarray(cam))
    mask, parts = np.asarray(mask), np.asarray(parts)
    assert mask.shape == (1, 64, 64)
    assert parts.shape == (1, 64, 64)
    assert mask.max() == 1.0 and mask.min() == 0.0
    assert set(np.unique(parts)).issubset(set(range(7)))
    # Parts only where the mask is on (dilation makes them supersets of the
    # raw splats; compare against the dilated mask).
    assert (parts[mask == 0] == 0).all()


def test_vert2map_drops_out_of_bounds():
    """Off-grid vertices must be dropped, not wrapped: a vertex at x=-1 used
    to paint the far edge via jnp negative-index wrapping (VERDICT Weak #6;
    size-sentinel + mode='drop' idiom)."""
    from inbed_pose_estimation_tpu.ops.vert2map import vert2map

    W = H = 16
    verts = jnp.asarray([[
        [-1.0, 5.0, 0.5],    # off-grid left: would wrap to x=15 with -1 idiom
        [5.0, -3.0, 0.5],    # off-grid top
        [100.0, 5.0, 0.5],   # off-grid right
        [8.0, 8.0, 0.7],     # the only in-bounds vertex
    ]])
    depth, contact = vert2map(verts, width=W, height=H)
    depth = np.asarray(depth)[0]
    contact = np.asarray(contact)[0]
    assert contact[8, 8] == 1.0 and depth[8, 8] > 0
    # No wrapped paint on the far edge / anywhere else outside the
    # in-bounds vertex's 8-neighbor patch region.
    assert contact[5, 15] == 0.0 and contact[13, 5] == 0.0
    inb = np.zeros((H, W), bool)
    inb[7:10, 7:10] = True
    assert contact[~inb].sum() == 0.0
