from .mask_raster import render_body_mask, splat_points_to_mask
from .vert2map import vert2map

__all__ = ["render_body_mask", "splat_points_to_mask", "vert2map"]
