from .mask_raster import render_body_mask, splat_points_to_mask

__all__ = ["render_body_mask", "splat_points_to_mask"]
