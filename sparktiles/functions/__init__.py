"""Scalar function library: tile math, reference scalar semantics,
pure-numpy geometry kernels, text/language kernels.

Everything that can be a Catalyst column expression IS one (JVM-side,
whole-stage-codegen'd); only per-codepoint / per-vertex work drops into
vectorized pandas UDFs.
"""

from sparktiles.functions.tilemath import (  # noqa: F401
    WORLD_MERC_WIDTH,
    zres,
    zres_expr,
    zoom_from_scale,
    zoom_from_scale_expr,
    tile_bbox,
    tile_bbox_exprs,
    buffered_tile_bbox_exprs,
    pixel_width,
    lonlat_to_tile_exprs,
    deg2num,
    mercator_x_expr,
    mercator_y_expr,
    lonlat_to_mercator,
    quadkey_expr,
    cell_id_expr,
    cell_id,
)
