"""Deterministic synthetic polygon table (FIXTURES.md §3).

Admin-area polygons in EPSG:3857 covering the synthetic place grid,
plus the reference's geometry edge cases: <=5-point simple polys
(ToPoint centroid branch), a >5-point concave poly (point-on-surface
branch), an invalid bow-tie (MakeValid path), and POLYGON EMPTY.

Polygon WKB is built driver-side (the polygon dim is small — the
reference's ancillary/admin import, import_data.sh:34-50) and
parallelize'd; at scale this table would live in Iceberg like any
other dim.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from sparktiles.functions import geom as G

ADMIN_CLASSES = ["country", "state", "county", "protected_area"]


def _rect(x0, y0, w, h):
    return ("Polygon", [np.array(
        [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]],
        dtype=float)])


def generate_polygons(spark: SparkSession, n_grid: int = 8, seed: int = 42) -> DataFrame:
    """n_grid x n_grid lattice of slightly-jittered rectangles over
    mercator space (non-overlapping), plus 4 edge-case rows with ids
    >= 10_000."""
    half = 20037508.34278925
    rows = []
    cell_w = 2 * half * 0.9 / n_grid
    cell_h = 2 * half * 0.7 / n_grid
    for i in range(n_grid):
        for j in range(n_grid):
            pid = i * n_grid + j
            jx = ((pid * 7919 + seed) % 100) / 100.0 * 0.1 * cell_w
            jy = ((pid * 104729 + seed) % 100) / 100.0 * 0.1 * cell_h
            x0 = -half * 0.9 + i * cell_w + jx
            y0 = -half * 0.7 + j * cell_h + jy
            g = _rect(x0, y0, cell_w * 0.8, cell_h * 0.8)
            rows.append((
                pid,
                bytearray(G.wkb_dumps(g, srid=3857)),
                ADMIN_CLASSES[pid % len(ADMIN_CLASSES)],
                f"Admin_{pid}",
            ))
    # edge cases (reference tests/sql/ToPoint.sql shapes, merc-scaled)
    edge = [
        (10_000, _rect(0.0, 0.0, 1000.0, 1000.0), "simple5pt"),
        (10_001, ("Polygon", [np.array(
            [[50, 5], [10, 8], [10, 10], [100, 190], [150, 30], [150, 10], [50, 5]],
            dtype=float) * 1000.0]), "concave"),
        (10_002, ("Polygon", [np.array(
            [[0, 0], [10, 0], [0, 10], [10, 10], [0, 0]], dtype=float) * 1000.0]),
         "bowtie_invalid"),
        (10_003, ("Polygon", []), "empty"),
    ]
    for pid, g, cls in edge:
        rows.append((pid, bytearray(G.wkb_dumps(g, srid=3857)), cls, f"Edge_{cls}"))
    return spark.createDataFrame(
        rows, "poly_id long, geom binary, admin_class string, name string"
    )
