"""Deterministic synthetic LineString table (transportation-shaped).

Road-like polylines in EPSG:3857 with class / name / precomputed
mercator length — the line analog of sources/polygons.py, modeled on
the transportation layers that dominate the reference's real golden
tile (tests/http/osm_13_4388_2568.mvt, decoded in
tests/expected/debug_mvt_dump.out). The line dim is small and built
driver-side; at scale it would live in Iceberg like any feature table.

`length_merc` is precomputed so LineLabel gating (sql/LineLabel.sql:
18-34) stays pure column math downstream.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from sparktiles.functions import geom as G

ROAD_CLASSES = ["motorway", "trunk", "primary", "secondary"]


def generate_lines(spark: SparkSession, n: int = 64, seed: int = 7) -> DataFrame:
    """n deterministic 4-vertex polylines marching across mercator
    space (each spans several tiles at mid zooms), plus 2 edge-case
    rows with ids >= 10_000: a zero-length degenerate line and a
    MultiLineString."""
    half = 20037508.34278925
    rows = []
    for i in range(n):
        x0 = -half * 0.85 + ((i * 7919 + seed) % 1000) / 1000.0 * 1.7 * half
        y0 = -half * 0.60 + ((i * 104729 + seed) % 1000) / 1000.0 * 1.2 * half
        dx = (((i * 31 + seed) % 17) - 8) * half / 40.0
        dy = (((i * 37 + seed) % 13) - 6) * half / 40.0
        pts = [
            [x0 + k * dx + ((k * i) % 5) * half / 500.0,
             y0 + k * dy - ((k + i) % 7) * half / 700.0]
            for k in range(4)
        ]
        arr = np.array(pts, dtype=float)
        seg = np.diff(arr, axis=0)
        length = float(np.hypot(seg[:, 0], seg[:, 1]).sum())
        rows.append((
            i,
            bytearray(G.wkb_dumps(("LineString", arr), srid=3857)),
            ROAD_CLASSES[i % len(ROAD_CLASSES)],
            f"Road_{i}",
            length,
        ))
    # edge cases: zero-length (LineLabel keeps it at every zoom) and a
    # two-part MultiLineString
    zero = np.array([[1000.0, 2000.0], [1000.0, 2000.0]])
    rows.append((10_000, bytearray(G.wkb_dumps(("LineString", zero), srid=3857)),
                 "service", "Road_zero", 0.0))
    mls = [np.array([[-half / 3, 0.0], [-half / 3 + half / 50, half / 80]]),
           np.array([[half / 3, 0.0], [half / 3 + half / 50, -half / 80]])]
    mlen = float(sum(np.hypot(np.diff(p, axis=0)[:, 0],
                              np.diff(p, axis=0)[:, 1]).sum() for p in mls))
    rows.append((10_001, bytearray(G.wkb_dumps(("MultiLineString", mls), srid=3857)),
                 "trunk", "Road_multi", mlen))
    return spark.createDataFrame(
        rows,
        "line_id long, geom binary, class string, name string, length_merc double",
    )
