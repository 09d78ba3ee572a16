"""Generalized tables + geometry DataFrame ops (S3/G5/G9/P7/G11).

The reference materializes simplified copies of feature tables with
imposm `generalized_tables` (tolerance = ZRESnn meters,
openmaptiles/imposm.py:29-51) and uses ToPoint/ST_Simplify in layer SQL.
Here: WKB-in/WKB-out mapInPandas kernels over the pure-numpy geometry
library, plus a zoom-band materializer that writes one simplified copy
per band (build once, reuse for a zoom range — SURVEY §4).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparktiles.functions import geom as G
from sparktiles.functions.tilemath import zres


def _wkb_map(df: DataFrame, geom_col: str, fn, out_col: str | None = None,
             out_type: str = "binary") -> DataFrame:
    """Apply geometry->geometry/scalar fn over a WKB column (Arrow
    batches; None-safe)."""
    out_col = out_col or geom_col
    fields = [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema
              if f.name != out_col]
    schema = ", ".join(fields + [f"`{out_col}` {out_type}"])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = []
            for b in pdf[geom_col]:
                if b is None:
                    vals.append(None)
                    continue
                vals.append(fn(G.wkb_loads(bytes(b))))
            out = pdf.drop(columns=[out_col], errors="ignore")
            out[out_col] = vals
            yield out

    return df.mapInPandas(run, schema)


def simplify_table(df: DataFrame, tolerance_m: float, geom_col: str = "geom") -> DataFrame:
    """ST_Simplify(geom, tol) over a table (G9). Degenerate results
    (collapsed rings) become NULL geometries; callers filter."""

    def fn(g):
        s = G.simplify(g, tolerance_m)
        return None if G.is_empty(s) else bytearray(G.wkb_dumps(s, srid=3857))

    return _wkb_map(df, geom_col, fn)


def generalized_tables(
    df: DataFrame, out_dir: str, bands: dict[str, int],
    geom_col: str = "geom", sql_filter=None,
) -> dict[str, str]:
    """Materialize one simplified copy per zoom band (S3): bands maps
    name -> ZRES zoom (tolerance = zres(z) meters, reference
    imposm.py:34-45). Returns {name: path}. At cluster scale each write
    is an Iceberg table the layer queries read for their zoom range."""
    paths = {}
    for name, z in bands.items():
        out = simplify_table(df, zres(z), geom_col)
        if sql_filter is not None:
            out = out.where(sql_filter)
        out = out.where(F.col(geom_col).isNotNull())
        path = f"{out_dir}/{name}"
        out.write.mode("overwrite").parquet(path)
        paths[name] = path
    return paths


def to_point_table(df: DataFrame, geom_col: str = "geom",
                   out_col: str = "geom_label") -> DataFrame:
    """ToPoint(geom) per row (G5): label-placement points."""

    def fn(g):
        pt = G.to_point(g)
        return None if pt is None else bytearray(G.wkb_dumps(("Point", pt), srid=3857))

    return _wkb_map(df, geom_col, fn, out_col)


def geometry_stats(df: DataFrame, geom_col: str = "geom") -> DataFrame:
    """Debug introspection (G11/P7): type, npoints, validity, bbox,
    area/length — the debug-mvt column set (bin/debug-mvt:178-204)."""
    fields = [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema]
    schema = ", ".join(fields + [
        "geom_type string", "n_points int", "is_valid boolean",
        "area double", "length double",
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            t, n, v, a, ln = [], [], [], [], []
            for b in pdf[geom_col]:
                if b is None:
                    t.append(None); n.append(None); v.append(None)
                    a.append(None); ln.append(None)
                    continue
                g = G.wkb_loads(bytes(b))
                t.append(g[0]); n.append(G.n_points(g)); v.append(G.is_valid(g))
                a.append(G.area(g)); ln.append(G.length(g))
            out = pdf.copy()
            out["geom_type"] = t; out["n_points"] = n; out["is_valid"] = v
            out["area"] = a; out["length"] = ln
            yield out

    return df.mapInPandas(run, schema)
