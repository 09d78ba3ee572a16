"""Deep multi-layer build: the single-shuffle 3-layer spine at depth.

bench.py's 3-layer leg stops at z8 and the z0-z14 deep bench
(tools/deep_pyramid_bench.py) is points-only; this tool proves the
round-5 fused multi-layer spine (one zxy exchange for point + WKB
line + WKB polygon layers, per-layer dictionary encode + ordered
concat + gzip + md5 in one grouped pass) survives the depth where
line/polygon supercover fan-out dominates: every zoom doubles a
world-crossing line's tile path, so z12 line rows are ~16x the z8
build bench.py times.

Runs the FAITHFUL MID_ZOOM impute loop (plans/pipeline.TileBuild
.build — the reference driver's shape, bin/generate-tiles:48-49) and
reports per-zoom map rows / non-empty tiles / wall, plus layer-row
counts so the line-vs-point mix is visible.

env: MLDEEP_PAGES (default 200000), MLDEEP_LINES (2000),
     MLDEEP_GRID (24), MLDEEP_MAXZ (12), MLDEEP_MIDZ (7),
     SPARK_GRAFT_CPUS (32), MLDEEP_GZIP (6)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("SPARK_DRIVER_MEM", "32g")

N_PAGES = int(os.environ.get("MLDEEP_PAGES", "200000"))
N_LINES = int(os.environ.get("MLDEEP_LINES", "2000"))
N_GRID = int(os.environ.get("MLDEEP_GRID", "24"))
MAXZ = int(os.environ.get("MLDEEP_MAXZ", "12"))
MIDZ = int(os.environ.get("MLDEEP_MIDZ", "7"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
GZIP = int(os.environ.get("MLDEEP_GZIP", "6"))


def main():
    from sparktiles.operators.mvt import LayerSpec
    from sparktiles.plans.pipeline import BuildConfig, TileBuild
    from sparktiles.session import get_spark
    from sparktiles.sources.geoparse import build_features
    from sparktiles.sources.lines import generate_lines
    from sparktiles.sources.pages import generate_pages
    from sparktiles.sources.polygons import generate_polygons

    spark = get_spark("ml-deep-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    base = "/dev/shm" if Path("/dev/shm").exists() else None
    store = tempfile.mkdtemp(prefix="sparktiles_mldeep_", dir=base)
    out = {"n_pages": N_PAGES, "n_lines": N_LINES, "n_grid": N_GRID,
           "maxzoom": MAXZ, "mid_zoom": MIDZ, "cpus": CPUS,
           "gzip_level": GZIP}
    try:
        pages = generate_pages(spark, N_PAGES).repartition(64).cache()
        pages.count()
        feats = build_features(pages).cache()
        out["n_point_features"] = feats.count()
        lines = generate_lines(spark, n=N_LINES).withColumnRenamed(
            "line_id", "feature_id").cache()
        polys = generate_polygons(spark, n_grid=N_GRID).withColumnRenamed(
            "poly_id", "feature_id").cache()
        out["n_line_features"] = lines.count()
        out["n_poly_features"] = polys.count()

        frames = [
            (LayerSpec(layer_id="place", index=0,
                       attr_fields={"name": "string"}, buffer_px=8), feats),
            (LayerSpec(layer_id="transportation", index=1,
                       attr_fields={"class": "string", "name": "string"},
                       buffer_px=4, geometry_kind="wkb"), lines),
            (LayerSpec(layer_id="boundary", index=2,
                       attr_fields={"admin_class": "string",
                                    "name": "string"},
                       buffer_px=4, geometry_kind="wkb"), polys),
        ]
        b = TileBuild(spark, frames, BuildConfig(
            store_dir=store, minzoom=0, maxzoom=MAXZ, mid_zoom=MIDZ,
            gzip_level=GZIP))
        t0 = time.time()
        summary = b.build()
        out["build_wall_s"] = round(time.time() - t0, 2)
        out["map_rows_total"] = summary["tiles"]
        out["map_rows_per_s"] = summary["tiles_per_s"]
        out["zooms"] = summary["zooms"]
        nonempty = sum(z["n_nonempty"] for z in summary["zooms"])
        out["nonempty_tiles"] = nonempty
        out["nonempty_tiles_per_s"] = round(
            nonempty / out["build_wall_s"], 1)
        gen_listed = sum(z.get("n_generate_listed", 0)
                         for z in summary["zooms"])
        imputed = sum(z.get("n_imputed", 0) for z in summary["zooms"])
        out["children_generated"] = gen_listed
        out["children_imputed"] = imputed
        out["impute_savings_factor"] = round(
            (gen_listed + imputed) / gen_listed, 2) if gen_listed else None
        print(json.dumps(out, indent=1))
        Path("BENCH_ML_DEEP_R5.json").write_text(json.dumps(out, indent=1))
    finally:
        shutil.rmtree(store, ignore_errors=True)


if __name__ == "__main__":
    main()
