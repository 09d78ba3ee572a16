"""Full-depth z0-z14 impute-mode pyramid bench (BASELINE metric depth).

BASELINE.md's authoritative tiles/sec is "measured over the full z0-z14
pyramid build" (reference bin/generate-tiles:48-49: MIN_ZOOM=0,
MAX_ZOOM=14; test areas pinned at z14, openmaptiles/performance.py:
23-48). This tool runs the FAITHFUL per-zoom MID_ZOOM loop
(plans/pipeline.TileBuild.build: pyramid scheme to MID_ZOOM, impute +
list scheme above it — the reference driver's shape) on the synthetic
page corpus to z14, then verifies the impute output against a direct
full-depth generation:

  1. every non-empty map row equals the directly-generated tile at its
     (z,x,y) — both directions (anti-join counts 0);
  2. every imputed-empty map row has NO directly-generated tile;
  3. every zoom's map covers exactly the 4^z universe.

Together these assert map == direct-build map without enumerating the
empty universe a second time (at z14 that's 268M rows of empties; the
non-empty set is bounded by the place-location count).

Reported: per-zoom map rows / nonempty / wall; impute savings factor
(children inherited vs children total above MID_ZOOM); z0-z14 map
rows/s and generated-tiles/s; equality verdict.

env: DEEP_PAGES (default 400000), DEEP_MAXZ (default 14),
     DEEP_MIDZ (default 8), SPARK_GRAFT_CPUS (default 32),
     DEEP_GZIP (default 6),
     DEEP_CAP (default 0 = uncapped): LayerSpec.max_features_per_tile.
     The uncapped run carries the honest skew floor of the faithful
     per-zoom loop — z0 is one tile = one task encoding the whole
     corpus (~87 s at 400k pages, r5 session 1). Real tilesets bound
     low-zoom density (the reference's DISTINCT ON LabelGrid rank);
     DEEP_CAP measures that production shape: the kernel-level cap
     (grouped_map_sorted group_cap/layer_caps) bounds every tile's
     encode, so the low-zoom serial tail should collapse while
     impute ≡ direct equality still holds (both paths capped
     identically).
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

# local mode: driver JVM = executor; the z14 equality pass scans the
# 358M-row map repeatedly — give it headroom beyond the 8g test default
os.environ.setdefault("SPARK_DRIVER_MEM", "32g")

N_PAGES = int(os.environ.get("DEEP_PAGES", "400000"))
MAXZ = int(os.environ.get("DEEP_MAXZ", "14"))
MIDZ = int(os.environ.get("DEEP_MIDZ", "8"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
GZIP = int(os.environ.get("DEEP_GZIP", "6"))
CAP = int(os.environ.get("DEEP_CAP", "0"))


def main():
    from pyspark.sql import functions as F

    from sparktiles.operators.mvt import LayerSpec
    from sparktiles.plans.pipeline import (
        BuildConfig,
        TileBuild,
        empty_tile_blob,
    )
    from sparktiles.session import get_spark
    from sparktiles.sources.geoparse import build_features
    from sparktiles.sources.pages import generate_pages

    import hashlib

    spark = get_spark("deep-pyramid-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    base = "/dev/shm" if Path("/dev/shm").exists() else None
    store = tempfile.mkdtemp(prefix="sparktiles_deep_", dir=base)
    out = {"n_pages": N_PAGES, "maxzoom": MAXZ, "mid_zoom": MIDZ,
           "cpus": CPUS, "gzip_level": GZIP}
    try:
        pages = generate_pages(spark, N_PAGES).repartition(64).cache()
        pages.count()
        feats = build_features(pages).cache()
        out["n_features"] = feats.count()
        spec = LayerSpec(layer_id="place", index=0,
                         attr_fields={"name": "string"}, buffer_px=8,
                         max_features_per_tile=CAP or None)
        out["cap"] = CAP or None

        # ---- faithful per-zoom MID_ZOOM impute loop, timed
        b = TileBuild(spark, [(spec, feats)], BuildConfig(
            store_dir=store, minzoom=0, maxzoom=MAXZ, mid_zoom=MIDZ,
            gzip_level=GZIP))
        t0 = time.time()
        summary = b.build()
        out["build_wall_s"] = round(time.time() - t0, 2)
        out["map_rows_total"] = summary["tiles"]
        out["map_rows_per_s"] = summary["tiles_per_s"]
        out["zooms"] = summary["zooms"]

        # impute savings above MID_ZOOM: inherited children / children
        gen_listed = sum(z.get("n_generate_listed", 0)
                         for z in summary["zooms"])
        imputed = sum(z.get("n_imputed", 0) for z in summary["zooms"])
        nonempty = sum(z["n_nonempty"] for z in summary["zooms"])
        out["children_generated"] = gen_listed
        out["children_imputed"] = imputed
        out["impute_savings_factor"] = round(
            (gen_listed + imputed) / gen_listed, 2) if gen_listed else None
        out["nonempty_tiles"] = nonempty
        out["generated_tiles_per_s"] = round(
            (sum(z["n_tiles"] for z in summary["zooms"]
                 if "n_generate_listed" not in z) + gen_listed)
            / out["build_wall_s"], 1)

        # ---- equality vs direct full-depth generation (untimed)
        t0 = time.time()
        direct = b._build_tiles((0, MAXZ), None).select(
            F.col("z").alias("zoom_level"),
            F.col("x").alias("tile_column"),
            F.col("y").alias("tile_row"), "tile_id")
        direct.write.mode("overwrite").parquet(store + "/direct")
        direct = spark.read.parquet(store + "/direct")
        out["direct_build_s"] = round(time.time() - t0, 2)
        empty_id = hashlib.md5(empty_tile_blob(GZIP)).hexdigest()
        keys = ["zoom_level", "tile_column", "tile_row"]
        full_map = b.read_tile_map()
        ne = full_map.where(F.col("tile_id") != empty_id)
        miss_a = ne.join(direct, keys + ["tile_id"], "left_anti").count()
        miss_b = direct.join(ne, keys + ["tile_id"], "left_anti").count()
        ghost = (full_map.where(F.col("tile_id") == empty_id)
                 .join(direct, keys, "left_semi").count())
        per_zoom = {r.zoom_level: r.n for r in
                    full_map.groupBy("zoom_level").agg(
                        F.count("*").alias("n")).collect()}
        universe_ok = all(per_zoom.get(z, 0) == 4 ** z
                          for z in range(0, MAXZ + 1))
        out["eq_nonempty_missing_in_direct"] = miss_a
        out["eq_direct_missing_in_map"] = miss_b
        out["eq_empty_rows_with_direct_tile"] = ghost
        out["eq_universe_counts_ok"] = universe_ok
        out["impute_equals_direct"] = (
            miss_a == 0 and miss_b == 0 and ghost == 0 and universe_ok)
    finally:
        shutil.rmtree(store, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
