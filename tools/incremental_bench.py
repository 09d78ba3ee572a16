"""Incremental re-tiling at bench scale (SURVEY §2.10 / T5+T8).

Builds a z0..MAXZ pyramid map for snapshot 1 of an N-page corpus, then
applies a ~1/DIV-changed snapshot 2 two ways:

  full     — from-scratch rebuild of snapshot 2
  incr     — run_incremental_retile: sha2(text) diff -> buffered
             per-zoom invalidation -> regenerate ONLY listed tiles ->
             anti-join+union MERGE (the parquet stand-in for Iceberg
             MERGE INTO)

and reports both wall times plus a full equality check (count + sum of
xxhash64 over every (z,x,y,tile_id) row — order-insensitive, collision
odds ~2^-64 * rows^2). The incremental cost is ∝ change rate, not
corpus size — the property that makes a 100 TB daily refresh a small
job (docs/SCALE.md stage 7).

env: INC_PAGES (default 400000), INC_MAXZ (default 10),
     INC_DIV (default 60 — ~1.7% urls updated + removals + adds),
     SPARK_GRAFT_CPUS (default 32)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_PAGES = int(os.environ.get("INC_PAGES", "400000"))
MAXZ = int(os.environ.get("INC_MAXZ", "10"))
DIV = int(os.environ.get("INC_DIV", "60"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from pyspark.sql import functions as F

    from sparktiles.operators.mvt import LayerSpec, encode_and_assemble_single
    from sparktiles.operators.pyramid import assign_point_tiles_multi, tile_pyramid
    from sparktiles.plans.pipeline import empty_tile_blob
    from sparktiles.session import get_spark
    from sparktiles.sources.geoparse import build_features
    from sparktiles.sources.pages import generate_pages
    from sparktiles.streaming.incremental import run_incremental_retile

    spark = get_spark("incremental-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    BUF = 8.0
    spec = LayerSpec(layer_id="place", index=0,
                     attr_fields={"name": "string"}, buffer_px=int(BUF))
    empty_id = hashlib.md5(empty_tile_blob(6)).hexdigest()
    base = "/dev/shm" if Path("/dev/shm").exists() else None
    tmp = tempfile.mkdtemp(prefix="sparktiles_inc_", dir=base)

    def full_map(pages_df):
        feats = build_features(pages_df)
        assigned = assign_point_tiles_multi(feats, 0, MAXZ, buffer_px=BUF)
        tiles = encode_and_assemble_single(assigned, spec, 6)
        uni = tile_pyramid(spark, 0, MAXZ)
        empties = uni.join(tiles.select("z", "x", "y"), ["z", "x", "y"],
                           "left_anti").select(
            F.col("z").alias("zoom_level"), F.col("x").alias("tile_column"),
            F.col("y").alias("tile_row"), F.lit(empty_id).alias("tile_id"))
        return tiles.select(
            F.col("z").alias("zoom_level"), F.col("x").alias("tile_column"),
            F.col("y").alias("tile_row"), "tile_id").unionByName(empties)

    out = {"n_pages": N_PAGES, "maxzoom": MAXZ, "cpus": CPUS,
           "change_divisor": DIV}

    # snapshot 1 + its persisted map (the standing store)
    p1 = generate_pages(spark, N_PAGES).repartition(64).cache()
    p1.count()
    t0 = time.time()
    full_map(p1).write.mode("overwrite").parquet(tmp + "/map1")
    out["build_snapshot1_s"] = round(time.time() - t0, 2)
    old_map = spark.read.parquet(tmp + "/map1")

    # snapshot 2: ~1/DIV urls removed, ~1/DIV updated (extra mention ->
    # text hash + feature change), N/DIV new urls
    h = F.pmod(F.xxhash64("url"), F.lit(DIV))
    kept = p1.where(h != 0)
    upd = F.when(h == 1, F.concat(
        F.col("text"), F.lit(" Name_412 (31.41592; 65.35897)"))
    ).otherwise(F.col("text"))
    p2_core = kept.withColumn("text", upd).withColumn(
        "html", F.encode(F.col("text"), "utf-8"))
    added = generate_pages(spark, N_PAGES // DIV).withColumn(
        "url", F.concat(F.col("url"), F.lit("?v2")))
    p2 = p2_core.unionByName(added).cache()
    p2.count()

    # ---- incremental path
    inv_count = {}

    def regenerate(inv):
        inv = inv.cache()
        inv_count["n"] = inv.count()
        feats = build_features(p2)
        assigned = assign_point_tiles_multi(feats, 0, MAXZ, buffer_px=BUF)
        assigned = assigned.join(inv, ["z", "x", "y"], "left_semi")
        tiles = encode_and_assemble_single(assigned, spec, 6)
        gen = tiles.select(
            F.col("z").alias("zoom_level"), F.col("x").alias("tile_column"),
            F.col("y").alias("tile_row"), "tile_id")
        empties = inv.join(tiles.select("z", "x", "y"), ["z", "x", "y"],
                           "left_anti").select(
            F.col("z").alias("zoom_level"), F.col("x").alias("tile_column"),
            F.col("y").alias("tile_row"), F.lit(empty_id).alias("tile_id"))
        return gen.unionByName(empties)

    t0 = time.time()
    merged = run_incremental_retile(
        spark, p1, p2, build_features, old_map, 0, MAXZ,
        regenerate, buffer_px=BUF)
    merged.write.mode("overwrite").parquet(tmp + "/map_incr")
    out["incremental_s"] = round(time.time() - t0, 2)
    out["invalidated_tiles"] = inv_count["n"]

    # ---- from-scratch rebuild of snapshot 2
    t0 = time.time()
    full_map(p2).write.mode("overwrite").parquet(tmp + "/map2")
    out["full_rebuild_s"] = round(time.time() - t0, 2)

    # ---- equality: merged == full rebuild, row for row
    def sig(path):
        df = spark.read.parquet(path)
        return df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("zoom_level", "tile_column", "tile_row",
                             "tile_id")).alias("h")).first()

    a, b = sig(tmp + "/map_incr"), sig(tmp + "/map2")
    out["n_tiles"] = a.n
    out["merged_equals_full_rebuild"] = (a.n == b.n and a.h == b.h)
    out["speedup_vs_full"] = round(out["full_rebuild_s"] / out["incremental_s"], 2)
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
