"""Scaling-efficiency evidence (BASELINE.json north_rule).

Runs the identical tile-build job on the identical deterministic input
at two parallelism levels (local[8] = N, local[32] = 4N — the sandbox
stand-in for N vs 4N executors) and reports throughput at both plus
efficiency = (thr_4N / thr_N) / 4. Results appended to BENCH.md.

usage: python tools/scaling_bench.py [n_pages] [maxzoom]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
MAXZOOM = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def run_at(cpus: int) -> dict:
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active:
        active.stop()
        time.sleep(2)

    from sparktiles.session import get_spark
    from sparktiles.sources.pages import generate_pages
    from sparktiles.sources.geoparse import build_features
    from sparktiles.operators.pyramid import assign_point_tiles_multi
    from sparktiles.plans.config import FieldDef, LayerDef, TilesetDef
    from sparktiles.plans.pipeline import BuildConfig, TileBuild, make_point_layer_frames

    spark = get_spark(f"scaling-{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"cpus": cpus}

    t0 = time.time()
    pages = generate_pages(spark, N_PAGES)
    feats = build_features(pages).cache()
    n = feats.count()
    out["n_features"] = n
    out["geoparse_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    # project to the join columns (memory-bandwidth, not CPU, dominates
    # a wide explode; the real pipeline projects the same way)
    slim = feats.select("feature_id", "px", "py")
    join_rows = assign_point_tiles_multi(slim, 0, MAXZOOM, buffer_px=8).count()
    dt = time.time() - t0
    out["join_rows"] = join_rows
    out["spatial_join_s"] = round(dt, 2)
    out["spatial_join_rows_per_s"] = round(join_rows / dt, 1)

    tileset = TilesetDef(
        name="scaling",
        layers=[LayerDef(id="place", fields=[FieldDef("name")], buffer_size=8)],
        minzoom=0, maxzoom=MAXZOOM,
    )
    frames = make_point_layer_frames(feats, tileset)
    # tmpfs store: measures compute scaling, not single-NVMe write
    # bandwidth (on a real cluster each executor writes its own shards)
    base = "/dev/shm" if Path("/dev/shm").exists() else None
    store = tempfile.mkdtemp(prefix=f"sparktiles_scale_{cpus}_", dir=base)
    try:
        # phase 1 timed separately: the embarrassingly-parallel part
        from sparktiles.operators.mvt import assemble_tiles, encode_layer_df

        spec_, f_ = frames[0]
        t0 = time.time()
        assigned = assign_point_tiles_multi(f_, 0, MAXZOOM, buffer_px=spec_.buffer_px)
        lb = encode_layer_df(assigned, spec_)
        tiles = assemble_tiles(lb, None)
        tiles.write.mode("overwrite").partitionBy("z").parquet(store + "/tiles_all")
        dt1 = time.time() - t0
        out["mvt_encode_s"] = round(dt1, 2)
        n_nonempty = spark.read.parquet(store + "/tiles_all").count()
        out["nonempty_tiles"] = n_nonempty
        out["mvt_tiles_per_s"] = round(n_nonempty / dt1, 1)

        t0 = time.time()
        b = TileBuild(spark, frames, BuildConfig(
            store_dir=store, minzoom=0, maxzoom=MAXZOOM, mid_zoom=6))
        summary = b.build_fast()
        dt2 = time.time() - t0
        out["bookkeeping_s"] = round(dt2, 2)
        out["tiles"] = summary["tiles"]
        out["pyramid_s"] = round(dt1 + dt2, 2)
        out["tiles_per_s"] = round(summary["tiles"] / (dt1 + dt2), 1)
    finally:
        shutil.rmtree(store, ignore_errors=True)
    spark.stop()
    time.sleep(2)
    return out


def main():
    r8 = run_at(8)
    r32 = run_at(32)
    eff_tiles = (r32["tiles_per_s"] / r8["tiles_per_s"]) / 4
    eff_join = (r32["spatial_join_rows_per_s"] / r8["spatial_join_rows_per_s"]) / 4
    eff_mvt = (r32["mvt_tiles_per_s"] / r8["mvt_tiles_per_s"]) / 4
    eff_geo = (r8["geoparse_s"] / r32["geoparse_s"]) / 4
    result = {
        "n_pages": N_PAGES,
        "maxzoom": MAXZOOM,
        "N(local[8])": r8,
        "4N(local[32])": r32,
        "scaling_efficiency_tiles": round(eff_tiles, 3),
        "scaling_efficiency_join": round(eff_join, 3),
        "scaling_efficiency_mvt_encode": round(eff_mvt, 3),
        "scaling_efficiency_geoparse": round(eff_geo, 3),
    }
    print(json.dumps(result, indent=1))
    Path("BENCH_SCALING.json").write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
