"""Line-dominated full-build stress: 50k world-crossing polylines,
z0..z10, WKB layer, gzip 6, tmpfs store — the identical job measured
in rounds 3 (607 s, bbox-explode era) and 4 (85.7 s, supercover).
Reference shape: a line-heavy `transportation` layer generated over
every tile of the pyramid (bin/generate-tiles). Brackets the run with
the single-core index so cross-round deltas can be hw-normalized on
this noisy box.

env: STRESS_LINES (default 50000), STRESS_MAXZ (10),
     SPARK_GRAFT_CPUS (32), out: BENCH_LINE_LARGE_R5.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_LINES = int(os.environ.get("STRESS_LINES", "50000"))
MAXZ = int(os.environ.get("STRESS_MAXZ", "10"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from scaling_bench import core_index

    from sparktiles.operators.mvt import LayerSpec
    from sparktiles.plans.pipeline import BuildConfig, TileBuild
    from sparktiles.session import get_spark
    from sparktiles.sources.lines import generate_lines

    ci0 = core_index()
    spark = get_spark("line-build-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    lines = generate_lines(spark, n=N_LINES).withColumnRenamed(
        "line_id", "feature_id").repartition(64).cache()
    lines.count()
    spec = LayerSpec(layer_id="transportation", index=0,
                     attr_fields={"class": "string", "name": "string"},
                     buffer_px=4, geometry_kind="wkb")
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    store = tempfile.mkdtemp(prefix="lines_", dir=base)
    try:
        t0 = time.time()
        b = TileBuild(spark, [(spec, lines)], BuildConfig(
            store_dir=store, minzoom=0, maxzoom=MAXZ, mid_zoom=6,
            gzip_level=6))
        s = b.build_fast()
        dt = time.time() - t0
        nonempty = spark.read.parquet(store + "/tiles_all").count()
    finally:
        shutil.rmtree(store, ignore_errors=True)
    spark.stop()
    out = {
        "n_lines": N_LINES, "maxz": MAXZ, "cpus": CPUS,
        "tiles": s["tiles"], "wall_s": round(dt, 1),
        "tiles_per_s": round(s["tiles"] / dt, 1),
        "nonempty": nonempty,
        "core_index_before": round(ci0, 1),
        "core_index_after": round(core_index(), 1),
        "round3_wall_s": 607, "round4_wall_s": 85.7,
    }
    out["speedup_vs_r3"] = round(607 / dt, 1)
    out["speedup_vs_r4"] = round(85.7 / dt, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
