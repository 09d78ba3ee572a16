"""Line-layer candidate-generation profile: bbox explode vs supercover.

Reproduces the round-3 measurement (docs/SCALE.md stage 3 "KNOWN
NEXT"): N synthetic world-crossing polylines, z0..MAXZ, 4px buffer.
For each assignment strategy reports candidate rows, exact-clip
survivor rows (rows the map-side vecmvt pass keeps), survival %, and
the wall time of assignment + encode (count of encoded layer rows —
the real per-build cost, shuffle excluded so the delta isolates the
candidate path).

env: STRESS_LINES (default 10000), STRESS_MAXZ (default 9),
     SPARK_GRAFT_CPUS (default 32), STRESS_RUNS (default 1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_LINES = int(os.environ.get("STRESS_LINES", "10000"))
MAXZ = int(os.environ.get("STRESS_MAXZ", "9"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("STRESS_RUNS", "1"))


def main():
    from sparktiles.operators.mvt import LayerSpec, encode_layer_df
    from sparktiles.operators.joins import polygons_with_bounds
    from sparktiles.operators.pyramid import (
        assign_bbox_tiles_multi,
        assign_supercover_tiles_multi,
    )
    from sparktiles.session import get_spark
    from sparktiles.sources.lines import generate_lines

    spark = get_spark("line-stress", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    lines = generate_lines(spark, n=N_LINES).withColumnRenamed(
        "line_id", "feature_id").cache()
    lines.count()
    spec = LayerSpec(
        layer_id="transportation", index=0,
        attr_fields={"class": "string", "name": "string"},
        key_field="feature_id", buffer_px=4, geometry_kind="wkb")

    def assigned(strategy):
        if strategy == "bbox":
            return assign_bbox_tiles_multi(
                polygons_with_bounds(lines, "geom"), 0, MAXZ, buffer_px=4)
        return assign_supercover_tiles_multi(lines, 0, MAXZ, buffer_px=4)

    out = {"n_lines": N_LINES, "maxz": MAXZ, "cpus": CPUS}
    for strategy in ("bbox", "supercover"):
        best = None
        for _ in range(RUNS):
            t0 = time.time()
            cand = assigned(strategy).count()
            t_assign = time.time() - t0
            t0 = time.time()
            enc = encode_layer_df(assigned(strategy), spec)
            tiles = enc.count()
            t_encode = time.time() - t0
            r = {"candidates": cand, "assign_s": round(t_assign, 2),
                 "encoded_tiles": tiles,
                 "assign_encode_s": round(t_encode, 2)}
            if best is None or r["assign_encode_s"] < best["assign_encode_s"]:
                best = r
        out[strategy] = best
    b, s = out["bbox"], out["supercover"]
    out["candidate_ratio"] = round(b["candidates"] / s["candidates"], 2)
    out["speedup_assign_encode"] = round(
        b["assign_encode_s"] / s["assign_encode_s"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
