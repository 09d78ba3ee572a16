"""Decompose the multi-layer build's 2v8 scaling loss into (a) driver/
scheduler serial time and (b) per-task CPU inflation (bus contention).

The ABBA protocol (tools/ml_abba.py) put the ml phase's true 2v8 ratio
at 0.749-0.775 raw on this box. Two rival explanations, with opposite
100-TB implications:
  serial driver time  — fixed S per build: on a real cluster S stays
                        constant while the parallel part shards over
                        executors (gets WORSE with more executors
                        relative, but is driver work a cluster also
                        pays exactly once);
  bus contention      — per-task CPU inflates as more cores share this
                        box's one memory bus: a cluster with per-node
                        buses does NOT pay this (the carried argument,
                        measured for the point-encode leg in round 3).
The split is measurable from Spark's own stage metrics:
  busy = sum(executorRunTime) over the build's stages
  idle_share = (wall - busy/cpus) / wall      -> (a)
  inflation  = busy_8c / busy_2c              -> (b) (same job, same
               input, same partition logic; >1 means each task burned
               more CPU when 8 cores shared the bus)

usage: python tools/ml_stagedecomp.py [n_pages] [maxzoom]
       python tools/ml_stagedecomp.py --single [n_pages] [maxzoom]
--single decomposes the single-layer fused encode instead (the leg
that has read 0.46-0.63 raw since round 2, bus-attributed). Writes
BENCH_ML_STAGEDECOMP.json / BENCH_SINGLE_STAGEDECOMP.json. Each leg
pinned like ml_abba.py.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import urllib.request
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def stage_metrics(spark) -> list[dict]:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete",
            timeout=10) as r:
        return json.load(r)


def run_leg(cpus: int, maxzoom: int, feats_dir: str, n_pages: int,
            single: bool = False, capped: bool = False) -> dict:
    os.environ["SPARK_DRIVER_MEM"] = "24g"
    from dataclasses import replace
    from sparktiles.operators.mvt import LayerSpec
    from sparktiles.plans.config import FieldDef, LayerDef, TilesetDef
    from sparktiles.plans.pipeline import (BuildConfig, TileBuild,
                                           make_point_layer_frames)
    from sparktiles.session import get_spark
    from sparktiles.sources.lines import generate_lines
    from sparktiles.sources.polygons import generate_polygons

    spark = get_spark(f"ml-decomp-{cpus}", cpus=cpus,
                      extra_conf={"spark.ui.enabled": "true",
                                  # compute-heavy corpus: pin the encode
                                  # exchange at 4 waves/core (see
                                  # grouped_map_sorted, operators/mvt.py)
                                  "spark.sparktiles.encodePartitions":
                                  str(4 * cpus)})
    spark.sparkContext.setLogLevel("ERROR")
    # same input-granularity treatment as ml_abba.run_rep: prep writes few
    # large files; repartition (untimed) to the splits a real corpus has
    feats = spark.read.parquet(feats_dir).repartition(4 * cpus).cache()
    feats.count()
    tileset = TilesetDef(
        name="scaling",
        layers=[LayerDef(id="place", fields=[FieldDef("name")], buffer_size=8)],
        minzoom=0, maxzoom=maxzoom)
    f_ = make_point_layer_frames(feats, tileset)[0][1]
    lines = generate_lines(spark, n=max(2000, n_pages // 40)) \
        .withColumnRenamed("line_id", "feature_id").cache()
    polys = generate_polygons(spark, n_grid=24) \
        .withColumnRenamed("poly_id", "feature_id").cache()
    lines.count(), polys.count()
    ml_frames = [
        (LayerSpec(layer_id="place", index=0,
                   attr_fields={"name": "string"}, buffer_px=8), f_),
        (LayerSpec(layer_id="transportation", index=1,
                   attr_fields={"class": "string", "name": "string"},
                   buffer_px=4, geometry_kind="wkb"), lines),
        (LayerSpec(layer_id="boundary", index=2,
                   attr_fields={"admin_class": "string", "name": "string"},
                   buffer_px=4, geometry_kind="wkb"), polys),
    ]
    if capped:
        # the production low-zoom shape measured by scaling_bench's mlc
        # phase: per-layer kernel density caps
        ml_frames = [
            (replace(spec, max_features_per_tile=cap_n), df)
            for (spec, df), cap_n in zip(ml_frames, (1024, 512, 256))
        ]
    base = "/dev/shm" if Path("/dev/shm").exists() else None
    store = tempfile.mkdtemp(prefix=f"sparktiles_decomp_{cpus}_", dir=base)
    try:
        if single:
            from sparktiles.operators.mvt import encode_and_assemble_single
            from sparktiles.operators.pyramid import assign_point_tiles_multi
            spec_ = ml_frames[0][0]

            def build_once():
                assigned = assign_point_tiles_multi(
                    f_, 0, maxzoom, buffer_px=spec_.buffer_px)
                encode_and_assemble_single(assigned, spec_, 6) \
                    .write.mode("overwrite").partitionBy("z") \
                    .parquet(store + "/tiles_all")
        else:
            mlb = TileBuild(spark, ml_frames, BuildConfig(
                store_dir=store + "/ml", minzoom=0, maxzoom=maxzoom,
                mid_zoom=6, gzip_level=6))

            def build_once():
                mlb._build_tiles((0, maxzoom), None).write \
                    .mode("overwrite").partitionBy("z") \
                    .parquet(store + "/ml_tiles")
        # warmup build (JIT/codegen) — excluded from metrics
        build_once()
        seen = {s["stageId"] for s in stage_metrics(spark)}
        t0 = time.time()
        build_once()
        wall = time.time() - t0
        stages = [s for s in stage_metrics(spark) if s["stageId"] not in seen]
        busy_ms = sum(s.get("executorRunTime", 0) for s in stages)
        cpu_ns = sum(s.get("executorCpuTime", 0) for s in stages)
        out = {
            "cpus": cpus,
            "wall_s": round(wall, 2),
            "n_stages": len(stages),
            "busy_core_s": round(busy_ms / 1000, 2),
            "cpu_core_s": round(cpu_ns / 1e9, 2),
            "gc_s": round(sum(s.get("jvmGcTime", 0) for s in stages) / 1000, 2),
            "shuffle_fetch_wait_s": round(sum(
                s.get("shuffleFetchWaitTime", 0) for s in stages) / 1000, 2),
            "shuffle_write_time_s": round(sum(
                s.get("shuffleWriteTime", 0) for s in stages) / 1e9, 2),
            "idle_share": round((wall - busy_ms / 1000 / cpus) / wall, 3),
            "stage_walls": [
                {"id": s["stageId"], "name": s.get("name", "")[:60],
                 "tasks": s.get("numCompleteTasks"),
                 "busy_s": round(s.get("executorRunTime", 0) / 1000, 2)}
                for s in sorted(stages, key=lambda s: s["stageId"])],
        }
    finally:
        shutil.rmtree(store, ignore_errors=True)
    spark.stop()
    return out


def main() -> None:
    if sys.argv[1:2] == ["--leg"]:
        print("LEGRESULT " + json.dumps(run_leg(
            int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
            int(sys.argv[5]), single=bool(int(sys.argv[6])),
            capped=bool(int(sys.argv[7])) if len(sys.argv) > 7 else False)))
        return
    args = sys.argv[1:]
    single = "--single" in args
    capped = "--capped" in args
    args = [a for a in args if a not in ("--single", "--capped")]
    n_pages = int(args[0]) if args else 400_000
    maxzoom = int(args[1]) if len(args) > 1 else 10

    base = "/dev/shm" if Path("/dev/shm").exists() else None
    work = tempfile.mkdtemp(prefix="sparktiles_decomp_in_", dir=base)
    feats_dir = work + "/feats"
    legs = {}
    try:
        subprocess.run([sys.executable, str(ROOT / "tools/ml_abba.py"),
                        "--prep", str(n_pages), feats_dir], check=True,
                       cwd=str(ROOT))
        for cpus in (2, 8):
            cmd = [sys.executable, __file__, "--leg", str(cpus),
                   str(maxzoom), feats_dir, str(n_pages),
                   str(int(single)), str(int(capped))]
            if shutil.which("taskset"):
                cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  cwd=str(ROOT))
            line = next((l for l in proc.stdout.splitlines()
                         if l.startswith("LEGRESULT ")), None)
            if line is None:
                sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
                raise RuntimeError(f"leg {cpus} failed")
            legs[cpus] = json.loads(line[len("LEGRESULT "):])
            print(f"[decomp] {cpus}c: wall={legs[cpus]['wall_s']}s "
                  f"busy={legs[cpus]['busy_core_s']} "
                  f"idle_share={legs[cpus]['idle_share']}", flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    r2, r8 = legs[2], legs[8]
    result = {
        "workload": ("single_layer_fused_encode" if single
                     else "multilayer_capped" if capped else "multilayer"),
        "n_pages": n_pages, "maxzoom": maxzoom,
        "leg_2c": r2, "leg_8c": r8,
        "raw_eff": round(r2["wall_s"] / r8["wall_s"] / 4, 3),
        "busy_inflation_8c_over_2c": round(
            r8["busy_core_s"] / r2["busy_core_s"], 3),
        "cpu_inflation_8c_over_2c": round(
            r8["cpu_core_s"] / r2["cpu_core_s"], 3)
        if r2.get("cpu_core_s") else None,
        "note": "busy_inflation > 1 = bus contention (cluster-free cost); "
                "idle_share = driver/scheduler serial share",
    }
    print(json.dumps(result, indent=1))
    out_name = ("BENCH_SINGLE_STAGEDECOMP.json" if single
                else "BENCH_MLC_STAGEDECOMP.json" if capped
                else "BENCH_ML_STAGEDECOMP.json")
    (ROOT / out_name).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
