"""ABBA-ordered 2v8 scaling measurement for the multi-layer tile spine.

Why: the one-shot scaling legs (tools/scaling_bench.py) measure the
box's per-core speed only at leg boundaries, and both round-5 draws
that put the multi-layer phase over the 0.8 bar (0.883, 0.819 raw)
also showed the N leg's core index decaying ~15% across its 6 minutes
— the same confound direction both times (a slow box during the
2-core ml phase inflates the ratio). This tool isolates the ml phase
and runs it A B B A (A=low-core pinned, B=high-core pinned), with the
core index sampled inside every rep. Under monotone box drift the two
A/B pairs are biased in OPPOSITE directions, so they bracket the true
ratio; the spread between the pairs IS the drift error bar.

Protocol per rep (fresh pinned JVM, like a cluster executor):
  read the prepared feature parquet (geoparse is untimed prep),
  regenerate the deterministic line/polygon layers, then run the
  single-shuffle multi-layer build (TileBuild._build_tiles, the
  round-5 fused spine) twice to a tmpfs parquet store; min-of-2 is
  the rep time (first run absorbs JIT/codegen warmup).

usage: python tools/ml_abba.py [n_pages] [maxzoom] [low] [high]
       python tools/ml_abba.py --single [n_pages] [maxzoom] [low] [high]
       (defaults 400000 10 2 8)
--single measures the single-layer fused encode phase instead (same
workload as tools/ml_stagedecomp.py --single). Writes
BENCH_SCALING_R5_ABBA.json (or BENCH_SINGLE_ABBA.json) and prints it.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def core_index(seconds: float = 3.0) -> float:
    """Single-thread cache-resident compute index under this process's
    cpu affinity (same instrument as tools/scaling_bench.py)."""
    import numpy as np

    a = np.random.default_rng(0).random(200_000)
    t_end = time.time() + seconds
    it = 0
    while time.time() < t_end:
        np.sin(a).sum()
        it += 1
    return round(it / seconds, 1)


def prep(n_pages: int, feats_dir: str) -> None:
    os.environ["SPARK_DRIVER_MEM"] = "24g"
    from sparktiles.session import get_spark
    from sparktiles.sources.geoparse import build_features
    from sparktiles.sources.pages import generate_pages

    spark = get_spark("ml-abba-prep", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    pages = generate_pages(spark, n_pages).repartition(64)
    build_features(pages).write.mode("overwrite").parquet(feats_dir)
    spark.stop()


def run_rep(cpus: int, maxzoom: int, feats_dir: str, n_pages: int,
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

    out: dict = {"cpus": cpus, "load1": round(os.getloadavg()[0], 2),
                 "core_index_before": core_index()}
    spark = get_spark(f"ml-abba-{cpus}", cpus=cpus,
                      extra_conf={"spark.ui.enabled": "true",
                                  # compute-heavy corpus: pin the encode
                                  # exchange at 4 waves/core (see
                                  # grouped_map_sorted, operators/mvt.py)
                                  "spark.sparktiles.encodePartitions":
                                  str(4 * cpus)})
    spark.sparkContext.setLogLevel("ERROR")

    # prep writes few large parquet files; a real corpus at this per-core
    # scale arrives as many splits. Repartition (untimed, absorbed into
    # cache materialization) so the map stage isn't granularity-starved.
    feats = spark.read.parquet(feats_dir).repartition(4 * cpus).cache()
    out["n_features"] = feats.count()
    tileset = TilesetDef(
        name="scaling",
        layers=[LayerDef(id="place", fields=[FieldDef("name")], buffer_size=8)],
        minzoom=0, maxzoom=maxzoom)
    f_ = make_point_layer_frames(feats, tileset)[0][1]
    # identical layer mix to the scaling_bench ml phase
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
        # the production low-zoom shape (scaling_bench mlc phase)
        ml_frames = [
            (replace(spec, max_features_per_tile=cap_n), df)
            for (spec, df), cap_n in zip(ml_frames, (1024, 512, 256))
        ]
    base = "/dev/shm" if Path("/dev/shm").exists() else None
    store = tempfile.mkdtemp(prefix=f"sparktiles_abba_{cpus}_", dir=base)
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
                    .parquet(store + "/ml_tiles")
        else:
            mlb = TileBuild(spark, ml_frames, BuildConfig(
                store_dir=store + "/ml", minzoom=0, maxzoom=maxzoom,
                mid_zoom=6, gzip_level=6))

            def build_once():
                mlb._build_tiles((0, maxzoom), None).write \
                    .mode("overwrite").partitionBy("z") \
                    .parquet(store + "/ml_tiles")
        times = []
        for _ in range(2):
            t0 = time.time()
            build_once()
            times.append(round(time.time() - t0, 2))
        out["ml_times_s"] = times
        out["ml_encode_s"] = min(times)
        out["ml_nonempty_tiles"] = spark.read.parquet(
            store + "/ml_tiles").count()
    finally:
        shutil.rmtree(store, ignore_errors=True)
    spark.stop()
    out["core_index_after"] = core_index()
    return out


def main() -> None:
    if sys.argv[1:2] == ["--rep"]:
        cpus, maxzoom, feats_dir, n_pages = (
            int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], int(sys.argv[5]))
        single = "single" in sys.argv[6:]
        capped = "capped" in sys.argv[6:]
        print("REPRESULT " + json.dumps(run_rep(cpus, maxzoom, feats_dir,
                                                n_pages, single=single,
                                                capped=capped)))
        return
    if sys.argv[1:2] == ["--prep"]:
        prep(int(sys.argv[2]), sys.argv[3])
        return

    argv = sys.argv[1:]
    single = "--single" in argv
    capped = "--capped" in argv
    argv = [a for a in argv if a not in ("--single", "--capped")]
    n_pages = int(argv[0]) if len(argv) > 0 else 400_000
    maxzoom = int(argv[1]) if len(argv) > 1 else 10
    low = int(argv[2]) if len(argv) > 2 else 2
    high = int(argv[3]) if len(argv) > 3 else 8

    base = "/dev/shm" if Path("/dev/shm").exists() else None
    work = tempfile.mkdtemp(prefix="sparktiles_abba_in_", dir=base)
    feats_dir = work + "/feats"
    try:
        subprocess.run([sys.executable, __file__, "--prep", str(n_pages),
                        feats_dir], check=True, cwd=str(ROOT))
        reps = []
        for i, cpus in enumerate((low, high, high, low)):
            cmd = [sys.executable, __file__, "--rep", str(cpus),
                   str(maxzoom), feats_dir, str(n_pages)] \
                + (["single"] if single else []) \
                + (["capped"] if capped else [])
            if shutil.which("taskset"):
                cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  cwd=str(ROOT))
            line = next((l for l in proc.stdout.splitlines()
                         if l.startswith("REPRESULT ")), None)
            if line is None:
                sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
                raise RuntimeError(f"rep {i} (cpus={cpus}) failed")
            rep = json.loads(line[len("REPRESULT "):])
            rep["order"] = i
            reps.append(rep)
            print(f"[abba] rep {i} cpus={cpus}: ml={rep['ml_encode_s']}s "
                  f"ci={rep['core_index_before']}/{rep['core_index_after']}",
                  flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    a1, b1, b2, a2 = reps
    ideal = high / low

    def pair(a: dict, b: dict) -> dict:
        raw = round((a["ml_encode_s"] / b["ml_encode_s"]) / ideal, 3)
        ci_a = (a["core_index_before"] + a["core_index_after"]) / 2
        ci_b = (b["core_index_before"] + b["core_index_after"]) / 2
        # box slower during the low leg inflates raw; rescale to equal
        # box speed (same correction as scaling_bench hw_norm)
        norm = round(raw * (ci_a / ci_b), 3) if ci_b else None
        return {"raw": raw, "hw_norm": norm,
                "ci_low_leg": round(ci_a, 1), "ci_high_leg": round(ci_b, 1)}

    p1, p2 = pair(a1, b1), pair(a2, b2)
    cis = [x for r in reps
           for x in (r["core_index_before"], r["core_index_after"])]
    phase_name = ("single-layer fused encode" if single
                  else "mlc (capped)" if capped else "ml")
    result = {
        "protocol": f"ABBA {phase_name} phase only, A=local[{low}] "
                    f"B=local[{high}] pinned, min-of-2 per rep, "
                    "fresh JVM per rep",
        "n_pages": n_pages, "maxzoom": maxzoom,
        "reps": reps,
        "pair1": p1, "pair2": p2,
        "ml_raw_mean": round((p1["raw"] + p2["raw"]) / 2, 3),
        "ml_raw_bracket": sorted([p1["raw"], p2["raw"]]),
        "ci_spread_pct": round(100 * (max(cis) - min(cis)) / max(cis), 1),
        "tiles_equal_all_reps": len(
            {r["ml_nonempty_tiles"] for r in reps}) == 1,
    }
    print(json.dumps(result, indent=1))
    out_name = ("BENCH_SINGLE_ABBA.json" if single
                else "BENCH_MLC_ABBA.json" if capped
                else "BENCH_SCALING_R5_ABBA.json")
    (ROOT / out_name).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
