"""Capped multi-layer build 2v8 at a fixed-cost-amortizing corpus size.

The capped production-shape multilayer leg (scaling_bench `mlc`) read
0.765 raw on the round's one fully-clean 400k-page draw, and its 2v8
stage decomposition (BENCH_MLC_STAGEDECOMP.json) splits the loss into
(a) ~4.5 s of 8-core tail-wave/barrier idle (idle_share 0.101 on a
~35 s phase — a FIXED share that shrinks linearly with corpus size)
and (b) 1.49x per-task bus inflation (window-dependent). This tool
runs ONLY geoparse + the capped multi-layer build at a corpus large
enough (default 1.2M pages) that (a) is <3% of the 8-core leg — the
same fixed-cost-amortizing protocol that moved the single-layer leg
from 0.60 to 0.853 raw (tools/sl_scaling.py,
BENCH_SL_SCALING_LARGE.json).

Layer mix and caps are identical to scaling_bench's mlc phase
(place/transportation/boundary, caps 1024/512/256, lines scale with
the corpus at n_pages//40).

usage: python tools/mlc_scaling.py [n_pages] [maxzoom] [n_low] [n_high]
       (refuses to fire when the bandwidth control reads < 0.6)
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROOT = Path(__file__).resolve().parent.parent
ILOCK = Path("/tmp/sparktiles_interactive.lock")
SLOCK = Path("/tmp/sparktiles_scaling.lock")
BE_GATE = 0.6


def core_index(seconds: float = 3.0) -> float:
    import numpy as np

    a = np.random.default_rng(0).random(200_000)
    t_end = time.time() + seconds
    it = 0
    while time.time() < t_end:
        np.sin(a).sum()
        it += 1
    return round(it / seconds, 1)


def control() -> dict:
    proc = subprocess.run(
        [sys.executable, str(ROOT / "tools/hw_scaling_control.py"), "2", "8"],
        capture_output=True, text=True, cwd=str(ROOT), timeout=600)
    out = proc.stdout.strip()
    ctl = json.loads(out[out.index("{"):])
    subprocess.run(["git", "checkout", "--", "BENCH_HW_CONTROL.json"],
                   cwd=str(ROOT), capture_output=True)
    return {"compute_eff": ctl["compute"]["efficiency"],
            "bandwidth_eff": ctl["bandwidth"]["efficiency"]}


def run_leg(cpus: int, n_pages: int, maxzoom: int, repeats: int = 2) -> dict:
    import os
    from dataclasses import replace

    os.environ["SPARK_DRIVER_MEM"] = "24g"
    from sparktiles.operators.mvt import LayerSpec
    from sparktiles.plans.config import FieldDef, LayerDef, TilesetDef
    from sparktiles.plans.pipeline import (BuildConfig, TileBuild,
                                           make_point_layer_frames)
    from sparktiles.session import get_spark
    from sparktiles.sources.geoparse import build_features
    from sparktiles.sources.lines import generate_lines
    from sparktiles.sources.pages import generate_pages
    from sparktiles.sources.polygons import generate_polygons

    spark = get_spark(f"mlc-scaling-{cpus}", cpus=cpus, extra_conf={
        "spark.sparktiles.encodePartitions": str(4 * cpus)})
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"cpus": cpus, "core_index_before": core_index()}

    t0 = time.time()
    pages = generate_pages(spark, n_pages).repartition(4 * cpus)
    feats = build_features(pages).cache()
    out["n_features"] = feats.count()
    out["geoparse_s"] = round(time.time() - t0, 2)

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
    ml_frames = [
        (replace(spec, max_features_per_tile=cap_n), df)
        for (spec, df), cap_n in zip(ml_frames, (1024, 512, 256))
    ]
    base = "/dev/shm" if Path("/dev/shm").exists() else None
    store = tempfile.mkdtemp(prefix=f"sparktiles_mlc_{cpus}_", dir=base)
    try:
        mlcb = TileBuild(spark, ml_frames, BuildConfig(
            store_dir=store + "/mlc", minzoom=0, maxzoom=maxzoom,
            mid_zoom=6, gzip_level=6))
        times = []
        for _ in range(repeats):
            t0 = time.time()
            mlcb._build_tiles((0, maxzoom), None).write \
                .mode("overwrite").partitionBy("z") \
                .parquet(store + "/mlc_tiles")
            times.append(time.time() - t0)
        dt = min(times)
        out["mlc_times_s"] = [round(t, 2) for t in times]
        out["mlc_encode_s"] = round(dt, 2)
        n = spark.read.parquet(store + "/mlc_tiles").count()
        out["mlc_nonempty_tiles"] = n
        out["mlc_tiles_per_s"] = round(n / dt, 1)
    finally:
        shutil.rmtree(store, ignore_errors=True)
    spark.stop()
    out["core_index_after"] = core_index()
    return out


def _spawn_leg(cpus: int, n_pages: int, maxzoom: int, repeats: int) -> dict:
    cmd = [sys.executable, __file__, "--leg", str(cpus),
           str(n_pages), str(maxzoom), str(repeats)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=str(ROOT))
    line = next((l for l in proc.stdout.splitlines()
                 if l.startswith("LEGRESULT ")), None)
    if line is None:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
        raise RuntimeError(f"leg {cpus} failed")
    return json.loads(line[len("LEGRESULT "):])


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        repeats = int(sys.argv[5]) if len(sys.argv) > 5 else 2
        print("LEGRESULT " + json.dumps(run_leg(
            int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), repeats)))
        return

    argv = sys.argv[1:]
    n_pages = int(argv[0]) if len(argv) > 0 else 1_200_000
    maxzoom = int(argv[1]) if len(argv) > 1 else 10
    n_low = int(argv[2]) if len(argv) > 2 else 2
    n_high = int(argv[3]) if len(argv) > 3 else 8

    if SLOCK.exists():
        raise SystemExit("scaling watcher mid-draw; retry later")
    if ILOCK.exists():
        raise SystemExit("interactive lock present; retry later")
    ILOCK.touch()
    try:
        ctl = control()
        if ctl["bandwidth_eff"] < BE_GATE:
            raise SystemExit(
                f"bandwidth control {ctl['bandwidth_eff']} < {BE_GATE}: "
                "bus-starved window, a draw now would understate 8c — "
                "not firing")
        legs = {cpus: _spawn_leg(cpus, n_pages, maxzoom, 2)
                for cpus in (n_low, n_high)}
    finally:
        ILOCK.unlink(missing_ok=True)

    factor = n_high / n_low

    def ci(leg: dict) -> float:
        return (leg["core_index_before"] + leg["core_index_after"]) / 2

    lo, hi = legs[n_low], legs[n_high]
    eff = round((hi["mlc_tiles_per_s"] / lo["mlc_tiles_per_s"]) / factor, 3)
    drift = ci(lo) / ci(hi) if ci(hi) else 1.0
    result = {
        "n_pages": n_pages, "maxzoom": maxzoom, "control": ctl,
        f"N(local[{n_low}])": lo, f"4N(local[{n_high}])": hi,
        "scaling_efficiency_multilayer_capped": eff,
        "box_speed_drift_low_over_high": round(drift, 3),
        "hw_norm_multilayer_capped": round(eff * drift, 3),
    }
    print(json.dumps(result, indent=1))
    Path("BENCH_MLC_SCALING_LARGE.json").write_text(
        json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
