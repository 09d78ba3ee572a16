"""N vs 4N scaling for the raster↔vector operators.

Same pinned-fresh-JVM protocol as tools/sl_scaling.py (taskset legs,
core-index drift tracking, the 2v8 compute+bandwidth control gate up
front). Legs time, over geoparsed point features from an n-page
synthetic corpus:

* rasterize:   rasterize_point_tiles at z10/grid16 → noop sink
               (the (tile, pixel) map-side-combined groupBy + per-tile
               SPTX pack — the family's only shuffle)
* polygonize:  rasterize → raster_runs_to_features(threshold=2) → noop
               (adds the shuffle-free mapInPandas direction)

usage: python tools/raster_scaling.py [n_pages] [n_low] [n_high]
       (refuses when the bandwidth control reads < 0.6)
writes BENCH_RASTER_SCALING.json
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
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


def run_leg(cpus: int, n_pages: int) -> dict:
    import os

    os.environ["SPARK_DRIVER_MEM"] = "24g"
    from sparktiles.operators.raster import (
        raster_runs_to_features,
        rasterize_point_tiles,
    )
    from sparktiles.session import get_spark
    from sparktiles.sources.geoparse import build_features
    from sparktiles.sources.pages import generate_pages

    spark = get_spark(f"raster-scaling-{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"cpus": cpus, "core_index_before": core_index()}

    t0 = time.time()
    pages = generate_pages(spark, n_pages).repartition(64)
    feats = build_features(pages).select("px", "py").cache()
    out["n_features"] = feats.count()
    out["geoparse_s"] = round(time.time() - t0, 2)

    def best_of_2(df_fn):
        t = []
        for _ in range(2):
            t0 = time.time()
            df_fn().write.format("noop").mode("overwrite").save()
            t.append(time.time() - t0)
        return round(min(t), 3)

    rast = lambda: rasterize_point_tiles(  # noqa: E731
        feats, zoom=10, grid=16, x_col="px", y_col="py")
    # one untimed warmup of the full path: whole-stage codegen compile,
    # Arrow/python-worker spin-up and the shuffle path all JIT on the
    # first execution — without this the first timed leg reads cold
    # (the 25.6M draw's superset leg beat its subset leg at 8 cores)
    raster_runs_to_features(rast(), threshold=2).write \
        .format("noop").mode("overwrite").save()
    dt = best_of_2(rast)
    out["rasterize_s"] = dt
    out["rasterize_feats_per_s"] = round(out["n_features"] / dt, 1)

    dt = best_of_2(lambda: raster_runs_to_features(rast(), threshold=2))
    out["polygonize_s"] = dt
    out["polygonize_feats_per_s"] = round(out["n_features"] / dt, 1)

    spark.stop()
    out["core_index_after"] = core_index()
    return out


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        print("LEGRESULT " + json.dumps(run_leg(
            int(sys.argv[2]), int(sys.argv[3]))))
        return

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_600_000
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 8

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
                "bus-starved window — not firing")
        legs = {}
        for cpus in (n_low, n_high):
            cmd = [sys.executable, __file__, "--leg", str(cpus), str(n_pages)]
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
    finally:
        ILOCK.unlink(missing_ok=True)

    lo, hi = legs[n_low], legs[n_high]
    factor = n_high / n_low

    def eff(metric):
        return round((hi[metric] / lo[metric]) / factor, 3)

    ci = lambda leg: (leg["core_index_before"]  # noqa: E731
                      + leg["core_index_after"]) / 2
    drift = round(ci(lo) / ci(hi), 3) if ci(hi) else 1.0
    result = {
        "n_pages": n_pages, "control": ctl,
        f"N(local[{n_low}])": lo, f"4N(local[{n_high}])": hi,
        "rasterize_eff": eff("rasterize_feats_per_s"),
        "polygonize_eff": eff("polygonize_feats_per_s"),
        "box_speed_drift_low_over_high": drift,
    }
    print(json.dumps(result, indent=1))
    Path("BENCH_RASTER_SCALING.json").write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
