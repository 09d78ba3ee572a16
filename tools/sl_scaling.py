"""Single-layer encode 2v8 at a fixed-cost-amortizing corpus size.

The single-layer leg is the round's one remaining weak scaling
number (0.42-0.60 raw). Its decomposition (BENCH.md) attributes the
loss to (a) a ~8 s fixed driver/plan/commit cost that dominates a
~60 s 2-core leg at the standard 400k-page corpus and (b) a measured
~1.10x memory-bus inflation. This tool runs ONLY geoparse + the
fused single-layer encode at a corpus large enough (default 1.6M
pages) that the fixed cost is <4% of the 2-core leg, with the same
pinned-fresh-JVM protocol and the 2v8 compute+bandwidth control
up front — the be-gate discipline the multi-layer leg needed before
it read its true >=0.8 (BENCH_SCALING.json attempt 81).

usage: python tools/sl_scaling.py [n_pages] [maxzoom] [n_low] [n_high]
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

    os.environ["SPARK_DRIVER_MEM"] = "24g"
    from sparktiles.operators.mvt import LayerSpec, encode_and_assemble_single
    from sparktiles.operators.pyramid import assign_point_tiles_multi
    from sparktiles.session import get_spark
    from sparktiles.sources.geoparse import build_features
    from sparktiles.sources.pages import generate_pages

    spark = get_spark(f"sl-scaling-{cpus}", cpus=cpus, extra_conf={
        "spark.sparktiles.encodePartitions": str(4 * cpus)})
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"cpus": cpus, "core_index_before": core_index()}

    t0 = time.time()
    pages = generate_pages(spark, n_pages).repartition(64)
    feats = build_features(pages).cache()
    out["n_features"] = feats.count()
    out["geoparse_s"] = round(time.time() - t0, 2)

    spec = LayerSpec(layer_id="place", index=0,
                     attr_fields={"name": "string"}, buffer_px=8)
    base = "/dev/shm" if Path("/dev/shm").exists() else None
    store = tempfile.mkdtemp(prefix=f"sparktiles_sl_{cpus}_", dir=base)
    try:
        times = []
        for _ in range(repeats):
            t0 = time.time()
            assigned = assign_point_tiles_multi(
                feats, 0, maxzoom, buffer_px=spec.buffer_px)
            encode_and_assemble_single(assigned, spec, 6).write \
                .mode("overwrite").partitionBy("z") \
                .parquet(store + "/tiles")
            times.append(time.time() - t0)
        dt = min(times)
        out["sl_encode_s"] = round(dt, 2)
        n = spark.read.parquet(store + "/tiles").count()
        out["nonempty_tiles"] = n
        out["sl_tiles_per_s"] = round(n / dt, 1)
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

    abba = "--abba" in sys.argv
    argv = [a for a in sys.argv[1:] if a != "--abba"]
    n_pages = int(argv[0]) if len(argv) > 0 else 1_600_000
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
                "bus-starved window, a draw now would understate 8c — not firing")
        if abba:
            # A-B-B-A: a monotonic box-speed drift inflates one pair's
            # efficiency and deflates the other's by the same factor, so
            # the geometric mean of the two pair efficiencies cancels it.
            order = [n_low, n_high, n_high, n_low]
            runs = [_spawn_leg(c, n_pages, maxzoom, 1) for c in order]
            legs = {"pair1": {n_low: runs[0], n_high: runs[1]},
                    "pair2": {n_low: runs[3], n_high: runs[2]}}
        else:
            legs = {cpus: _spawn_leg(cpus, n_pages, maxzoom, 2)
                    for cpus in (n_low, n_high)}
    finally:
        ILOCK.unlink(missing_ok=True)

    factor = n_high / n_low

    def pair_eff(lo: dict, hi: dict) -> float:
        return round((hi["sl_tiles_per_s"] / lo["sl_tiles_per_s"]) / factor, 3)

    def ci(leg: dict) -> float:
        return (leg["core_index_before"] + leg["core_index_after"]) / 2

    if abba:
        e1 = pair_eff(legs["pair1"][n_low], legs["pair1"][n_high])
        e2 = pair_eff(legs["pair2"][n_low], legs["pair2"][n_high])
        eff = round((e1 * e2) ** 0.5, 3)
        all_ci = [ci(legs[p][c]) for p in ("pair1", "pair2")
                  for c in (n_low, n_high)]
        result = {
            "protocol": "ABBA", "n_pages": n_pages, "maxzoom": maxzoom,
            "control": ctl, "pair1": legs["pair1"], "pair2": legs["pair2"],
            "eff_pair1": e1, "eff_pair2": e2,
            "scaling_efficiency_single_layer": eff,
            "core_index_spread": round(max(all_ci) / min(all_ci), 3),
        }
        out_path = "BENCH_SL_SCALING_ABBA.json"
    else:
        lo, hi = legs[n_low], legs[n_high]
        eff = pair_eff(lo, hi)
        drift = ci(lo) / ci(hi) if ci(hi) else 1.0
        result = {
            "n_pages": n_pages, "maxzoom": maxzoom, "control": ctl,
            f"N(local[{n_low}])": lo, f"4N(local[{n_high}])": hi,
            "scaling_efficiency_single_layer": eff,
            "box_speed_drift_low_over_high": round(drift, 3),
            "hw_norm_single_layer": round(eff * drift, 3),
        }
        out_path = "BENCH_SL_SCALING_LARGE.json"
    print(json.dumps(result, indent=1))
    Path(out_path).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
