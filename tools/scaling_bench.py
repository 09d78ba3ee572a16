"""Scaling-efficiency evidence (BASELINE.json north_rule).

Runs the identical tile-build job on the identical deterministic input
at two parallelism levels (local[8] = N, local[32] = 4N — the sandbox
stand-in for N vs 4N executors) and reports per-phase throughput at
both plus efficiency = (thr_4N / thr_N) / 4.

Each leg runs in its OWN subprocess (fresh JVM: heap sizing, GC state
and broadcast caches cannot leak between legs). The tile store lives
on tmpfs so the measurement captures compute scaling, not the single
local NVMe (a cluster writes to per-executor object-store shards).

usage:
  python tools/scaling_bench.py [n_pages] [maxzoom]         # both legs
  python tools/scaling_bench.py --leg CPUS N_PAGES MAXZOOM  # one leg
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import tempfile
import time
from dataclasses import replace
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def total_shuffle_write(spark) -> int:
    """Sum of shuffle-write bytes over all completed stages so far
    (Spark's own per-stage metrics via the local REST API)."""
    import json as j
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete", timeout=10
        ) as r:
            stages = j.load(r)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return -1


def dir_bytes(path: str) -> int:
    return sum(p.stat().st_size for p in Path(path).rglob("*") if p.is_file())


def core_index(seconds: float = 3.0) -> float:
    """Single-thread cache-resident compute index (iterations/s of a
    fixed numpy sin loop) under THIS leg's cpu affinity. On a shared VM
    the box's per-core speed drifts between the two legs (co-tenant
    load); recording the index before/after each leg lets the N->4N
    ratio be normalized to equal box speed — the drift-corrected number
    a dedicated cluster would show."""
    import numpy as np

    a = np.random.default_rng(0).random(200_000)
    t_end = time.time() + seconds
    it = 0
    while time.time() < t_end:
        np.sin(a).sum()
        it += 1
    return round(it / seconds, 1)


def run_leg(cpus: int, n_pages: int, maxzoom: int, gzip_level=6) -> dict:
    import os

    os.environ["SPARK_DRIVER_MEM"] = "24g"
    from sparktiles.session import get_spark
    from sparktiles.sources.pages import generate_pages
    from sparktiles.sources.geoparse import build_features
    from sparktiles.sources.lines import generate_lines
    from sparktiles.sources.polygons import generate_polygons
    from sparktiles.operators.mvt import LayerSpec, encode_and_assemble_single
    from sparktiles.operators.pyramid import assign_point_tiles_multi
    from sparktiles.plans.config import FieldDef, LayerDef, TilesetDef
    from sparktiles.plans.pipeline import BuildConfig, TileBuild, make_point_layer_frames

    # UI on for this bench only: shuffle-write bytes come from the
    # per-stage REST metrics
    spark = get_spark(f"scaling-{cpus}", cpus=cpus,
                      extra_conf={"spark.ui.enabled": "true",
                                  # compute-heavy corpus: pin the encode
                                  # exchange at 4 waves/core (see
                                  # grouped_map_sorted, operators/mvt.py)
                                  "spark.sparktiles.encodePartitions":
                                  str(4 * cpus)})
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"cpus": cpus, "core_index_before": core_index()}

    t0 = time.time()
    # fixed task count on both legs: the experiment varies ONLY the
    # number of concurrent slots, like adding executors to a cluster
    pages = generate_pages(spark, n_pages).repartition(64)
    feats = build_features(pages).cache()
    n = feats.count()
    out["n_features"] = n
    out["geoparse_s"] = round(time.time() - t0, 2)

    # min-of-2 per phase: absorbs frequency/cache-contention noise
    slim = feats.select("feature_id", "px", "py")
    times = []
    for _ in range(2):
        t0 = time.time()
        join_rows = assign_point_tiles_multi(slim, 0, maxzoom, buffer_px=8).count()
        times.append(time.time() - t0)
    dt = min(times)
    out["join_rows"] = join_rows
    out["spatial_join_s"] = round(dt, 2)
    out["spatial_join_rows_per_s"] = round(join_rows / dt, 1)

    tileset = TilesetDef(
        name="scaling",
        layers=[LayerDef(id="place", fields=[FieldDef("name")], buffer_size=8)],
        minzoom=0, maxzoom=maxzoom,
    )
    frames = make_point_layer_frames(feats, tileset)
    base = "/dev/shm" if Path("/dev/shm").exists() else None
    store = tempfile.mkdtemp(prefix=f"sparktiles_scale_{cpus}_", dir=base)
    try:
        spec_, f_ = frames[0]
        enc_times = []
        shuffle_deltas = []
        for _ in range(2):
            sb0 = total_shuffle_write(spark)
            t0 = time.time()
            assigned = assign_point_tiles_multi(f_, 0, maxzoom, buffer_px=spec_.buffer_px)
            # the real single-layer build path: fused encode+assemble,
            # one (packed zxy) shuffle for the whole pyramid; gzip'd
            # blobs (reference default) — compression shrinks the store
            # write (the bandwidth term this box cannot scale) and costs
            # CPU (the term that DOES scale with cores)
            tiles = encode_and_assemble_single(assigned, spec_, gzip_level)
            tiles.write.mode("overwrite").partitionBy("z").parquet(store + "/tiles_all")
            enc_times.append(time.time() - t0)
            sb1 = total_shuffle_write(spark)
            if sb0 >= 0 and sb1 >= 0:
                shuffle_deltas.append(sb1 - sb0)
        dt1 = min(enc_times)
        if shuffle_deltas:
            out["mvt_shuffle_write_bytes"] = min(shuffle_deltas)
        out["mvt_encode_s"] = round(dt1, 2)
        # engine-only twin: identical plan, store write replaced by the
        # noop sink — separates compute+shuffle scaling from the
        # parquet/tmpfs write tail (one local disk/page-cache, which a
        # cluster would shard per executor)
        noio_times = []
        for _ in range(2):
            t0 = time.time()
            assigned = assign_point_tiles_multi(
                f_, 0, maxzoom, buffer_px=spec_.buffer_px)
            encode_and_assemble_single(assigned, spec_, gzip_level) \
                .write.format("noop").mode("overwrite").save()
            noio_times.append(time.time() - t0)
        out["mvt_encode_noio_s"] = round(min(noio_times), 2)
        out["mvt_gzip_level"] = gzip_level
        out["mvt_store_bytes"] = dir_bytes(store + "/tiles_all")
        out["mvt_bytes_per_s"] = round(
            (out["mvt_store_bytes"]
             + max(0, out.get("mvt_shuffle_write_bytes", 0))) / dt1)
        n_nonempty = spark.read.parquet(store + "/tiles_all").count()
        out["nonempty_tiles"] = n_nonempty
        out["mvt_tiles_per_s"] = round(n_nonempty / dt1, 1)

        # ---- multi-layer point+line+polygon build: the WKB (vecmvt)
        # map-side encode + SINGLE-SHUFFLE normalized assembly (round 5
        # fused the per-layer encode shuffles and the blob reshuffle
        # into one zxy exchange) — the path every real tileset uses
        # (reference tests/testlayers/testmaptiles.yaml)
        # round 4: supercover assignment cut the line layer's absolute
        # cost 6x, shortening the ml phase into VM-noise territory;
        # 2.5x more lines restores a meaningful phase length AND makes
        # the mix more like the reference's line-dominated real tiles
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
        ml_times, ml_shuffles = [], []
        mlb = TileBuild(spark, ml_frames, BuildConfig(
            store_dir=store + "/ml", minzoom=0, maxzoom=maxzoom,
            mid_zoom=6, gzip_level=gzip_level))
        for _ in range(2):
            sb0 = total_shuffle_write(spark)
            t0 = time.time()
            tiles = mlb._build_tiles((0, maxzoom), None)
            tiles.write.mode("overwrite").partitionBy("z").parquet(
                store + "/ml_tiles")
            ml_times.append(time.time() - t0)
            sb1 = total_shuffle_write(spark)
            if sb0 >= 0 and sb1 >= 0:
                ml_shuffles.append(sb1 - sb0)
        dt_ml = min(ml_times)
        out["ml_encode_s"] = round(dt_ml, 2)
        if ml_shuffles:
            out["ml_shuffle_write_bytes"] = min(ml_shuffles)
        out["ml_store_bytes"] = dir_bytes(store + "/ml_tiles")
        ml_tiles = spark.read.parquet(store + "/ml_tiles").count()
        out["ml_nonempty_tiles"] = ml_tiles
        out["ml_tiles_per_s"] = round(ml_tiles / dt_ml, 1)

        # ---- capped multi-layer build: the PRODUCTION low-zoom shape.
        # The uncapped ml phase carries a deliberate skew stress: at
        # z<=2 one (z,x,y) group encodes the whole corpus in one task
        # (~20 s serial-equivalent share on this corpus — measured via
        # S+P/k fit across the attempts journal), which Amdahl-bounds
        # its N->4N ratio no matter how fast the kernels get. Real
        # tilesets never ship uncapped low zooms — the reference gates
        # density per tile (DISTINCT ON LabelGrid rank,
        # sql/LabelGrid.sql:20-29; zoom-gated classes) — and
        # docs/SCALE.md claims that cap is what bounds reducer skew at
        # 100 TB. This phase measures that claim: identical layers,
        # LayerSpec.max_features_per_tile set, same single-exchange
        # plan. Cap keeps the top row of every tile, so the non-empty
        # tile universe is identical to the uncapped phase.
        mlc_frames = [
            (replace(spec, max_features_per_tile=cap_n), df)
            for (spec, df), cap_n in zip(ml_frames, (1024, 512, 256))
        ]
        mlc_times, mlc_shuffles = [], []
        mlcb = TileBuild(spark, mlc_frames, BuildConfig(
            store_dir=store + "/mlc", minzoom=0, maxzoom=maxzoom,
            mid_zoom=6, gzip_level=gzip_level))
        for _ in range(2):
            sb0 = total_shuffle_write(spark)
            t0 = time.time()
            tiles = mlcb._build_tiles((0, maxzoom), None)
            tiles.write.mode("overwrite").partitionBy("z").parquet(
                store + "/mlc_tiles")
            mlc_times.append(time.time() - t0)
            sb1 = total_shuffle_write(spark)
            if sb0 >= 0 and sb1 >= 0:
                mlc_shuffles.append(sb1 - sb0)
        dt_mlc = min(mlc_times)
        out["mlc_encode_s"] = round(dt_mlc, 2)
        if mlc_shuffles:
            out["mlc_shuffle_write_bytes"] = min(mlc_shuffles)
        out["mlc_store_bytes"] = dir_bytes(store + "/mlc_tiles")
        mlc_tiles = spark.read.parquet(store + "/mlc_tiles").count()
        out["mlc_nonempty_tiles"] = mlc_tiles
        out["mlc_tiles_per_s"] = round(mlc_tiles / dt_mlc, 1)
        # engine-only twin (same pattern as mvt_encode_noio_s): identical
        # single-exchange capped plan, noop sink. Separates kernel+shuffle
        # scaling from the partitioned-parquet commit tail — file count
        # grows with partitions (anti-scaling on one local tmpfs: ~4x the
        # files at 4N), whereas a cluster commits per-executor shards.
        mlc_noio_times = []
        for _ in range(2):
            t0 = time.time()
            mlcb._build_tiles((0, maxzoom), None) \
                .write.format("noop").mode("overwrite").save()
            mlc_noio_times.append(time.time() - t0)
        out["mlc_encode_noio_s"] = round(min(mlc_noio_times), 2)
        out["mlc_noio_tiles_per_s"] = round(
            mlc_tiles / min(mlc_noio_times), 1)

        t0 = time.time()
        b = TileBuild(spark, frames, BuildConfig(
            store_dir=store, minzoom=0, maxzoom=maxzoom, mid_zoom=6))
        summary = b.build_fast()
        dt2 = time.time() - t0
        out["bookkeeping_s"] = round(dt2, 2)
        out["tiles"] = summary["tiles"]
        out["pyramid_s"] = round(dt1 + dt2, 2)
        out["tiles_per_s"] = round(summary["tiles"] / (dt1 + dt2), 1)
    finally:
        shutil.rmtree(store, ignore_errors=True)
    spark.stop()
    out["core_index_after"] = core_index()
    return out


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        cpus, n_pages, maxzoom = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
        print("LEGRESULT " + json.dumps(run_leg(cpus, n_pages, maxzoom)))
        return

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    maxzoom = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_low = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_high = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    legs = {}
    for cpus in (n_low, n_high):
        # pin the whole leg (JVM + python workers) to exactly `cpus`
        # cores: a cluster executor with N cores has N cores — without
        # pinning, GC/netty/Arrow threads of the "N" leg spill onto the
        # machine's idle cores and overstate small-leg throughput,
        # understating N->4N efficiency. Java 17 reads the affinity
        # mask, so spark sees the right availableProcessors too.
        cmd = [sys.executable, __file__, "--leg", str(cpus), str(n_pages), str(maxzoom)]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
        proc = subprocess.run(
            cmd,
            capture_output=True, text=True, cwd=str(Path(__file__).parent.parent),
        )
        line = next((l for l in proc.stdout.splitlines()
                     if l.startswith("LEGRESULT ")), None)
        if line is None:
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
            raise RuntimeError(f"leg {cpus} failed")
        legs[cpus] = json.loads(line[len("LEGRESULT "):])

    r8, r32 = legs[n_low], legs[n_high]

    def eff(metric, invert=False):
        a, b = r8[metric], r32[metric]
        return round(((a / b) if invert else (b / a)) / 4, 3)

    # box-speed drift correction: per-core compute index measured
    # inside each pinned leg (mean of before/after). If the box ran
    # slower during one leg (co-tenant load), the raw ratio mis-states
    # what equal-speed hardware would show; hw_norm rescales the high
    # leg's throughput to the low leg's box speed.
    ci_low = (r8["core_index_before"] + r8["core_index_after"]) / 2
    ci_high = (r32["core_index_before"] + r32["core_index_after"]) / 2
    drift = ci_low / ci_high if ci_high else 1.0

    def eff_norm(metric, invert=False):
        return round(eff(metric, invert) * drift, 3)

    result = {
        "n_pages": n_pages,
        "maxzoom": maxzoom,
        f"N(local[{n_low}])": r8,
        f"4N(local[{n_high}])": r32,
        "scaling_efficiency_tiles": eff("tiles_per_s"),
        "scaling_efficiency_join": eff("spatial_join_rows_per_s"),
        "scaling_efficiency_mvt_encode": eff("mvt_tiles_per_s"),
        "scaling_efficiency_multilayer": eff("ml_tiles_per_s"),
        "scaling_efficiency_multilayer_capped": eff("mlc_tiles_per_s")
        if "mlc_tiles_per_s" in r8 else None,
        "scaling_efficiency_multilayer_capped_noio":
        eff("mlc_encode_noio_s", invert=True)
        if "mlc_encode_noio_s" in r8 else None,
        "scaling_efficiency_geoparse": eff("geoparse_s", invert=True),
        "box_speed_drift_low_over_high": round(drift, 3),
        "hw_norm": {
            "tiles": eff_norm("tiles_per_s"),
            "join": eff_norm("spatial_join_rows_per_s"),
            "mvt_encode": eff_norm("mvt_tiles_per_s"),
            "mvt_encode_noio": eff_norm("mvt_encode_noio_s", invert=True)
            if "mvt_encode_noio_s" in r8 else None,
            "multilayer": eff_norm("ml_tiles_per_s"),
            "multilayer_capped": eff_norm("mlc_tiles_per_s")
            if "mlc_tiles_per_s" in r8 else None,
            "multilayer_capped_noio": eff_norm(
                "mlc_encode_noio_s", invert=True)
            if "mlc_encode_noio_s" in r8 else None,
            "geoparse": eff_norm("geoparse_s", invert=True),
        },
        # bandwidth-normalized decomposition: bytes the encode phase
        # moved (store write + shuffle write) per second of wall — how
        # much of each leg is bus, not compute
        "mvt_bytes_per_s_N": r8.get("mvt_bytes_per_s"),
        "mvt_bytes_per_s_4N": r32.get("mvt_bytes_per_s"),
    }
    print(json.dumps(result, indent=1))
    Path("BENCH_SCALING.json").write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
