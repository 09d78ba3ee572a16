"""Targeted per-query bench + plan capture (guide §1.1/§1.4/§7.2).

bench.py is frozen for measurement; this harness exists so individual
queries can be isolated through the noop sink at any scale factor and
their .explain("formatted") plans captured, without touching the
driver's timing contract.

usage:
  python bench_extra.py time  <sf_dir> <runs> <query> [query ...]
  python bench_extra.py plan  <sf_dir> <outdir> <query> [query ...]
  python bench_extra.py rows  <sf_dir> <out.jsonl> <query> [query ...]

`rows` dumps a canonicalized, order-insensitive digest of the full
result (same canon rules as tools/check_entry.py) so before/after
equivalence of a restructured query can be proven at scale factors the
DuckDB oracle is too slow for.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 2**53:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def digest(df):
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(tuple(canon(r[i]) for i in order) for r in df.collect())
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return {"rows": len(rows), "cols": sorted(cols), "sha": h.hexdigest()}


def main():
    mode, sf_dir = sys.argv[1], sys.argv[2]
    import sparktiles.queries as Q
    from sparktiles.session import get_spark

    spark = get_spark("bench-extra", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    if mode == "time":
        runs, names = int(sys.argv[3]), sys.argv[4:]
        out = {}
        for name in names:
            fn = Q.QUERIES[name]
            best = None
            samples = []
            for _ in range(runs):
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                samples.append(round(dt, 3))
                best = dt if best is None or dt < best else best
            out[name] = {"min": round(best, 3), "samples": samples}
            print(json.dumps({name: out[name]}), flush=True)
        print(json.dumps({"sf": sf_dir, "cpus": CPUS, "results": out}))
    elif mode == "plan":
        outdir, names = sys.argv[3], sys.argv[4:]
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = Q.QUERIES[name](spark, sf_dir)
            p = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            path = os.path.join(outdir, f"{name}.txt")
            with open(path, "w") as f:
                f.write(p)
            print(f"wrote {path} ({len(p)} bytes)", flush=True)
    elif mode == "rows":
        out_path, names = sys.argv[3], sys.argv[4:]
        with open(out_path, "a") as f:
            for name in names:
                d = digest(Q.QUERIES[name](spark, sf_dir))
                rec = {"query": name, "sf": sf_dir, **d}
                f.write(json.dumps(rec) + "\n")
                print(json.dumps(rec), flush=True)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
