"""A/B bench: hash-min label propagation vs large-star/small-star
connected components on the SAME LSH candidate edge set.

Motivation (BENCH.md round-5 minhash_cc decomposition): at 800k docs
the funnel's dominant stage is the CC closure (~67 s of 87.8 s), and
hash-min's per-round cost is three exchanges over the full edge set
(edges ⋈ labels, groupBy, labels ⋈ mins). The star algorithm
(Kiveris et al. 2014) does one window-min per phase over an edge set
that CONTRACTS as stars form — this tool measures whether that wins
on the funnel's real dup structure (dense: ~all docs in components).

Corpus: funnel_bench.py's replica scheme (even replicas exact copies,
odd replicas token-prefixed) — real near-dup structure, not noise.

usage: python tools/cc_ab_bench.py [replicas] [cpus]
writes BENCH_CC_AB.json
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"


def main():
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from sparktiles.session import get_spark
    from sparktiles.operators.graph import (connected_components,
                                            connected_components_star)
    from sparktiles.operators.text import lsh_buckets, minhash_signatures

    spark = get_spark("cc-ab-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rep = docs.select(
        "doc_id", "text",
        F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("r"))
    corpus = rep.select(
        (F.col("doc_id") + F.col("r") * 1_000_000).alias("doc_id"),
        F.when(F.col("r") % 2 == 1,
               F.concat(F.format_string("rep%d ", F.col("r")),
                        F.col("text"))).otherwise(F.col("text")).alias("text"),
    ).repartition(64)
    n_docs = corpus.count()

    t0 = time.time()
    sigs = minhash_signatures(corpus)
    buckets = lsh_buckets(sigs)
    edges = buckets.where(F.col("bucket_size") > 1).select(
        F.explode("members").alias("src"),
        F.col("canonical_id").alias("dst")).localCheckpoint()
    n_edges = edges.count()
    t_edges = round(time.time() - t0, 2)

    out = {"replicas": replicas, "cpus": cpus, "n_docs": n_docs,
           "n_edges": n_edges, "edge_build_s": t_edges}

    results = {}
    for name, fn in (("star", connected_components_star),
                     ("hashmin", connected_components)):
        t0 = time.time()
        cc = fn(edges).localCheckpoint()
        n_nodes = cc.count()
        dt = round(time.time() - t0, 2)
        chk = cc.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("component").alias("n_comp"),
            F.sum(F.xxhash64("node", "component")
                  .cast("decimal(38,0)")).alias("h")).collect()[0]
        results[name] = {"wall_s": dt, "n_nodes": n_nodes,
                         "n_components": int(chk["n_comp"]),
                         "label_hash": str(chk["h"])}
        print(json.dumps({name: results[name]}), flush=True)

    out["algorithms"] = results
    out["labels_identical"] = (
        results["star"]["label_hash"] == results["hashmin"]["label_hash"]
        and results["star"]["n_nodes"] == results["hashmin"]["n_nodes"])
    out["speedup_star_vs_hashmin"] = round(
        results["hashmin"]["wall_s"] / max(results["star"]["wall_s"], 1e-9), 3)
    print(json.dumps(out, indent=1))
    Path("BENCH_CC_AB.json").write_text(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
