"""Crash-resume demonstration of a store-backed curation funnel.

The checkpoint-resume contract (north rule: "resumable from
checkpoint with per-partition lineage + metrics") exercised at corpus
scale through plans/curation.py: run a six-stage funnel over the
replicated sf0.1 corpus, then simulate a crash by deleting the last
three stage outputs (plus wrecking one with a partial, _SUCCESS-less
directory) and resume. Reports:

- full-run wall vs resumed wall (resume must not pay for the
  completed prefix — the dedup stages dominate, so the resumed run
  should cost roughly the suffix alone);
- survivor equality: the resumed run's final doc_id set must be
  byte-identical to the fresh run's (deterministic stages);
- the lineage table both runs leave behind (per-partition rows).

usage: python tools/funnel_resume_demo.py [replicas] [cpus]
writes BENCH_CURATION_RESUME.json
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def stages():
    from pyspark.sql import functions as F

    from sparktiles.operators.graph import minhash_dedup_cc
    from sparktiles.operators.text import (exact_dedup, normalize_text,
                                           repetition_signals,
                                           stratified_sample)

    def s_norm(df):
        return (df.drop("text")
                .join(normalize_text(df)
                      .select("doc_id", F.col("norm_text").alias("text")),
                      "doc_id"))

    def s_exact(df):
        keep = exact_dedup(df).select(F.col("canonical_id").alias("doc_id"))
        return df.join(keep, "doc_id")

    def s_cc(df):
        dropped = minhash_dedup_cc(df).where(
            F.col("doc_id") != F.col("canonical_id")).select("doc_id")
        return df.join(dropped, "doc_id", "left_anti")

    def s_gate(df):
        return df.join(repetition_signals(df)
                       .where(~F.col("repetitive")).select("doc_id"),
                       "doc_id")

    def s_sample(df):
        return df.join(stratified_sample(df, "lang", quota=2000)
                       .select("doc_id"), "doc_id")

    def s_pack_prep(df):
        return df.select("doc_id", "lang", F.length("text").alias("n_chars"))

    return [("normalize", s_norm), ("exact_dedup", s_exact),
            ("minhash_cc", s_cc), ("quality_gate", s_gate),
            ("sample", s_sample), ("pack_prep", s_pack_prep)]


def main():
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from curation_scaling import corpus

    from sparktiles.plans.curation import CurationPipeline
    from sparktiles.session import get_spark

    spark = get_spark("funnel-resume", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = corpus(spark, replicas).cache()
    n0 = docs.count()

    store = Path(tempfile.mkdtemp(prefix="funnel_store_"))
    pipe = CurationPipeline(spark, str(store), stages())

    t0 = time.time()
    out = pipe.run(docs)
    full_ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    full_s = round(time.time() - t0, 2)

    # --- simulated crash: the last three stages are lost; the one we
    # "died inside" is a partial directory with no _SUCCESS marker
    for name in ("03_quality_gate", "04_sample", "05_pack_prep"):
        shutil.rmtree(store / name)
    wreck = store / "03_quality_gate"
    wreck.mkdir()
    (wreck / "part-00000.parquet").write_bytes(b"torn write")

    t1 = time.time()
    out2 = CurationPipeline(spark, str(store), stages()).run(docs)
    res_ids = sorted(r["doc_id"] for r in out2.select("doc_id").collect())
    resume_s = round(time.time() - t1, 2)

    metrics = [r.asDict() for r in pipe.stage_metrics().collect()]
    result = {
        "replicas": replicas, "cpus": cpus, "n_docs_in": n0,
        "survivors": len(full_ids),
        "full_run_s": full_s,
        "resume_after_crash_s": resume_s,
        "resume_reuses_prefix": resume_s < full_s,
        "resumed_equals_fresh": res_ids == full_ids,
        "stage_metrics": metrics,
    }
    print(json.dumps(result, indent=1))
    Path("BENCH_CURATION_RESUME.json").write_text(json.dumps(result, indent=1))
    shutil.rmtree(store, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
