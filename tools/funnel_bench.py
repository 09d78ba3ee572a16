"""End-to-end training-data curation funnel at corpus scale.

The webtext showcase: one pipeline chaining the engine's curation
operators the way a Common-Crawl curation job actually runs them,
each stage consuming the previous stage's survivors, with per-stage
survivor counts and throughput. Corpus: the sf0.1 documents table
replicated R times (curation_scaling.py's scheme: even replicas are
exact copies, odd replicas get a distinct token prefix so near-dup
detection has real work) plus a synthetic crawl URL per row (four
scheme/tracking/fragment variants per canonical so URL dedup has
real work) and the original lang column for the final sampling.

Stages
0. normalize        C4/ftfy normalization (mojibake + spacing fixes;
                    odd replicas carry injected mojibake so the stage
                    has real repairs to make)
1. url_dedup        canonical-URL dedup (best doc per canonical)
2. exact_dedup      md5 content dedup
3. minhash_cc       MinHash-LSH + connected-components closure
4. span_cut         ExactSubstr duplicate-span removal (doc rebuild)
5. quality_gate     Gopher repetition gate + CCNet per-lang ppl band
                    (head/middle kept, tail cut)
6. decontaminate    benchmark 5-gram decontamination
7. classifier_gate  FineWeb-Edu-shape model gate: distill the per-lang
                    LM band (ppl_bucket == head) into a linear scorer
                    on cheap surface features, trained ON this
                    funnel's survivors (40 one-job GD iterations over
                    a checkpointed 6-double/row frame), then keep
                    positive logits — serving is one map-side
                    projection. Runs before dsir, while head/middle
                    is still balanced
8. dsir_select      DSIR importance cut toward the head-band gram
                    profile (log_weight > 0)
9. sample           stratified per-lang quota
10. split           leakage-safe train/holdout split (whole near-dup
                    components stay on one side); train side proceeds
11. pack_1024       concat-and-chunk packing at a 1024-token budget

usage: python tools/funnel_bench.py [replicas] [cpus]
writes BENCH_CURATION_FUNNEL.json
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"


def main():
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from sparktiles.session import get_spark
    from sparktiles.operators.graph import (leakage_safe_split,
                                            minhash_dedup_cc)
    from sparktiles.operators.text import (
        dedup_url_canonical,
        decontaminate,
        dsir_logweights,
        exact_dedup,
        exactsubstr_cut,
        normalize_text,
        pack_sequences,
        perplexity_buckets,
        repetition_signals,
        stratified_sample,
    )

    spark = get_spark("funnel-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rep = docs.select(
        "doc_id", "text", "lang",
        F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("r"))
    did = (F.col("doc_id") + F.col("r") * 1_000_000).alias("doc_id")
    text = F.when(
        F.col("r") % 2 == 1,
        F.concat(F.format_string("rep%d", F.col("r")),
                 F.lit("\u00e2\u20ac\u2122s  "),
                 F.col("text"))).otherwise(F.col("text")).alias("text")
    # URL variants: every 5th replica refetches replica r-4's page
    # through a different scheme/tracking/fragment combination, so
    # canonical-URL dedup has real (and bounded) work
    canon_r = F.when(F.col("r") % 5 == 4, F.col("r") - 4).otherwise(F.col("r"))
    canon_id = (F.col("doc_id") * 1000 + canon_r)
    url = F.concat(
        F.when(F.col("r") % 4 == 0, F.lit("https://www."))
        .otherwise(F.lit("http://")),
        F.lit("d"), (F.col("doc_id") % 997).cast("string"),
        F.lit(".example.com/p/"), canon_id.cast("string"),
        F.when(F.col("r") % 4 == 1, F.lit("?utm_source=crawl"))
        .when(F.col("r") % 4 == 2, F.lit("/#frag"))
        .otherwise(F.lit(""))).alias("url")
    corpus = rep.select(did, text, "lang", url,
                        F.length("text").alias("n_chars")) \
        .repartition(64).cache()
    n0 = corpus.count()

    stages = []
    result = {"replicas": replicas, "cpus": cpus, "n_docs_in": n0}

    def stage(name, n_in, fn):
        t0 = time.time()
        out_df, n_out = fn()
        # stage boundary = a table write in a real pipeline. Truncate
        # the logical plan here (reads back the just-counted cache):
        # self-referencing downstream stages (dsir fits two bucket
        # models on the same frame, ppl joins scores back to langs)
        # otherwise replicate the WHOLE upstream funnel lineage per
        # reference and the plan string alone OOMs the driver.
        out_df = out_df.localCheckpoint()
        dt = round(time.time() - t0, 2)
        stages.append({"stage": name, "in_docs": n_in, "out_docs": n_out,
                       "wall_s": dt, "docs_per_s": round(n_in / dt, 1)})
        print(json.dumps(stages[-1]), flush=True)
        return out_df, n_out

    # 0. normalization — rebuild the text column through the C4/ftfy
    # chain; row count is unchanged, repaired-doc count is recorded
    def s_norm():
        nt = normalize_text(corpus)
        result["normalize_changed_docs"] = int(
            nt.agg(F.sum(F.col("changed").cast("int"))).collect()[0][0])
        out = (corpus.drop("text", "n_chars")
               .join(nt.select("doc_id",
                               F.col("norm_text").alias("text")),
                     "doc_id")
               .withColumn("n_chars", F.length("text")).cache())
        return out, out.count()
    corpus, n0b = stage("normalize", n0, s_norm)

    # 1. URL dedup (keeps best doc per canonical URL)
    def s_url():
        kept = dedup_url_canonical(corpus).select("doc_id")
        out = corpus.join(kept, "doc_id").select(
            "doc_id", "text", "lang").cache()
        return out, out.count()
    cur, n = stage("url_dedup", n0b, s_url)

    # 2. exact content dedup (canonical id survives)
    def s_exact():
        keep = exact_dedup(cur).select(
            F.col("canonical_id").alias("doc_id"))
        out = cur.join(keep, "doc_id").cache()
        return out, out.count()
    cur, n = stage("exact_dedup", n, s_exact)

    # 3. MinHash-LSH near-dup + connected-components closure
    def s_cc():
        mapping = minhash_dedup_cc(cur)
        dropped = mapping.where(
            F.col("doc_id") != F.col("canonical_id")).select("doc_id")
        out = cur.join(dropped, "doc_id", "left_anti").cache()
        return out, out.count()
    cur, n = stage("minhash_cc", n, s_cc)

    # 4. ExactSubstr span removal: cut every 5-token window that still
    # occurs >1 time among the near-dup survivors, drop docs left with
    # fewer than 10 tokens (out_docs falls only by those)
    def s_spancut():
        cut = exactsubstr_cut(cur, window=5)
        out = (cut.where(F.col("n_tokens") - F.col("n_removed") >= 10)
               .join(cur.select("doc_id", "lang"), "doc_id")
               .select("doc_id", F.col("kept_text").alias("text"), "lang")
               .cache())
        return out, out.count()
    cur, n = stage("span_cut", n, s_spancut)

    # 5. quality gates: Gopher repetition + the CCNet per-language
    # perplexity band (equal-frequency head/middle/tail on self-trained
    # LM bits/token; tail = the gibberish end, cut). Adaptive per
    # language, unlike a fixed bits threshold.
    def s_quality():
        gate = repetition_signals(cur).where(~F.col("repetitive")) \
            .select("doc_id")
        bands = perplexity_buckets(cur, vocab_size=1024, n_buckets=3)
        keep = bands.where(F.col("ppl_bucket") != "tail") \
            .select("doc_id", "ppl_bucket")
        out = cur.join(gate, "doc_id").join(keep, "doc_id").cache()
        return out, out.count()
    cur, n = stage("quality_gate", n, s_quality)

    # 6. benchmark decontamination (5-gram overlap vs a held-out set)
    def s_decontam():
        bench = docs.limit(50).select("doc_id", "text")
        flags = decontaminate(cur, bench).where(~F.col("contaminated")) \
            .select("doc_id")
        out = cur.join(flags, "doc_id").cache()
        return out, out.count()
    cur, n = stage("decontaminate", n, s_decontam)

    # 7. model-based quality gate: the classifier is trained HERE, on
    # the funnel's own survivors, to predict the expensive per-lang LM
    # head band from five cheap surface signals — then applied as pure
    # column math. It must run BEFORE dsir (which also selects toward
    # head): head vs middle is ~balanced at this point (tail already
    # cut), so a 0 logit threshold cuts real mass without emptying
    # the funnel; after dsir the label is nearly all-positive and the
    # gate would be vacuous.
    def s_classifier():
        from sparktiles.operators.classify import (lr_score, lr_train,
                                                   quality_features)
        feat = quality_features(cur).withColumn(
            "_lbl", (F.col("ppl_bucket") == "head").cast("int"))
        w = lr_train(feat, "_lbl", iters=40, lr=2.0)
        result["classifier_weights"] = [round(x, 4) for x in w]
        out = (lr_score(quality_features(cur), weights=w)
               .where("lr_keep")
               .select("doc_id", "text", "lang", "ppl_bucket").cache())
        return out, out.count()
    cur, n = stage("classifier_gate", n, s_classifier)

    # 8. DSIR importance selection toward the head-band gram profile:
    # fit target (ppl_bucket = head survivors) vs raw bucket models on
    # the corpus itself and keep docs whose hashed-gram profile looks
    # MORE like the head band than like the average (log_weight > 0)
    def s_dsir():
        w = dsir_logweights(cur, target_col="ppl_bucket",
                            target_value="head")
        keep = w.where(F.col("log_weight") > 0).select("doc_id")
        out = cur.join(keep, "doc_id").cache()
        return out, out.count()
    cur, n = stage("dsir_select", n, s_dsir)

    # 9. stratified per-lang quota sample (rejoin text for the packer)
    pre_sample = cur

    def s_sample():
        keep = stratified_sample(cur, "lang", quota=2000).select("doc_id")
        out = pre_sample.join(keep, "doc_id").cache()
        return out, out.count()
    cur, n = stage("sample", n, s_sample)

    # 9. leakage-safe split: whole near-dup components on one side;
    # the holdout fraction leaves the training funnel here
    def s_split():
        sp = leakage_safe_split(cur, holdout_pct=10)
        result["holdout_docs"] = sp.where(
            F.col("side") == "holdout").count()
        out = cur.join(sp.where(F.col("side") == "train")
                       .select("doc_id"), "doc_id").cache()
        return out, out.count()
    cur, n = stage("split", n, s_split)

    # 10. concat-and-chunk packing at a 1024-token training budget —
    # the survivors leave as fixed-budget sequences; out_docs is the
    # doc rows annotated, packed_chunks the sequences produced
    def s_pack():
        packed = pack_sequences(cur, budget=1024).cache()
        row = packed.agg(
            F.sum("n_tokens").alias("tok"),
            F.max("last_chunk").alias("mx"),
            F.sum(F.col("crosses_boundary").cast("int")).alias("xb"),
        ).collect()[0]
        result["packed_tokens"] = int(row["tok"])
        result["packed_chunks"] = int(row["mx"]) + 1
        result["boundary_crossing_docs"] = int(row["xb"])
        return packed, packed.count()
    cur, n = stage("pack_1024", n, s_pack)

    result["stages"] = stages
    result["n_docs_out"] = n
    total = round(sum(s["wall_s"] for s in stages), 2)
    result["total_wall_s"] = total
    result["end_to_end_docs_per_s"] = round(n0 / total, 1)
    print(json.dumps(result, indent=1))
    Path("BENCH_CURATION_FUNNEL.json").write_text(json.dumps(result, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
