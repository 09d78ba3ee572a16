"""N vs 4N scaling for the training-data curation operators.

Same protocol as tools/scaling_bench.py (taskset-pinned legs, fresh
JVM per leg, single-core compute index before/after for drift
normalization, the 2v8 compute+bandwidth control gate up front),
applied to the webtext side of the engine: MinHash dedup, ExactSubstr
duplicate-window fractions, and Gopher repetition signals over a
deterministic synthetic corpus (the sf0.1 documents table replicated
R times with remapped doc_ids and a per-replica token prefix, so
dedup work is real, not degenerate).

Two protocol rules learned the hard way (first draft of this tool):

* The synthetic corpus MUST be repartitioned after synthesis. It
  derives from one 5,000-row parquet file (one row group -> ONE input
  partition), and explode() preserves partitioning — without the
  repartition the entire shingle/md5 map side runs in a single task
  and the "scaling" measured is only the post-shuffle tail. A 100 TB
  corpus arrives in thousands of splits; 64 fixed partitions model
  that while keeping both legs' plans identical.
* Timings force the FULL plan via the noop sink, not .count().
  count() lets Catalyst prune: per-doc signal columns that no filter
  consumes are simply never computed, so a count-timed "gopher leg"
  measures a row count of the cache, not the operator.

These operators are hash/string CPU over groupBy shuffles — unlike
the tile-encode legs their compute is md5/ALU work with small shuffle
payloads, so they also probe whether the box's weak tile-leg 2v8
ratios are bus starvation (see BENCH.md) rather than engine
structure.

usage: python tools/curation_scaling.py [replicas] [n_low] [n_high] [ops]
  ops: comma list from dup_window,minhash,gopher,exactsubstr,pack,
       ppl,verify,keepbest
       (default all). Short-leg ops need a bigger corpus to amortize
       the ~1-2 s fixed job cost — filter to them and raise replicas
       rather than reading a 2 s leg's ratio.
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
SF_DIR = "/root/testdata/sf0.1"
ILOCK = Path("/tmp/sparktiles_interactive.lock")
SLOCK = Path("/tmp/sparktiles_scaling.lock")


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
    """2v8 pinned compute+bandwidth control (same gate the scaling
    watcher uses); restores the committed BENCH_HW_CONTROL.json."""
    proc = subprocess.run(
        [sys.executable, str(ROOT / "tools/hw_scaling_control.py"), "2", "8"],
        capture_output=True, text=True, cwd=str(ROOT), timeout=600)
    out = proc.stdout.strip()
    ctl = json.loads(out[out.index("{"):])
    subprocess.run(["git", "checkout", "--", "BENCH_HW_CONTROL.json"],
                   cwd=str(ROOT), capture_output=True)
    return ctl


def corpus(spark, replicas: int):
    """sf0.1 documents x replicas: doc_id remapped per replica; the
    first token gets a replica tag on odd replicas so exact/minhash
    dedup sees both true duplicates and near-misses. Repartitioned to
    64 fixed splits (see module docstring) so the map side
    parallelizes identically in both legs."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rep = docs.select(
        "doc_id", "text", "lang",
        F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("r"))
    out = rep.select(
        (F.col("doc_id") + F.col("r") * 1_000_000).alias("doc_id"),
        F.when(F.col("r") % 2 == 1,
               F.concat(F.format_string("rep%d", F.col("r")), F.lit(" "), F.col("text"))
               ).otherwise(F.col("text")).alias("text"),
        "lang",  # perplexity banding partitions on it
    )
    # n_chars is the keep-best quality column (odd replicas are longer
    # by their tag, so the keeper is deterministic and non-minimal-id)
    return out.withColumn("n_chars", F.length("text")).repartition(64)


def run_leg(cpus: int, replicas: int, ops: set[str]) -> dict:
    from pyspark.sql import functions as F
    from sparktiles.session import get_spark
    from sparktiles.operators.graph import dedup_keep_best
    from sparktiles.operators.sketch import bloom_dedup_incremental
    from sparktiles.operators.text import (
        bpe_pair_counts, dsir_logweights, duplicate_window_fractions,
        exactsubstr_cut, kn_bigram_scores, minhash_dedup,
        minhash_jaccard_verify, pack_sequences, perplexity_buckets,
        repetition_signals, winnowing_fingerprints)

    spark = get_spark(f"curation-scaling-{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"cpus": cpus, "core_index_before": core_index()}

    docs = corpus(spark, replicas).cache()
    n_docs = docs.count()
    out["n_docs"] = n_docs

    def best_of_2(df_fn):
        t = []
        for _ in range(2):
            t0 = time.time()
            # noop sink: every column is computed and serialized, no
            # Catalyst pruning, no disk term (one local page cache
            # would otherwise cap the 8-core leg)
            df_fn().write.format("noop").mode("overwrite").save()
            t.append(time.time() - t0)
        return round(min(t), 3)

    # round-5 additions beyond the first three: the span-REMOVAL
    # sibling of dup_window (the replica corpus makes nearly every
    # window a duplicate, so the covered-set rebuild runs at its
    # worst case), and the two-pass blocked prefix-sum packer (probes
    # whether the blocked scan's extra exchange erodes scaling vs
    # plain map work)
    legs = {
        "dup_window": lambda: duplicate_window_fractions(docs, window=5),
        "minhash": lambda: minhash_dedup(docs, n_hashes=8, band_size=2),
        "gopher": lambda: repetition_signals(docs),
        "exactsubstr": lambda: exactsubstr_cut(docs, window=5),
        "pack": lambda: pack_sequences(docs, budget=256),
        # round-5 late additions: ppl's first draft banded via a
        # lang-partitioned window (parallelism 5, 0.48 at 3M docs); a
        # range-sort rewrite fixed the ratio but re-executed the LM
        # upstream in the boundary-sampling job (2.1x absolute). The
        # leg now measures the granularity-bounded rank decomposition
        # that replaced both.
        "ppl": lambda: perplexity_buckets(docs, vocab_size=16),
        "verify": lambda: minhash_jaccard_verify(docs, threshold=0.5),
        "keepbest": lambda: dedup_keep_best(docs, quality_col="n_chars"),
        # session-11 additions — all three are map-dominant shapes
        # (doc-local partial aggs / bounded key spaces), so they probe
        # the same bus-vs-structure question as gopher
        "winnow": lambda: winnowing_fingerprints(docs, k=8, window=4),
        "dsir": lambda: dsir_logweights(docs),
        "bpe": lambda: bpe_pair_counts(docs, top_k=20),
        # session-13: the order-2 LM — same tokenize-heavy scan family
        # as ppl but with a bigram-count model build + probe; probes
        # whether the KN shape scales where unigram ppl is bus-bound
        "kn": lambda: kn_bigram_scores(docs, vocab_size=16),
        # session-15: Bloom incremental dedup — sketch build (one
        # bounded distinct) + zero-exchange Arrow probe + md5 rescue
        # join; standing/batch split by replica index so even-r batch
        # docs are true dups of standing copies (worst-case rescue)
        "bloom": lambda: bloom_dedup_incremental(
            docs.where(F.col("doc_id") % 4_000_000 >= 1_000_000),
            docs.where(F.col("doc_id") % 4_000_000 < 1_000_000),
            m_bits=1 << 24, k=4),
    }
    for name, fn in legs.items():
        if name not in ops:
            continue
        dt = best_of_2(fn)
        out[f"{name}_s"] = dt
        out[f"{name}_docs_per_s"] = round(n_docs / dt, 1)

    out["core_index_after"] = core_index()
    return out


ALL_OPS = ("dup_window", "minhash", "gopher", "exactsubstr", "pack",
           "ppl", "verify", "keepbest", "winnow", "dsir", "bpe", "kn",
           "bloom")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        ops = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else set(ALL_OPS)
        print("LEGRESULT " + json.dumps(
            run_leg(int(sys.argv[2]), int(sys.argv[3]), ops)))
        return

    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    ops = (sys.argv[4].split(",") if len(sys.argv) > 4 else list(ALL_OPS))

    if SLOCK.exists():
        raise SystemExit("scaling watcher mid-draw (lock present); retry later")
    if ILOCK.exists():  # held by another interactive session — don't clobber
        raise SystemExit("interactive lock present (another heavy job); retry later")
    ILOCK.touch()  # keep the watcher from firing into our windows
    try:
        ctl = control()
        legs = {}
        for cpus in (n_low, n_high):
            cmd = [sys.executable, __file__, "--leg", str(cpus),
                   str(replicas), ",".join(ops)]
            if shutil.which("taskset"):
                cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  cwd=str(Path(__file__).parent.parent))
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

    ci_lo = (lo["core_index_before"] + lo["core_index_after"]) / 2
    ci_hi = (hi["core_index_before"] + hi["core_index_after"]) / 2
    drift = ci_lo / ci_hi if ci_hi else 1.0
    result = {
        "replicas": replicas,
        "n_docs": lo["n_docs"],
        "control": {"compute_eff": ctl["compute"]["efficiency"],
                    "bandwidth_eff": ctl["bandwidth"]["efficiency"]},
        f"N(local[{n_low}])": lo,
        f"4N(local[{n_high}])": hi,
        "box_speed_drift_low_over_high": round(drift, 3),
        "hw_norm": {},
    }
    for op in ops:
        e = eff(f"{op}_docs_per_s")
        result[f"scaling_efficiency_{op}"] = e
        result["hw_norm"][op] = round(e * drift, 3)
    print(json.dumps(result, indent=1))
    out_name = ("BENCH_CURATION_SCALING.json" if set(ops) == set(ALL_OPS)
                else "BENCH_CURATION_SCALING_%s.json" % "_".join(ops))
    Path(out_name).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
