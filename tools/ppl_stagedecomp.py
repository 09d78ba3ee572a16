"""Stage decomposition of the perplexity-buckets 2v8 scaling leg.

Three ppl draws read 0.43-0.54 raw while verify (0.926), keepbest
(0.832) and gopher (0.95-1.1) passed in the same windows — so the leg,
not the box, owns the loss. This tool splits the operator into its
three phases and measures each at both core counts (same pinned
fresh-JVM protocol as curation_scaling):

  p1_count   tokenize + explode + groupBy(tok) count      (the cf pass)
  p2_lm      full unigram_lm_scores                       (p1 + 2nd
             tokenize + broadcast-join scoring + groupBy(doc))
  p3_ppl     full perplexity_buckets                      (p2 + lang
             join + granularity-rank banding)

The per-phase 2v8 ratios localize the non-scaling term: a phase whose
ratio tracks gopher's (~0.9+) is healthy; the first phase that drops
is the culprit.

usage: python tools/ppl_stagedecomp.py [replicas] [n_low] [n_high]
writes BENCH_PPL_STAGEDECOMP.json
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

ROOT = Path(__file__).resolve().parent.parent


def run_leg(cpus: int, replicas: int) -> dict:
    from pyspark.sql import functions as F

    from curation_scaling import core_index, corpus
    from sparktiles.session import get_spark
    from sparktiles.operators.text import (perplexity_buckets,
                                           unigram_lm_scores)

    spark = get_spark(f"ppl-decomp-{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"cpus": cpus, "core_index_before": core_index()}
    docs = corpus(spark, replicas).cache()
    out["n_docs"] = docs.count()

    def p1():
        toks = docs.select(
            F.col("doc_id"),
            F.explode(F.split(F.col("text"), " ")).alias("tok"),
        ).where(F.col("tok") != "")
        return toks.groupBy("tok").agg(F.count("*").alias("cf"))

    legs = {
        "p1_count": p1,
        "p2_lm": lambda: unigram_lm_scores(docs, vocab_size=16),
        "p3_ppl": lambda: perplexity_buckets(docs, vocab_size=16),
    }
    for name, fn in legs.items():
        t = []
        for _ in range(2):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            t.append(time.time() - t0)
        out[f"{name}_s"] = round(min(t), 3)
    out["core_index_after"] = core_index()
    return out


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        print("LEGRESULT " + json.dumps(
            run_leg(int(sys.argv[2]), int(sys.argv[3]))))
        return

    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from curation_scaling import control
    ctl = control()
    legs = {}
    for cpus in (n_low, n_high):
        cmd = [sys.executable, __file__, "--leg", str(cpus), str(replicas)]
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

    lo, hi = legs[n_low], legs[n_high]
    factor = n_high / n_low
    result = {
        "replicas": replicas,
        "n_docs": lo["n_docs"],
        "control": {"compute_eff": ctl["compute"]["efficiency"],
                    "bandwidth_eff": ctl["bandwidth"]["efficiency"]},
        f"N(local[{n_low}])": lo,
        f"4N(local[{n_high}])": hi,
    }
    for p in ("p1_count", "p2_lm", "p3_ppl"):
        result[f"eff_{p}"] = round(
            lo[f"{p}_s"] / (hi[f"{p}_s"] * factor), 3)
    # phase deltas at each leg: what the increment costs
    for cpus, leg in (("low", lo), ("high", hi)):
        result[f"delta_scoring_{cpus}_s"] = round(
            leg["p2_lm_s"] - leg["p1_count_s"], 3)
        result[f"delta_banding_{cpus}_s"] = round(
            leg["p3_ppl_s"] - leg["p2_lm_s"], 3)
    print(json.dumps(result, indent=1))
    Path(ROOT / "BENCH_PPL_STAGEDECOMP.json").write_text(
        json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
