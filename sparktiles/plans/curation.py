"""Declarative, checkpoint-resumable curation pipeline.

The webtext twin of the tile store's build contract (north rule:
"resumable from checkpoint with per-partition lineage + metrics",
already delivered for tiles in plans/pipeline.py — lineage rows at
pipeline.py:356-370, resume via the store). A curation funnel is a
linear chain of DataFrame -> DataFrame stages; production runs write
each stage's survivors to a table and restart from the last complete
stage after a failure. This module makes that contract first-class:

- every stage's output is written to `<store>/NN_name/` (parquet, so
  any engine can audit survivors);
- a per-partition lineage row (stage, file, n_rows) plus stage-level
  metrics (in/out counts, wall seconds) land in `<store>/lineage/`
  after EVERY stage — written before the next stage starts, so a
  crash loses at most the running stage;
- `run(resume=True)` skips stages whose output already exists (the
  parquet _SUCCESS marker is the checkpoint token) and re-reads the
  stored survivors, truncating lineage exactly where a table write
  would in a production job (also the plan-string OOM fix the funnel
  bench needed — see BENCH.md session 11b).

Stages must be deterministic DataFrame transforms (everything in
operators/ is); resume of a deterministic chain is byte-equivalent
to a fresh run, which tests/test_curation_pipeline.py asserts.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CurationPipeline:
    """Linear chain of named stages with store-backed resume.

    stages: list of (name, fn) where fn: DataFrame -> DataFrame.
    """

    def __init__(self, spark: SparkSession, store: str,
                 stages: list[tuple[str, Callable[[DataFrame], DataFrame]]]):
        names = [n for n, _ in stages]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate stage names: {names}")
        self.spark = spark
        self.store = Path(store)
        self.stages = list(stages)

    # ---------------------------------------------------------- paths
    def _stage_dir(self, i: int) -> Path:
        return self.store / f"{i:02d}_{self.stages[i][0]}"

    def _done(self, i: int) -> bool:
        return (self._stage_dir(i) / "_SUCCESS").exists()

    # ---------------------------------------------------------- run
    def run(self, source: DataFrame, resume: bool = True) -> DataFrame:
        """Run the chain, writing each stage's output + lineage.

        With resume=True, completed stages (parquet _SUCCESS present)
        are skipped and their stored output is re-read; the first
        incomplete stage recomputes from the last stored survivors,
        never from `source` (unless stage 0 itself is incomplete)."""
        cur = source
        for i, (name, fn) in enumerate(self.stages):
            out_dir = self._stage_dir(i)
            if resume and self._done(i):
                cur = self.spark.read.parquet(str(out_dir))
                continue
            t0 = time.time()
            n_in = cur.count()
            fn(cur).write.mode("overwrite").parquet(str(out_dir))
            # re-read the store: downstream plans hang off a parquet
            # leaf, not the whole upstream lineage (bounded plans, and
            # exactly what a resumed run will see)
            cur = self.spark.read.parquet(str(out_dir))
            self._write_lineage(i, name, cur, n_in,
                                round(time.time() - t0, 3))
        return cur

    def _write_lineage(self, i: int, name: str, stored: DataFrame,
                       n_in: int, wall_s: float) -> None:
        per_part = (stored.withColumn("_file", F.input_file_name())
                    .groupBy("_file")
                    .agg(F.count("*").alias("n_rows"))
                    .select(F.lit(i).alias("stage_idx"),
                            F.lit(name).alias("stage"),
                            F.col("_file").alias("file"),
                            "n_rows",
                            F.lit(n_in).alias("stage_in_rows"),
                            F.lit(float(wall_s)).alias("stage_wall_s")))
        # one subdir per stage, overwritten whole — a stage that is
        # re-run (crashed before _SUCCESS) replaces its rows instead
        # of appending duplicates
        (per_part.coalesce(1).write.mode("overwrite")
         .parquet(str(self.store / "lineage" / f"{i:02d}_{name}")))

    # ---------------------------------------------------------- audit
    def read_lineage(self) -> DataFrame:
        """Per-partition lineage/metrics rows, one per stage output
        file (same contract as the tile store's read_lineage)."""
        return self.spark.read.parquet(str(self.store / "lineage" / "*"))

    def stage_metrics(self) -> DataFrame:
        """Stage-level rollup FROM the lineage rows: in/out counts,
        wall seconds, output files."""
        return (self.read_lineage()
                .groupBy("stage_idx", "stage")
                .agg(F.sum("n_rows").alias("out_rows"),
                     F.max("stage_in_rows").alias("in_rows"),
                     F.max("stage_wall_s").alias("wall_s"),
                     F.count("*").alias("n_files"))
                .orderBy("stage_idx"))
