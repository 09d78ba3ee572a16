"""CurationPipeline (plans/curation.py): store-backed resume + the
per-partition lineage/metrics contract — the webtext twin of the tile
store's checkpoint-resume evidence."""

from pyspark.sql import functions as F


def _stages():
    from sparktiles.operators.text import exact_dedup, normalize_text

    def s_norm(df):
        return (normalize_text(df)
                .select("doc_id", F.col("norm_text").alias("text")))

    def s_dedup(df):
        keep = exact_dedup(df).select(
            F.col("canonical_id").alias("doc_id"))
        return df.join(keep, "doc_id")

    def s_gate(df):
        return df.where(F.length("text") >= 12)

    return [("normalize", s_norm), ("exact_dedup", s_dedup),
            ("len_gate", s_gate)]


def _corpus(spark):
    rows = [(i, f"document  body number {i % 30} with words") for i in range(90)]
    rows += [(100 + i, "tiny") for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_full_run_outputs_and_lineage(spark, tmp_path):
    from sparktiles.plans.curation import CurationPipeline

    pipe = CurationPipeline(spark, str(tmp_path / "store"), _stages())
    out = pipe.run(_corpus(spark))
    rows = out.collect()
    assert len(rows) == 30                       # 90 docs -> 30 distinct
    assert all("  " not in r["text"] for r in rows)

    m = {r["stage"]: r for r in pipe.stage_metrics().collect()}
    assert set(m) == {"normalize", "exact_dedup", "len_gate"}
    assert m["normalize"]["in_rows"] == 95
    assert m["normalize"]["out_rows"] == 95
    assert m["exact_dedup"]["out_rows"] == 31    # 30 + the tiny dup class
    assert m["len_gate"]["out_rows"] == 30
    # per-partition granularity: one lineage row per output file
    lin = pipe.read_lineage()
    assert lin.count() == lin.select("file").distinct().count()
    assert all(r["wall_s"] > 0 for r in m.values())


def test_resume_skips_completed_stages(spark, tmp_path):
    from sparktiles.plans.curation import CurationPipeline

    store = str(tmp_path / "store")
    calls = []

    def counting(name, fn):
        def wrapped(df):
            calls.append(name)
            return fn(df)
        return name, wrapped

    stages = [counting(n, f) for n, f in _stages()]
    pipe = CurationPipeline(spark, store, stages)
    a = pipe.run(_corpus(spark))
    first = sorted(r["doc_id"] for r in a.collect())
    assert calls == ["normalize", "exact_dedup", "len_gate"]

    calls.clear()
    b = pipe.run(_corpus(spark))                 # everything checkpointed
    assert calls == []
    assert sorted(r["doc_id"] for r in b.collect()) == first


def test_crash_resume_equals_fresh_run(spark, tmp_path):
    import shutil

    from sparktiles.plans.curation import CurationPipeline

    stages = _stages()
    fresh = CurationPipeline(spark, str(tmp_path / "a"), stages)
    want = {(r["doc_id"], r["text"]) for r in
            fresh.run(_corpus(spark)).collect()}

    # simulate a crash after stage 0: run only the first stage, then
    # wreck stage 1's partial output (no _SUCCESS -> must recompute)
    store = tmp_path / "b"
    CurationPipeline(spark, str(store), stages[:1]).run(_corpus(spark))
    partial = store / "01_exact_dedup"
    partial.mkdir()
    (partial / "part-garbage.parquet").write_bytes(b"not parquet")
    shutil.rmtree(store / "lineage" / "00_normalize")  # lost metrics too

    resumed = CurationPipeline(spark, str(store), stages)
    got = {(r["doc_id"], r["text"]) for r in
           resumed.run(_corpus(spark)).collect()}
    assert got == want
    # stage 0 was NOT recomputed (its lineage dir stays lost), stages
    # 1-2 wrote fresh lineage
    names = {r["stage"] for r in resumed.read_lineage().collect()}
    assert names == {"exact_dedup", "len_gate"}


def test_duplicate_stage_names_rejected(spark, tmp_path):
    import pytest

    from sparktiles.plans.curation import CurationPipeline

    with pytest.raises(ValueError):
        CurationPipeline(spark, str(tmp_path), [("a", id), ("a", id)])
