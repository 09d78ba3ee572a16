"""asof_join (operators/temporal.py) — goldens vs pandas merge_asof
(an independent third implementation besides the DuckDB ASOF oracle)
plus hand cases for ties, no-match, and duplicate build timestamps."""

from datetime import datetime

import pandas as pd


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_hand_cases(spark):
    from sparktiles.operators.temporal import asof_join

    probes = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:00")),
         (2, 10, _ts("2024-01-01 12:00")),
         (3, 10, _ts("2024-01-01 09:00")),   # before any build
         (4, 20, _ts("2024-01-01 11:00")),   # exact-ts match
         (5, 30, _ts("2024-01-01 11:00"))],  # user with no builds
        "event_id long, user_id long, ts timestamp")
    builds = spark.createDataFrame(
        [(10, _ts("2024-01-01 09:30"), 1.0),
         (10, _ts("2024-01-01 11:30"), 2.0),
         (20, _ts("2024-01-01 11:00"), 7.0),
         (20, _ts("2024-01-01 11:00"), 9.0)],  # dup ts -> max wins
        "user_id long, ts timestamp, value double")
    out = {r["event_id"]: r for r in
           asof_join(probes, builds).collect()}
    assert out[1]["asof_value"] == 1.0
    assert out[2]["asof_value"] == 2.0
    assert out[3]["asof_value"] is None and out[3]["asof_ts"] is None
    assert out[4]["asof_value"] == 9.0       # at-or-before + dedup max
    assert out[4]["asof_ts"] == _ts("2024-01-01 11:00")
    assert out[5]["asof_value"] is None


def test_asof_matches_pandas_merge_asof(spark):
    from sparktiles.operators.temporal import asof_join

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    probes = ev.where("event_type = 'purchase'").select(
        "event_id", "user_id", "ts")
    builds = (ev.where("event_type = 'error'")
              .groupBy("user_id", "ts").agg({"value": "max"})
              .withColumnRenamed("max(value)", "value"))
    got = (asof_join(probes, builds)
           .orderBy("event_id").toPandas())

    pp = probes.toPandas().sort_values("ts")
    bb = builds.toPandas().sort_values("ts")
    want = pd.merge_asof(pp, bb, on="ts", by="user_id",
                         direction="backward").sort_values("event_id")
    assert len(got) == len(want)
    gv = got["asof_value"].tolist()
    wv = want["value"].tolist()
    assert all((pd.isna(a) and pd.isna(b)) or a == b
               for a, b in zip(gv, wv))
