"""mbtiles sink, wikidata source, DAG executor, schema validation,
per-tile rank, field-mapping matrix."""

import time

import pytest
from pyspark.sql import functions as F

from sparktiles.plans.config import (
    FieldDef,
    LayerDef,
    TilesetDef,
    compile_field_mapping,
    validate_layer_frame,
)
from sparktiles.plans.dag import Action, check_cycles, run_actions
from sparktiles.sources.mbtiles import export_mbtiles, read_mbtiles
from sparktiles.sources.wikidata import (
    batch_ids,
    harvest_wikidata_ids,
    synthetic_labels,
    uncached_ids,
)


def test_mbtiles_roundtrip(spark, tmp_path):
    tm = spark.createDataFrame(
        [(z, x, y, f"id{z}-{x}-{y}") for z in range(3) for x in range(2**z)
         for y in range(2**z)],
        "zoom_level int, tile_column long, tile_row long, tile_id string",
    )
    ti = tm.select("tile_id").distinct().withColumn(
        "tile_data", F.encode("tile_id", "utf-8"))
    path = str(tmp_path / "out.mbtiles")
    res = export_mbtiles(tm, ti, path, metadata={"name": "t", "format": "pbf"})
    assert res["map_rows"] == 21 and res["image_rows"] == 21

    import sqlite3

    con = sqlite3.connect(path)
    # TMS inversion stored: xyz (2,0,0) -> tms row 3
    row = con.execute(
        "SELECT tile_row FROM map WHERE zoom_level=2 AND tile_column=0 "
        "AND tile_id='id2-0-0'").fetchone()
    assert row[0] == 3
    # tiles view joins
    assert con.execute("SELECT COUNT(*) FROM tiles").fetchone()[0] == 21
    assert con.execute(
        "SELECT value FROM metadata WHERE name='format'").fetchone()[0] == "pbf"
    con.close()

    # size guard: refuses a map larger than max_rows (driver-side sink)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_rows"):
        export_mbtiles(tm, ti, str(tmp_path / "big.mbtiles"), max_rows=5)

    tm2, ti2 = read_mbtiles(spark, path)
    assert tm2.count() == 21
    # xyz convention restored
    assert tm.exceptAll(tm2).count() == 0


def test_wikidata_pipeline(spark):
    feats = spark.createDataFrame(
        [
            (1, {"wikidata": "Q42", "name": "a"}),
            (2, {"wikidata": "Q0"}),        # invalid (leading zero rule)
            (3, {"wikidata": "Q42"}),       # dup
            (4, {"name": "nowd"}),
            (5, {"wikidata": "Q7"}),
        ],
        "id int, tags map<string,string>",
    )
    ids = harvest_wikidata_ids([feats, feats])
    got = {r.id for r in ids.collect()}
    assert got == {"Q42", "Q7"}
    cache = spark.createDataFrame([("Q42",)], "id string")
    assert {r.id for r in uncached_ids(ids, cache).collect()} == {"Q7"}
    b = batch_ids(ids, batch_size=1)
    assert b.count() == 2
    labels = synthetic_labels(spark, ids, ["en", "de"])
    row = {r.id: r.labels for r in labels.collect()}
    assert row["Q7"]["name:en"] == "EN label Q7"


def test_dag_executor_order_and_parallelism():
    order = []
    def mk(name, dur=0.05):
        def fn():
            order.append(("start", name, time.time()))
            time.sleep(dur)
            order.append(("end", name, time.time()))
            return name
        return fn

    actions = [
        Action("a", mk("a")),
        Action("b", mk("b")),
        Action("c", mk("c"), depends_on=["a", "b"]),
        Action("d", mk("d"), depends_on=["c"]),
    ]
    res = run_actions(actions, max_parallel=2)
    assert set(res) == {"a", "b", "c", "d"}
    starts = {n: t for e, n, t in order if e == "start"}
    ends = {n: t for e, n, t in order if e == "end"}
    assert starts["c"] >= max(ends["a"], ends["b"]) - 1e-3
    assert starts["d"] >= ends["c"] - 1e-3


def test_dag_cycle_detection():
    with pytest.raises(ValueError, match="Circular"):
        check_cycles([
            Action("a", lambda: 1, depends_on=["b"]),
            Action("b", lambda: 1, depends_on=["a"]),
        ])
    with pytest.raises(ValueError, match="unknown"):
        check_cycles([Action("a", lambda: 1, depends_on=["zz"])])


def test_validate_layer_frame(spark):
    df = spark.createDataFrame(
        [(1, "x", 2.0)], "feature_id long, name string, rank double")
    layer = LayerDef(id="l", buffer_size=0, fields=[
        FieldDef("name"), FieldDef("rank", mvt_type="number")])
    validate_layer_frame(df, layer)  # ok
    bad = LayerDef(id="l", buffer_size=0, fields=[
        FieldDef("missing"), FieldDef("name", mvt_type="number")])
    with pytest.raises(ValueError) as e:
        validate_layer_frame(df, bad)
    assert "missing" in str(e.value) and "not a number" in str(e.value)


def test_tile_rank(spark):
    from sparktiles.operators.pyramid import with_tile_rank

    df = spark.createDataFrame(
        [(1, 10, 20, 5.0), (1, 10, 20, 9.0), (1, 10, 20, 7.0), (1, 11, 20, 1.0)],
        "z int, x long, y long, importance double",
    )
    out = with_tile_rank(df, [F.desc("importance")])
    rows = {(r.x, r.importance): r["rank"] for r in out.collect()}
    assert rows[(10, 9.0)] == 1 and rows[(10, 7.0)] == 2 and rows[(10, 5.0)] == 3
    assert rows[(11, 1.0)] == 1


def test_field_mapping_full_matrix(spark):
    """Behavioral equivalence with the reference's enumfield golden CASE
    (tests/expected/parallel_sql/parallel/enumfield.sql:5-31), expressed
    as input->class pairs."""
    values = {
        "rock": {"natural": ["bare_rock"]},
        "grass": {"natural": "grassland",
                  "landuse": ["grass", "meadow%", "allotments", "grassland",
                              "park", "village_green", "recreation_ground"]},
        "school": {"subclass": ["school", "kindergarten", "uni%"]},
        "railway": [
            {"__AND__": {"subclass": "station", "mapping_key": "railway"}},
            {"subclass": ["halt", "tram_stop", "subway"]},
        ],
        "andfield": {"__AND__": {
            "field1": "a1fld1",
            "field2": ["a1fld2a", "%a1fld2b%", "a1fld2c"],
            "field3": "a1fld3"}},
        "other_null": None,
        "other_obj": {},
        "other_false": False,
        "other_true": True,
    }
    cols = ["natural", "landuse", "subclass", "mapping_key",
            "field1", "field2", "field3"]
    cases = [
        ({"natural": "bare_rock"}, "rock"),
        ({"natural": "grassland"}, "grass"),
        ({"landuse": "meadow_x"}, "grass"),
        ({"landuse": "park"}, "grass"),
        ({"subclass": "university"}, "school"),
        ({"subclass": "station", "mapping_key": "railway"}, "railway"),
        ({"subclass": "station", "mapping_key": "highway"}, None),
        ({"subclass": "halt"}, "railway"),
        ({"field1": "a1fld1", "field2": "xx a1fld2b yy", "field3": "a1fld3"},
         "andfield"),
        ({"field1": "a1fld1", "field2": "nope", "field3": "a1fld3"}, None),
        ({"natural": "water"}, None),
        ({}, None),
    ]
    rows = []
    for i, (attrs, _) in enumerate(cases):
        rows.append(tuple([i] + [attrs.get(c) for c in cols]))
    df = spark.createDataFrame(
        rows, "i int, " + ", ".join(f"`{c}` string" for c in cols))
    expr = compile_field_mapping(values)
    got = {r.i: r.cls for r in df.select("i", expr.alias("cls")).collect()}
    for i, (attrs, exp) in enumerate(cases):
        assert got[i] == exp, (attrs, exp, got[i])
