"""Reference-shaped tileset YAML, parsed and built end-to-end.

The tileset below mirrors /root/reference/tests/testlayers/
testmaptiles.yaml (3 layers: housenumber / enumfield / mountain_peak,
languages en+de+cs, per-layer buffer sizes, a requires edge, the full
__AND__ / __OR__ / '%'-LIKE enum mapping of enumfield.yaml) without
copying it — the layer content is re-authored over the synthetic
geoparse corpus. Declared-field validation follows sqltomvt.py:261-300.
"""

import textwrap

import pytest
from pyspark.sql import functions as F

from sparktiles.functions import mvtcodec as C
from sparktiles.plans.config import FieldDef, TilesetDef, validate_layer_frame
from sparktiles.plans.pipeline import BuildConfig, TileBuild, make_point_layer_frames
from sparktiles.sources.geoparse import build_features
from sparktiles.sources.pages import generate_pages

TILESET_YAML = """
tileset:
  name: TestTiles v1
  id: testtiles
  layers:
    - housenumber.yaml
    - enumfield.yaml
    - mountain_peak.yaml
  minzoom: 0
  maxzoom: 3
  pixel_scale: 256
  bounds: [-180.0, -85.0511, 180.0, 85.0511]
  languages:
    - en
    - de
    - cs
"""

HOUSENUMBER_YAML = """
layer:
  id: housenumber
  buffer_size: 8
  fields:
    housenumber: The housenumber label.
  datasource:
    key_field: feature_id
"""

ENUMFIELD_YAML = """
layer:
  id: enumfield
  buffer_size: 0
  fields:
    class:
      description: enum mapping test field
      values:
        rock:
          natural: ['bare_rock']
        grass:
          natural: 'grassland'
          landuse: ['grass', 'meadow%']
        school:
          subclass: ['school', 'kindergarten', 'uni%']
        railway:
          - __AND__:
              subclass: 'station'
              mapping_key: 'railway'
          - subclass: ['halt', 'tram_stop', 'subway']
        other_null:
        other_str: 'str'
"""

MOUNTAIN_PEAK_YAML = """
layer:
  id: mountain_peak
  buffer_size: 64
  requires:
    layers:
      - enumfield
  fields:
    name: Peak name.
    class:
      description: peak vs volcano (doc-only enum domain)
      values:
        - peak
        - volcano
    ele: Elevation string.
    rank: Rank of the peak within one tile.
"""

NATURALS = ["bare_rock", "grassland", "water", "wood"]
LANDUSES = ["grass", "meadow_alpine", "residential", "forest"]
SUBCLS = ["station", "halt", "university", "shop"]
MAPKEYS = ["railway", "highway"]


def expected_class(natural, landuse, subclass, mapping_key):
    """Python twin of the enumfield mapping (first matching class wins,
    the CASE-chain order of compile_field_mapping)."""
    if natural == "bare_rock":
        return "rock"
    if natural == "grassland" or landuse == "grass" or landuse.startswith("meadow"):
        return "grass"
    if subclass in ("school", "kindergarten") or subclass.startswith("uni"):
        return "school"
    if (subclass == "station" and mapping_key == "railway") or subclass in (
            "halt", "tram_stop", "subway"):
        return "railway"
    return None


@pytest.fixture(scope="module")
def tileset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("yamlts")
    (d / "testtiles.yaml").write_text(textwrap.dedent(TILESET_YAML))
    (d / "housenumber.yaml").write_text(textwrap.dedent(HOUSENUMBER_YAML))
    (d / "enumfield.yaml").write_text(textwrap.dedent(ENUMFIELD_YAML))
    (d / "mountain_peak.yaml").write_text(textwrap.dedent(MOUNTAIN_PEAK_YAML))
    return d


@pytest.fixture(scope="module")
def tileset(tileset_dir):
    return TilesetDef.from_yaml(tileset_dir / "testtiles.yaml")


@pytest.fixture(scope="module")
def features(spark):
    """Geoparse corpus + the enum source columns and per-layer fields."""
    f = build_features(generate_pages(spark, 400))
    pid = F.abs(F.col("feature_id"))
    return (
        f.withColumn("housenumber", F.format_string("%d", pid % 200))
        .withColumn("natural", F.element_at(
            F.array(*[F.lit(v) for v in NATURALS]), (pid % 4 + 1).cast("int")))
        .withColumn("landuse", F.element_at(
            F.array(*[F.lit(v) for v in LANDUSES]), (pid % 3 + 1).cast("int")))
        .withColumn("subclass", F.element_at(
            F.array(*[F.lit(v) for v in SUBCLS]), (pid % 5 % 4 + 1).cast("int")))
        .withColumn("mapping_key", F.element_at(
            F.array(*[F.lit(v) for v in MAPKEYS]), (pid % 2 + 1).cast("int")))
        .withColumn("rank", (pid % 10).cast("int"))
        .withColumn("class", F.lit(None).cast("string"))
        .cache()
    )


def test_yaml_parse_matches_declaration(spark, tileset):
    # (spark: Column-expression construction needs an active session)
    assert tileset.name == "TestTiles v1"
    assert [l.id for l in tileset.layers] == [
        "housenumber", "enumfield", "mountain_peak"]
    assert tileset.minzoom == 0 and tileset.maxzoom == 3
    assert tileset.languages == ["en", "de", "cs"]
    assert tileset.bounds == (-180.0, -85.0511, 180.0, 85.0511)
    bufs = {l.id: l.resolved_buffer(tileset) for l in tileset.layers}
    assert bufs == {"housenumber": 8, "enumfield": 0, "mountain_peak": 64}
    # requires edge is honored in topo order
    order = [l.id for l in tileset.topo_order()]
    assert order.index("enumfield") < order.index("mountain_peak")
    # key_field parsed from datasource
    assert tileset.layers[0].key_field == "feature_id"
    # enum mapping compiled for enumfield; list-form domain is doc-only
    enum_layer = tileset.layers[1]
    assert enum_layer.fields[0].expr() is not None
    peak_layer = tileset.layers[2]
    cls_field = [fd for fd in peak_layer.fields if fd.name == "class"][0]
    assert cls_field.values == ["peak", "volcano"]
    assert cls_field.expr() is None


def test_declared_field_validation_raises(spark, tileset, features):
    """sqltomvt.py:261-300 semantics: every declared field must exist in
    the prepared frame with an MVT-encodable type."""
    bad = features.drop("housenumber")
    with pytest.raises(ValueError, match="housenumber.*missing"):
        validate_layer_frame(bad, tileset.layers[0], tileset.languages)
    # wrong type: declared bool, actual string
    lay = tileset.layers[0]
    lay2_fields = [FieldDef("housenumber", mvt_type="bool")]
    from sparktiles.plans.config import LayerDef
    lay2 = LayerDef(id=lay.id, fields=lay2_fields, buffer_size=8)
    with pytest.raises(ValueError, match="not a bool"):
        validate_layer_frame(features, lay2, [])


def test_yaml_build_end_to_end(spark, tileset, features, tmp_path):
    from sparktiles.operators.pyramid import with_tile_rank

    # mountain_peak rank is per-tile (W2): recompute after tile assign.
    # The YAML declares no field types (the reference takes them from
    # the PG query's result schema); rank is numeric here.
    peak = [l for l in tileset.layers if l.id == "mountain_peak"][0]
    for fd in peak.fields:
        if fd.name == "rank":
            fd.mvt_type = "number"
    peak.transform = lambda df: with_tile_rank(
        df.drop("rank"), [F.desc("rank_src"), "feature_id"], "rank")

    frames = make_point_layer_frames(features, tileset)
    b = TileBuild(spark, frames, BuildConfig(
        store_dir=str(tmp_path / "ts"), minzoom=0, maxzoom=tileset.maxzoom,
        mid_zoom=1))
    b.build_fast()

    tm = b.read_tile_map()
    per_zoom = {r.zoom_level: r["c"] for r in
                tm.groupBy("zoom_level").agg(F.count("*").alias("c")).collect()}
    for z in range(4):
        assert per_zoom[z] == 4**z

    # the world tile carries all three layers in topo (index) order
    row = (tm.where((F.col("zoom_level") == 0))
           .join(b.read_tile_images(), "tile_id").first())
    tile = C.decode_tile(bytes(row.tile_data))
    assert list(tile.keys()) == ["housenumber", "enumfield", "mountain_peak"]

    src = {r.feature_id: r for r in features.collect()}
    # enumfield classes match the python twin of the mapping
    n_classed = 0
    for f in tile["enumfield"]["features"]:
        s = src[_signed(f["id"])]
        exp = expected_class(s.natural, s.landuse, s.subclass, s.mapping_key)
        assert f["attrs"].get("class") == exp
        if exp is not None:
            n_classed += 1
    assert n_classed > 50

    # mountain_peak: localized names present when tags carry them,
    # rank starts at 1 per tile
    peaks = tile["mountain_peak"]["features"]
    ranks = sorted(int(f["attrs"]["rank"]) for f in peaks)
    assert ranks[0] == 1 and ranks == list(range(1, len(peaks) + 1))
    n_lang = 0
    for f in peaks:
        s = src[_signed(f["id"])]
        tags = dict(s.tags)
        for lang in ("en", "de", "cs"):
            if tags.get(f"name:{lang}"):
                assert f["attrs"][f"name:{lang}"] == tags[f"name:{lang}"]
                n_lang += 1
            else:
                assert f["attrs"].get(f"name:{lang}") is None
    assert n_lang > 20


def _signed(fid: int) -> int:
    """MVT feature ids are uint64 on the wire; map back to the signed
    xxhash64 feature_id."""
    return fid - (1 << 64) if fid >= (1 << 63) else fid
