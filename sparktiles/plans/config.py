"""Tileset / Layer / Field config model + field-mapping compiler.

Re-expresses the reference's YAML object model (openmaptiles/tileset.py
classes Tileset:350-491, Layer:80-347, Field:48-77) and the
FieldExpander CASE generator (openmaptiles/sql.py:161-249) as
dataclasses + a compiler from the same `values` YAML structure to a
Catalyst `F.when(...).when(...)` chain.

Semantics preserved:
- values mapping: {output_class: {field: value-or-list}}; '%' in a value
  -> LIKE; multiple plain values -> IN; fields combined with OR at top,
  AND inside __AND__; nested __AND__/__OR__ combinators; list mappings
  OR'd; non-dict/list values (None/bool/{}) ignored (sql.py:178-186)
- buffer_size cascade (tileset.py:220-278): max(first of [env
  TILE_BUFFER_SIZE, tileset per-layer override, tileset global
  override, layer value, 0], first of [per-layer min override, layer
  min, 0]); layer must define one of buffer_size/min_buffer_size
- vars priority layer < tileset global < tileset per-layer < env
  OMT_VAR_<name> (tileset.py:178-192)
- requires cycle detection (tileset.py:389-408), duplicate layer ids
  rejected (tileset.py:384-386)
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field as dc_field
from pathlib import Path

import yaml
from pyspark.sql import Column
from pyspark.sql import functions as F


# ------------------------------------------------------------ field mapping

def _field_condition(in_fld: str, in_vals) -> Column:
    if isinstance(in_vals, str):
        in_vals = [in_vals]
    col = F.col(in_fld)
    wildcards = [v for v in in_vals if "%" in v]
    plain = [v for v in in_vals if "%" not in v]
    conds = []
    if plain:
        conds.append(col == plain[0] if len(plain) == 1 else col.isin(plain))
    conds.extend(col.like(w) for w in wildcards)
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


def compile_mapping_expr(mapping, op: str = "OR") -> Column | None:
    """One output-class mapping -> boolean Column (sql.py:193-237)."""
    if isinstance(mapping, list):
        exprs = [compile_mapping_expr(v) for v in mapping]
    elif isinstance(mapping, dict) and list(mapping.keys()) == ["__AND__"]:
        return compile_mapping_expr(mapping["__AND__"], "AND")
    elif isinstance(mapping, dict) and list(mapping.keys()) == ["__OR__"]:
        return compile_mapping_expr(mapping["__OR__"], "OR")
    elif isinstance(mapping, dict):
        if "__AND__" in mapping or "__OR__" in mapping:
            raise ValueError("mixes __AND__/__OR__ with values")
        exprs = [_field_condition(k, v) for k, v in mapping.items()]
    else:
        return None
    exprs = [e for e in exprs if e is not None]
    if not exprs:
        return None
    out = exprs[0]
    for e in exprs[1:]:
        out = (out & e) if op == "AND" else (out | e)
    return out


def compile_field_mapping(values: dict) -> Column:
    """values: {output_class: mapping} -> CASE WHEN chain; classes with
    non-dict/list mapping are skipped (reference: 'assuming manual SQL
    handling', sql.py:185-189). Unmatched -> NULL."""
    expr = None
    for map_to, mapping in values.items():
        if not isinstance(mapping, (dict, list)):
            continue
        cond = compile_mapping_expr(mapping)
        if cond is None:
            continue
        expr = F.when(cond, F.lit(map_to)) if expr is None else expr.when(cond, F.lit(map_to))
    if expr is None:
        return F.lit(None).cast("string")
    return expr


# ------------------------------------------------------------ model

@dataclass
class FieldDef:
    name: str
    description: str = ""
    values: dict | None = None          # enum mapping (P4)
    mvt_type: str = "string"            # 'string' | 'number' | 'bool'

    def expr(self) -> Column | None:
        # a LIST of values (mountain_peak class: [peak, volcano]) only
        # documents the enum domain — no mapping is generated
        # (reference tileset.py:59-66 treats it as doc-only)
        if self.values and isinstance(self.values, dict):
            return compile_field_mapping(self.values)
        return None


@dataclass
class LayerDef:
    id: str
    fields: list[FieldDef] = dc_field(default_factory=list)
    buffer_size: int | None = None
    min_buffer_size: int | None = None
    key_field: str | None = None
    geometry_kind: str = "point"        # point | wkb
    requires: list[str] = dc_field(default_factory=list)
    vars: dict = dc_field(default_factory=dict)
    transform: object = None            # callable(df) -> df post tile-assign
    #                                     (df has z,x,y: per-zoom gating hook)

    def resolved_buffer(self, tileset: "TilesetDef | None" = None,
                        getenv=os.environ.get) -> int:
        size, min_size = self.buffer_size, self.min_buffer_size
        if size is None and min_size is None:
            raise ValueError(
                f'Layer "{self.id}" is missing buffer_size and/or min_buffer_size')
        if size is not None and min_size is not None and size < min_size:
            raise ValueError(f'Layer "{self.id}" buffer_size < min_buffer_size')
        size = size or 0
        min_size = min_size or 0
        if tileset:
            g = tileset.overrides.get("buffer_size")
            if g is not None:
                size = int(g)
            per = tileset.overrides.get("layers", {}).get(self.id, {})
            if per.get("buffer_size") is not None:
                size = int(per["buffer_size"])
            if per.get("min_buffer_size") is not None:
                min_size = int(per["min_buffer_size"])
                if per.get("buffer_size") is not None and size < min_size:
                    raise ValueError(
                        f'Layer overrides for "{self.id}" buffer_size < min_buffer_size')
        env = getenv("TILE_BUFFER_SIZE") or ""
        if env != "":
            size = int(env)
        return max(size, min_size)

    def resolved_vars(self, tileset: "TilesetDef | None" = None,
                      getenv=os.environ.get) -> dict:
        result = dict(self.vars)
        if tileset:
            for name, value in tileset.overrides.get("vars", {}).items():
                if name in result:
                    result[name] = value
            for name, value in (
                tileset.overrides.get("layers", {}).get(self.id, {}).get("vars", {}).items()
            ):
                if name not in result:
                    raise ValueError(
                        f'Layer override variable "{name}" is not defined in the layer')
                result[name] = value
        for name in list(result):
            env = getenv(f"OMT_VAR_{name}") or ""
            if env != "":
                result[name] = env
        return result


_MVT_OK_TYPES = {
    "string": {"string"},
    "number": {"int", "bigint", "smallint", "tinyint", "double", "float",
               "decimal", "long"},
    "bool": {"boolean"},
}


def validate_layer_frame(df, layer: "LayerDef", languages: list[str] = ()) -> None:
    """Schema probe (O4, reference sqltomvt.py:261-300): the prepared
    feature frame must expose every declared field with an
    MVT-encodable type; raises listing the mismatches. The reference
    runs `SELECT * FROM <query> WHERE false LIMIT 0` against PG — on a
    DataFrame the schema is static, no execution needed."""
    actual = {f.name: f.dataType.simpleString() for f in df.schema}
    problems = []
    expected = [(fd.name, fd.mvt_type) for fd in layer.fields]
    expected += [(f"name:{lang}", "string") for lang in languages]
    for name, mvt_type in expected:
        if name not in actual:
            problems.append(f"declared field '{name}' missing from frame")
            continue
        ok = _MVT_OK_TYPES[mvt_type]
        base = actual[name].split("(")[0]
        if base not in ok:
            problems.append(
                f"field '{name}' has type {actual[name]}, not a {mvt_type}")
    if problems:
        raise ValueError(
            f"Layer '{layer.id}' field validation failed: " + "; ".join(problems))


@dataclass
class TilesetDef:
    name: str
    layers: list[LayerDef]
    minzoom: int = 0
    maxzoom: int = 14
    pixel_scale: int = 256
    languages: list[str] = dc_field(default_factory=list)
    overrides: dict = dc_field(default_factory=dict)
    bounds: tuple | None = None

    def __post_init__(self):
        ids = [l.id for l in self.layers]
        dups = {i for i in ids if ids.count(i) > 1}
        if dups:
            raise ValueError(f"Duplicate layer ids: {sorted(dups)}")
        self._check_requires_cycles()

    def _check_requires_cycles(self):
        # reference tileset.py:389-408 / sql.py:65-67
        graph = {l.id: [r for r in l.requires] for l in self.layers}
        ids = set(graph)
        for lid, reqs in graph.items():
            for r in reqs:
                if r not in ids:
                    raise ValueError(f'Layer "{lid}" requires unknown layer "{r}"')
        state: dict[str, int] = {}

        def visit(n):
            if state.get(n) == 1:
                raise ValueError(f"Circular requires involving layer {n}")
            if state.get(n) == 2:
                return
            state[n] = 1
            for m in graph[n]:
                visit(m)
            state[n] = 2

        for n in graph:
            visit(n)

    def topo_order(self) -> list[LayerDef]:
        """Layers in dependency order (J7: requires-driven ordering,
        sql.py:40-64)."""
        by_id = {l.id: l for l in self.layers}
        seen: list[str] = []

        def visit(lid):
            if lid in seen:
                return
            for r in by_id[lid].requires:
                visit(r)
            seen.append(lid)

        for l in self.layers:
            visit(l.id)
        return [by_id[i] for i in seen]

    def get_layers(self, include=None, exclude=None) -> list[LayerDef]:
        """Layer selection with unknown-id errors (sqltomvt.py:302-327)."""
        ids = {l.id for l in self.layers}
        for sel in (include or []) + (exclude or []):
            if sel not in ids:
                raise ValueError(f"Unknown layer {sel}")
        out = [l for l in self.layers if (not include or l.id in include)]
        return [l for l in out if not (exclude and l.id in exclude)]

    @classmethod
    def from_yaml(cls, path: str | Path) -> "TilesetDef":
        """Load a tileset YAML roughly matching the reference layout
        (tests/testlayers/testmaptiles.yaml)."""
        doc = yaml.safe_load(Path(path).read_text())
        ts = doc["tileset"]
        layers = []
        for entry in ts.get("layers", []):
            ldoc = entry if isinstance(entry, dict) else yaml.safe_load(
                (Path(path).parent / entry).read_text())
            ld = ldoc["layer"]
            fields = [
                FieldDef(name=k,
                         description=(v or {}).get("description", "") if isinstance(v, dict) else "",
                         values=(v or {}).get("values") if isinstance(v, dict) else None)
                for k, v in (ld.get("fields") or {}).items()
            ]
            layers.append(LayerDef(
                id=ld["id"], fields=fields,
                buffer_size=ld.get("buffer_size"),
                min_buffer_size=ld.get("min_buffer_size"),
                key_field=(ld.get("datasource") or {}).get("key_field"),
                requires=(
                    ld.get("requires", {}).get("layers", [])
                    if isinstance(ld.get("requires"), dict)
                    else ld.get("requires") or []
                ),
                vars=ld.get("vars") or {},
            ))
        return cls(
            name=ts.get("name", Path(path).stem),
            layers=layers,
            minzoom=ts.get("minzoom", 0),
            maxzoom=ts.get("maxzoom", 14),
            pixel_scale=ts.get("pixel_scale", 256),
            languages=ts.get("languages", []),
            overrides=ts.get("overrides", {}),
            bounds=tuple(ts["bounds"]) if ts.get("bounds") else None,
        )
