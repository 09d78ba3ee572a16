"""mbtiles-normalized tile store utilities: copier + metadata (T6/T7).

Reference counterparts:
- TileCopier (mbtile_tools.py:435-552): filtered mbtiles->mbtiles copy
  with zoom list / zoom range / lon-lat bbox (per-zoom tile ranges),
  conflict modes; here: DataFrame filters + MERGE-style dedup append.
- Metadata generator (mbtile_tools.py:259-432): mbtiles-1.3 metadata
  dict incl. auto min/max zoom and the tilejson `json.vector_layers`
  block built from layer specs (pgutils.py:133-156 get_vector_layers).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparktiles.functions.tilemath import lonlat_to_tile_exprs


def filter_tiles(
    tile_map: DataFrame,
    zooms: list[int] | None = None,
    min_zoom: int | None = None,
    max_zoom: int | None = None,
    bbox_lonlat: tuple[float, float, float, float] | None = None,
) -> DataFrame:
    """TileCopier's selection semantics (iterate_queries,
    mbtile_tools.py:488-527): explicit zoom list wins; else zoom range;
    bbox converts to per-zoom inclusive tile ranges."""
    df = tile_map
    if zooms is not None:
        df = df.where(F.col("zoom_level").isin([int(z) for z in zooms]))
    else:
        if min_zoom is not None:
            df = df.where(F.col("zoom_level") >= min_zoom)
        if max_zoom is not None:
            df = df.where(F.col("zoom_level") <= max_zoom)
    if bbox_lonlat is not None:
        lon0, lat0, lon1, lat1 = bbox_lonlat
        x0, y1 = lonlat_to_tile_exprs(F.lit(lon0), F.lit(lat0), F.col("zoom_level"))
        x1, y0 = lonlat_to_tile_exprs(F.lit(lon1), F.lit(lat1), F.col("zoom_level"))
        df = df.where(
            (F.col("tile_column") >= x0) & (F.col("tile_column") <= x1)
            & (F.col("tile_row") >= y0) & (F.col("tile_row") <= y1)
        )
    return df


def copy_tiles(
    src_map: DataFrame,
    src_images: DataFrame,
    dst_map_path: str,
    dst_images_path: str,
    on_conflict: str = "ignore",
    existing_map: DataFrame | None = None,
    **filters,
) -> dict:
    """Filtered copy (T6). `on_conflict`: 'ignore' keeps existing rows
    (INSERT OR IGNORE), 'replace' prefers the incoming row. Images are
    copied via the referenced-id semi join (J6, mbtile_tools.py:479-486).
    """
    sel = filter_tiles(src_map, **filters)
    if existing_map is not None:
        if on_conflict == "ignore":
            sel = sel.join(
                existing_map.select("zoom_level", "tile_column", "tile_row"),
                ["zoom_level", "tile_column", "tile_row"], "left_anti",
            )
            out_map = existing_map.unionByName(sel)
        elif on_conflict == "replace":
            keep = existing_map.join(
                sel.select("zoom_level", "tile_column", "tile_row"),
                ["zoom_level", "tile_column", "tile_row"], "left_anti",
            )
            out_map = keep.unionByName(sel)
        else:
            raise ValueError(on_conflict)
    else:
        out_map = sel
    out_map.write.mode("overwrite").parquet(dst_map_path)
    images = src_images.join(
        out_map.select("tile_id").distinct(), "tile_id", "left_semi"
    ).dropDuplicates(["tile_id"])
    images.write.mode("overwrite").parquet(dst_images_path)
    return {"map_path": dst_map_path, "images_path": dst_images_path}


def generate_metadata(
    tileset,
    tile_map: DataFrame | None = None,
    center_zoom: int | None = None,
    layer_fields: dict[str, dict[str, str]] | None = None,
) -> dict:
    """mbtiles-1.3 metadata (T7). `json` holds vector_layers built from
    each layer's declared fields (name -> MVT type), matching the
    tilejson the reference serves (postserve.py:159-231)."""
    minzoom, maxzoom = tileset.minzoom, tileset.maxzoom
    if tile_map is not None:
        r = tile_map.agg(
            F.min("zoom_level").alias("a"), F.max("zoom_level").alias("b")
        ).first()
        if r.a is not None:
            minzoom, maxzoom = int(r.a), int(r.b)
    bounds = tileset.bounds or (-180.0, -85.0511, 180.0, 85.0511)
    center = (
        round((bounds[0] + bounds[2]) / 2, 4),
        round((bounds[1] + bounds[3]) / 2, 4),
        center_zoom if center_zoom is not None else minzoom,
    )
    vector_layers = []
    for layer in tileset.layers:
        fields = (layer_fields or {}).get(layer.id)
        if fields is None:
            fields = {
                fd.name: {"string": "String", "number": "Number", "bool": "Boolean"}[
                    fd.mvt_type] for fd in layer.fields
            }
        vector_layers.append({"id": layer.id, "fields": fields,
                              "minzoom": minzoom, "maxzoom": maxzoom})
    return {
        "name": tileset.name,
        "format": "pbf",
        "bounds": ",".join(str(b) for b in bounds),
        "center": ",".join(str(c) for c in center),
        "minzoom": str(minzoom),
        "maxzoom": str(maxzoom),
        "type": "overlay",
        "version": "1.0",
        "json": json.dumps({"vector_layers": vector_layers}),
    }


def tilejson(metadata: dict, tiles_url: str = "tiles/{z}/{x}/{y}.pbf") -> dict:
    """TileJSON 2.2.0 document from the metadata dict
    (postserve.py:159-231)."""
    return {
        "tilejson": "2.2.0",
        "name": metadata["name"],
        "format": metadata["format"],
        "tiles": [tiles_url],
        "minzoom": int(metadata["minzoom"]),
        "maxzoom": int(metadata["maxzoom"]),
        "bounds": [float(v) for v in metadata["bounds"].split(",")],
        "center": [float(v) for v in metadata["center"].split(",")],
        "vector_layers": json.loads(metadata["json"])["vector_layers"],
    }
