"""Real .mbtiles (SQLite) sink/source — the reference's storage format.

Schema is byte-for-byte the reference's (mbtile_tools.py:555-571):
  map(zoom_level, tile_column, tile_row, tile_id) unique (z,x,y)
  images(tile_data, tile_id unique)
  metadata(name, value)
  tiles view joining map+images
plus the TMS inverted-Y convention on export/import
(mbtile_tools.py:186-187: stored tile_row = (2^z - 1) - xyz_y).

Export streams partitions through toLocalIterator (bounded driver
memory); at a 10^12-doc scale the mbtiles file is a per-region extract,
not the primary store (which stays Iceberg).
"""

from __future__ import annotations

import sqlite3

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SQL_CREATE_MBTILES = """
CREATE TABLE IF NOT EXISTS metadata (name text, value text);
CREATE TABLE IF NOT EXISTS map (
    zoom_level integer, tile_column integer, tile_row integer, tile_id text);
CREATE TABLE IF NOT EXISTS images (tile_data blob, tile_id text);
CREATE UNIQUE INDEX IF NOT EXISTS map_index
    ON map (zoom_level, tile_column, tile_row);
CREATE UNIQUE INDEX IF NOT EXISTS images_id ON images (tile_id);
CREATE UNIQUE INDEX IF NOT EXISTS name ON metadata (name);
CREATE VIEW IF NOT EXISTS tiles AS
    SELECT map.zoom_level AS zoom_level,
           map.tile_column AS tile_column,
           map.tile_row AS tile_row,
           images.tile_data AS tile_data
    FROM map JOIN images ON images.tile_id = map.tile_id;
"""


def export_mbtiles(
    tile_map: DataFrame,
    tile_images: DataFrame,
    path: str,
    metadata: dict | None = None,
    batch: int = 100_000,
    max_rows: int | None = 50_000_000,
) -> dict:
    """Write tile_map/tile_images DataFrames to a .mbtiles file with
    TMS row inversion. Returns row counts.

    This sink is driver-side BY DESIGN: mbtiles is one SQLite file — a
    per-region extract format, not the cluster store (the store is the
    partitioned tile_map/tile_images tables; serve.py reads those).
    `max_rows` guards against pointing it at a full planet pyramid:
    the map-row count is checked up front (cheap count on narrow rows)
    and the export refuses rather than silently funneling billions of
    rows through one driver."""
    if max_rows is not None:
        n = tile_map.count()
        if n > max_rows:
            raise ValueError(
                f"tile_map has {n:,} rows > max_rows={max_rows:,}: "
                "mbtiles is a single-file driver-side extract — filter "
                "to a region/zoom subset first, or raise max_rows "
                "explicitly if you really want a file this size")
    con = sqlite3.connect(path)
    con.executescript("PRAGMA page_size = 512;" + SQL_CREATE_MBTILES)
    inv = tile_map.select(
        "zoom_level", "tile_column",
        (F.pow(F.lit(2.0), F.col("zoom_level")).cast("long") - 1 - F.col("tile_row"))
        .alias("tile_row"),
        "tile_id",
    )
    n_map = 0
    buf = []
    for row in inv.toLocalIterator():
        buf.append((row.zoom_level, row.tile_column, row.tile_row, row.tile_id))
        if len(buf) >= batch:
            con.executemany("INSERT OR IGNORE INTO map VALUES (?,?,?,?)", buf)
            n_map += len(buf)
            buf = []
    if buf:
        con.executemany("INSERT OR IGNORE INTO map VALUES (?,?,?,?)", buf)
        n_map += len(buf)
    n_img = 0
    buf = []
    for row in tile_images.toLocalIterator():
        buf.append((bytes(row.tile_data), row.tile_id))
        if len(buf) >= batch:
            con.executemany("INSERT OR IGNORE INTO images VALUES (?,?)", buf)
            n_img += len(buf)
            buf = []
    if buf:
        con.executemany("INSERT OR IGNORE INTO images VALUES (?,?)", buf)
        n_img += len(buf)
    for k, v in (metadata or {}).items():
        con.execute("INSERT OR REPLACE INTO metadata VALUES (?,?)", (k, str(v)))
    con.commit()
    con.close()
    return {"map_rows": n_map, "image_rows": n_img}


def read_mbtiles(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Load an mbtiles file back into (tile_map, tile_images) DataFrames
    (XYZ convention restored)."""
    con = sqlite3.connect(path)
    map_rows = con.execute(
        "SELECT zoom_level, tile_column, tile_row, tile_id FROM map").fetchall()
    img_rows = [
        (tid, bytearray(data))
        for data, tid in con.execute("SELECT tile_data, tile_id FROM images")
    ]
    con.close()
    tm = spark.createDataFrame(
        map_rows, "zoom_level int, tile_column long, tile_row long, tile_id string"
    ).select(
        "zoom_level", "tile_column",
        (F.pow(F.lit(2.0), F.col("zoom_level")).cast("long") - 1 - F.col("tile_row"))
        .alias("tile_row"),
        "tile_id",
    )
    ti = spark.createDataFrame(img_rows, "tile_id string, tile_data binary")
    return tm, ti
