"""Supercover tile-cover assignment — O(path) candidate generation.

Replaces the whole-geometry bbox explode (`operators/pyramid.
assign_bbox_tiles_multi`) for WKB line/polygon layers. The bbox of a
long diagonal line covers O(n^2) tiles while the line touches O(n):
the round-3 profile measured 66.5M candidate rows for a 10k-line z0-9
build with only 4.38% surviving the exact clip — the explode + Arrow
transfer of doomed rows WAS the line-build cost (docs/SCALE.md
"KNOWN NEXT"). Here candidates are the tiles the geometry actually
touches, computed per column strip with pure numpy passes over the
already-decoded coordinate arrays (`vecmvt.decode_wkb_batch`).

Semantics (the candidate contract of reference sqltomvt.py:197-242 —
`geometry && ST_Expand(tile_envelope, buffer)` per tile): a tile
(z, c, r) is a candidate iff the geometry intersects the tile envelope
expanded by `bf = buffer_px / 256` tile units. Equivalently the
geometry intersects [c-bf, c+1+bf] x [r-bf, r+1+bf] in tile units.
Computed per geometry family:

- segments (lines + ring outlines + degenerate points): for every
  column strip c the segment's buffered x-extent crosses, the
  sub-segment over x in [c-bf, c+1+bf] has a linear y-extent
  [ymin, ymax]; candidate rows are r in [ceil(ymin-bf-1),
  floor(ymax+bf)] (boundary-touch inclusive, matching the clip's
  inclusive >= lo / <= hi bounds).
- polygons: additionally the interior — per (polygon, column) the
  interior rows lie between the min/max boundary rows in that column
  (any vertical ray from an interior point hits boundary at the same
  x), so the fill is a per-(poly, col) min/max aggregate over the
  outline spans followed by a row-range explode. Holes contribute
  their outline and stay filled: a tile strictly inside a hole still
  survives the exact clip (shell and hole both clip to the full tile
  square), so fill-through-holes is REQUIRED for candidate
  completeness, not an over-approximation.

Guarantee (property-tested, tests/test_tilecover.py): the candidate
set is a superset of the exact-clip survivor set (`vecmvt.
wkb_row_fields_vec` non-None), with an `_EPS` margin absorbing the
float-sequence difference between this tile-unit math and the per-tile
transform in the encode kernel. Cells are clamped to [0, 2^z - 1]
exactly like assign_bbox_tiles.
"""

from __future__ import annotations

import numpy as np

from sparktiles.functions.tilemath import HALF_WORLD, WORLD_MERC_WIDTH

# safety margin (tile units) absorbing float divergence between the
# map-side tile-unit transform here and the per-tile affine transform
# in the encode kernel (~ulp-scale); 1e-6 tiles ~ 2.4mm at z14
_EPS = 1e-6


def _explode_counts(counts: np.ndarray):
    """(owner, intra) for variable-length ranges: owner repeats each
    index `counts[i]` times; intra counts 0..counts[i]-1 within."""
    counts = counts.astype(np.int64)
    total = int(counts.sum())
    owner = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    intra = np.arange(total, dtype=np.int64) - starts[owner]
    return owner, intra


def _segment_col_spans(px, py, qx, qy, bf: float, top: int):
    """Per-(segment, column) candidate row spans for bf-buffered
    segments in tile units. Returns (seg, col, r0, r1) — int64 arrays,
    one entry per column strip each segment's buffered extent crosses,
    with r0..r1 the inclusive candidate row range in that column.
    Degenerate segments (p == q, i.e. points) are handled by the
    vertical-segment path."""
    sx0 = np.minimum(px, qx)
    sx1 = np.maximum(px, qx)
    # inclusive column range: c >= sx0 - bf - 1 (boundary touch) and
    # c <= sx1 + bf
    c0 = np.clip(np.ceil(sx0 - bf - 1.0), 0, top).astype(np.int64)
    c1 = np.clip(np.floor(sx1 + bf), 0, top).astype(np.int64)
    seg, intra = _explode_counts(c1 - c0 + 1)
    col = c0[seg] + intra
    colf = col.astype(np.float64)
    # sub-segment over the strip's buffered x-interval, clamped to the
    # segment's x-extent (always non-empty by the column range above)
    xa = np.maximum(colf - bf, sx0[seg])
    xb = np.minimum(colf + 1.0 + bf, sx1[seg])
    dx = qx - px
    dy = qy - py
    sdx = dx[seg]
    with np.errstate(divide="ignore", invalid="ignore"):
        ta = (xa - px[seg]) / sdx
        tb = (xb - px[seg]) / sdx
    vert = sdx == 0.0
    ya = np.where(vert, py[seg], py[seg] + ta * dy[seg])
    yb = np.where(vert, qy[seg], py[seg] + tb * dy[seg])
    ymin = np.minimum(ya, yb)
    ymax = np.maximum(ya, yb)
    r0 = np.clip(np.ceil(ymin - bf - 1.0), 0, top).astype(np.int64)
    r1 = np.clip(np.floor(ymax + bf), 0, top).astype(np.int64)
    return seg, col, r0, r1


def _part_segments(coords, off):
    """(px, py, qx, qy, seg_part) for consecutive-vertex segments of
    every part; single-vertex parts contribute a degenerate segment so
    isolated points still cover their cell."""
    n = len(coords)
    nparts = len(off) - 1
    if n == 0:
        z = np.empty(0)
        return z, z, z, z, np.empty(0, dtype=np.int64)
    lens = np.diff(off)
    seg_mask = np.ones(n, dtype=bool)
    seg_mask[off[1:] - 1] = False          # last vertex of each part
    seg_i = np.flatnonzero(seg_mask)
    part_of = np.searchsorted(off, seg_i, side="right") - 1
    px, py = coords[seg_i, 0], coords[seg_i, 1]
    qx, qy = coords[seg_i + 1, 0], coords[seg_i + 1, 1]
    single = np.flatnonzero(lens == 1)
    if len(single):
        s = off[:-1][single]
        px = np.concatenate([px, coords[s, 0]])
        py = np.concatenate([py, coords[s, 1]])
        qx = np.concatenate([qx, coords[s, 0]])
        qy = np.concatenate([qy, coords[s, 1]])
        part_of = np.concatenate([part_of, single])
    del nparts
    return px, py, qx, qy, part_of


def _ring_closing_segments(coords, off):
    """(px, py, qx, qy, ring_of) closing segments (last -> first) for
    rings not already closed (WKB rings normally repeat the first
    vertex; tolerate unclosed input)."""
    nr = len(off) - 1
    if nr == 0 or len(coords) == 0:
        z = np.empty(0)
        return z, z, z, z, np.empty(0, dtype=np.int64)
    lens = np.diff(off)
    first = off[:-1]
    last = off[1:] - 1
    ne = lens > 1
    openr = np.zeros(nr, dtype=bool)
    openr[ne] = (coords[last[ne]] != coords[first[ne]]).any(axis=1)
    idx = np.flatnonzero(openr)
    return (coords[last[idx], 0], coords[last[idx], 1],
            coords[first[idx], 0], coords[first[idx], 1], idx)


def _dedup_cells(row, cx, cy, zbits: int):
    """Distinct (row, cx, cy) triples. Packs into one int64 key when it
    fits (zbits bits per coordinate), else lexsorts."""
    if len(row) == 0:
        return row, cx, cy
    nrow = int(row.max()) + 1
    row_bits = max(1, int(nrow - 1).bit_length())
    if row_bits + 2 * zbits <= 62:
        key = (row << (2 * zbits)) | (cx << zbits) | cy
        key = np.unique(key)
        m = (np.int64(1) << zbits) - 1
        return key >> (2 * zbits), (key >> zbits) & m, key & m
    order = np.lexsort((cy, cx, row))
    r, x, y = row[order], cx[order], cy[order]
    keep = np.ones(len(r), dtype=bool)
    keep[1:] = (r[1:] != r[:-1]) | (x[1:] != x[:-1]) | (y[1:] != y[:-1])
    return r[keep], x[keep], y[keep]


def _explode_spans(owner, col, r0, r1):
    """Explode inclusive row spans to cells: (owner, col, row)."""
    ex, intra = _explode_counts(r1 - r0 + 1)
    return owner[ex], col[ex], r0[ex] + intra


def _groupby_minmax(key, r0, r1):
    """Per distinct key: (keys, min r0, max r1) via sort + reduceat."""
    order = np.argsort(key, kind="stable")
    k = key[order]
    cuts = np.concatenate([[0], np.flatnonzero(k[1:] != k[:-1]) + 1])
    gmin = np.minimum.reduceat(r0[order], cuts)
    gmax = np.maximum.reduceat(r1[order], cuts)
    return k[cuts], gmin, gmax


def cover_cells_zoom(pt, ln, pg, zoom: int, bf: float):
    """Candidate cells for one zoom over decoded WKB family structures
    (vecmvt.decode_wkb_batch output, coordinates in EPSG:3857).
    Returns (row, cx, cy) int64 arrays — distinct (batch row, tile)
    pairs."""
    n = np.float64(2.0 ** zoom)
    top = (1 << zoom) - 1
    zbits = max(1, zoom)
    bfe = float(bf) + _EPS
    rows_out, cx_out, cy_out = [], [], []

    def to_tile_units(coords):
        t = np.empty_like(coords)
        t[:, 0] = (coords[:, 0] + HALF_WORLD) / WORLD_MERC_WIDTH * n
        t[:, 1] = (HALF_WORLD - coords[:, 1]) / WORLD_MERC_WIDTH * n
        return t

    # ---- points: every vertex of every (Multi)Point individually
    # (MultiPoint members are NOT connected — no inter-point segments)
    if pt.part_row is not None and len(pt.part_row):
        t = to_tile_units(pt.coords)
        vpart = np.repeat(np.arange(len(pt.part_row)), np.diff(pt.off))
        seg, col, r0, r1 = _segment_col_spans(
            t[:, 0], t[:, 1], t[:, 0], t[:, 1], bfe, top)
        owner, ccol, crow = _explode_spans(vpart[seg], col, r0, r1)
        rows_out.append(pt.part_row[owner])
        cx_out.append(ccol)
        cy_out.append(crow)

    # ---- lines: outline segments
    if ln.part_row is not None and len(ln.part_row):
        t = to_tile_units(ln.coords)
        px, py, qx, qy, part_of = _part_segments(t, ln.off)
        if len(px):
            seg, col, r0, r1 = _segment_col_spans(px, py, qx, qy, bfe, top)
            owner, ccol, crow = _explode_spans(part_of[seg], col, r0, r1)
            rows_out.append(ln.part_row[owner])
            cx_out.append(ccol)
            cy_out.append(crow)

    # ---- polygons: outline spans aggregated per (poly, column), then
    # interior fill between min/max rows
    if pg.poly_row is not None and len(pg.poly_row):
        t = to_tile_units(pg.coords)
        px, py, qx, qy, ring_of = _part_segments(t, pg.off)
        cx2, cy2, cqx, cqy, cring = _ring_closing_segments(t, pg.off)
        if len(cx2):
            px = np.concatenate([px, cx2])
            py = np.concatenate([py, cy2])
            qx = np.concatenate([qx, cqx])
            qy = np.concatenate([qy, cqy])
            ring_of = np.concatenate([ring_of, cring])
        if len(px):
            seg, col, r0, r1 = _segment_col_spans(px, py, qx, qy, bfe, top)
            poly_of = pg.part_poly[ring_of[seg]]
            key = (poly_of << (zbits + 1)) | col  # col <= top < 2^zbits
            keys, gmin, gmax = _groupby_minmax(key, r0, r1)
            kpoly = keys >> (zbits + 1)
            kcol = keys & ((np.int64(1) << (zbits + 1)) - 1)
            owner, ccol, crow = _explode_spans(kpoly, kcol, gmin, gmax)
            rows_out.append(pg.poly_row[owner])
            cx_out.append(ccol)
            cy_out.append(crow)

    if not rows_out:
        e = np.empty(0, dtype=np.int64)
        return e, e, e
    row = np.concatenate(rows_out)
    cx = np.concatenate(cx_out)
    cy = np.concatenate(cy_out)
    return _dedup_cells(row, cx, cy, zbits)
