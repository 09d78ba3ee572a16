"""Byte-parity fuzz: the batch-vectorized WKB->MVT geometry pipeline
(functions/vecmvt.py) must reproduce the scalar path — wkb_loads ->
as_mvt_geom -> encode_geometry (+ the 0x22 length framing) — bit for
bit, including which rows drop entirely. No Spark needed."""

import numpy as np
import pytest

from sparktiles.functions import geom as G
from sparktiles.functions import mvtcodec as C
from sparktiles.functions.vecmvt import fid_fields_vec, wkb_row_fields_vec
from sparktiles.operators.mvt import as_mvt_geom

EXTENT = 4096
HALF = 20037508.34278925


def scalar_geom_field(wkb, z, x, y, buf):
    g = G.wkb_loads(bytes(wkb))
    mg = as_mvt_geom(g, z, x, y, EXTENT, buf, clip=True)
    if mg is None:
        return None, 0
    geom = C.encode_geometry(mg[0], mg[1])
    return b"\x22" + C._varint(len(geom)) + geom, mg[0]


def run_parity(wkbs, zs, xs, ys, buf):
    gf, gt = wkb_row_fields_vec(
        np.array(wkbs, dtype=object),
        np.asarray(zs), np.asarray(xs), np.asarray(ys), EXTENT, buf)
    for i, w in enumerate(wkbs):
        want, want_t = scalar_geom_field(w, int(zs[i]), int(xs[i]),
                                         int(ys[i]), buf)
        if want is None:
            assert gf[i] is None, f"row {i}: vec emitted, scalar dropped"
        else:
            assert gf[i] is not None, f"row {i}: vec dropped, scalar kept"
            assert gt[i] == want_t, f"row {i}: gtype {gt[i]} != {want_t}"
            assert bytes(gf[i]) == want, f"row {i}: geometry bytes differ"


def rand_line(rng, cx, cy, span):
    n = rng.integers(2, 9)
    pts = np.cumsum(rng.normal(0, span / 4, size=(n, 2)), axis=0)
    return pts + [cx, cy]


def rand_ring(rng, cx, cy, span):
    n = int(rng.integers(3, 9))
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(span / 8, span, n)
    ring = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)
    return np.vstack([ring, ring[:1]])


@pytest.mark.parametrize("buf", [0, 256])
def test_lines_parity_fuzz(buf):
    rng = np.random.default_rng(42 + buf)
    wkbs, zs, xs, ys = [], [], [], []
    for _ in range(300):
        z = int(rng.integers(0, 7))
        n = 2 ** z
        x, y = int(rng.integers(0, n)), int(rng.integers(0, n))
        size = 2 * HALF / n
        # center near the tile (sometimes far outside)
        cx = -HALF + (x + rng.uniform(-1.5, 2.5)) * size
        cy = HALF - (y + rng.uniform(-1.5, 2.5)) * size
        if rng.random() < 0.25:
            parts = [rand_line(rng, cx, cy, size * rng.uniform(0.01, 2))
                     for _ in range(rng.integers(1, 4))]
            g = ("MultiLineString", parts)
        elif rng.random() < 0.1:
            p = np.array([[cx, cy], [cx, cy]])  # zero-length degenerate
            g = ("LineString", p)
        else:
            g = ("LineString", rand_line(rng, cx, cy, size * rng.uniform(0.01, 3)))
        wkbs.append(G.wkb_dumps(g, srid=3857 if rng.random() < 0.5 else None))
        zs.append(z)
        xs.append(x)
        ys.append(y)
    run_parity(wkbs, zs, xs, ys, buf)


@pytest.mark.parametrize("buf", [0, 128])
def test_polygons_parity_fuzz(buf):
    rng = np.random.default_rng(7 + buf)
    wkbs, zs, xs, ys = [], [], [], []
    for _ in range(300):
        z = int(rng.integers(0, 6))
        n = 2 ** z
        x, y = int(rng.integers(0, n)), int(rng.integers(0, n))
        size = 2 * HALF / n
        cx = -HALF + (x + rng.uniform(-1.0, 2.0)) * size
        cy = HALF - (y + rng.uniform(-1.0, 2.0)) * size
        r = rng.random()
        if r < 0.2:
            # rect with a hole
            w = size * rng.uniform(0.05, 1.5)
            shell = np.array([[cx, cy], [cx + w, cy], [cx + w, cy + w],
                              [cx, cy + w], [cx, cy]])
            hw = w * 0.3
            hole = np.array([[cx + hw, cy + hw], [cx + 2 * hw, cy + hw],
                             [cx + 2 * hw, cy + 2 * hw], [cx + hw, cy + 2 * hw],
                             [cx + hw, cy + hw]])[::-1]
            g = ("Polygon", [shell, hole])
        elif r < 0.35:
            g = ("MultiPolygon",
                 [[rand_ring(rng, cx + k * size * 0.7, cy, size * 0.4)]
                  for k in range(int(rng.integers(1, 4)))])
        elif r < 0.45:
            # tiny sliver that may snap to zero area
            eps = size * 10 ** rng.uniform(-7, -3)
            g = ("Polygon", [np.array(
                [[cx, cy], [cx + size * 0.5, cy + eps], [cx + size * 0.5, cy],
                 [cx, cy]])])
        elif r < 0.5:
            g = ("Polygon", [])  # empty
        else:
            g = ("Polygon", [rand_ring(rng, cx, cy, size * rng.uniform(0.02, 2))])
        wkbs.append(G.wkb_dumps(g, srid=3857 if rng.random() < 0.5 else None))
        zs.append(z)
        xs.append(x)
        ys.append(y)
    run_parity(wkbs, zs, xs, ys, buf)


def test_points_and_mixed_parity():
    rng = np.random.default_rng(99)
    wkbs, zs, xs, ys = [], [], [], []
    for _ in range(200):
        z = int(rng.integers(0, 7))
        n = 2 ** z
        x, y = int(rng.integers(0, n)), int(rng.integers(0, n))
        size = 2 * HALF / n
        cx = -HALF + (x + rng.uniform(-0.5, 1.5)) * size
        cy = HALF - (y + rng.uniform(-0.5, 1.5)) * size
        r = rng.random()
        if r < 0.3:
            g = ("Point", (cx, cy))
        elif r < 0.5:
            pts = np.stack([cx + rng.normal(0, size, 4),
                            cy + rng.normal(0, size, 4)], axis=1)
            g = ("MultiPoint", pts)
        elif r < 0.7:
            g = ("LineString", rand_line(rng, cx, cy, size))
        else:
            g = ("Polygon", [rand_ring(rng, cx, cy, size * 0.5)])
        wkbs.append(G.wkb_dumps(g, srid=3857))
        zs.append(z)
        xs.append(x)
        ys.append(y)
    # plus hand-picked edge rows (incl. a BIG-ENDIAN LineString — the
    # WKB spec allows either byte order; scalar wkb_loads handles both)
    import struct

    be_pts = np.array([[-1e6, 2e6], [3e6, -4e6], [5e6, 6e6]])
    be_line = (b"\x00" + struct.pack(">I", 2) + struct.pack(">I", len(be_pts))
               + be_pts.astype(">f8").tobytes())
    wkbs += [
        G.wkb_dumps(("Point", None)),                      # POINT EMPTY
        G.wkb_dumps(("LineString", np.array([[0.0, 0.0], [0.0, 0.0]]))),
        G.wkb_dumps(("Polygon", [np.array(
            [[0, 0], [10, 0], [0, 10], [10, 10], [0, 0]], dtype=float) * 1000])),
        G.wkb_dumps(("GeometryCollection", [("Point", (0.0, 0.0))])),
        be_line,
    ]
    zs += [1, 1, 3, 2, 2]
    xs += [0, 1, 4, 1, 1]
    ys += [0, 1, 3, 1, 1]
    run_parity(wkbs, zs, xs, ys, 64)


def test_fid_fields_parity():
    fids = [0, 1, 127, 128, 10_001, 2**40 + 7]
    got = fid_fields_vec(fids)
    for f, g in zip(fids, got):
        assert g == b"\x08" + C._varint(f)


def test_mixed_endian_multi_children_parity():
    """Spec-valid WKB lets every child of a Multi* carry its own byte
    order (and EWKB its own SRID flag); the scalar reader honors them
    recursively. The batch decoder must match — incl. the MultiPoint
    bulk-read fast path falling back cleanly (ADVICE round-3)."""
    import struct

    def point(xy, big=False, srid=None):
        fmt = ">" if big else "<"
        code = 1 | (0x20000000 if srid else 0)
        b = (b"\x00" if big else b"\x01") + struct.pack(fmt + "I", code)
        if srid:
            b += struct.pack(fmt + "I", srid)
        return b + struct.pack(fmt + "dd", *xy)

    def line(pts, big=False):
        fmt = ">" if big else "<"
        return ((b"\x00" if big else b"\x01") + struct.pack(fmt + "I", 2)
                + struct.pack(fmt + "I", len(pts))
                + np.asarray(pts, dtype=fmt + "f8").tobytes())

    def poly(rings, big=False):
        fmt = ">" if big else "<"
        b = (b"\x00" if big else b"\x01") + struct.pack(fmt + "I", 3)
        b += struct.pack(fmt + "I", len(rings))
        for r in rings:
            b += struct.pack(fmt + "I", len(r))
            b += np.asarray(r, dtype=fmt + "f8").tobytes()
        return b

    def multi(code, children, big=False):
        fmt = ">" if big else "<"
        return ((b"\x00" if big else b"\x01") + struct.pack(fmt + "I", code)
                + struct.pack(fmt + "I", len(children)) + b"".join(children))

    s = 2 * HALF / 4  # z2 tile size
    p0 = (-HALF + 1.2 * s, HALF - 1.3 * s)
    p1 = (-HALF + 1.7 * s, HALF - 1.6 * s)
    ln0 = [[p0[0], p0[1]], [p1[0], p1[1]], [p0[0] + s / 3, p0[1] - s / 2]]
    ring = np.array([[p0[0], p0[1]], [p1[0], p0[1]], [p1[0], p1[1]],
                     [p0[0], p1[1]], [p0[0], p0[1]]])
    wkbs = [
        # MultiPoint: mixed child endianness + one EWKB-SRID child
        multi(4, [point(p0), point(p1, big=True), point(p0, srid=3857)]),
        # MultiPoint all-little (bulk fast path), all-big parent+children
        multi(4, [point(p0), point(p1)]),
        multi(4, [point(p0, big=True), point(p1, big=True)], big=True),
        # MultiLineString: big-endian child inside little parent
        multi(5, [line(ln0), line(ln0[::-1], big=True)]),
        # MultiPolygon: big parent, little children / little parent, big child
        multi(6, [poly([ring]), poly([ring * 0.98])], big=True),
        multi(6, [poly([ring], big=True)]),
    ]
    zs = [2] * len(wkbs)
    xs = [1] * len(wkbs)
    ys = [1] * len(wkbs)
    run_parity(wkbs, zs, xs, ys, 64)


def test_decode_wkb_batch_vec_scalar_parity():
    """The vectorized structure walk must produce exactly the scalar
    walk's flat family structures for every geometry type, including
    adjacent-duplicate runs, Nones, NaN-empty points, empty rings/parts,
    and multi-geometries; uniform big-endian batches take the vectorized
    path too; mixed-endian and SRID batches must FALL BACK (vec returns
    None) and still decode correctly end-to-end."""
    import struct

    from sparktiles.functions.vecmvt import (
        _decode_wkb_batch_scalar,
        _decode_wkb_batch_vec,
        decode_wkb_batch,
    )

    rng = np.random.RandomState(123)

    def w(fmt, *vals):
        return struct.pack(fmt, *vals)

    def head(fmt, code):
        return (b"\x01" if fmt == "<" else b"\x00") + w(fmt + "I", code)

    def pt(fmt="<", nan=False):
        x, y = (np.nan, np.nan) if nan else tuple(rng.randn(2) * 1e6)
        return head(fmt, 1) + w(fmt + "dd", x, y)

    def mpt(npts, fmt="<"):
        b = head(fmt, 4) + w(fmt + "I", npts)
        for _ in range(npts):
            b += head(fmt, 1) + w(fmt + "dd", *(rng.randn(2) * 1e6))
        return b

    def ls(nv, fmt="<"):
        b = head(fmt, 2) + w(fmt + "I", nv)
        for _ in range(nv):
            b += w(fmt + "dd", *(rng.randn(2) * 1e6))
        return b

    def mls(parts, fmt="<"):
        b = head(fmt, 5) + w(fmt + "I", len(parts))
        for nv in parts:
            b += head(fmt, 2) + w(fmt + "I", nv)
            for _ in range(nv):
                b += w(fmt + "dd", *(rng.randn(2) * 1e6))
        return b

    def ring_bytes(nv, fmt="<"):
        b = w(fmt + "I", nv)
        for _ in range(nv):
            b += w(fmt + "dd", *(rng.randn(2) * 1e6))
        return b

    def poly(rings, fmt="<"):
        b = head(fmt, 3) + w(fmt + "I", len(rings))
        for nv in rings:
            b += ring_bytes(nv, fmt)
        return b

    def mpoly(polys, fmt="<"):
        b = head(fmt, 6) + w(fmt + "I", len(polys))
        for rings in polys:
            b += head(fmt, 3) + w(fmt + "I", len(rings))
            for nv in rings:
                b += ring_bytes(nv, fmt)
        return b

    def gen_one(fmt="<"):
        r = rng.randint(12)
        if r == 0:
            return None
        if r == 1:
            return pt(fmt, nan=True)
        if r == 2:
            return pt(fmt)
        if r == 3:
            return mpt(rng.randint(0, 4), fmt)
        if r == 4:
            return ls(rng.randint(0, 6), fmt)
        if r == 5:
            return mls([rng.randint(0, 5) for _ in range(rng.randint(0, 4))], fmt)
        if r == 6:
            return poly([rng.randint(0, 6) for _ in range(rng.randint(0, 4))], fmt)
        if r == 7:
            return mpoly([[rng.randint(0, 5) for _ in range(rng.randint(0, 3))]
                          for _ in range(rng.randint(0, 3))], fmt)
        if r == 8:
            return head(fmt, 7) + w(fmt + "I", 0)  # GeometryCollection
        if r == 9:
            return poly([5, 0, 4], fmt)            # empty hole
        if r == 10:
            return poly([0, 4], fmt)               # empty shell
        return mls([3], fmt)

    def flats_equal(a, b):
        pta, lna, pga = a
        ptb, lnb, pgb = b
        for fa, fb in ((pta, ptb), (lna, lnb)):
            assert np.array_equal(fa.coords, fb.coords)
            assert np.array_equal(fa.off, fb.off)
            assert np.array_equal(fa.part_row, fb.part_row)
        assert np.array_equal(pga.coords, pgb.coords)
        assert np.array_equal(pga.off, pgb.off)
        assert np.array_equal(pga.part_poly, pgb.part_poly)
        assert np.array_equal(pga.poly_row, pgb.poly_row)
        assert np.array_equal(pga.ring_is_shell, pgb.ring_is_shell)

    for trial in range(30):
        fmt = ">" if trial % 5 == 4 else "<"
        items = []
        for _ in range(rng.randint(1, 40)):
            g = gen_one(fmt)
            items.extend([g] * rng.randint(1, 4))  # adjacent-dup runs
        blobs = np.array(items, dtype=object)
        vec = _decode_wkb_batch_vec(blobs)
        assert vec is not None, (trial, "uniform batch must vectorize")
        flats_equal(vec, _decode_wkb_batch_scalar(blobs))

    # mixed endianness -> fallback; SRID flag -> fallback
    mixed = np.array([ls(3, "<"), ls(3, ">")], dtype=object)
    assert _decode_wkb_batch_vec(mixed) is None
    srid = head("<", 2 | 0x20000000) + w("<I", 4326) + w("<I", 1) + \
        w("<dd", 1.0, 2.0)
    assert _decode_wkb_batch_vec(np.array([srid], dtype=object)) is None
    # and decode_wkb_batch dispatch still decodes both correctly
    a = decode_wkb_batch(mixed)
    b = _decode_wkb_batch_scalar(mixed)
    flats_equal(a, b)


def test_truncated_wkb_bails_out_of_vec_path():
    """Corrupt/truncated blobs must not silently gather coordinate
    bytes from the NEXT rep in the concatenated buffer: the vec walk
    bounds-checks every count/span read against the owning rep's end
    and returns None (scalar fallback, which raises), at every
    structure level and for the truncated-blob-last case too."""
    import struct

    from sparktiles.functions.vecmvt import (
        _decode_wkb_batch_scalar,
        _decode_wkb_batch_vec,
    )

    rng = np.random.RandomState(7)

    def head(code):
        return b"\x01" + struct.pack("<I", code)

    def ls(nv, claim=None):
        b = head(2) + struct.pack("<I", claim if claim is not None else nv)
        for _ in range(nv):
            b += struct.pack("<dd", *(rng.randn(2) * 1e6))
        return b

    def poly(rings, claim_first=None):
        b = head(3) + struct.pack("<I", len(rings))
        for k, nv in enumerate(rings):
            n_claim = claim_first if (k == 0 and claim_first) else nv
            b += struct.pack("<I", n_claim)
            for _ in range(nv):
                b += struct.pack("<dd", *(rng.randn(2) * 1e6))
        return b

    good = ls(4)
    bad_cases = [
        ls(4, claim=10),                 # LineString: count > held verts
        ls(4)[:-5],                      # truncated coord bytes
        head(1) + b"\x00" * 8,           # Point: 8 of 16 coord bytes
        head(4) + struct.pack("<I", 3) + (head(1) + b"\x00" * 16),  # MultiPoint
        poly([4, 4], claim_first=9),     # Polygon ring overruns
        head(5) + struct.pack("<I", 2) + ls(3),   # MultiLineString missing part
        head(6) + struct.pack("<I", 1) + poly([4], claim_first=7)[0:],  # MPoly
    ]
    for j, bad in enumerate(bad_cases):
        for blobs in ([good, bad, good], [good, bad]):  # bad mid + bad LAST
            arr = np.array(blobs, dtype=object)
            assert _decode_wkb_batch_vec(arr) is None, (j, len(blobs))
            with pytest.raises(Exception):
                _decode_wkb_batch_scalar(arr)
    # well-formed batches still take the vec path
    assert _decode_wkb_batch_vec(np.array([good, good], dtype=object)) \
        is not None
