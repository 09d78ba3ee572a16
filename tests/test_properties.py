"""Property-based tests (hypothesis) for the wire codec and tile math —
the invariants the rest of the engine silently relies on."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sparktiles.functions import mvtcodec as C
from sparktiles.functions import tilemath as TM

u64 = st.integers(min_value=0, max_value=(1 << 64) - 1)
i64 = st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)


@given(st.lists(u64, min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip_and_vectorized_writer_match(vals):
    scalar = b"".join(C._varint(v) for v in vals)
    arr = np.array(vals, dtype=np.uint64)
    nb = C._varint_nbytes(arr)
    offs = np.zeros(len(vals), dtype=np.int64)
    if len(vals) > 1:
        offs[1:] = np.cumsum(nb[:-1])
    buf = np.zeros(int(nb.sum()), dtype=np.uint8)
    C._write_varints(buf, offs, arr, nb)
    assert buf.tobytes() == scalar
    # decode roundtrip
    i = 0
    for v in vals:
        got, i = C._read_varint(scalar, i)
        assert got == v


@given(i64)
@settings(max_examples=300, deadline=None)
def test_zigzag_roundtrip(n):
    assert C._unzigzag(C._zigzag(n) & ((1 << 64) - 1)) == n


@given(st.integers(min_value=0, max_value=22),
       st.floats(min_value=-179.99, max_value=179.99, allow_nan=False),
       st.floats(min_value=-84.9, max_value=84.9, allow_nan=False))
@settings(max_examples=300, deadline=None)
def test_point_in_its_tile_bbox(z, lon, lat):
    """deg2num and tile_bbox agree: every point lies inside (or within
    one float ulp of) the bbox of the tile deg2num assigns it to."""
    x, y = TM.deg2num(lat, lon, z)
    n = 2 ** z
    x, y = min(max(x, 0), n - 1), min(max(y, 0), n - 1)
    mx, my = TM.lonlat_to_mercator(lon, lat)
    xmin, ymin, xmax, ymax = TM.tile_bbox(z, x, y)
    # TileBBox uses the deliberately-rounded reference constant
    # (20037508.34 vs half-world 20037508.3427...): allow that slack
    pad = (xmax - xmin) * 1e-12 + 2 * 0.00279
    assert xmin - pad <= mx <= xmax + pad
    assert ymin - pad <= my <= ymax + pad


@given(st.integers(min_value=0, max_value=29),
       st.integers(min_value=0, max_value=(1 << 29) - 1),
       st.integers(min_value=0, max_value=(1 << 29) - 1))
@settings(max_examples=300, deadline=None)
def test_cell_id_pack_unpack(z, x, y):
    n = 2 ** min(z, 29)
    x, y = x % n, y % n
    cid = TM.cell_id(z, x, y)
    from sparktiles.operators.mvt import unpack_zxy
    # cell_id layout == the pyramid shuffle key layout for z<=29
    assert unpack_zxy((z << 58) ^ (x << 29) ^ y) == (z, x, y)
    assert cid == (z << 58) | (x << 29) | y
