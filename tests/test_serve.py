"""HTTP tile reader (serve.py) against a freshly built store."""

import gzip
import json
import threading
import urllib.error
import urllib.request

import pytest


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    from sparktiles.plans.config import FieldDef, LayerDef, TilesetDef
    from sparktiles.plans.pipeline import (
        BuildConfig, TileBuild, make_point_layer_frames)
    from sparktiles.sources.geoparse import build_features
    from sparktiles.sources.pages import generate_pages

    path = str(tmp_path_factory.mktemp("servestore"))
    feats = build_features(generate_pages(spark, 200))
    ts = TilesetDef(name="s", layers=[
        LayerDef(id="place", fields=[FieldDef("name")], buffer_size=0)],
        minzoom=0, maxzoom=2)
    b = TileBuild(spark, make_point_layer_frames(feats, ts), BuildConfig(
        store_dir=path, minzoom=0, maxzoom=2, mid_zoom=1, gzip_level=6))
    b.build_fast()
    return path


@pytest.fixture(scope="module")
def server(store):
    from sparktiles.serve import make_server

    srv = make_server(store)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", srv
    srv.shutdown()


def _get(url, headers=None):
    req = urllib.request.Request(url, headers=headers or {})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, dict(r.headers), r.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read()


def test_tile_roundtrip_and_headers(server):
    from sparktiles.functions import mvtcodec as C

    base, srv = server
    status, headers, body = _get(f"{base}/tiles/0/0/0.pbf")
    assert status == 200
    assert headers["Content-Type"] == "application/x-protobuf"
    assert headers["Content-Disposition"] == "attachment"
    assert headers.get("Content-Encoding") == "gzip"
    assert headers["ETag"].startswith('"') and len(headers["ETag"]) == 34
    # urllib does not auto-decompress; the payload is the stored blob
    tile = C.decode_tile(gzip.decompress(body))
    assert "place" in tile and tile["place"]["features"]


def test_etag_304(server):
    base, _ = server
    _, headers, _ = _get(f"{base}/tiles/0/0/0.pbf")
    status, h2, body = _get(f"{base}/tiles/0/0/0.pbf",
                            {"If-None-Match": headers["ETag"]})
    assert status == 304 and body == b""
    assert h2["ETag"] == headers["ETag"]


def test_empty_tile_204(server):
    base, _ = server
    status, _, body = _get(f"{base}/tiles/14/0/0.pbf")
    assert status == 204 and body == b""


def test_bad_address_400_and_404(server):
    base, _ = server
    assert _get(f"{base}/tiles/a/b/c.pbf")[0] == 400
    assert _get(f"{base}/nope")[0] == 404


def test_tilejson(server):
    base, srv = server
    status, headers, body = _get(f"{base}/tilejson.json")
    assert status == 200 and headers["Content-Type"] == "application/json"
    tj = json.loads(body)
    assert tj["tilejson"] == "2.2.0" and tj["format"] == "pbf"
    assert tj["minzoom"] == 0 and tj["maxzoom"] == 2
    assert "{z}/{x}/{y}" in tj["tiles"][0]


def test_store_load_no_double_count(server, store):
    # DISTINCT guards against any dir-layout duplication in the scan
    _, srv = server
    n = len(srv.RequestHandlerClass.tiles)
    assert n == sum(1 for (z, _, _) in srv.RequestHandlerClass.tiles)
    zs = {z for (z, _, _) in srv.RequestHandlerClass.tiles}
    assert zs == {0, 1, 2}


def test_head_matches_get_headers(server):
    import http.client

    base, _ = server
    host = base.split("//")[1]
    c = http.client.HTTPConnection(host)
    c.request("HEAD", "/tiles/0/0/0.pbf")
    r = c.getresponse()
    body = r.read()
    assert r.status == 200 and body == b""
    assert r.getheader("ETag") and r.getheader("Content-Length") != "0"
