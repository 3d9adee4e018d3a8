"""REST façade tests — mirrors the reference's rest_test.go scenarios:
create/info/list, insert (incl. text-embed path), search with filter
expecting exactly id 1 (rest_test.go:503-570), pagination
(rest_test.go:72-160), metadata update, record delete, ids endpoint.
"""

import json
import threading
import urllib.request

import pytest

from syzgydb_spark.server import serve

PORT = 18472


@pytest.fixture(scope="module")
def base_url(spark, tmp_path_factory):
    folder = str(tmp_path_factory.mktemp("rest_data"))
    httpd = serve(spark, folder, PORT)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{PORT}"
    httpd.shutdown()


def call(base, method, path, body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(f"{base}{path}", data=data, method=method)
    req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def test_full_rest_flow(base_url):
    # create (rest_test.go create scenario)
    code, _ = call(base_url, "POST", "/api/v1/collections", {
        "name": "demo", "vector_size": 5, "distance_function": "cosine",
    })
    assert code == 200
    # duplicate create → error
    code, _ = call(base_url, "POST", "/api/v1/collections", {
        "name": "demo", "vector_size": 5,
    })
    assert code == 404

    # insert the canonical 3 docs (rest_test.go:520-522)
    code, _ = call(base_url, "POST", "/api/v1/collections/demo/records", [
        {"id": 1, "vector": [0.1, 0.2, 0.3, 0.4, 0.5], "metadata": {"category": "A", "score": 80}},
        {"id": 2, "vector": [0.2, 0.3, 0.4, 0.5, 0.6], "metadata": {"category": "B", "score": 90}},
        {"id": 3, "vector": [0.3, 0.4, 0.5, 0.6, 0.7], "metadata": {"category": "A", "score": 70}},
    ])
    assert code == 200

    # info
    code, info = call(base_url, "GET", "/api/v1/collections/demo")
    assert code == 200 and info["document_count"] == 3 and info["vector_size"] == 5

    # the canonical filtered search → exactly id 1 (rest_test.go:554-569)
    code, res = call(base_url, "POST", "/api/v1/collections/demo/search", {
        "vector": [0.1, 0.2, 0.3, 0.4, 0.5], "k": 3,
        "filter": "category == 'A' AND score > 75",
    })
    assert code == 200
    assert [r["id"] for r in res["results"]] == [1]
    assert res["results"][0]["metadata"]["category"] == "A"
    assert "search_time" in res and res["percent_searched"] == 100.0

    # text-only insert → embedded via the stub model
    code, _ = call(base_url, "POST", "/api/v1/collections/demo/records", [
        {"id": 10, "text": "hello vector world", "metadata": {"category": "T"}},
    ])
    assert code == 200
    # searching by the same text must return that doc first
    code, res = call(base_url, "POST", "/api/v1/collections/demo/search", {
        "text": "hello vector world", "k": 1,
    })
    assert code == 200 and res["results"][0]["id"] == 10
    assert res["embedding_time"] >= 0

    # listing with pagination (rest_test.go:72-160): no k/radius
    code, res = call(base_url, "POST", "/api/v1/collections/demo/search", {
        "limit": 2, "offset": 1,
    })
    assert code == 200 and [r["id"] for r in res["results"]] == [2, 3]

    # ids
    code, ids = call(base_url, "GET", "/api/v1/collections/demo/ids")
    assert code == 200 and ids == [1, 2, 3, 10]

    # metadata update keeps the vector (rest_test.go update scenario)
    code, _ = call(base_url, "PUT", "/api/v1/collections/demo/records/2/metadata",
                   {"metadata": {"category": "Z"}})
    assert code == 200
    code, res = call(base_url, "POST", "/api/v1/collections/demo/search", {
        "vector": [0.2, 0.3, 0.4, 0.5, 0.6], "k": 1, "filter": "category == 'Z'",
    })
    assert code == 200 and res["results"][0]["id"] == 2

    # delete record
    code, _ = call(base_url, "DELETE", "/api/v1/collections/demo/records/3")
    assert code == 200
    code, ids = call(base_url, "GET", "/api/v1/collections/demo/ids")
    assert ids == [1, 2, 10]

    # list collections / drop
    code, lst = call(base_url, "GET", "/api/v1/collections")
    assert code == 200 and [c["name"] for c in lst] == ["demo"]
    code, _ = call(base_url, "DELETE", "/api/v1/collections/demo")
    assert code == 200
    code, lst = call(base_url, "GET", "/api/v1/collections")
    assert lst == []


def test_get_search_query_params(base_url):
    """GET search variant (reference rest.go:401-409): text / filter /
    k / limit / offset come from query params; no raw vector."""
    from urllib.parse import quote

    call(base_url, "POST", "/api/v1/collections", {"name": "g", "vector_size": 4})
    call(base_url, "POST", "/api/v1/collections/g/records", [
        {"id": 1, "text": "alpha beta gamma", "metadata": {"category": "A", "score": 80}},
        {"id": 2, "text": "delta epsilon zeta", "metadata": {"category": "B", "score": 90}},
        {"id": 3, "text": "eta theta iota", "metadata": {"category": "A", "score": 70}},
    ])
    # listing via GET with limit/offset
    code, res = call(base_url, "GET", "/api/v1/collections/g/search?limit=2&offset=1")
    assert code == 200 and [r["id"] for r in res["results"]] == [2, 3]
    # text + filter via GET — the canonical filter keeps exactly id 1
    flt = quote("category == 'A' AND score > 75")
    code, res = call(
        base_url, "GET",
        f"/api/v1/collections/g/search?text={quote('alpha beta gamma')}&k=3&filter={flt}",
    )
    assert code == 200 and [r["id"] for r in res["results"]] == [1]
    assert res["embedding_time"] >= 0
    # bad filter via GET → 400, like the POST path
    code, res = call(
        base_url, "GET", f"/api/v1/collections/g/search?k=1&filter={quote('x ==')}"
    )
    assert code == 400 and "error" in res
    call(base_url, "DELETE", "/api/v1/collections/g")


def test_percent_searched_observed_on_ann_path(base_url):
    """An LSH-indexed collection reports percent_searched < 100 from
    the query's own observed pass (collection.go:700-709)."""
    import numpy as np

    call(base_url, "POST", "/api/v1/collections", {
        "name": "ann", "vector_size": 8, "distance_function": "cosine",
        "lsh": {"dim": 8, "num_tables": 5, "num_planes": 8, "seed": 2,
                "method": "cosine", "bucket_width": 1.0},
    })
    rng = np.random.default_rng(5)
    recs = [
        {"id": i, "vector": rng.uniform(size=8).tolist(), "metadata": {"i": i}}
        for i in range(800)
    ]
    code, _ = call(base_url, "POST", "/api/v1/collections/ann/records", recs)
    assert code == 200
    code, res = call(base_url, "POST", "/api/v1/collections/ann/search", {
        "vector": recs[17]["vector"], "k": 5, "precision": "medium",
    })
    assert code == 200 and res["results"][0]["id"] == 17
    assert 0.0 < res["percent_searched"] < 100.0
    # exact path reports 100
    code, res = call(base_url, "POST", "/api/v1/collections/ann/search", {
        "vector": recs[17]["vector"], "k": 5, "precision": "exact",
    })
    assert code == 200 and res["percent_searched"] == 100.0
    call(base_url, "DELETE", "/api/v1/collections/ann")


def test_search_bad_filter_is_400(base_url):
    call(base_url, "POST", "/api/v1/collections", {"name": "e", "vector_size": 2})
    call(base_url, "POST", "/api/v1/collections/e/records",
         [{"id": 1, "vector": [0.0, 1.0], "metadata": {}}])
    code, res = call(base_url, "POST", "/api/v1/collections/e/search", {
        "vector": [0.0, 1.0], "k": 1, "filter": "category ==",
    })
    assert code == 400 and "error" in res


def test_search_result_cap(spark, tmp_path):
    """An unbounded listing/radius query must not ship the whole
    collection through the driver: results cap at max_results and the
    response says so."""
    from syzgydb_spark.server import EngineServer

    srv = EngineServer(spark, str(tmp_path / "cap_data"), max_results=3)
    srv.create_collection(
        {"name": "caps", "vector_size": 3, "distance_function": "euclidean"}
    )
    srv.insert(
        "caps",
        [
            {"id": i, "vector": [float(i), 0.0, 0.0], "metadata": {"i": i}}
            for i in range(10)
        ],
    )
    res = srv.search("caps", {})  # listing, no limit
    assert len(res["results"]) == 3
    assert res["truncated"] is True
    # a bounded query is not flagged
    res2 = srv.search("caps", {"limit": 2})
    assert len(res2["results"]) == 2
    assert res2["truncated"] is False


# ------------------------------------------------------ config loading

def test_load_config_precedence(tmp_path):
    """flags > env > config file > defaults — the reference's viper
    lookup order (cmd/config.go:32-90)."""
    from syzgydb_spark.server import ServerConfig, load_config

    # defaults match cmd/config.go SetDefault values
    d = load_config(env={})
    assert d.syzgy_host == "0.0.0.0:8080"
    assert d.ollama_server == "127.0.0.1:11434"
    assert d.text_model == "all-minilm"
    assert d.data_folder == "./data"

    conf = tmp_path / "syzgy.conf"
    conf.write_text(
        "# comment\n"
        "data_folder: /tmp/from_file   # trailing comment\n"
        "syzgy-host: '0.0.0.0:9999'\n"
        "text_model: \"file-model\"\n"
        "unknown_key: ignored\n"
    )
    c = load_config(env={}, config_file=str(conf))
    assert c.data_folder == "/tmp/from_file"
    assert c.syzgy_host == "0.0.0.0:9999"  # dash key normalized, quotes stripped
    assert c.text_model == "file-model"

    # env overrides the file; flags override env
    c = load_config(
        {"text-model": "flag-model"},
        env={"TEXT_MODEL": "env-model", "DATA_FOLDER": "/tmp/from_env"},
        config_file=str(conf),
    )
    assert c.text_model == "flag-model"
    assert c.data_folder == "/tmp/from_env"
    assert c.syzgy_host == "0.0.0.0:9999"  # file still wins over defaults

    with pytest.raises(ValueError, match="unknown config key"):
        load_config({"ollama_sever": "typo"}, env={})

    # missing file is not an error (reference logs and continues)
    c = load_config(env={}, config_file=str(tmp_path / "nope.conf"))
    assert c.data_folder == "./data"

    # search path discovery: '.'-style chain finds syzgy.conf
    c = load_config(env={}, search_paths=(str(tmp_path),))
    assert c.data_folder == "/tmp/from_file"


def test_serve_uses_config(spark, tmp_path):
    """serve(config=...) resolves data folder and port from the config
    and keeps route behavior; an explicit model_fn (the stub) is used
    for text search instead of the configured HTTP client."""
    import json as _json
    import urllib.request

    from syzgydb_spark.embedding import stub_model
    from syzgydb_spark.server import ServerConfig, serve

    cfg = ServerConfig(
        data_folder=str(tmp_path / "cfg_data"), syzgy_host="0.0.0.0:18099"
    )
    httpd = serve(spark, config=cfg, model_fn=stub_model)
    import threading

    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = "http://127.0.0.1:18099/api/v1/collections"
        req = urllib.request.Request(
            base,
            data=_json.dumps({"name": "cfgcol", "vector_size": 3}).encode(),
            headers={"Content-Type": "application/json"},
        )
        assert urllib.request.urlopen(req).status in (200, 201)
        import os as _os

        assert _os.path.isdir(str(tmp_path / "cfg_data" / "cfgcol"))
        # text insert + text search ride the stub model end-to-end
        req = urllib.request.Request(
            base + "/cfgcol/records",
            data=_json.dumps([{"id": 1, "text": "hello world"}]).encode(),
            headers={"Content-Type": "application/json"},
        )
        assert urllib.request.urlopen(req).status == 200
        req = urllib.request.Request(
            base + "/cfgcol/search",
            data=_json.dumps({"text": "hello world", "k": 1}).encode(),
            headers={"Content-Type": "application/json"},
        )
        body = _json.loads(urllib.request.urlopen(req).read())
        assert [r["id"] for r in body["results"]] == [1]
    finally:
        httpd.shutdown()
