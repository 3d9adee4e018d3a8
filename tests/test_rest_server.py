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


def test_search_bad_filter_is_400(base_url):
    call(base_url, "POST", "/api/v1/collections", {"name": "e", "vector_size": 2})
    call(base_url, "POST", "/api/v1/collections/e/records",
         [{"id": 1, "vector": [0.0, 1.0], "metadata": {}}])
    code, res = call(base_url, "POST", "/api/v1/collections/e/search", {
        "vector": [0.0, 1.0], "k": 1, "filter": "category ==",
    })
    assert code == 400 and "error" in res
