"""HTTP embedding client (make_http_model) against a local stdlib
http.server fixture — the reference's real Ollama client contract
(embedding.go:27-104: POST {model, input} → {embeddings}), plus the
batching/retry additions this client layers on top."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from syzgydb_spark.embedding import embed_text, make_http_model

DIM = 8


class _FakeEmbedServer:
    """Ollama-shaped /api/embed endpoint: embedding i of text t is a
    deterministic function of (len(t), i). Records per-request batch
    sizes; can be told to fail the next N requests with a given
    status."""

    def __init__(self, *, bad_dim: bool = False):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                if self.path != "/api/embed":
                    self.send_error(404)
                    return
                body = json.loads(
                    self.rfile.read(int(self.headers["Content-Length"]))
                )
                server.requests.append(body)
                if server.fail_next > 0:
                    server.fail_next -= 1
                    self.send_error(server.fail_status, "injected failure")
                    return
                d = DIM - 1 if server.bad_dim else DIM
                embs = [
                    [float(len(t) + i) for i in range(d)] for t in body["input"]
                ]
                out = json.dumps({"embeddings": embs}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)

        self.requests: list[dict] = []
        self.fail_next = 0
        self.fail_status = 503
        self.bad_dim = bad_dim
        self.httpd = HTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.httpd.server_address[1]
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self.thread.start()

    @property
    def endpoint(self) -> str:
        # scheme-less on purpose: the client must add http://
        # (embedding.go:61-64)
        return f"127.0.0.1:{self.port}"

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


@pytest.fixture()
def fake_server():
    s = _FakeEmbedServer()
    yield s
    s.close()


def _expected(texts):
    return np.array(
        [[float(len(t) + i) for i in range(DIM)] for t in texts]
    )


def test_basic_post_and_model_field(fake_server):
    fn = make_http_model(fake_server.endpoint, "all-minilm")
    texts = ["alpha", "bee", ""]
    out = fn(texts, DIM)
    assert out.shape == (3, DIM)
    np.testing.assert_allclose(out, _expected(texts))
    assert fake_server.requests == [{"model": "all-minilm", "input": texts}]


def test_batching_chunks_requests(fake_server):
    fn = make_http_model(fake_server.endpoint, "m", batch_size=4)
    texts = [f"t{i}" for i in range(10)]
    out = fn(texts, DIM)
    np.testing.assert_allclose(out, _expected(texts))
    sizes = [len(r["input"]) for r in fake_server.requests]
    assert sizes == [4, 4, 2]


def test_retry_on_transient_5xx(fake_server):
    fake_server.fail_next = 2
    fn = make_http_model(
        fake_server.endpoint, "m", max_retries=3, backoff=0.01
    )
    out = fn(["hello"], DIM)
    np.testing.assert_allclose(out, _expected(["hello"]))
    assert len(fake_server.requests) == 3  # 2 failures + 1 success


def test_non_retriable_4xx_raises(fake_server):
    fake_server.fail_next = 1
    fake_server.fail_status = 400
    fn = make_http_model(fake_server.endpoint, "m", backoff=0.01)
    with pytest.raises(RuntimeError, match="HTTP 400"):
        fn(["hello"], DIM)
    assert len(fake_server.requests) == 1  # no retry on client error


def test_retries_exhausted_raises(fake_server):
    fake_server.fail_next = 99
    fn = make_http_model(
        fake_server.endpoint, "m", max_retries=2, backoff=0.01
    )
    with pytest.raises(RuntimeError, match="HTTP 503"):
        fn(["hello"], DIM)
    assert len(fake_server.requests) == 3  # initial + 2 retries


def test_dimension_mismatch_raises():
    s = _FakeEmbedServer(bad_dim=True)
    try:
        fn = make_http_model(s.endpoint, "m")
        with pytest.raises(ValueError, match="dimension mismatch"):
            fn(["hello"], DIM)
    finally:
        s.close()


def test_connection_refused_raises():
    fn = make_http_model("127.0.0.1:1", "m", max_retries=1, backoff=0.01)
    with pytest.raises(RuntimeError, match="failed to connect"):
        fn(["hello"], DIM)


def test_as_model_fn_through_embed_text(spark, fake_server):
    """The executor path: embed_text ships the closure by value into
    mapInPandas; local[4] executors POST to the fixture server."""
    fn = make_http_model(fake_server.endpoint, "m")
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(20)], "id LONG, text STRING"
    )
    out = embed_text(spark, df, text_col="text", dim=DIM, model_fn=fn)
    rows = {r["id"]: r["embedding"] for r in out.collect()}
    assert len(rows) == 20
    np.testing.assert_allclose(rows[3], _expected(["doc 3"])[0])
    assert all(len(v) == DIM for v in rows.values())
