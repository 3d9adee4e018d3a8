"""Thin REST façade over the engine — endpoint parity with the
reference server (/root/reference/rest.go, main.go:36-50).

Stdlib-only (http.server; no extra deps in this environment). This is
a demo/ops surface, NOT the scale path: per BASELINE.json, single-query
online serving is out of scope for a Spark engine — each request runs a
small Spark job (seconds, not milliseconds). The batch APIs
(Collection, knn_join, dedup) are the product.

Endpoint surface (reference rest.go):

    POST   /api/v1/collections                     create
    GET    /api/v1/collections                     list
    GET    /api/v1/collections/{name}              info/stats
    DELETE /api/v1/collections/{name}              drop
    POST   /api/v1/collections/{name}/records      insert/upsert batch
    PUT    /api/v1/collections/{name}/records/{id}/metadata
    DELETE /api/v1/collections/{name}/records/{id}
    GET    /api/v1/collections/{name}/ids          all ids
    POST   /api/v1/collections/{name}/search       search (vector |
                                                   text | filter, k /
                                                   radius / limit /
                                                   offset / precision)
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

from syzgydb_spark.collection import Collection, CollectionOptions


class EngineServer:
    def __init__(self, spark: SparkSession, data_folder: str):
        self.spark = spark
        self.data_folder = data_folder
        os.makedirs(data_folder, exist_ok=True)
        self.collections: dict[str, Collection] = {}
        # open existing collections on startup (reference main.go:16-34)
        for name in os.listdir(data_folder):
            path = os.path.join(data_folder, name)
            if os.path.isfile(os.path.join(path, "options.json")):
                self.collections[name] = Collection.open(spark, path)

    # ---- handlers (thin, JSON in/out) ----
    def create_collection(self, body: dict) -> dict:
        name = body["name"]
        if name in self.collections:
            raise KeyError(f"collection {name} exists")
        opts = CollectionOptions(
            name=name,
            dimension_count=body["vector_size"],
            distance_method=body.get("distance_function", "euclidean"),
            quantization=body.get("quantization", 64),
        )
        path = os.path.join(self.data_folder, name)
        self.collections[name] = Collection.create(self.spark, path, opts)
        return {"message": f"collection {name} created"}

    def list_collections(self) -> list[dict]:
        return [self.info(n) for n in sorted(self.collections)]

    def info(self, name: str) -> dict:
        c = self.collections[name]
        st = c.stats()
        return {
            "name": name,
            "vector_size": c.options.dimension_count,
            "distance_function": c.options.distance_method,
            "quantization": c.options.quantization,
            "document_count": st["document_count"],
            "storage_size": st["storage_size"],
        }

    def drop(self, name: str) -> dict:
        c = self.collections.pop(name)
        shutil.rmtree(c.path, ignore_errors=True)
        return {"message": f"collection {name} deleted"}

    def insert(self, name: str, body: list[dict]) -> dict:
        c = self.collections[name]
        vec_rows, text_rows = [], []
        for r in body:
            meta = json.dumps(r.get("metadata") or {})
            if "vector" in r and r["vector"] is not None:
                vec_rows.append((int(r["id"]), [float(x) for x in r["vector"]], meta))
            else:
                # text-only records are embedded in one batch
                # (reference rest.go:250-272)
                text_rows.append((int(r["id"]), r.get("text", ""), meta))
        if vec_rows:
            c.add_documents(vec_rows)
        if text_rows:
            c.add_texts(text_rows)
        return {"message": f"{len(vec_rows) + len(text_rows)} records inserted"}

    def update_metadata(self, name: str, doc_id: int, body: dict) -> dict:
        self.collections[name].update_metadata(
            doc_id, json.dumps(body.get("metadata") or {})
        )
        return {"message": "metadata updated"}

    def delete_record(self, name: str, doc_id: int) -> dict:
        self.collections[name].remove(doc_id)
        return {"message": "record deleted"}

    def ids(self, name: str) -> list[int]:
        return self.collections[name].get_all_ids()

    def search(self, name: str, body: dict) -> dict:
        c = self.collections[name]
        t0 = time.time()
        embed_ms = 0.0
        vector = body.get("vector")
        if vector is None and body.get("text"):
            from syzgydb_spark.embedding import stub_model

            te = time.time()
            vector = [float(x) for x in stub_model([body["text"]], c.options.dimension_count)[0]]
            embed_ms = (time.time() - te) * 1000
        res = c.search(
            vector,
            k=int(body.get("k", 0) or 0),
            radius=float(body.get("radius", 0) or 0),
            filter=body.get("filter"),
            precision=body.get("precision", "medium"),
            offset=int(body.get("offset", 0) or 0),
            limit=int(body.get("limit", 0) or 0),
        )
        rows = res.collect()
        out = []
        for r in rows:
            rec = {"id": r["id"], "metadata": json.loads(r["metadata"] or "null")}
            if "distance" in r.__fields__:
                rec["distance"] = r["distance"]
            out.append(rec)
        pct = (
            c.percent_searched(vector)
            if vector is not None and body.get("precision", "medium") != "exact"
            else 100.0
        )
        return {
            "results": out,
            "percent_searched": pct,
            "search_time": round((time.time() - t0) * 1000 - embed_ms, 3),
            "embedding_time": round(embed_ms, 3),
        }


def make_handler(engine: EngineServer):
    routes = [
        ("POST", r"^/api/v1/collections$", lambda m, b: engine.create_collection(b)),
        ("GET", r"^/api/v1/collections$", lambda m, b: engine.list_collections()),
        ("GET", r"^/api/v1/collections/([^/]+)$", lambda m, b: engine.info(m.group(1))),
        ("DELETE", r"^/api/v1/collections/([^/]+)$", lambda m, b: engine.drop(m.group(1))),
        ("POST", r"^/api/v1/collections/([^/]+)/records$", lambda m, b: engine.insert(m.group(1), b)),
        ("PUT", r"^/api/v1/collections/([^/]+)/records/(\d+)/metadata$",
         lambda m, b: engine.update_metadata(m.group(1), int(m.group(2)), b)),
        ("DELETE", r"^/api/v1/collections/([^/]+)/records/(\d+)$",
         lambda m, b: engine.delete_record(m.group(1), int(m.group(2)))),
        ("GET", r"^/api/v1/collections/([^/]+)/ids$", lambda m, b: engine.ids(m.group(1))),
        ("POST", r"^/api/v1/collections/([^/]+)/search$", lambda m, b: engine.search(m.group(1), b)),
    ]

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _dispatch(self, method: str):
            body = None
            length = int(self.headers.get("Content-Length") or 0)
            if length:
                body = json.loads(self.rfile.read(length))
            for meth, pat, fn in routes:
                if meth != method:
                    continue
                m = re.match(pat, self.path)
                if m:
                    try:
                        result = fn(m, body)
                        code = 200
                    except KeyError as e:
                        result, code = {"error": str(e)}, 404
                    except Exception as e:  # surface engine errors as 400
                        result, code = {"error": f"{type(e).__name__}: {e}"}, 400
                    payload = json.dumps(result).encode()
                    self.send_response(code)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(payload)))
                    self.end_headers()
                    self.wfile.write(payload)
                    return
            self.send_response(404)
            self.end_headers()

        def do_GET(self):
            self._dispatch("GET")

        def do_POST(self):
            self._dispatch("POST")

        def do_PUT(self):
            self._dispatch("PUT")

        def do_DELETE(self):
            self._dispatch("DELETE")

    return Handler


def serve(spark: SparkSession, data_folder: str, port: int = 8080) -> ThreadingHTTPServer:
    """Start the server (non-blocking; call .serve_forever() or use the
    returned instance's .shutdown())."""
    engine = EngineServer(spark, data_folder)
    httpd = ThreadingHTTPServer(("127.0.0.1", port), make_handler(engine))
    return httpd


if __name__ == "__main__":
    from syzgydb_spark.session import get_spark

    folder = os.environ.get("SYZGY_DATA", "/tmp/syzgy_data")
    port = int(os.environ.get("SYZGY_PORT", "8080"))
    httpd = serve(get_spark(app_name="syzgydb-server"), folder, port)
    print(f"syzgydb-spark REST server on http://127.0.0.1:{port}")
    httpd.serve_forever()
