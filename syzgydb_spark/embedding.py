"""Text → vector embedding stage.

Reference: ``EmbedText`` batches texts into one HTTP POST to an Ollama
``/api/embed`` endpoint, with a swappable function hook for tests and a
100-entry LRU cache (/root/reference/embedding.go:21-104,
embedding_cache.go:13-57, rest.go:250-272 for the batch trick).

Spark-first shape: an ``mapInPandas`` stage — each Arrow batch is one
"HTTP batch" (the reference's rest.go batching falls out for free), the
model hook is a plain callable, and the LRU lives for one TASK (the
closure is rebuilt per task): it short-circuits repeated texts within a
partition, which is where the duplicates are after any upstream
repartition-by-text. A process-global cache would require the package
on the executors' PYTHONPATH, which this library deliberately avoids.

No embedding model ships in this environment, so the default model is a
deterministic stub: per-component md5-derived uniforms, L2-normalized —
stable across runs AND engines (each step is exact-rational → IEEE
double, so a DuckDB SQL oracle reproduces the vector bit-for-bit), like
the reference's stubbed ``embedText`` (embedding.go:21-24). A real
deployment passes ``model_fn`` that calls its endpoint with the same
(texts → matrix) contract.
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict
from typing import Callable, Iterator

import numpy as np

from pyspark.sql import DataFrame, SparkSession

EMBED_CACHE_SIZE = 100  # reference embedding.go:14


def _make_stub_model():
    """Built as a nested closure so cloudpickle ships it BY VALUE into
    executor UDFs — a plain module-level def would pickle by reference
    and executors would need this package importable (they don't, when
    an app runs outside the repo root)."""

    def stub(texts: list[str], dim: int) -> np.ndarray:
        import hashlib
        import math

        import numpy as np

        out = np.empty((len(texts), dim), dtype=np.float64)
        for i, t in enumerate(texts):
            # component j = md5(text|j) first 4 bytes as uint32,
            # scaled to [-0.5, 0.5); L2-normalized. Every step is
            # exact rational → IEEE double, so the same vector is
            # expressible in ANSI SQL (md5 + hex-cast + sqrt) and the
            # oracle can hash-match it (cf. the plane-literal trick
            # the LSH oracle uses). Sequential-order norm sum on
            # purpose — matches a SQL fold, unlike numpy's pairwise.
            x = [
                int.from_bytes(
                    hashlib.md5(f"{t}|{j}".encode()).digest()[:4], "big"
                )
                / 4294967296.0
                - 0.5
                for j in range(dim)
            ]
            s = 0.0
            for v in x:
                s += v * v
            n = math.sqrt(s)
            out[i] = [v / n for v in x] if n > 0 else x
        return out

    return stub


#: Deterministic fake embedder: per-component md5-derived uniforms,
#: L2-normalized — SQL-expressible (see stub docstring).
stub_model = _make_stub_model()


def make_http_model(
    endpoint: str,
    model: str,
    *,
    batch_size: int = 256,
    timeout: float = 30.0,
    max_retries: int = 3,
    backoff: float = 0.5,
):
    """Build a ``model_fn`` that POSTs text batches to an
    Ollama-compatible ``/api/embed`` endpoint — the reference's real
    client (embedding.go:27-104): payload ``{"model": ..., "input":
    [texts]}``, response ``{"embeddings": [[...]]}``, scheme-less
    hosts get ``http://`` prefixed, non-200 is an error.

    Additions over the reference (it sends one unbounded POST and has
    no retry): requests are chunked to ``batch_size`` texts, and
    transient failures (URLError, HTTP 5xx/429) retry up to
    ``max_retries`` with exponential backoff. A returned dimension
    that disagrees with the requested ``dim`` raises rather than
    silently truncating.

    stdlib-only (urllib) and built as a nested closure so cloudpickle
    ships it by value into executor UDFs — same contract as
    ``stub_model``: ``(texts, dim) -> ndarray[len(texts), dim]``.
    """
    url = endpoint
    if not (url.startswith("http://") or url.startswith("https://")):
        url = "http://" + url
    url = url.rstrip("/") + "/api/embed"

    def http_embed(texts: list[str], dim: int) -> np.ndarray:
        import json as _json
        import time as _time
        import urllib.error
        import urllib.request

        import numpy as _np

        out = _np.empty((len(texts), dim), dtype=np.float64)
        for start in range(0, len(texts), batch_size):
            chunk = texts[start : start + batch_size]
            body = _json.dumps({"model": model, "input": chunk}).encode()
            last_err: Exception | None = None
            for attempt in range(max_retries + 1):
                req = urllib.request.Request(
                    url, data=body, headers={"Content-Type": "application/json"}
                )
                try:
                    with urllib.request.urlopen(req, timeout=timeout) as resp:
                        payload = _json.loads(resp.read().decode())
                    break
                except urllib.error.HTTPError as e:
                    retriable = e.code >= 500 or e.code == 429
                    detail = e.read().decode(errors="replace")
                    last_err = RuntimeError(
                        f"failed to get embedding: HTTP {e.code}: {detail}"
                    )
                    if not retriable or attempt == max_retries:
                        raise last_err from e
                except (urllib.error.URLError, TimeoutError) as e:
                    last_err = RuntimeError(
                        f"failed to connect to embedding server: {e}"
                    )
                    if attempt == max_retries:
                        raise last_err from e
                _time.sleep(backoff * (2**attempt))
            embs = payload.get("embeddings") or []
            if len(embs) != len(chunk):
                raise RuntimeError(
                    f"no embeddings found in response: got {len(embs)}, "
                    f"expected {len(chunk)}"
                )
            mat = _np.asarray(embs, dtype=_np.float64)
            if mat.shape != (len(chunk), dim):
                raise ValueError(
                    f"embedding dimension mismatch: server returned "
                    f"{mat.shape[1] if mat.ndim == 2 else '?'}, expected {dim}"
                )
            out[start : start + len(chunk)] = mat
        return out

    return http_embed


def embed_text(
    spark: SparkSession,
    df: DataFrame,
    *,
    text_col: str = "text",
    out_col: str = "embedding",
    dim: int = 64,
    model_fn: Callable[[list[str], int], np.ndarray] | None = None,
    cache_size: int = EMBED_CACHE_SIZE,
) -> DataFrame:
    """Append an embedding column computed batch-wise on executors.

    Each Arrow batch is embedded in one ``model_fn`` call (the batched-
    RPC pattern); a task-local LRU short-circuits repeated texts within
    the partition.
    """
    import pandas as pd

    fn = model_fn or stub_model
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{fields}, {out_col} array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: OrderedDict[str, np.ndarray] = OrderedDict()

        def embed_batch(texts: list[str]) -> list[np.ndarray]:
            # results for THIS batch live in a local dict so LRU
            # eviction can never force a re-embed within the batch
            # (with many unique texts per Arrow batch the old lookup
            # lost evicted vectors and fell back to one model call PER
            # TEXT — the exact per-row RPC pattern batching exists to
            # avoid); the LRU only serves cross-batch reuse, with
            # recency refreshed on hit (true LRU, like the reference's
            # embedding_cache.go)
            local: dict[str, np.ndarray] = {}
            misses: list[str] = []
            for t in dict.fromkeys(texts):
                v = cache.get(t)
                if v is not None:
                    cache.move_to_end(t)
                    local[t] = v
                else:
                    misses.append(t)
            if misses:
                vecs = fn(misses, dim)
                for t, v in zip(misses, vecs):
                    local[t] = v
                    cache[t] = v
                    cache.move_to_end(t)
                    if len(cache) > cache_size:
                        cache.popitem(last=False)
            return [local[t] for t in texts]

        for pdf in batches:
            texts = pdf[text_col].fillna("").astype(str).tolist()
            pdf = pdf.copy()
            pdf[out_col] = [v.tolist() for v in embed_batch(texts)]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
