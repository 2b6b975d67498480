"""Pluggable embedding stage (reference V4/V5).

The reference embeds column descriptions one HTTP call at a time with
a hard 0.1 s sleep (≤10 columns/s, ``join_discoverer.py:244``). The
Spark shape is a batched ``mapInPandas`` stage: each Arrow batch goes
through the embedder once, with per-executor lazy model/client init,
optional rate limiting, and content-hash keys for idempotent caching
(so task retries/speculation never double-bill an API;
SURVEY §4.3).

Two built-in embedders:

- ``HashEmbedder`` — deterministic feature-hash vector from md5
  chunks; no model, no network; also available as a PURE COLUMN
  EXPRESSION (``hash_embedding_expr``) so the DuckDB oracle can check
  the whole embed→index→search pipeline end to end.
- ``CallableEmbedder`` — wraps any ``list[str] -> list[list[float]]``
  (an OpenAI client, a sentence-transformer, …). Import-gated; never
  required for correctness tests.
"""

from __future__ import annotations

import hashlib
import math
from typing import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from semantic_ann_in_data_lake_spark.functions.hashing import (
    portable_hash64,
    portable_hash_expr,
)

_SCALE = 100000.0


class HashEmbedder:
    """Deterministic local embedder: dim hash projections of the text.

    Component i = (md5("i:" + text) as 60-bit int mod 200001)/100000 - 1
    ∈ [-1, 1] — matches ``hash_embedding_expr`` bit-for-bit.
    """

    def __init__(self, dim: int = 16):
        self.dim = dim

    def __call__(self, texts: list[str]) -> list[list[float]]:
        out = []
        for t in texts:
            vec = []
            for i in range(self.dim):
                h = int(hashlib.md5(f"{i}:{t}".encode()).hexdigest()[:15], 16)
                vec.append((h % 200001) / _SCALE - 1.0)
            out.append(vec)
        return out


#: worker-process-global HTTP throttle state (see HttpEmbedder):
#: per-endpoint last-call stamps shared by every task in this worker.
import threading as _threading

_THROTTLE_LOCK = _threading.Lock()
_LAST_CALL: dict[str, float] = {}


def hash_embedding_expr(text: Column | str, dim: int = 16) -> Column:
    """The HashEmbedder as a JVM column expression (oracle-checkable)."""
    c = F.col(text) if isinstance(text, str) else text
    comps = [
        (
            F.pmod(portable_hash64(c, seed=f"{i}:"), F.lit(200001)).cast("double")
            / F.lit(_SCALE)
            - F.lit(1.0)
        )
        for i in range(dim)
    ]
    return F.array(*comps)


def hash_embedding_sql(expr: str, dim: int = 16) -> str:
    """DuckDB twin of :func:`hash_embedding_expr`."""
    comps = ", ".join(
        f"(({portable_hash_expr(expr, seed=f'{i}:')} % 200001)::DOUBLE / {_SCALE} - 1.0)"
        for i in range(dim)
    )
    return f"[{comps}]"


class CallableEmbedder:
    """Adapter for real model/API embedders; constructed lazily on the
    executor (the factory runs once per python worker)."""

    def __init__(self, factory: Callable[[], Callable[[list[str]], list[list[float]]]]):
        self.factory = factory
        self._fn = None

    def __call__(self, texts: list[str]) -> list[list[float]]:
        if self._fn is None:
            self._fn = self.factory()
        return self._fn(texts)


class HttpEmbedder:
    """Minimal HTTP embedding client behind the standard embedder
    interface (``list[str] -> list[list[float]]``) — the thin piece the
    reference wires to a hosted service one item at a time with a hard
    sleep (``semantic_annotation.py:116-131``,
    ``join_discoverer.py:149-168, 244``); here ONE request per Arrow
    batch inside ``embed_texts``'s ``mapInPandas`` stage.

    POSTs ``{"input": [...], "model": ...}`` and expects
    ``{"data": [{"embedding": [...]}, ...]}`` in input order (the
    request/response shape most public embedding endpoints share).
    stdlib ``urllib`` only — no extra dependency; auth goes in
    ``headers`` (caller-supplied, never read from the environment).
    Retries 429/5xx with exponential backoff; ``min_interval_s``
    rate-limits per worker process. Combine with ``embed_texts``'s
    content-hash column for idempotent caching so task retries and
    speculation never re-bill completed batches.
    """

    def __init__(
        self,
        url: str,
        model: str = "default",
        headers: dict[str, str] | None = None,
        timeout_s: float = 30.0,
        max_retries: int = 4,
        backoff_s: float = 0.5,
        min_interval_s: float = 0.0,
    ):
        self.url = url
        self.model = model
        self.headers = dict(headers or {})
        self.timeout_s = timeout_s
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.min_interval_s = min_interval_s

    def __call__(self, texts: list[str]) -> list[list[float]]:
        import json
        import time
        import urllib.error
        import urllib.request

        payload = json.dumps({"input": texts, "model": self.model}).encode()
        headers = {"Content-Type": "application/json", **self.headers}
        last_err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            if self.min_interval_s > 0:
                # throttle state is WORKER-global (module dict keyed by
                # endpoint), not per instance: HttpEmbedder objects are
                # re-deserialized per TASK, so instance state would
                # reset every task and concurrent tasks in one worker
                # would each rate-limit only against themselves. One
                # lock+stamp per worker process is the real per-worker
                # floor; total cluster rate is still workers × rate —
                # size min_interval_s for the worker count.
                with _THROTTLE_LOCK:
                    wait = (
                        _LAST_CALL.get(self.url, 0.0)
                        + self.min_interval_s
                        - time.time()
                    )
                    if wait > 0:
                        time.sleep(wait)
                    _LAST_CALL[self.url] = time.time()
            try:
                req = urllib.request.Request(
                    self.url, data=payload, headers=headers, method="POST"
                )
                with urllib.request.urlopen(req, timeout=self.timeout_s) as r:
                    body = json.loads(r.read().decode("utf-8"))
                data = body["data"]
                if len(data) != len(texts):
                    raise ValueError(
                        f"embedding endpoint returned {len(data)} vectors "
                        f"for {len(texts)} inputs"
                    )
                return [list(map(float, d["embedding"])) for d in data]
            except urllib.error.HTTPError as e:
                # retry only transient statuses; client errors propagate
                if e.code == 429 or e.code >= 500:
                    last_err = e
                else:
                    raise
            except (urllib.error.URLError, TimeoutError) as e:
                last_err = e
            if attempt < self.max_retries:
                time.sleep(self.backoff_s * (2**attempt))
        raise RuntimeError(
            f"embedding endpoint failed after {self.max_retries + 1} attempts"
        ) from last_err


def embed_texts(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    embedder: Callable[[list[str]], list[list[float]]] | None = None,
    dim: int = 16,
    batch_size: int = 256,
) -> DataFrame:
    """mapInPandas embedding stage → id cols + content_hash + embedding.

    ``content_hash`` keys an idempotent cache (the reference's
    artifact-cache S9 generalized): re-runs or task retries can join
    against previously persisted embeddings and skip the model call.
    """
    import pandas as pd

    emb = embedder or HashEmbedder(dim)
    out_fields = ", ".join(f"{c} string" for c in id_cols)
    schema = f"{out_fields}, content_hash string, embedding array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                texts = chunk[text_col].fillna("").tolist()
                vecs = emb(texts)
                # null ids must stay NULL: astype(str) renders them as
                # the literal 'None', forging a phantom join key
                out = {
                    c: [None if pd.isna(v) else str(v) for v in chunk[c]]
                    for c in id_cols
                }
                out["content_hash"] = [
                    hashlib.md5(t.encode()).hexdigest() for t in texts
                ]
                out["embedding"] = vecs
                yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=schema)
