"""Cache-lifetime management for operators that persist intermediates.

Several operators persist a subtree that feeds multiple branches of the
ONE lazy plan they return (kNN reuse in the grid evaluator, LSH / SimHash
signatures ahead of self-joins, the embedded catalog in discovery):
Catalyst does not CSE across join/union branches, so without the persist
the expensive subtree re-executes per plan site. Because the result is
returned lazily, the operator itself cannot unpersist — the blocks must
outlive the function and be dropped only after the caller's consuming
action.

:func:`scoped_persist` keeps that contract explicit: inside a
:func:`cache_scope` block, every persist is registered and released when
the block exits (after the caller has run its action); outside any
scope it behaves exactly like ``df.persist()`` and the caller owns the
lifetime for the rest of the session. Long-running loops (``bench.py``,
repeated notebook calls) wrap each iteration in ``cache_scope()`` so
cached blocks cannot accumulate for the lifetime of the session.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame

# thread-LOCAL scope stack: concurrent driver threads (foreachBatch
# callbacks, parallel bench iterations) each get their own stack — a
# shared module global would register thread A's persists into thread
# B's innermost frame and unpersist A's still-in-use blocks when B's
# scope exits
_TLS = threading.local()


def _scopes() -> list[list[DataFrame]]:
    stack = getattr(_TLS, "scopes", None)
    if stack is None:
        stack = []
        _TLS.scopes = stack
    return stack


def scoped_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` that registers with the innermost active
    :func:`cache_scope` of THIS thread (no-op registration when no
    scope is active — the caller then owns the cache for the
    session)."""
    df = df.persist()
    stack = _scopes()
    if stack:
        stack[-1].append(df)
    return df


@contextmanager
def cache_scope() -> Iterator[list[DataFrame]]:
    """Unpersist every :func:`scoped_persist` made inside the block on
    exit. Results computed inside remain CORRECT afterwards (Spark
    recomputes from lineage) — only the cached blocks are released."""
    frames: list[DataFrame] = []
    stack = _scopes()
    stack.append(frames)
    try:
        yield frames
    finally:
        stack.pop()
        for df in frames:
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped — nothing to release
