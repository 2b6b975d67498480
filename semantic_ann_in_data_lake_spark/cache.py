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

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame

_SCOPES: list[list[DataFrame]] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` that registers with the innermost active
    :func:`cache_scope` (no-op registration when no scope is active —
    the caller then owns the cache for the session)."""
    df = df.persist()
    if _SCOPES:
        _SCOPES[-1].append(df)
    return df


@contextmanager
def cache_scope() -> Iterator[list[DataFrame]]:
    """Unpersist every :func:`scoped_persist` made inside the block on
    exit. Results computed inside remain CORRECT afterwards (Spark
    recomputes from lineage) — only the cached blocks are released."""
    frames: list[DataFrame] = []
    _SCOPES.append(frames)
    try:
        yield frames
    finally:
        _SCOPES.pop()
        for df in frames:
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped — nothing to release
