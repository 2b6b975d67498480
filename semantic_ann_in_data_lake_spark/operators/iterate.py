"""Shared checkpoint convention for ITERATIVE operators (PageRank /
TrustRank / HITS / LPA / k-core / BFS / HyperANF, NN-descent, dedup's
connected-components loop).

Every fixpoint loop in this engine truncates lineage once per round —
without it, each round's plan embeds the whole previous round's plan
2-5×, and Catalyst ANALYSIS goes exponential in the round count
(measured: 160 s → 16 s at T=3, PERF.md). Two postures:

``local`` (default)
    ``localCheckpoint(eager=True)``: blocks live in executor storage,
    zero filesystem round-trip — the right choice on local[*] and for
    short jobs. On a REAL multi-node cluster a local-checkpoint block
    dies with its executor, and because the lineage was truncated
    Spark cannot recompute it — any later task that needs the block
    fails the JOB, not just the task. Fine when a whole-job retry is
    acceptable; wrong for long multi-hour fixpoints on preemptible
    nodes.

``reliable``
    Parquet write→read round-trip under a caller-owned directory:
    the round state survives executor loss (any executor can re-read
    the files), exactly like ``sparkContext.setCheckpointDir`` + RDD
    checkpointing but with columnar files a human can also inspect,
    and with the read side a normal prunable scan. Costs one
    filesystem round-trip per round — on a cluster, point the dir at
    the DFS the executors share.

The knob is a context manager rather than a per-function parameter so
the posture threads through every nested helper (e.g. community_dedup
→ lpa_communities) without signature churn::

    from semantic_ann_in_data_lake_spark.operators.iterate import (
        reliable_checkpoints,
    )

    with reliable_checkpoints("/dfs/ckpt/run-17"):
        ranks = pagerank(edges, iters=20)
        ranks.write.parquet(...)   # consume INSIDE the context, or
                                   # keep the dir alive until consumed

The checkpoint files are NOT deleted on context exit: the returned
DataFrame still reads from the last round's files lazily. The caller
owns the directory lifecycle (delete it after the results are
consumed/persisted elsewhere). Output is bit-identical between
postures — pinned by ``tests/test_graphrank.py`` and the oracle gate,
which replays a reliable-mode run against the same DuckDB SQL.
"""

from __future__ import annotations

import os
import threading
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame

# thread-local, matching cache.py's per-thread scope stack: a
# reliable_checkpoints block entered on one thread (a streaming
# foreachBatch handler, a parallel bench leg) must not flip the
# posture — or the target dir — for fixpoint loops running
# concurrently on other threads, and the finally-restore must not
# clobber a nested context on another thread.
_TLS = threading.local()


def _state() -> dict:
    st = getattr(_TLS, "state", None)
    if st is None:
        st = {"mode": "local", "dir": None, "seq": 0}
        _TLS.state = st
    return st


@contextmanager
def reliable_checkpoints(checkpoint_dir: str) -> Iterator[None]:
    """Run iterative operators with executor-loss-safe round state:
    every per-round lineage truncation inside the block becomes a
    parquet round-trip under ``checkpoint_dir`` (see module doc).
    The posture is per-thread — concurrent loops on other threads
    keep their own posture."""
    st = _state()
    prev_mode, prev_dir = st["mode"], st["dir"]
    st["mode"], st["dir"] = "reliable", checkpoint_dir
    try:
        yield
    finally:
        st["mode"], st["dir"] = prev_mode, prev_dir


def iter_checkpoint(df: DataFrame) -> DataFrame:
    """Truncate ``df``'s lineage under the active posture. Use as
    ``df.transform(iter_checkpoint)`` so call sites chain exactly like
    the ``.localCheckpoint(eager=True)`` they replace."""
    st = _state()
    if st["mode"] == "local":
        return df.localCheckpoint(eager=True)
    st["seq"] += 1
    path = os.path.join(st["dir"], f"ckpt-{st['seq']:06d}")
    df.write.parquet(path)
    return df.sparkSession.read.parquet(path)
