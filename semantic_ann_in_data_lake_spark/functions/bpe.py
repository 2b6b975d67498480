"""Byte-level BPE tokenizer — the exact-token tier for V3 budgets.

The reference counts tiktoken cl100k tokens (``SemLink/
join_discoverer.py:34-62``); that vocabulary file is not in this
environment, so the package provides the REAL algorithm with a
corpus-trained vocabulary instead: standard byte-pair encoding exactly
as published for GPT-2-style tokenizers — pre-tokenize, start from raw
bytes, repeatedly merge the most frequent adjacent pair. Plug the
resulting tokenizer into ``functions.text.token_truncate(tokenizer=...)``
and the whole truncation path runs on true subword counts; in an
environment WITH tiktoken, swap the factory and nothing else changes.

Scale split: pair-merge training is inherently iterative-sequential,
but its input is only the WORD FREQUENCY table — computed distributed
(one groupBy over the corpus), truncated to a bounded head, and the
merge loop runs driver-side on that bounded dict (the same shape every
published BPE trainer uses). Encoding is embarrassingly parallel:
the merges table broadcasts, workers encode with a per-worker LRU.
"""

from __future__ import annotations

from collections import OrderedDict

import re
from typing import Iterable

_PRETOKEN = re.compile(r"\S+|\s+")

#: symbols 0..255 are raw bytes; merged symbols start here
_BASE = 256


def train_bpe(word_freqs: dict[str, int], num_merges: int) -> list[tuple[int, int]]:
    """Learn ``num_merges`` merges from a word→frequency dict.

    Deterministic: the best pair is (count desc, pair asc); ties cannot
    depend on dict order. Returns merge pairs over symbol ids (raw
    bytes 0..255; merge i creates symbol 256+i).
    """
    seqs: dict[str, list[int]] = {
        w: list(w.encode("utf-8")) for w in word_freqs if w
    }
    merges: list[tuple[int, int]] = []
    for step in range(num_merges):
        counts: dict[tuple[int, int], int] = {}
        for w, seq in seqs.items():
            f = word_freqs[w]
            for pair in zip(seq, seq[1:]):
                counts[pair] = counts.get(pair, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break
        new_id = _BASE + step
        merges.append(best)
        a, b = best
        for w, seq in seqs.items():
            i, out = 0, []
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(new_id)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = out
    return merges


def train_bpe_from_df(
    df,
    text_col: str = "text",
    num_merges: int = 256,
    max_words: int = 50_000,
) -> list[tuple[int, int]]:
    """Distributed word-frequency pass → bounded driver-side merge loop.

    The collect is capped at ``max_words`` (frequency-desc, word-asc —
    deterministic cutoff): the merge statistics saturate long before
    the long tail matters, which is what keeps the driver step bounded
    at 100 TB (the frequency table, not the corpus, crosses the wire).
    """
    from pyspark.sql import functions as F

    rows = (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(max_words)
        .collect()
    )
    return train_bpe({r["w"]: r["n"] for r in rows}, num_merges)


def save_merges(merges: list[tuple[int, int]], path: str) -> None:
    """Persist a learned merge table as JSON — the tokenizer artifact
    (train once per corpus snapshot, reuse across every job that
    budgets tokens; the file is a few KB)."""
    import json
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump({"version": 1, "merges": [list(p) for p in merges]}, f)


def load_merges(path: str) -> list[tuple[int, int]]:
    import json

    with open(path) as f:
        doc = json.load(f)
    if doc.get("version") != 1:
        raise ValueError(f"unsupported bpe artifact version: {doc.get('version')}")
    return [tuple(p) for p in doc["merges"]]


class BpeTokenizer:
    """encode/decode over a learned merge table — the interface
    ``token_truncate``'s tokenizer seam expects (tiktoken-compatible:
    ``encode(str) -> list[int]``, ``decode(list[int]) -> str``).

    decode(encode(t)) == t for any str (pre-tokens partition the text;
    symbols expand back to their exact bytes)."""

    def __init__(self, merges: list[tuple[int, int]]):
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        # precompute symbol id → bytes
        table: list[bytes] = [bytes([i]) for i in range(_BASE)]
        for a, b in merges:
            table.append(table[a] + table[b])
        self._bytes = table
        self._cache: OrderedDict = OrderedDict()

    def _apply(self, seq: list[int]) -> list[int]:
        ranks = self.ranks
        while len(seq) >= 2:
            best_rank, best_pair = None, None
            for pair in zip(seq, seq[1:]):
                r = ranks.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, pair
            if best_pair is None:
                break
            new_id = _BASE + best_rank
            a, b = best_pair
            i, out = 0, []
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(new_id)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = out
        return seq

    def encode(self, text: str) -> list[int]:
        # true LRU (move-to-end on hit, evict oldest at capacity): an
        # insert-only capped dict fills with one-off pre-tokens early
        # (unique ids/URLs) and then re-encodes every FREQUENT token
        # via the O(n²) merge loop for the rest of the task — the
        # opposite of what the cache exists for on large corpora
        cache = self._cache
        out: list[int] = []
        for tok in _PRETOKEN.findall(text or ""):
            ids = cache.get(tok)
            if ids is None:
                ids = self._apply(list(tok.encode("utf-8")))
                if len(cache) >= 100_000:
                    cache.popitem(last=False)
                cache[tok] = ids
            else:
                cache.move_to_end(tok)
            out.extend(ids)
        return out

    def decode(self, ids: Iterable[int]) -> str:
        return b"".join(self._bytes[i] for i in ids).decode(
            "utf-8", errors="replace"
        )
