"""Structured Streaming extensions (SURVEY §2.10: extension, not parity).

The reference is batch-only; the streaming surface generalizes its
profiling/embedding stages to append-only sources: tumbling-window
rollups with watermarked late-data handling, and incremental
(re-)embedding via ``foreachBatch``.
"""
