"""Streaming exact deduplication: first-seen wins within the watermark.

A crawl stream re-fetches the same page (and mirrors of it) continuously;
the standard Structured Streaming answer is ``dropDuplicates`` on the
content hash under an event-time watermark — state is bounded by the
watermark horizon, the engine evicts expired hashes itself.

``dedup_stream`` is the streaming operator; ``dedup_batch`` is its exact
batch twin (first row per hash in event-time order) used as the
correctness oracle: replaying a bounded input through the stream must
produce the same set of survivors the batch twin selects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["dedup_stream", "dedup_batch"]


def _with_hash(df: DataFrame, text_col: str) -> DataFrame:
    norm = F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
    return df.withColumn("content_hash", F.xxhash64(norm))


def dedup_stream(
    pages: DataFrame,
    ts_col: str = "warc_ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming DataFrame → streaming DataFrame keeping the first
    occurrence of each content hash.  State size is O(distinct hashes per
    watermark window); the watermark lets the engine drop state for
    hashes older than the horizon — the knob that keeps a
    trillion-document crawl stream's dedup state bounded."""
    return (
        _with_hash(pages, text_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicates(["content_hash"])
    )


def dedup_batch(
    pages: DataFrame,
    ts_col: str = "warc_ts",
    text_col: str = "text",
    id_col: str = "url",
) -> DataFrame:
    """Batch twin: the first row (by event time, id tiebreak) per content
    hash — what a replayed stream's survivor set must equal."""
    w = Window.partitionBy("content_hash").orderBy(ts_col, id_col)
    return (
        _with_hash(pages, text_col)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
