"""Streaming NEAR-duplicate detection: MinHash-LSH buckets + custom state.

``stream_dedup`` catches byte-identical re-fetches; a crawl stream also
delivers near-identical pages (boilerplate edits, timestamps, mirrors)
that only signature buckets catch.  Shape:

  text --pandas UDF--> band bucket keys (the SAME stable minhash
  permutations as ``operators.dedup``; a scalar UDF so every other
  column rides along) --explode--> (bucket, url, ts) --
  applyInPandasWithState keyed by bucket--> collision flags against the
  bucket's FIRST-seen document.

State per bucket is one (url, ts) pair — O(distinct buckets), evicted by
processing-time timeout, so a perpetual crawl stream's state is bounded.
A document colliding in >= ``min_bands`` buckets is a near-dup candidate
(the LSH S-curve knob); exact verification happens downstream against
the corpus index (``operators.dedup.incremental_minhash_pairs``) — the
stream stage only has to be cheap and high-recall.

``neardup_batch`` is the deterministic batch twin (first-seen per bucket
via one window) — ``tests/test_spark_pipeline.py`` pins replayed-stream
== batch-twin equality and planted-duplicate recall.  The banding is a
Python minhash, not SQL, so this operator intentionally has NO driver
oracle entry; its correctness gate is the twin equality.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from graby_spark.operators.dedup import _minhash_batch_stable

__all__ = ["band_buckets_udf", "neardup_stream", "neardup_batch"]

_COLLISION_SCHEMA = StructType(
    [
        StructField("bucket", LongType()),
        StructField("url", StringType()),
        StructField("ts", TimestampType()),
        StructField("first_url", StringType()),
        StructField("is_collision", LongType()),
    ]
)
_STATE_SCHEMA = StructType(
    [StructField("first_url", StringType()), StructField("first_ts", TimestampType())]
)


def band_buckets_udf(num_perm: int = 64, bands: int = 16, shingle_k: int = 5):
    """Scalar pandas UDF text -> array<long> of band bucket keys.

    Reuses the batch path's stable signature generator, so the underlying
    PERMUTATIONS agree with ``build_minhash_index`` (the bucket hashing
    itself differs — an FNV fold here vs ``_banded``'s xxhash64 — so the
    keys are not join-compatible across the two; rerank candidates
    against the index by doc id, not by bucket).  Each bucket key packs
    the band index into the top 6 bits so different bands never alias.
    """
    if num_perm % bands or bands > 64:
        raise ValueError(
            f"bands={bands} must divide num_perm={num_perm} and fit the "
            "6-bit band tag (<= 64)"
        )
    rows = num_perm // bands
    sig_fn = _minhash_batch_stable(num_perm, shingle_k)

    @F.pandas_udf(ArrayType(LongType()))
    def bucketize(texts: pd.Series) -> pd.Series:
        frame = pd.DataFrame({"doc": range(len(texts)), "text": texts})
        sigs = pd.concat(list(sig_fn(iter([frame]))), ignore_index=True)
        out = []
        for sig in sigs["signature"]:
            s = np.asarray(sig, dtype=np.uint64).reshape(bands, rows)
            # FNV-style fold per band, band index in the top 6 bits
            h = np.full(bands, 0xCBF29CE484222325, dtype=np.uint64)
            for c in range(rows):
                h ^= s[:, c]
                h *= np.uint64(0x100000001B3)
            keyed = (h >> np.uint64(6)) | (
                np.arange(bands, dtype=np.uint64) << np.uint64(58)
            )
            out.append(keyed.astype(np.int64).tolist())
        return pd.Series(out)

    return bucketize


def _exploded(pages: DataFrame, url_col, ts_col, text_col, udf) -> DataFrame:
    return pages.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("ts"),
        F.explode(udf(F.coalesce(F.col(text_col), F.lit("")))).alias("bucket"),
    )


def neardup_stream(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    state_ttl_ms: int = 3_600_000,
) -> DataFrame:
    """Streaming pages → (bucket, url, ts, first_url, is_collision) rows.

    Aggregate downstream per url (``sum(is_collision) >= min_bands``) to
    get candidates; 1-row-per-bucket state with TTL keeps it bounded.
    """

    def update(key, pdfs: Iterator[pd.DataFrame], state):
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=_COLLISION_SCHEMA.fieldNames())
            return
        first_url, first_ts = state.get if state.exists else (None, None)
        # the group's first-seen row is a GLOBAL (ts, url) min — chunks
        # must be concatenated before latching it, or a group split
        # across Arrow batches latches chunk 1's min and diverges from
        # the batch twin (the operator's correctness gate)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "url"])
        rows = []
        for r in pdf.itertuples():
            if first_url is None:
                first_url, first_ts = r.url, r.ts
                rows.append((key[0], r.url, r.ts, r.url, 0))
            elif r.url == first_url:
                rows.append((key[0], r.url, r.ts, first_url, 0))
            else:
                rows.append((key[0], r.url, r.ts, first_url, 1))
        state.update((first_url, first_ts))
        state.setTimeoutDuration(state_ttl_ms)
        # emit in bounded slices: a degenerate hot bucket (boilerplate
        # pages all hashing alike) shouldn't become one giant Arrow batch
        for i in range(0, len(rows), 2048):
            yield pd.DataFrame(
                rows[i : i + 2048], columns=_COLLISION_SCHEMA.fieldNames()
            )

    exploded = _exploded(
        pages, url_col, ts_col, text_col, band_buckets_udf(num_perm, bands, shingle_k)
    )
    return exploded.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType=_COLLISION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def neardup_batch(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """Batch twin: first row per bucket by (ts, url); later rows from
    OTHER urls are collisions.  Same output schema as the stream."""
    exploded = _exploded(
        pages, url_col, ts_col, text_col, band_buckets_udf(num_perm, bands, shingle_k)
    )
    w = Window.partitionBy("bucket").orderBy("ts", "url")
    return (
        exploded.withColumn("first_url", F.first("url").over(w))
        .select(
            "bucket",
            "url",
            "ts",
            "first_url",
            ((F.col("url") != F.col("first_url")).cast("long")).alias("is_collision"),
        )
    )
