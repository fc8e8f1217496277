"""Training-data assembly operators: sequence packing, deterministic
sampling, and source mixing.

The last mile of an LLM data pipeline after extraction + dedup: pack
documents into fixed token budgets (context windows), carve deterministic
subsamples, and mix sources at target weights.  Everything is pure JVM
Spark SQL (whole-stage codegen, zero Python) and every decision derives
from md5 — portable, so the DuckDB oracles compute bit-identical results.

Scale notes: packing windows are partitioned by a hash bucket, never
global (a global ORDER BY window would serialize the corpus through one
partition); sampling/mixing are stateless per-row predicates (no shuffle
at all, fully pushdown-friendly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_sequences", "sample_hash", "sample_by_source"]


def _md5_long(col: F.Column) -> F.Column:
    """Top 60 bits of md5 as a non-negative long — identical in any SQL
    engine with md5 (the cross-engine determinism trick used throughout
    this repo)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 2048,
    n_buckets: int = 64,
) -> DataFrame:
    """Assign documents to fixed-token-budget training bins.

    Greedy-by-order packing within ``n_buckets`` hash buckets: documents
    are ordered by id inside their bucket, and a document opens a new bin
    whenever the running token total would exceed ``budget``.  Returns
    (doc_id, n_tokens, bucket, bin_id).  The window partitions on the
    bucket — parallelism = n_buckets regardless of corpus size — and the
    assignment is a pure function of (id, token count), so re-runs and
    the DuckDB oracle reproduce it exactly.

    The bin boundary uses the cumulative-sum approximation
    ``floor((cumsum - 1) / budget)`` (documents longer than the budget
    occupy their own bin(s)); exact first-fit-decreasing packing is a
    bin-packing heuristic, not worth a sequential dependency at corpus
    scale.
    """
    tokens = F.size(
        F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != "")
    ).cast("long")
    bucket = F.pmod(_md5_long(F.col(id_col).cast("string")), F.lit(n_buckets)).cast(
        "int"
    )
    w = Window.partitionBy("bucket").orderBy(id_col)
    return (
        df.select(F.col(id_col), tokens.alias("n_tokens"), bucket.alias("bucket"))
        .withColumn("_cum", F.sum("n_tokens").over(w))
        .select(
            id_col,
            "n_tokens",
            "bucket",
            F.floor((F.col("_cum") - 1) / budget).cast("long").alias("bin_id"),
        )
    )


def sample_hash(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic 1-in-k subsample: keep rows whose md5(id||salt)
    bucket is 0.  Stateless per-row predicate — no shuffle, survives
    predicate pushdown, and different ``salt`` values give independent
    samples (held-out splits)."""
    h = _md5_long(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    return df.where(F.pmod(h, F.lit(k)) == 0)


def sample_by_source(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    source_col: str = "source",
    default_weight: float = 0.0,
) -> DataFrame:
    """Source mixing at target rates: keep a deterministic ``weights[s]``
    fraction of each source's rows (pretraining data mixing).  The keep
    decision is md5(id||source) scaled to [0,1) compared to the source's
    weight — per-row, shuffle-free, reproducible."""
    frac = (_md5_long(
        F.concat(F.col(id_col).cast("string"), F.lit("|"), F.col(source_col))
    ) % 1_000_000) / 1_000_000.0
    rate = F.lit(default_weight)
    for src, w in sorted(weights.items()):
        rate = F.when(F.col(source_col) == src, F.lit(float(w))).otherwise(rate)
    return df.where(frac < rate)
