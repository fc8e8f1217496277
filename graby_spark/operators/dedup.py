"""Deduplication operators for web-text corpora.

Five strategies, each a DataFrame→DataFrame operator:

  * exact_duplicates      — hash groupBy (xxhash64 of normalized text);
                            pure JVM, one shuffle on the 64-bit hash
  * ngram_jaccard_pairs   — token-level Jaccard via explode + equi-join on
                            token (the classic inverted-index join: no
                            cartesian product, shuffle keyed by token)
  * minhash_lsh_pairs     — shingle → minhash signature (vectorized numpy
                            in a pandas UDF) → band buckets → bucket join →
                            exact verify; the 100 TB-scale path (candidate
                            generation cost ~ O(n · bands))
  * simhash               — 64-bit simhash + banded buckets for
                            near-duplicate candidates
  * embedding_near_dups   — cosine-over-threshold pairs on an embedding
                            column; brute-force pair join below a size
                            cutoff, LSH hyperplane buckets above it

Determinism: all hashing uses fixed seeds; no RNG at runtime.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "exact_duplicates",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "embedding_near_dups",
]

_MERSENNE = (1 << 61) - 1


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (whitespace-normalized) texts.

    Returns (group_hash, dup_count, doc_ids) for groups with >1 member.
    One shuffle, map-side partial aggregation; at 100 TB the groupBy key is
    the 64-bit hash, never the text itself.
    """
    norm = F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
    return (
        df.select(F.col(id_col), F.xxhash64(norm).alias("group_hash"))
        .groupBy("group_hash")
        .agg(
            F.count("*").alias("dup_count"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .where(F.col("dup_count") > 1)
    )


def _tokens_df(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Distinct lowercase word tokens per document."""
    return (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(
                F.array_distinct(
                    F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
                )
            ).alias("token"),
        )
        .where(F.col("token") != "")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
) -> DataFrame:
    """Jaccard-similar pairs via the inverted-index join.

    |A∩B| from a token-keyed self-join (shuffle key = token, so hot tokens
    are the skew concern — callers can pre-filter stopwords), sizes from a
    per-doc count; jaccard = c / (|A|+|B|-c).  Returns
    (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= threshold.
    """
    tokens = _tokens_df(df, id_col, text_col)
    sizes = tokens.groupBy("doc").agg(F.count("*").alias("size"))
    a = tokens.select(F.col("doc").alias("doc_a"), "token")
    b = tokens.select(F.col("doc").alias("doc_b"), "token")
    inter = (
        a.join(b, "token")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("c"))
    )
    return (
        inter.join(sizes.select(F.col("doc").alias("doc_a"), F.col("size").alias("size_a")), "doc_a")
        .join(sizes.select(F.col("doc").alias("doc_b"), F.col("size").alias("size_b")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("c") / (F.col("size_a") + F.col("size_b") - F.col("c"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    shingle_k: int = 5,
) -> DataFrame:
    """(doc, signature:array<long>) minhash signatures (stable FNV shingle
    hashes — deterministic across Python workers)."""
    src = df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("text"))
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    schema = StructType(
        [StructField("doc", src.schema[0].dataType), StructField("signature", ArrayType(LongType()))]
    )
    return src.mapInPandas(_minhash_batch_stable(num_perm, shingle_k), schema)


def _stable_shingle_hashes(text: str, k: int) -> np.ndarray:
    """FNV-1a over k-char shingles — deterministic across processes."""
    n = max(len(text) - k + 1, 1)
    out = np.empty(n, dtype=np.uint64)
    data = text.encode("utf-8", "replace")
    # hash characterwise shingles on the unicode string for correctness
    for i in range(n):
        h = np.uint64(0xCBF29CE484222325)
        for ch in text[i : i + k].encode("utf-8", "replace"):
            h = np.uint64((int(h) ^ ch) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return (out >> np.uint64(1)).astype(np.int64)  # clear sign bit


def _minhash_batch_stable(num_perm: int, shingle_k: int):
    rng = np.random.RandomState(42)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for doc_id, text in zip(batch["doc"], batch["text"]):
                hv = np.unique(_stable_shingle_hashes((text or "").lower(), shingle_k))
                sig = ((np.outer(a, hv) + b[:, None]) % _MERSENNE).min(axis=1)
                out.append({"doc": doc_id, "signature": sig.tolist()})
            yield pd.DataFrame(out, columns=["doc", "signature"])

    return fn


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs.

    signature → ``bands`` buckets (rows = num_perm/bands hashes hashed
    together) → groupBy (band, bucket) join for candidates → exact
    signature-agreement estimate as the verify step.  The candidate join
    shuffles only (band_id, bucket_hash, doc) — at corpus scale this is the
    only strategy whose cost does not grow quadratically.
    """
    rows = num_perm // bands
    sigs = minhash_signatures(df, id_col, text_col, num_perm, shingle_k).cache()
    banded = sigs.select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.xxhash64(F.slice("signature", i * rows + 1, rows).cast("string")),
            )
        ).alias("band", "bucket"),
    )
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .where(F.col("x.doc") < F.col("y.doc"))
        .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .distinct()
    )
    verified = (
        cand.join(sigs.select(F.col("doc").alias("doc_a"), F.col("signature").alias("sig_a")), "doc_a")
        .join(sigs.select(F.col("doc").alias("doc_b"), F.col("signature").alias("sig_b")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda p, q: p == q), lambda v: v))
                / F.size("sig_a")
            ).alias("est_jaccard"),
        )
        .where(F.col("est_jaccard") >= threshold)
    )
    return verified


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per document (token-level, FNV token hashes) plus the
    four 16-bit band keys used for near-dup candidate bucketing."""
    src = df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("text"))
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField("doc", src.schema[0].dataType),
            StructField("simhash", LongType()),
            StructField("band0", LongType()),
            StructField("band1", LongType()),
            StructField("band2", LongType()),
            StructField("band3", LongType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for doc_id, text in zip(batch["doc"], batch["text"]):
                tokens = (text or "").lower().split()
                acc = np.zeros(64, dtype=np.int64)
                shifts = np.arange(64, dtype=np.uint64)
                for tok in tokens:
                    h = 0xCBF29CE484222325
                    for ch in tok.encode("utf-8", "replace"):
                        h = (h ^ ch) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF
                    bits = ((np.uint64(h) >> shifts) & np.uint64(1)).astype(np.int64)
                    acc += np.where(bits == 1, 1, -1)
                value = 0
                for i in range(64):
                    if acc[i] > 0:
                        value |= 1 << i
                value &= 0x7FFFFFFFFFFFFFFF  # keep in long range
                out.append(
                    {
                        "doc": doc_id,
                        "simhash": value,
                        "band0": value & 0xFFFF,
                        "band1": (value >> 16) & 0xFFFF,
                        "band2": (value >> 32) & 0xFFFF,
                        "band3": (value >> 48) & 0xFFFF,
                    }
                )
            yield pd.DataFrame(out, columns=["doc", "simhash", "band0", "band1", "band2", "band3"])

    return src.mapInPandas(fn, schema)


def embedding_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Cosine-over-threshold pairs.  JVM-side dot products via
    ``aggregate(zip_with(...))``; pair generation is a range-bucketed
    self-join on the leading vector component (cheap blocking that stays
    correct because cosine ≥ t ⇒ leading components are close only after
    normalization — so for exactness we keep the full join at test scale
    and expose the LSH path via minhash-style hyperplanes at real scale)."""
    norm = _with_norm(df, id_col, vec_col)
    a = norm.select(F.col("id").alias("id_a"), F.col("unit").alias("unit_a"))
    b = norm.select(F.col("id").alias("id_b"), F.col("unit").alias("unit_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.aggregate(
                F.zip_with("unit_a", "unit_b", lambda x, y: x * y),
                F.lit(0.0).cast("double"),
                lambda acc, v: acc + v,
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def embedding_near_dups_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    dim: int = 64,
) -> DataFrame:
    """Scale path for cosine near-dups: hyperplane-LSH bucket join for
    candidates (O(n·tables) shuffle keyed by bucket), exact cosine rerank of
    candidates only.  Same output contract as embedding_near_dups; recall
    < 1 by construction (near-identical vectors share every bucket, so
    recall at dedup-grade thresholds is effectively 1)."""
    from .similarity import lsh_signatures

    sigs = lsh_signatures(df, id_col, vec_col, dim)
    cand = (
        sigs.alias("x")
        .join(sigs.alias("y"), ["table", "bucket"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    norm = _with_norm(df, id_col, vec_col)
    a = norm.select(F.col("id").alias("id_a"), F.col("unit").alias("unit_a"))
    b = norm.select(F.col("id").alias("id_b"), F.col("unit").alias("unit_b"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.aggregate(
                F.zip_with("unit_a", "unit_b", lambda x, y: x * y),
                F.lit(0.0).cast("double"),
                lambda acc, v: acc + v,
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-duplicate pairs: candidates share at least one 16-bit
    band (pigeonhole: any pair within hamming distance 3 of a 64-bit hash
    must agree on one of 4 bands), verified by exact hamming distance."""
    hashes = simhash(df, id_col, text_col).cache()
    bands = hashes.selectExpr(
        "doc", "simhash", "stack(4, 0, band0, 1, band1, 2, band2, 3, band3) as (band, bucket)"
    )
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "bucket"])
        .where(F.col("x.doc") < F.col("y.doc"))
        .select(
            F.col("x.doc").alias("doc_a"),
            F.col("y.doc").alias("doc_b"),
            F.col("x.simhash").alias("h_a"),
            F.col("y.simhash").alias("h_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def _with_norm(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    vec_d = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    norm = F.sqrt(
        F.aggregate(vec_d, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.transform(vec_d, lambda v: v / norm).alias("unit"),
    )
