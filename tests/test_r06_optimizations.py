"""Round-6 optimization pins: the rewritten kernels must be INVARIANT to
partitioning and Arrow batching.

Each r06 rewrite moved math across a boundary (JVM HOF → numpy kernel,
per-row rows → per-task partials, full scan → per-batch top cut) under a
proof that the results cannot change.  These tests pin those proofs:

- k-means partial aggregation: int64 per-cell sums are order-independent,
  so centroids/assignments are bitwise identical under ANY partitioning;
- SemDeDup fused kernel: fold-left IEEE parity + conservative in-kernel
  cut leave the (dup, keep, cosine) output partition-invariant;
- brute-force ANN per-batch top-k cut: the union of batch tops contains
  the exact global top-k for every batching (the 2e-8 margin argument);
- IVF-SQ8 kernel scan: exact-order candidate cut is batching-invariant.

A regression here (e.g. a future kernel change that breaks the fold
order or the margin) would otherwise only surface as a flaky oracle
mismatch at a specific partition count.
"""

from __future__ import annotations

import pytest

from graby_spark.operators import cluster, dedup, similarity
from graby_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    session = get_spark(
        app_name="graby-r06-tests", master="local[4]", shuffle_partitions=4
    )
    session.sparkContext.setLogLevel("ERROR")
    yield session


@pytest.fixture(scope="module")
def emb(spark):
    return similarity.make_clustered_embeddings(
        spark, n=400, dim=32, n_clusters=8, seed=3
    ).localCheckpoint()


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_kmeans_train_partition_invariant(spark, emb):
    import numpy as np

    a = cluster.kmeans_train(emb.repartition(1), k=6, n_iter=2)
    b = cluster.kmeans_train(emb.repartition(13), k=6, n_iter=2)
    assert np.array_equal(a, b)  # bitwise: int64 sums are order-independent


def test_kmeans_embeddings_partition_invariant(spark, emb):
    cols = ("vec_id", "cell", "cosine")
    a = _rows(cluster.kmeans_embeddings(emb.repartition(1), k=6, n_iter=1), cols)
    b = _rows(cluster.kmeans_embeddings(emb.repartition(7), k=6, n_iter=1), cols)
    assert a == b


def test_semantic_dedup_partition_invariant(spark, emb):
    cols = ("dup_id", "keep_id", "cell", "cosine")
    a = _rows(
        dedup.semantic_dedup(emb.repartition(1), n_clusters=6, threshold=0.8), cols
    )
    b = _rows(
        dedup.semantic_dedup(emb.repartition(9), n_clusters=6, threshold=0.8), cols
    )
    assert a == b and len(a) > 0


def test_brute_force_topk_batch_invariant(spark, emb):
    """The per-batch top-k margin cut must yield the EXACT global top-k
    for every batching: tiny Arrow batches + many partitions exercise the
    union-of-batch-tops path hard."""
    queries = emb.where("vec_id < 7")
    cols = ("query_id", "neighbor_id", "cosine", "rank")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "17")
        a = _rows(similarity.brute_force_topk(emb.repartition(11), queries, k=9), cols)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    b = _rows(similarity.brute_force_topk(emb.repartition(1), queries, k=9), cols)
    assert a == b and len(a) == 7 * 9


def test_ivf_sq8_topk_partition_invariant(spark, emb):
    cols = ("query_id", "neighbor_id", "cosine", "rank")
    a = _rows(
        similarity.ivf_sq8_topk(
            emb.repartition(1), emb.where("vec_id < 5"), k=4, n_cells=6, nprobe=2
        ),
        cols,
    )
    b = _rows(
        similarity.ivf_sq8_topk(
            emb.repartition(10), emb.where("vec_id < 5"), k=4, n_cells=6, nprobe=2
        ),
        cols,
    )
    assert a == b and len(a) > 0
