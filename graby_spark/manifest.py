"""Checkpoint manifest: per-partition lineage + metrics, resumable runs.

The north_rule requires the job to be "resumable from checkpoint with
per-partition lineage + metrics".  Without an Iceberg runtime in this
environment the manifest is a plain parquet table maintained with Iceberg's
snapshot semantics (append-only manifests, resume = anti-join):

  manifest(run_id, snapshot_id, bucket, url_count, ok_count, fail_count,
           bytes_in, wall_ms, completed_at)

* ``bucket`` is a deterministic url-hash bucket (NOT the physical Spark
  partition id — bucket assignment must survive re-planning).
* A bucket appears in the manifest only after all of its rows were
  written — the write is bucket-partitioned so the commit unit and the
  resume unit coincide.
* resume = pages LEFT ANTI JOIN completed buckets.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "bucket_of",
    "completed_buckets",
    "filter_resumable",
    "write_with_manifest",
]

DEFAULT_BUCKETS = 64


def bucket_of(url_col, n_buckets: int = DEFAULT_BUCKETS):
    return F.pmod(F.xxhash64(url_col), F.lit(n_buckets)).cast("int")


def completed_buckets(spark: SparkSession, manifest_path: str) -> DataFrame:
    """Buckets recorded complete by any previous run."""
    if not os.path.exists(manifest_path):
        return spark.createDataFrame([], "bucket int")
    return spark.read.parquet(manifest_path).select("bucket").distinct()


def filter_resumable(
    spark: SparkSession,
    pages: DataFrame,
    manifest_path: str,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Drop rows whose bucket already completed (anti-join on the tiny
    bucket list — broadcastable by construction)."""
    done = completed_buckets(spark, manifest_path)
    with_bucket = pages.withColumn("bucket", bucket_of(F.col("url"), n_buckets))
    return with_bucket.join(F.broadcast(done), "bucket", "left_anti")


def write_with_manifest(
    spark: SparkSession,
    extracted: DataFrame,
    output_path: str,
    manifest_path: str,
    n_buckets: int = DEFAULT_BUCKETS,
    run_id: str | None = None,
) -> dict:
    """Write the extraction output bucket-partitioned, then append one
    manifest row per bucket (lineage: counts, bytes, wall time, snapshot).

    Returns summary metrics.  A crash between the data write and the
    manifest append leaves the bucket un-recorded → it is re-extracted on
    resume and overwritten idempotently (dynamic partition overwrite),
    which preserves exactly-once output semantics.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    snapshot_id = int(time.time() * 1000)
    started = time.time()

    with_bucket = extracted.withColumn("bucket", bucket_of(F.col("url"), n_buckets)).cache()
    if with_bucket.isEmpty():
        # fully resumed: nothing to write, nothing to record
        with_bucket.unpersist()
        return {
            "run_id": run_id,
            "snapshot_id": snapshot_id,
            "urls": 0,
            "ok": 0,
            "fail": 0,
            "wall_ms": 0,
        }

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    with_bucket.write.mode("overwrite").partitionBy("bucket").parquet(output_path)

    wall_ms = int((time.time() - started) * 1000)
    # lineage rows for THIS run's buckets only (never re-read the whole
    # output dir — prior runs' buckets are already recorded)
    stats = (
        with_bucket.groupBy("bucket")
        .agg(
            F.count("*").alias("url_count"),
            F.sum(F.col("is_success").cast("int")).alias("ok_count"),
            F.sum((~F.col("is_success")).cast("int")).alias("fail_count"),
            F.sum("bytes_in").alias("bytes_in"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("snapshot_id", F.lit(snapshot_id))
        .withColumn("wall_ms", F.lit(wall_ms))
        .withColumn("completed_at", F.current_timestamp())
        .select(
            "run_id",
            "snapshot_id",
            "bucket",
            "url_count",
            "ok_count",
            "fail_count",
            "bytes_in",
            "wall_ms",
            "completed_at",
        )
    )
    stats = stats.cache()
    stats.write.mode("append").parquet(manifest_path)
    agg = stats.agg(
        F.sum("url_count").alias("urls"),
        F.sum("ok_count").alias("ok"),
        F.sum("fail_count").alias("fail"),
    ).collect()[0]
    with_bucket.unpersist()
    return {
        "run_id": run_id,
        "snapshot_id": snapshot_id,
        "urls": agg["urls"],
        "ok": agg["ok"],
        "fail": agg["fail"],
        "wall_ms": wall_ms,
    }
