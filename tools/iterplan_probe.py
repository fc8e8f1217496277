"""Capture the LAZY multi-iteration physical plan of pagerank (old vs
new formulation) for plans/r06 evidence.

pagerank's public API eagerly localCheckpoints its result, so
``explain`` on the returned DataFrame shows only a scan of the
checkpointed RDD.  This probe rebuilds both formulations WITHOUT the
final checkpoint (2 iterations, no mid-loop checkpoint) and writes
``explain("formatted")`` so the per-iteration Exchange count is visible
and diffable.  Claims in OPTIMIZATION_r06.md cite these files.

Usage: python tools/iterplan_probe.py plans/r06
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graby_spark.session import get_spark


def _edges(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ids = docs.select("doc_id")
    n = ids.count()
    return (
        ids.selectExpr("doc_id as src", f"(doc_id*31+7) % {n} as dst")
        .union(
            ids.where("doc_id % 2 = 0").selectExpr(
                "doc_id as src", f"(doc_id*17+3) % {n} as dst"
            )
        )
        .union(ids.where("doc_id % 10 = 0").selectExpr("doc_id as src", "doc_id % 7 as dst"))
        .where("src != dst")
    )


def pagerank_body(edges, n_iter, co_partition: bool, n_part: int):
    damping = 0.85
    edges = edges.select(F.col("src"), F.col("dst")).dropDuplicates(["src", "dst"])
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    if co_partition:
        nodes = nodes.repartition(n_part, "node")
    nodes = nodes.cache()
    n = nodes.count()
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    out_edges = edges.join(deg, "src")
    if co_partition:
        out_edges = out_edges.repartition(n_part, "src")
    out_edges = out_edges.cache()
    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.round(F.lit(1.0 / n), 12).alias("rank"))
    for _ in range(n_iter):
        contrib = out_edges.join(ranks, out_edges["src"] == ranks["node"]).select(
            F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c")
        )
        incoming = contrib.groupBy("node").agg(F.sum("c").alias("in_rank"))
        ranks = nodes.join(incoming, "node", "left").select(
            "node",
            F.round(
                F.lit(base) + F.lit(damping) * F.coalesce("in_rank", F.lit(0.0)), 12
            ).alias("rank"),
        )
    return ranks


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r06"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(master="local[8]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    edges = _edges(spark, sf_dir)
    for name, co in (("iterplan_before", False), ("iterplan_after", True)):
        df = pagerank_body(edges, 2, co, 32)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"graph_pagerank_{name}.txt")
        with open(path, "w") as fh:
            fh.write("2 Lloyd-style pagerank iterations, final checkpoint omitted\n")
            fh.write(plan)
        n_ex = plan.count("Exchange") - plan.count("ReusedExchange")
        print(name, "Exchange nodes:", n_ex)
    spark.stop()


if __name__ == "__main__":
    main()
