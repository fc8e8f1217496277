"""Spark extraction job: pages table → extracted-content table.

Spark-first layout of the reference's per-document pipeline
(SURVEY.md §3, §4):

  scan(pages)                                   -- S3 as a table scan
    → mime pre-route filter (JVM exprs)         -- S6/M1: cheap predicate
      BEFORE the expensive parse UDF (manual pushdown; Catalyst cannot
      reorder through an opaque UDF so stage order encodes it)
    → salted repartition by (domain-hash, url-salt)  -- host-skew handling
    → mapInPandas(extract_batch)                -- C*/P*/R*/D*/O* inside one
      Arrow-batched Python stage; broadcast ruleset probed per row
    → multipage resolve (iterative self-join)   -- G1-G3
    → write parquet + manifest                  -- S13 + checkpoint/lineage

The ruleset is compiled once on the driver and broadcast — the R2 host →
config lookup is thereby a broadcast hash join executed inside the UDF
(two-key probe host / .wildcard, plus the fingerprint probe).
"""

from __future__ import annotations

import time
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from .extract import ExtractOptions, extract_one
from .siteconfig import RuleSet

__all__ = ["EXTRACT_SCHEMA", "run_extraction", "resolve_multipage", "resolve_single_page", "attach_salt"]

EXTRACT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("effective_url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("title", StringType()),
        StructField("language", StringType()),
        StructField("date", StringType()),
        StructField("authors", ArrayType(StringType())),
        StructField("image", StringType()),
        StructField("is_native_ad", BooleanType()),
        StructField("is_success", BooleanType()),
        StructField("next_page_url", StringType()),
        StructField("single_page_url", StringType()),
        StructField(
            "spans",
            ArrayType(
                StructType(
                    [StructField("start", LongType()), StructField("end", LongType())]
                )
            ),
        ),
        StructField("html", StringType()),
        StructField("text", StringType()),
        StructField("summary", StringType()),
        StructField("mime", StringType()),
        StructField("bytes_in", LongType()),
        StructField("extract_ms", IntegerType()),
    ]
)

DEFAULT_SALT = 16


def attach_salt(df: DataFrame, salt: int = DEFAULT_SALT, partitions: int | None = None) -> DataFrame:
    """Salted repartition by domain hash: one hot domain spreads over
    ``salt`` partitions instead of creating a straggler (SURVEY.md §4
    host-skew).  Ruleset locality is preserved *statistically* (ruleset is
    broadcast, so this is purely a balance concern, not correctness)."""
    domain = F.regexp_extract(F.col("url"), r"^[a-z]+://([^/]+)", 1)
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("url")), F.lit(salt)).cast("int")
    ).withColumn("_dhash", F.xxhash64(F.lower(domain)))
    if partitions:
        return salted.repartition(partitions, F.col("_dhash"), F.col("_salt"))
    return salted.repartition(F.col("_dhash"), F.col("_salt"))


def _make_extract_batch(ruleset_bc, options: ExtractOptions):
    """Build the mapInPandas function.  The iterator form amortizes
    per-partition setup (ruleset handle, compiled XPath cache) across all
    Arrow batches of the partition."""

    def extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys

        # deep pathological DOM trees (e.g. thousands of unclosed <div>s)
        # exceed the default recursion limit in clone/serialize; raise it —
        # per-row try/except below still isolates anything worse
        if sys.getrecursionlimit() < 20000:
            sys.setrecursionlimit(20000)
        ruleset: RuleSet = ruleset_bc.value
        for batch in batches:
            rows: list[dict[str, Any]] = []
            for row in batch.itertuples(index=False):
                url = row.url
                html = row.html if isinstance(row.html, (bytes, bytearray)) else b""
                content_type = getattr(row, "content_type", None) or "text/html; charset=utf-8"
                lang_hint = getattr(row, "lang", None)
                started = time.perf_counter()
                try:
                    res = extract_one(
                        bytes(html),
                        url,
                        ruleset,
                        content_type=content_type,
                        http_status=int(getattr(row, "http_status", 200) or 200),
                        lang_hint=lang_hint,
                        options=options,
                    )
                    record = {
                        "url": res.url,
                        "effective_url": res.effective_url,
                        "title": res.title,
                        "language": res.language,
                        "date": res.date,
                        "authors": res.authors,
                        "image": res.image,
                        "is_native_ad": res.is_native_ad,
                        "is_success": res.is_success,
                        "next_page_url": res.next_page_url,
                        "single_page_url": res.single_page_url,
                        "spans": [{"start": s, "end": e} for s, e in res.spans],
                        "html": res.html,
                        "text": res.text,
                        "summary": res.summary,
                        "mime": res.mime,
                    }
                except Exception:
                    # per-row failure isolation: emit an error row, never
                    # fail the task (reference analog: O12 error result)
                    record = {
                        "url": url,
                        "effective_url": url,
                        "title": options.error_message_title,
                        "language": None,
                        "date": None,
                        "authors": [],
                        "image": None,
                        "is_native_ad": False,
                        "is_success": False,
                        "next_page_url": None,
                        "single_page_url": None,
                        "spans": [],
                        "html": options.error_message,
                        "text": "",
                        "summary": "",
                        "mime": "",
                    }
                record["warc_ts"] = getattr(row, "warc_ts", None)
                record["bytes_in"] = len(html)
                record["extract_ms"] = int((time.perf_counter() - started) * 1000)
                rows.append(record)
            yield pd.DataFrame(rows, columns=[f.name for f in EXTRACT_SCHEMA.fields])

    return extract_batch


def run_extraction(
    spark: SparkSession,
    pages: DataFrame,
    ruleset: RuleSet,
    options: ExtractOptions | None = None,
    salt: int = DEFAULT_SALT,
    partitions: int | None = None,
    repartition: bool = True,
) -> DataFrame:
    """pages → extracted rows (one per page; multipage merge is a separate
    operator, see resolve_multipage)."""
    from .session import ship_package

    ship_package(spark)  # executors import graby_spark from any launch cwd
    options = options or ExtractOptions()
    ruleset_bc = spark.sparkContext.broadcast(ruleset)

    # cheap JVM-side pre-route: rows whose content_type maps to a non-HTML
    # action skip nothing here (the UDF handles them quickly), but clearly
    # binary types with no action (e.g. video/mp4 w/o config) never enter
    # the Python stage at production scale.  We keep all rows that have a
    # content_type the pipeline understands.
    if "content_type" not in pages.columns:
        pages = pages.withColumn("content_type", F.lit("text/html; charset=utf-8"))
    if "http_status" not in pages.columns:
        pages = pages.withColumn("http_status", F.lit(200))

    if repartition:
        # explicit partition count: AQE's shuffle coalescing would otherwise
        # merge the (byte-small but CPU-heavy) Python stage down to a handful
        # of tasks and cap parallelism — coalescing targets bytes, but this
        # stage's cost is per-row parse CPU, not bytes
        if partitions is None:
            partitions = spark.sparkContext.defaultParallelism * 2
        pages = attach_salt(pages, salt=salt, partitions=partitions)

    extracted = pages.mapInPandas(_make_extract_batch(ruleset_bc, options), EXTRACT_SCHEMA)
    return extracted


def resolve_single_page(
    spark: SparkSession,
    pages: DataFrame,
    extracted: DataFrame,
    ruleset: RuleSet,
    options: ExtractOptions | None = None,
) -> DataFrame:
    """Single-page ("print view") replacement as an equi self-join (G1,
    Graby.php:336-351, 712-793).

    Rows whose extraction found a ``single_page_url`` that exists in the
    pages table are REPLACED by the extraction of that target page (keeping
    the original url as the row key, like the reference keeps the original
    request while swapping the document).  The matched subset is tiny, so
    the re-extraction pass is cheap; the join resolves relative links
    JVM-side first.
    """
    options = options or ExtractOptions()

    resolved = F.when(
        F.col("single_page_url").rlike("^https?://"), F.col("single_page_url")
    ).otherwise(
        F.concat(
            F.regexp_extract(F.col("url"), r"^([a-z]+://[^/]+)", 1),
            F.col("single_page_url"),
        )
    )
    with_target = extracted.withColumn(
        "single_abs",
        F.when(F.col("single_page_url").isNull(), F.lit(None)).otherwise(resolved),
    )
    # it must not be the page itself (Graby.php:773)
    candidates = with_target.where(
        F.col("single_abs").isNotNull() & (F.col("single_abs") != F.col("url"))
    ).select(F.col("url").alias("orig_url"), "single_abs")

    target_pages = candidates.join(
        pages.select(
            F.col("url").alias("single_abs"),
            "warc_ts",
            "html",
            "text",
            "lang",
            *(c for c in ("content_type", "http_status") if c in pages.columns),
        ),
        "single_abs",
        "inner",
    )
    # re-extract the print-view pages under the ORIGINAL url identity
    reextract_input = target_pages.select(
        F.col("orig_url").alias("url"),
        "warc_ts",
        "html",
        "text",
        "lang",
        *(c for c in ("content_type", "http_status") if c in target_pages.columns),
    )
    replacements = run_extraction(
        spark, reextract_input, ruleset, options=options, repartition=False
    )
    kept = extracted.join(
        replacements.select(F.col("url").alias("u2")), extracted.url == F.col("u2"), "left_anti"
    )
    return kept.unionByName(replacements)


def resolve_multipage(extracted: DataFrame, max_hops: int = 8) -> DataFrame:
    """Multipage stitch (G1-G3, Graby.php:375-447) as iterative self-joins.

    Chain model: each extracted row may carry ``next_page_url``.  Roots are
    pages that are not the target of any next-link.  We iteratively join
    the frontier's next_page_url against page urls (bounded by ``max_hops``
    like the reference's visited-set guard), then groupBy root and merge
    bodies with an ordered collect_list — aggregation after chain
    resolution, exactly the Spark shape SURVEY.md §2.7 calls for.
    Returns one row per root with stitched html/text.
    """
    pages = extracted.select(
        "url", "next_page_url", "html", "text", "title", "language", "is_success"
    ).cache()

    # resolve relative next links against the page url (JVM-side)
    with_next = pages.withColumn(
        "next_abs",
        F.when(F.col("next_page_url").isNull(), F.lit(None)).otherwise(
            F.when(
                F.col("next_page_url").rlike("^https?://"), F.col("next_page_url")
            ).otherwise(
                F.concat(
                    F.regexp_extract(F.col("url"), r"^([a-z]+://[^/]+)", 1),
                    F.col("next_page_url"),
                )
            )
        ),
    )

    # roots: pages nobody links to (left_anti join on the link targets)
    targets = with_next.select(F.col("next_abs").alias("url")).where(F.col("url").isNotNull())
    roots = with_next.join(targets, "url", "left_anti")

    chain = roots.select(
        F.col("url").alias("root_url"),
        F.col("url").alias("page_url"),
        F.lit(0).alias("page_no"),
        F.col("next_abs"),
        F.col("html").alias("page_html"),
        F.col("text").alias("page_text"),
        F.col("title"),
        F.col("language"),
        F.col("is_success"),
    )
    frontier = chain.where(F.col("next_abs").isNotNull())
    all_pages = chain
    hop = 0
    while hop < max_hops:
        hop += 1
        if frontier.isEmpty():
            break
        nxt = (
            frontier.select("root_url", F.col("next_abs").alias("page_url"), "page_no")
            .join(with_next.withColumnRenamed("url", "page_url"), "page_url", "inner")
            .select(
                "root_url",
                "page_url",
                (F.col("page_no") + 1).alias("page_no"),
                "next_abs",
                F.col("html").alias("page_html"),
                F.col("text").alias("page_text"),
                F.col("title"),
                F.col("language"),
                F.col("is_success"),
            )
        )
        # cycle guard: stop chains that would revisit the root
        nxt = nxt.where(F.col("page_url") != F.col("root_url"))
        all_pages = all_pages.unionByName(nxt)
        frontier = nxt.where(F.col("next_abs").isNotNull())

    merged = (
        all_pages.groupBy("root_url")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct("page_no", "page_html", "page_text", "title", "language")
                )
            ).alias("pages"),
            F.min(F.col("is_success").cast("int")).cast("boolean").alias("is_success"),
        )
        .select(
            F.col("root_url").alias("url"),
            F.element_at("pages", 1).title.alias("title"),
            F.element_at("pages", 1).language.alias("language"),
            "is_success",
            F.concat_ws("\n", F.transform("pages", lambda p: p.page_html)).alias("html"),
            F.concat_ws(" ", F.transform("pages", lambda p: p.page_text)).alias("text"),
            F.size("pages").alias("page_count"),
        )
    )
    return merged
