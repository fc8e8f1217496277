"""Deterministic synthetic Common-Crawl-style pages table.

The driver's input_hint mandates the table shape
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
No external data may be used, so the pages table is synthesized
deterministically from the driver-provided ``documents`` parquet: each
document becomes one HTML page whose expected extraction output is, by
construction, a pure SQL function of the document row.  That construction is
what makes the extraction pipeline end-to-end verifiable against a DuckDB
oracle (see __spark_entry__.py).

Four page variants exercise four reference extraction paths:
  v0  site-config rules     (title: //h1, body div, strip ads)    D8/D13/D19
  v1  OpenGraph + JSON-LD + Schema.org articleBody                D5/D6/D22
  v2  hNews hentry microformat                                    D20
  v3  ISO-8859-1 bytes + meta-charset sniff + <title> fallback    C1-C5/D25

Variant selection, titles, dates and authors are all arithmetic on
``doc_id`` so the DuckDB oracle can recompute them exactly.

Everything here is JVM-side Spark SQL (no UDF): page synthesis stays inside
whole-stage codegen and scales linearly; only the *extraction* runs in
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "build_pages_df",
    "build_multipage_pages_df",
    "build_redirect_pages_df",
    "PAGES_SITE_CONFIGS",
    "oracle_pages_cte",
]

# site configs matched by the v0 domain (compiled into the test ruleset)
PAGES_SITE_CONFIGS = {
    "configured.example.com": [
        "title: //h1",
        "body: //div[@class='article-body']",
        "strip: //div[@class='ads']",
        "prune: no",
    ],
    "serial.example.com": [
        "title: //h1",
        "body: //div[@class='article-body']",
        "next_page_link: //a[@class='next']",
        "prune: no",
    ],
    "printable.example.com": [
        "title: //h1",
        "body: //div[@class='article-body']",
        "single_page_link: //a[@class='print']",
        "prune: no",
    ],
}

def pages_ruleset():
    """Compiled RuleSet for the synthetic domains (plus any vendored
    fixture configs the caller merges in)."""
    from .siteconfig import RuleSet, parse_lines

    return RuleSet({host: parse_lines(lines) for host, lines in PAGES_SITE_CONFIGS.items()})


# shared construction constants — referenced by both the Spark synthesis and
# the DuckDB oracle below; change them only together
_V1_DATE_SQL = "strftime(DATE '2020-01-01' + INTERVAL ((doc_id % 365)) DAY, '%Y-%m-%dT00:00:00+00:00')"


def _domain_expr() -> str:
    return (
        "CASE doc_id % 4 "
        "WHEN 0 THEN 'configured.example.com' "
        "WHEN 1 THEN concat('news-', cast(doc_id % 7 as string), '.example.org') "
        "WHEN 2 THEN concat('blog-', cast(doc_id % 13 as string), '.example.net') "
        "ELSE 'legacy.example.info' END"
    )


def _html_expr() -> str:
    """One SQL CASE producing the page HTML string per variant."""
    v0 = (
        "concat('<html lang=\"', lang, '\"><head><title>head title</title></head><body>',"
        "'<div class=\"ads\">AD BLOCK</div>',"
        "'<h1>Doc ', cast(doc_id as string), '</h1>',"
        "'<div class=\"article-body\"><p>', text, '</p></div>',"
        "'</body></html>')"
    )
    v1 = (
        "concat('<html lang=\"', lang, '\"><head><title>head</title>',"
        "'<meta property=\"og:title\" content=\"OG Doc ', cast(doc_id as string), '\"/>',"
        "'<meta property=\"article:published_time\" content=\"', "
        + _spark_v1_date()
        + ", '\"/>',"
        "'<script type=\"application/ld+json\">{\"@type\":\"Article\",\"author\":{\"name\":\"Author ', cast(doc_id % 7 as string), '\"}}</script>',"
        "'</head><body>',"
        "'<div itemprop=\"articleBody\"><p>', text, '</p></div>',"
        "'</body></html>')"
    )
    v2 = (
        "concat('<html lang=\"', lang, '\"><head><title>head</title></head><body>',"
        "'<div class=\"hentry\"><h2 class=\"entry-title\">Entry ', cast(doc_id as string), '</h2>',"
        "'<div class=\"entry-content\"><p>', text, '</p></div></div>',"
        "'</body></html>')"
    )
    v3 = (
        "concat('<html lang=\"', lang, '\"><head>',"
        "'<meta http-equiv=\"Content-Type\" content=\"text/html; charset=iso-8859-1\">',"
        "'<title>Résumé ', cast(doc_id as string), '</title></head><body>',"
        "'<div itemprop=\"articleBody\"><p>', text, '</p></div>',"
        "'</body></html>')"
    )
    return (
        f"CASE doc_id % 4 WHEN 0 THEN {v0} WHEN 1 THEN {v1} WHEN 2 THEN {v2} ELSE {v3} END"
    )


def _spark_v1_date() -> str:
    return "date_format(date_add(DATE '2020-01-01', cast(doc_id % 365 as int)), \"yyyy-MM-dd'T'00:00:00+00:00\")"


def build_pages_df(
    spark: SparkSession, sf_dir: str, repeat: int = 1, text_repeat: int = 1
) -> DataFrame:
    """documents.parquet → pages(url, warc_ts, html, text, lang, content_type,
    http_status).  ``repeat`` > 1 amplifies the table for benchmarking
    (each copy gets a distinct url / doc_id, preserving determinism);
    ``text_repeat`` inflates the body to production page sizes (50-500 KB)
    so per-document parse cost dominates like it does on real crawls."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # the documents parquet is tiny (one read task); spread the RAW rows
    # first — both amplifications (row explode and 50-500x body inflation)
    # must run after the shuffle, or the single scan task serially
    # generates and shuffle-writes the whole amplified payload (measured:
    # up to ~20% idle at 8 cores when inflation preceded the repartition)
    docs = docs.repartition(spark.sparkContext.defaultParallelism * 2, "doc_id")
    if repeat > 1:
        n = spark.read.parquet(f"{sf_dir}/documents.parquet").selectExpr(
            "max(doc_id) + 1 as n"
        ).collect()[0][0]
        docs = docs.selectExpr(
            f"explode(sequence(0, {repeat - 1})) as copy", "*"
        ).selectExpr(
            f"doc_id + copy * {n} as doc_id", "text", "lang", "source", "n_chars"
        )
    if text_repeat > 1:
        docs = docs.selectExpr(
            "doc_id",
            f"array_join(array_repeat(text, {text_repeat}), ' ') as text",
            "lang",
            "source",
            "n_chars",
        )
    domain = _domain_expr()
    html = _html_expr()
    return docs.selectExpr(
        f"concat('http://', {domain}, '/article/', cast(doc_id as string)) as url",
        "timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, doc_id) as warc_ts",
        # v3 pages are ISO-8859-1 bytes (charset declared only in <meta>)
        f"CASE doc_id % 4 WHEN 3 THEN encode({html}, 'ISO-8859-1') ELSE encode({html}, 'UTF-8') END as html",
        "text",
        "lang",
        # v3 content-type omits the charset to force the HTML sniff path
        "CASE doc_id % 4 WHEN 3 THEN 'text/html' ELSE 'text/html; charset=utf-8' END as content_type",
        "200 as http_status",
        "doc_id",
    )


def build_multipage_pages_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-page article chains on serial.example.com for every 10th doc:
    page 1 holds the first half of the text plus a next-page link, page 2
    the second half (G1-G3 self-join fixture)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where("doc_id % 10 = 0")
    base = "concat('http://serial.example.com/article/', cast(doc_id as string))"
    page1_html = (
        "concat('<html lang=\"', lang, '\"><head><title>head</title></head><body>',"
        "'<h1>Serial ', cast(doc_id as string), '</h1>',"
        "'<div class=\"article-body\"><p>', left(text, cast(floor(length(text)/2) as int)), '</p></div>',"
        "'<a class=\"next\" href=\"/article/', cast(doc_id as string), '/page2\">next</a>',"
        "'</body></html>')"
    )
    page2_html = (
        "concat('<html lang=\"', lang, '\"><head><title>head</title></head><body>',"
        "'<h1>Serial ', cast(doc_id as string), ' part 2</h1>',"
        "'<div class=\"article-body\"><p>', substring(text, cast(floor(length(text)/2) as int) + 1), '</p></div>',"
        "'</body></html>')"
    )
    page1 = docs.selectExpr(
        f"{base} as url",
        "timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, doc_id) as warc_ts",
        f"encode({page1_html}, 'UTF-8') as html",
        "text",
        "lang",
        "'text/html; charset=utf-8' as content_type",
        "200 as http_status",
        "doc_id",
    )
    page2 = docs.selectExpr(
        f"concat({base}, '/page2') as url",
        "timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, doc_id) as warc_ts",
        f"encode({page2_html}, 'UTF-8') as html",
        "text",
        "lang",
        "'text/html; charset=utf-8' as content_type",
        "200 as http_status",
        "doc_id",
    )
    return page1.unionByName(page2)


def build_singlepage_pages_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Teaser + print-view page pairs on printable.example.com for every
    10th doc (doc_id % 10 = 5): the article page holds only the first 40
    chars plus a 'print view' link; the print page holds the full text
    (G1 replacement-join fixture, singlepage*.com.txt semantics)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where("doc_id % 10 = 5")
    base = "concat('http://printable.example.com/article/', cast(doc_id as string))"
    teaser_html = (
        "concat('<html lang=\"', lang, '\"><head><title>head</title></head><body>',"
        "'<h1>Printable ', cast(doc_id as string), '</h1>',"
        "'<div class=\"article-body\"><p>', left(text, 40), '</p></div>',"
        "'<a class=\"print\" href=\"/article/', cast(doc_id as string), '/print\">print view</a>',"
        "'</body></html>')"
    )
    print_html = (
        "concat('<html lang=\"', lang, '\"><head><title>head</title></head><body>',"
        "'<h1>Printable ', cast(doc_id as string), '</h1>',"
        "'<div class=\"article-body\"><p>', text, '</p></div>',"
        "'</body></html>')"
    )
    common = [
        "timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, doc_id) as warc_ts",
        "text",
        "lang",
        "'text/html; charset=utf-8' as content_type",
        "200 as http_status",
        "doc_id",
    ]
    teaser = docs.selectExpr(f"{base} as url", f"encode({teaser_html}, 'UTF-8') as html", *common)
    printv = docs.selectExpr(
        f"concat({base}, '/print') as url", f"encode({print_html}, 'UTF-8') as html", *common
    )
    return teaser.unionByName(printv)


def build_redirect_pages_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Meta-refresh fixture pages (S8, HttpClient.php:452-475): every 10th
    doc (doc_id % 10 = 7) becomes a refresh.example.com page.  Three
    sub-variants by doc_id % 3 exercise both attribute orders, quoting
    styles, relative resolution and ``&amp;`` decoding:
      0: http-equiv first, double-quoted, absolute target
      1: content first (the reverse-order match), single-quoted, relative
         target with an &amp;-encoded query
      2: no refresh meta (expected redirect_target NULL)
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where("doc_id % 10 = 7")
    refresh0 = (
        "'<meta http-equiv=\"refresh\" content=\"0; url=http://target.example.com/t/' || cast(doc_id as string) || '\">'"
    )
    refresh1 = (
        "concat('<meta content=''5; url=/land/', cast(doc_id as string), '?a=1&amp;b=2'' http-equiv=''refresh''>')"
    )
    html = (
        "concat('<html lang=\"', lang, '\"><head><title>head</title>',"
        f"CASE doc_id % 3 WHEN 0 THEN {refresh0} WHEN 1 THEN {refresh1} ELSE '' END,"
        "'</head><body><div itemprop=\"articleBody\"><p>', text, '</p></div></body></html>')"
    )
    return docs.selectExpr(
        "concat('http://refresh.example.com/article/', cast(doc_id as string)) as url",
        "timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, doc_id) as warc_ts",
        f"encode({html}, 'UTF-8') as html",
        "text",
        "lang",
        "'text/html; charset=utf-8' as content_type",
        "200 as http_status",
        "doc_id",
    )


# ---------------------------------------------------------------------------
# DuckDB oracle CTE mirroring the construction
# ---------------------------------------------------------------------------

def oracle_pages_cte() -> str:
    """CTE computing the *expected* extraction output from ``documents``
    with plain SQL — what the pipeline must reproduce from raw bytes."""
    return f"""
expected AS (
    SELECT
        doc_id,
        CASE doc_id % 4
            WHEN 0 THEN 'http://configured.example.com/article/' || doc_id
            WHEN 1 THEN 'http://news-' || (doc_id % 7) || '.example.org/article/' || doc_id
            WHEN 2 THEN 'http://blog-' || (doc_id % 13) || '.example.net/article/' || doc_id
            ELSE 'http://legacy.example.info/article/' || doc_id
        END AS url,
        CASE doc_id % 4
            WHEN 0 THEN 'Doc ' || doc_id
            WHEN 1 THEN 'OG Doc ' || doc_id
            WHEN 2 THEN 'Entry ' || doc_id
            ELSE 'Résumé ' || doc_id
        END AS title,
        trim(regexp_replace(text, '[ \t\r\n]+', ' ', 'g')) AS expected_text,
        lang AS language,
        CASE doc_id % 4 WHEN 1 THEN {_V1_DATE_SQL} ELSE NULL END AS pub_date,
        CASE doc_id % 4 WHEN 1 THEN 'Author ' || (doc_id % 7) ELSE NULL END AS author_names
    FROM documents
)
""".strip()


def oracle_excerpt_sql(text_expr: str) -> str:
    """DuckDB SQL mirroring Graby::getExcerpt (250-char word cut +
    ' &hellip;') for clean single-spaced text."""
    return (
        f"CASE WHEN length({text_expr}) > 250 THEN "
        f"  CASE WHEN position(' ' IN substr({text_expr}, 251)) = 0 THEN {text_expr} "
        f"  ELSE rtrim(substr({text_expr}, 1, 250 + position(' ' IN substr({text_expr}, 251)) - 1)) || ' &hellip;' END "
        f"ELSE {text_expr} END"
    )
