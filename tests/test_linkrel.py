"""<link rel> relation mining and canonical-aware dedup
(graby_spark.operators.graph.link_relations / canonical_dedup).

Pins the attribute-quoting variants, the rel-token explode, href
resolution reuse, first-canonical-wins, and the cluster/survivor
semantics, plus the staged r05 driver query against its DuckDB oracle.
"""

import importlib

import pytest

from graby_spark.operators.graph import canonical_dedup, link_relations
from graby_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_link_relations_parsing_and_resolution(spark):
    html = (
        '<head><link rel="canonical" href="/art/1">'
        "<link rel='alternate' hreflang='fr-FR' href='//m.ex.com/fr'>"
        '<link rel=stylesheet href=style.css>'
        '<link rel="alternate nofollow" type="application/rss+xml" href="feed.xml">'
        '<link href="/no-rel"><link rel="icon"></head>'
    )
    out = (
        link_relations(_pages(spark, [("http://ex.com/a/b.html", html)]))
        .orderBy("link_idx", "rel")
        .collect()
    )
    # tags without rel or without href are dropped; multi-token rel explodes
    assert [(r["link_idx"], r["rel"], r["dst"]) for r in out] == [
        (0, "canonical", "http://ex.com/art/1"),
        (1, "alternate", "http://m.ex.com/fr"),
        (2, "stylesheet", "http://ex.com/a/style.css"),
        (3, "alternate", "http://ex.com/a/feed.xml"),
        (3, "nofollow", "http://ex.com/a/feed.xml"),
    ]
    assert out[1]["hreflang"] == "fr-fr"
    assert out[3]["type"] == "application/rss+xml"


def test_canonical_dedup_clusters(spark):
    canon = "http://ex.com/article"
    rows = [
        # self-canonical target, present in input
        (canon, f'<link rel="canonical" href="{canon}">'),
        # two variants pointing at it (one with a SECOND canonical that
        # must be ignored: first in document order wins)
        (
            "http://ex.com/article?utm=1",
            f'<link rel="canonical" href="/article">'
            f'<link rel="canonical" href="/WRONG">',
        ),
        ("http://ex.com/article/amp", f'<link rel=canonical href="{canon}">'),
        # cluster whose canonical target is NOT in the input: smallest
        # member url survives
        ("http://ex.com/p?b=2", '<link rel="canonical" href="/gone">'),
        ("http://ex.com/p?a=1", '<link rel="canonical" href="/gone">'),
        # no canonical at all: own singleton cluster, kept
        ("http://ex.com/solo", "<p>nothing</p>"),
    ]
    got = {
        r["url"]: r for r in canonical_dedup(_pages(spark, rows)).collect()
    }
    assert got[canon]["is_kept"] and got[canon]["cluster_size"] == 3
    assert not got["http://ex.com/article?utm=1"]["is_kept"]
    assert got["http://ex.com/article?utm=1"]["canonical_url"] == canon
    assert not got["http://ex.com/article/amp"]["is_kept"]
    assert got["http://ex.com/p?a=1"]["is_kept"]  # lexicographically smallest
    assert not got["http://ex.com/p?b=2"]["is_kept"]
    assert got["http://ex.com/p?a=1"]["canonical_url"] == "http://ex.com/gone"
    assert got["http://ex.com/solo"]["is_kept"]
    assert got["http://ex.com/solo"]["cluster_size"] == 1
    # exactly one survivor per cluster
    df = canonical_dedup(_pages(spark, rows))
    from pyspark.sql import functions as F

    per = (
        df.groupBy("canonical_url")
        .agg(F.sum(F.col("is_kept").cast("int")))
        .collect()
    )
    assert all(r[1] == 1 for r in per)


def test_staged_r05_query_matches_duckdb_oracle(spark):
    """The staged driver query (q_canonical_dedup) against its DuckDB
    oracle at sf0.001 — same comparison the driver runs, kept here until
    the r05 registry rotation."""
    duckdb = pytest.importorskip("duckdb")
    e = importlib.import_module("__spark_entry__")
    sf = "/root/testdata/sf0.001"
    got = e.q_canonical_dedup(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(f"create view documents as select * from '{sf}/documents.parquet'")
    exp = con.execute(e.R05_ORACLE_CANONICAL_DEDUP).df()
    g = got.sort_values("url").reset_index(drop=True)
    x = exp[got.columns].sort_values("url").reset_index(drop=True)
    assert len(g) == len(x) and len(g) > 0
    for col in got.columns:
        assert (g[col].values == x[col].values).all(), col


def test_hreflang_clusters(spark):
    """Symmetric hreflang annotations give every member the same
    cluster key without any cross-page join; x-default is kept; pages
    without hreflang links emit nothing."""
    en, fr, de = (
        "http://ex.com/en/p",
        "http://ex.com/fr/p",
        "http://ex.com/de/p",
    )

    def head(*variants):
        return "".join(
            f'<link rel="alternate" hreflang="{h}" href="{u}">' for h, u in variants
        )

    rows = [
        (en, head(("fr", fr), ("de", de), ("x-default", en))),
        (fr, head(("en", en), ("de", de))),
        (de, head(("en", en), ("fr", fr))),
        ("http://ex.com/solo", "<p>nothing</p>"),
    ]
    from graby_spark.operators.graph import hreflang_clusters

    got = hreflang_clusters(
        spark.createDataFrame(rows, "url string, html string")
    ).collect()
    # every member derives the same key (lexicographic min = /de/p)
    assert {r["cluster_key"] for r in got} == {de}
    by_url = {}
    for r in got:
        by_url.setdefault(r["url"], []).append(r)
    assert len(by_url[en]) == 3 and by_url[en][0]["n_variants"] == 3
    assert len(by_url[fr]) == 2 and len(by_url[de]) == 2
    assert {r["hreflang"] for r in by_url[en]} == {"fr", "de", "x-default"}
    assert "http://ex.com/solo" not in by_url


def test_translation_pairs_planted_set(spark):
    """translation_pairs = hreflang clusters ∧ langid agreement ∧
    length-ratio: a planted 3-language set yields its three pairs; a
    mislabeled variant (declared fr, English body) drops out with its
    pairs; a 3x-length stub fails the ratio filter."""
    from graby_spark.operators.graph import translation_pairs

    def head(me, others):
        links = "".join(
            f'<link rel="alternate" hreflang="{h}" href="http://ex.com/{h}/{me[1]}">'
            for h in others
        )
        return f"<html><head>{links}</head><body>x</body></html>"

    en_text = "the of and to that " * 4
    fr_text = "le les et est une " * 4
    de_text = "der die und das von " * 4
    rows = []
    # cluster 1: clean — all three pairs
    for lang, text in (("en", en_text), ("fr", fr_text), ("de", de_text)):
        others = [o for o in ("en", "fr", "de") if o != lang]
        rows.append((f"http://ex.com/{lang}/1", head((lang, 1), others), text))
    # cluster 2: fr page carries ENGLISH text — only (de, en) survives
    for lang, text in (("en", en_text), ("fr", en_text), ("de", de_text)):
        others = [o for o in ("en", "fr", "de") if o != lang]
        rows.append(
            (f"http://ex.com/{lang}/2", head((lang, 2), others).replace("/1", "/2"), text)
        )
    # cluster 3: de page 4x longer — only (en, fr) survives
    for lang, text in (("en", en_text), ("fr", fr_text), ("de", de_text * 4)):
        others = [o for o in ("en", "fr", "de") if o != lang]
        rows.append((f"http://ex.com/{lang}/3", head((lang, 3), others), text))
    pages = spark.createDataFrame(rows, "url string, html string, text string")
    got = translation_pairs(pages).collect()
    pairs = {(r["cluster_key"], r["lang_a"], r["lang_b"]) for r in got}
    c1, c2, c3 = "http://ex.com/de/1", "http://ex.com/de/2", "http://ex.com/de/3"
    assert pairs == {
        (c1, "de", "en"), (c1, "de", "fr"), (c1, "en", "fr"),
        (c2, "de", "en"),
        (c3, "en", "fr"),
    }
    for r in got:
        assert r["lang_a"] < r["lang_b"]
        assert 0.5 <= r["len_ratio"] <= 1.0
        assert r["len_a"] == len(
            {"en": en_text, "fr": fr_text, "de": de_text}[r["lang_a"]].strip()
        ) or r["cluster_key"] == c2


def test_r05_pipeline_translate_matches_duckdb_oracle(spark):
    """The pipeline_translate driver query against its DuckDB oracle at
    sf0.001 — same comparison the driver runs."""
    duckdb = pytest.importorskip("duckdb")
    e = importlib.import_module("__spark_entry__")
    sf = "/root/testdata/sf0.001"
    got = e.q_pipeline_translate(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(f"create view documents as select * from '{sf}/documents.parquet'")
    exp = con.execute(e.oracle_sql()["pipeline_translate"]).df()
    key = ["cluster_key", "lang_a", "lang_b"]
    g = got.sort_values(key).reset_index(drop=True)
    x = exp[got.columns].sort_values(key).reset_index(drop=True)
    assert len(g) == len(x) and len(g) > 0
    for col in got.columns:
        assert (g[col].values == x[col].values).all(), col


def test_staged_r05_hreflang_matches_duckdb_oracle(spark):
    """The staged driver query (q_hreflang_clusters) against its DuckDB
    oracle at sf0.001."""
    duckdb = pytest.importorskip("duckdb")
    e = importlib.import_module("__spark_entry__")
    sf = "/root/testdata/sf0.001"
    got = e.q_hreflang_clusters(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(f"create view documents as select * from '{sf}/documents.parquet'")
    exp = con.execute(e.R05_ORACLE_HREFLANG_CLUSTERS).df()
    key = ["url", "hreflang"]
    g = got.sort_values(key).reset_index(drop=True)
    x = exp[got.columns].sort_values(key).reset_index(drop=True)
    assert len(g) == len(x) and len(g) > 0
    for col in got.columns:
        assert (g[col].values == x[col].values).all(), col
