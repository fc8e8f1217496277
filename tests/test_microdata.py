"""Microdata extraction (graby_spark.operators.microdata).

Pins the WHATWG scoping rule (nested itemscope properties belong to the
nested item), the per-tag value table, multi-name itemprop explosion,
URL absolutization, and the staged r05 driver query against its DuckDB
oracle.
"""

import importlib

import pytest

from graby_spark.operators.microdata import (
    doc_microdata,
    extract_microdata,
    microdata_items,
)
from graby_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


PAGE = "http://md.example/a/page.html"


def test_scoping_and_nested_items():
    h = (
        '<div itemscope itemtype="https://schema.org/Article extra/Token">'
        '<h1 itemprop="headline">Big   news</h1>'
        '<span itemprop="author" itemscope itemtype="https://schema.org/Person">'
        '<span itemprop="name">Jo</span></span>'
        "</div>"
    )
    rows = doc_microdata(h, PAGE)
    # nested Person's `name` must NOT leak into the Article
    art = [r for r in rows if r["item_idx"] == 0]
    assert {r["prop"] for r in art} == {"headline", "author"}
    assert art[0]["item_type"] == "https://schema.org/Article"  # first token
    headline = next(r for r in art if r["prop"] == "headline")
    assert headline["value"] == "Big news"
    author = next(r for r in art if r["prop"] == "author")
    assert author["value"] == "" and author["child_item"] == 1
    person = [r for r in rows if r["item_idx"] == 1]
    assert person == [
        {
            "item_idx": 1,
            "item_type": "https://schema.org/Person",
            "prop": "name",
            "value": "Jo",
            "child_item": None,
        }
    ]


def test_value_table_and_multiname_props():
    h = (
        "<div itemscope>"
        '<meta itemprop="ratingValue" content=" 4.5 ">'
        '<img itemprop="image photo" src="/i.png">'
        '<a itemprop="url" href="next.html">ignored text</a>'
        '<time itemprop="datePublished" datetime="2024-03-04">March</time>'
        '<time itemprop="dateText">March 4</time>'
        '<data itemprop="sku" value="42">forty-two</data>'
        '<span itemprop="desc">Some <b>bold</b> text</span>'
        "</div>"
    )
    rows = {(r["prop"]): r["value"] for r in doc_microdata(h, PAGE)}
    assert rows["ratingValue"] == "4.5"
    assert rows["image"] == "http://md.example/i.png"
    assert rows["photo"] == rows["image"]  # multi-name itemprop
    assert rows["url"] == "http://md.example/a/next.html"
    assert rows["datePublished"] == "2024-03-04"
    assert rows["dateText"] == "March 4"  # datetime attr absent -> text
    assert rows["sku"] == "42"
    assert rows["desc"] == "Some bold text"


def test_totality_on_arbitrary_text():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.text(max_size=300))
    def prop(s):
        for r in doc_microdata(s, PAGE):
            assert isinstance(r["prop"], str) and isinstance(r["value"], str)

    prop()


def test_spark_operator_and_item_summary(spark):
    rows = [
        (
            "http://x/1",
            '<div itemscope itemtype="T"><i itemprop="a">1</i>'
            '<i itemprop="b">2</i><i itemprop="a">3</i></div>',
        ),
        ("http://x/2", "<p>no microdata</p>"),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    props = extract_microdata(df)
    assert props.count() == 3
    (item,) = microdata_items(props).collect()
    assert item["url"] == "http://x/1" and item["item_type"] == "T"
    assert item["n_props"] == 3 and item["prop_names"] == "a,b"


def test_staged_r05_query_matches_duckdb_oracle(spark):
    """The staged driver query (q_extract_microdata) against its DuckDB
    oracle at sf0.001 — same comparison the driver runs, kept here until
    the r05 registry rotation."""
    duckdb = pytest.importorskip("duckdb")
    e = importlib.import_module("__spark_entry__")
    sf = "/root/testdata/sf0.001"
    got = e.q_extract_microdata(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(f"create view documents as select * from '{sf}/documents.parquet'")
    exp = con.execute(e.R05_ORACLE_EXTRACT_MICRODATA).df()
    key = ["url", "item_idx", "prop"]
    g = got.sort_values(key).reset_index(drop=True)
    x = exp[got.columns].sort_values(key).reset_index(drop=True)
    assert len(g) == len(x) and len(g) > 0
    for col in got.columns:
        assert (g[col].values == x[col].values).all(), col


def test_real_fixture_pages_smoke():
    """Real crawled pages must parse without error and produce
    well-typed rows (clubic/lemonde/rollingstone fixtures)."""
    import glob

    paths = (
        glob.glob("fixtures/content/*clubic*")
        + glob.glob("fixtures/content/*lemonde*")
        + glob.glob("fixtures/content/*rollingstone*")
    )
    assert paths
    for p in paths:
        html = open(p, encoding="utf-8", errors="replace").read()
        for r in doc_microdata(html, "http://fixture.example/a/b.html"):
            assert isinstance(r["item_idx"], int)
            assert isinstance(r["prop"], str) and r["prop"]
