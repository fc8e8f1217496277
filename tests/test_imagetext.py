"""Image–text pair mining (graby_spark.operators.imagetext).

Covers the DOM-dependent parts a regex miner gets wrong — <base href>
resolution, lazy-load src fallbacks, srcset candidate selection,
figure/figcaption association — plus the Spark operator round trip,
the JVM quality features, a totality property, and the staged r05
driver query against its DuckDB oracle.
"""

import importlib

import pytest

from graby_spark.operators.imagetext import (
    _best_srcset,
    doc_image_pairs,
    image_text_pairs,
    pair_quality,
)
from graby_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


PAGE = "http://site.example/a/post.html"


def test_src_resolution_and_document_order():
    h = (
        '<p><img src="/img/one.jpg" alt=" First  image "></p>'
        '<img src="two.png" title="t2">'
        '<img src="http://cdn.example/three.gif">'
    )
    got = doc_image_pairs(h, PAGE)
    assert [r["src"] for r in got] == [
        "http://site.example/img/one.jpg",
        "http://site.example/a/two.png",
        "http://cdn.example/three.gif",
    ]
    assert [r["img_idx"] for r in got] == [0, 1, 2]
    assert got[0]["alt"] == "First image"  # whitespace normalized
    assert got[1]["title_attr"] == "t2" and got[1]["alt"] == ""


def test_base_href_wins_and_is_itself_resolved():
    # only the FIRST base element counts (HTML spec)
    h = (
        '<head><base href="/deep/dir/"><base href="http://other/"></head>'
        '<body><img src="x.jpg"></body>'
    )
    assert doc_image_pairs(h, PAGE)[0]["src"] == "http://site.example/deep/dir/x.jpg"


def test_lazyload_fallbacks_and_srcless_skip():
    h = (
        '<img data-src="/lazy.jpg" alt="a">'
        '<img data-original="/orig.jpg">'
        '<img alt="no source at all">'
        '<img src="" data-src="  ">'
    )
    got = doc_image_pairs(h, PAGE)
    assert [r["src"] for r in got] == [
        "http://site.example/lazy.jpg",
        "http://site.example/orig.jpg",
    ]


def test_srcset_best_candidate():
    assert _best_srcset("a.jpg 480w, b.jpg 800w, c.jpg 320w") == "b.jpg"
    assert _best_srcset("a.jpg 1x, b.jpg 2x") == "b.jpg"
    # width descriptors dominate density descriptors
    assert _best_srcset("a.jpg 2x, b.jpg 100w") == "b.jpg"
    # no descriptors: first candidate wins
    assert _best_srcset("a.jpg, b.jpg") == "a.jpg"
    assert _best_srcset("  ") is None
    # srcset-only img still yields a row, src = best candidate, absolute
    h = '<img srcset="/s1.jpg 480w, /s2.jpg 800w">'
    (r,) = doc_image_pairs(h, PAGE)
    assert r["src"] == "http://site.example/s2.jpg"
    assert r["srcset_best"] == "http://site.example/s2.jpg"


def test_figure_caption_and_dimensions():
    h = (
        "<figure><p><img src='/f.jpg' width='640' height='480'></p>"
        "<figcaption> A <b>bold</b>   caption </figcaption></figure>"
        "<img src='/nofig.jpg' width='100%' height='abc'>"
    )
    got = doc_image_pairs(h, PAGE)
    assert got[0]["caption"] == "A bold caption"
    assert (got[0]["width"], got[0]["height"]) == (640, 480)
    # CSS-length / junk dimensions -> null; no figure -> empty caption
    assert got[1]["caption"] == ""
    assert got[1]["width"] is None and got[1]["height"] is None


def test_data_uri_kept_javascript_dropped():
    h = (
        '<img src="data:image/gif;base64,R0lGOD=="><img src="javascript:x()">'
    )
    got = doc_image_pairs(h, PAGE)
    assert len(got) == 1 and got[0]["src"].startswith("data:image/gif")


def test_totality_on_arbitrary_text():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.text(max_size=300))
    def prop(s):
        for r in doc_image_pairs(s, PAGE):
            assert isinstance(r["src"], str)

    prop()


def test_spark_operator_and_quality(spark):
    rows = [
        (
            "http://a.example/p1",
            '<figure><img src="/cat.jpg" alt="a small cat" width="20" height="30">'
            "<figcaption>ignored: alt wins</figcaption></figure>",
        ),
        ("http://a.example/p2", '<img src="/IMG_0042.JPG" alt="IMG_0042.JPG">'),
        ("http://a.example/p3", "<p>no images here</p>"),
        (
            "http://a.example/p4",
            '<figure><img data-src="/dog.png"><figcaption>a good dog</figcaption></figure>',
        ),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    out = pair_quality(image_text_pairs(df)).orderBy("url").collect()
    assert [r["url"] for r in out] == [
        "http://a.example/p1",
        "http://a.example/p2",
        "http://a.example/p4",
    ]
    cat, junk, dog = out
    assert cat["text"] == "a small cat" and cat["text_words"] == 3
    assert cat["area"] == 600 and cat["ext"] == "jpg"
    assert not cat["alt_is_filename"]
    assert junk["alt_is_filename"] and junk["ext"] == "jpg"
    assert dog["text"] == "a good dog" and not dog["is_data_uri"]
    # binary html input path
    bin_df = spark.createDataFrame(
        [("u", bytearray(b'<img src="http://x/y.png">'))], "url string, html binary"
    )
    assert image_text_pairs(bin_df).count() == 1


def test_staged_r05_query_matches_duckdb_oracle(spark):
    """The staged driver query (q_image_text_pairs) against its DuckDB
    oracle at sf0.001 — same comparison the driver runs, kept here until
    the r05 registry rotation."""
    duckdb = pytest.importorskip("duckdb")
    e = importlib.import_module("__spark_entry__")
    sf = "/root/testdata/sf0.001"
    got = e.q_image_text_pairs(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(f"create view documents as select * from '{sf}/documents.parquet'")
    exp = con.execute(e.R05_ORACLE_IMAGE_TEXT_PAIRS).df()
    key = ["url", "img_idx"]
    g = got.sort_values(key).reset_index(drop=True)
    x = exp[got.columns].sort_values(key).reset_index(drop=True)
    assert len(g) == len(x) and len(g) > 0
    for col in got.columns:
        assert (g[col].values == x[col].values).all(), col


def test_real_fixture_pages_smoke():
    """Real crawled pages (clubic/lemonde tag soup, ~100 KB each) must
    mine without error; srcs are absolute or data: URIs."""
    import glob

    paths = glob.glob("fixtures/content/*clubic*") + glob.glob(
        "fixtures/content/*lemonde*"
    )
    assert paths
    for p in paths:
        html = open(p, encoding="utf-8", errors="replace").read()
        for r in doc_image_pairs(html, "http://fixture.example/a/b.html"):
            assert r["src"].startswith(("http://", "https://", "data:")), r["src"]


def test_staged_r05_pipeline_matches_duckdb_oracle(spark):
    """The composed curation pipeline (q_pipeline_imagetext) against its
    DuckDB oracle at sf0.001: exactly the planted keeper survives each
    page's rotating junk case (filename alt / 1x1 pixel / data URI /
    textless)."""
    duckdb = pytest.importorskip("duckdb")
    e = importlib.import_module("__spark_entry__")
    sf = "/root/testdata/sf0.001"
    got = e.q_pipeline_imagetext(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(f"create view documents as select * from '{sf}/documents.parquet'")
    exp = con.execute(e.R05_ORACLE_PIPELINE_IMAGETEXT).df()
    g = got.sort_values("url").reset_index(drop=True)
    x = exp[got.columns].sort_values("url").reset_index(drop=True)
    assert len(g) == len(x) and len(g) > 0
    for col in got.columns:
        assert (g[col].values == x[col].values).all(), col
