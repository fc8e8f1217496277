"""HTML table extraction (graby_spark.operators.tables).

The grid model follows the HTML table algorithm: colspan repeats across
columns, rowspan fills down, nested tables are their own tables, cell
assignment is nearest-ancestor (robust to tag-soup misnesting).  The
staged r05 driver query is gated here against its DuckDB oracle until
the registry rotation promotes it.
"""

import importlib

import pytest

from graby_spark.operators.tables import doc_tables, extract_tables, table_stats
from graby_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_grid_semantics():
    # header via thead, via all-th row, and plain data
    h = (
        "<table><thead><tr><th>A</th><th>B</th></tr></thead>"
        "<tbody><tr><td>1</td><td>2</td></tr></tbody></table>"
    )
    assert doc_tables(h) == [[(True, ["A", "B"]), (False, ["1", "2"])]]

    # rowspan fills down, colspan repeats across
    h = (
        "<table>"
        '<tr><td rowspan="2">x</td><td>a</td><td>b</td></tr>'
        '<tr><td colspan="2">y</td></tr>'
        "<tr><td>p</td><td>q</td><td>r</td></tr>"
        "</table>"
    )
    assert doc_tables(h) == [
        [
            (False, ["x", "a", "b"]),
            (False, ["x", "y", "y"]),
            (False, ["p", "q", "r"]),
        ]
    ]

    # rowspan spanning three rows with later short rows
    h = (
        "<table>"
        '<tr><td rowspan="3">s</td><td>1</td></tr>'
        "<tr><td>2</td></tr>"
        "<tr><td>3</td></tr>"
        "</table>"
    )
    assert [cells for _, cells in doc_tables(h)[0]] == [
        ["s", "1"],
        ["s", "2"],
        ["s", "3"],
    ]


def test_nested_and_misnested_tables():
    # a nested table is its own table; its text is NOT in the outer cell
    h = (
        "<table><tr><td>outer <table><tr><td>inner</td></tr></table></td>"
        "<td>o2</td></tr></table>"
    )
    assert doc_tables(h) == [
        [(False, ["outer", "o2"])],
        [(False, ["inner"])],
    ]

    # tag soup: unclosed <tr>/<td> (the lenient parser nests the second
    # row inside the first) — nearest-ancestor assignment still yields
    # two clean rows
    h = "<table><tr><td>a<td>b<tr><td>c<td>d</table>"
    assert [cells for _, cells in doc_tables(h)[0]] == [["a", "b"], ["c", "d"]]

    # a nested table WITHOUT its own <tr> must not leak its cells into
    # the outer row (nearest row-or-table ancestor rule)
    h = "<table><tr><td>a<table><td>leak</td></table></td><td>b</td></tr></table>"
    grids = doc_tables(h)
    assert [cells for _, cells in grids[0]] == [["a", "b"]]


def test_cell_text_normalization_and_spans_clamped():
    h = (
        "<table><tr>"
        "<td>  two\n  words <b>bold</b> </td>"
        '<td colspan="abc">v</td>'
        '<td rowspan="0">w</td>'
        "</tr></table>"
    )
    ((is_h, cells),) = doc_tables(h)[0]
    assert cells == ["two words bold", "v", "w"]
    assert is_h is False
    # empty table / no rows
    assert doc_tables("<p>no tables</p>") == []
    assert doc_tables("<table></table>") == [[]]


def test_extract_tables_and_stats_spark(spark):
    pages = spark.createDataFrame(
        [
            (
                "u1",
                "<table><tr><th>h</th><th>i</th></tr>"
                "<tr><td>1</td><td>2.5</td></tr>"
                "<tr><td>3</td><td></td></tr></table>",
            ),
            ("u2", "<p>none</p>"),
        ],
        ["url", "html"],
    )
    rows = extract_tables(pages).orderBy("url", "table_idx", "row_idx").collect()
    assert [r.url for r in rows] == ["u1", "u1", "u1"]
    assert rows[0].is_header and rows[0].cells == ["h", "i"]
    assert rows[2].cells == ["3", ""]

    stats = table_stats(extract_tables(pages)).collect()
    assert len(stats) == 1
    s = stats[0]
    assert s.n_rows == 3 and s.n_header_rows == 1 and s.max_cols == 2
    assert s.is_rectangular
    # numeric cells: 1, 2.5, 3 of 6 slots; empty: 1 of 6
    assert abs(s.numeric_ratio - 3 / 6) < 1e-9
    assert abs(s.empty_ratio - 1 / 6) < 1e-9

    # binary html input decodes
    binpages = spark.createDataFrame(
        [("u3", bytearray(b"<table><tr><td>z</td></tr></table>"))],
        "url string, html binary",
    )
    out = extract_tables(binpages).collect()
    assert out[0].cells == ["z"]


def test_tables_to_markdown(spark):
    from graby_spark.operators.tables import tables_to_markdown

    pages = spark.createDataFrame(
        [
            (
                "u1",
                "<table><tr><th>a</th><th>b|c</th></tr>"
                "<tr><td>1</td><td>2</td></tr></table>"
                "<table><tr><td>x</td><td>y</td></tr></table>",
            )
        ],
        ["url", "html"],
    )
    out = {
        (r.url, r.table_idx): r.markdown
        for r in tables_to_markdown(extract_tables(pages)).collect()
    }
    assert out[("u1", 0)] == "| a | b\\|c |\n| --- | --- |\n| 1 | 2 |"
    # headerless table gets a synthesized empty header
    assert out[("u1", 1)] == "|  |  |\n| --- | --- |\n| x | y |"


def test_real_fixture_page_smoke():
    """A real crawled page (clubic, ~100 KB of tag soup with layout and
    data tables) must extract without error and produce sane grids."""
    import glob

    paths = glob.glob("fixtures/content/*clubic*")
    assert paths
    html = open(paths[0], encoding="utf-8", errors="replace").read()
    tables = doc_tables(html)
    assert len(tables) >= 1
    for rows in tables:
        for is_header, cells in rows:
            assert isinstance(is_header, bool)
            assert all(isinstance(c, str) for c in cells)
    # at least one real data table with multiple columns exists on the page
    assert any(
        any(len(cells) >= 2 for _, cells in rows) for rows in tables
    )


def test_staged_r05_query_matches_duckdb_oracle(spark):
    """The staged driver query (q_extract_html_tables) against its
    DuckDB oracle at sf0.001 — same comparison the driver runs, kept
    here until the r05 registry rotation."""
    duckdb = pytest.importorskip("duckdb")
    e = importlib.import_module("__spark_entry__")
    sf = "/root/testdata/sf0.001"
    got = e.q_extract_html_tables(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{sf}/documents.parquet'"
    )
    exp = con.execute(e.R05_ORACLE_EXTRACT_HTML_TABLES).df()
    key = ["url", "table_idx", "row_idx"]
    g = got.sort_values(key).reset_index(drop=True)
    x = exp[got.columns].sort_values(key).reset_index(drop=True)
    assert len(g) == len(x) and len(g) > 0
    for col in got.columns:
        assert (g[col].values == x[col].values).all(), col
