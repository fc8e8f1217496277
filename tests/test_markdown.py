"""HTML→Markdown converter: block/inline structure and the Spark column."""

import pytest

from graby_spark.markdown import to_markdown


@pytest.mark.parametrize(
    "html,want",
    [
        ("<h1>T</h1><p>hello  world</p>", "# T\n\nhello world"),
        ("<h3>deep</h3>", "### deep"),
        ("<p><b>bold</b> and <i>it</i></p>", "**bold** and *it*"),
        (
            '<p>See <a href="http://x">link</a></p><ul><li>alpha</li><li>beta</li></ul>',
            "See [link](http://x)\n\n- alpha\n- beta",
        ),
        ("<blockquote><p>quoted</p><p>more</p></blockquote>", "> quoted\n>\n> more"),
        (
            "<pre>code  here\n  x</pre><hr><p>t</p>",
            "```\ncode  here\n  x\n```\n\n---\n\nt",
        ),
        # tight nesting: sub-list attaches directly under its item text
        (
            "<ol><li>one</li><li>two<ul><li>sub</li></ul></li></ol>",
            "1. one\n2. two\n  - sub",
        ),
        # multi-paragraph item keeps the paragraph break, indented
        ("<ul><li><p>a</p><p>b</p></li></ul>", "- a\n\n  b"),
        ('<p><img src="a.png" alt="pic"> and <code>x=1</code></p>', "![pic](a.png) and `x=1`"),
        (
            "<table><tr><th>a</th><th>b</th></tr><tr><td>1</td><td>2</td></tr></table>",
            "| a | b |\n\n| 1 | 2 |",
        ),
        # bare inline runs between blocks become implicit paragraphs
        ("<div>bare text<p>para</p>tail</div>", "bare text\n\npara\n\ntail"),
        # script/style content never leaks into the corpus
        ("<p>keep</p><script>var x;</script><style>.a{}</style>", "keep"),
        # anchor without href degrades to its text; empty emphasis drops
        ("<p><a>naked</a> <b> </b>end</p>", "naked end"),
        ("<p>line<br>break</p>", "line\nbreak"),
        ("", ""),
    ],
)
def test_to_markdown(html, want):
    assert to_markdown(html) == want


def test_markdown_column_vectorized():
    from graby_spark.markdown import markdown_column
    from graby_spark.session import get_spark

    spark = get_spark(
        app_name="graby-md-tests", master="local[2]", shuffle_partitions=2
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame(
        [(1, "<h1>A</h1>"), (2, None)], ["doc_id", "content_html"]
    )
    rows = {r["doc_id"]: r["markdown"] for r in markdown_column(df).collect()}
    assert rows == {1: "# A", 2: None}


@pytest.mark.parametrize(
    "name,md5,prefix",
    [
        (
            "lemonde",
            "193f594e3d8f94e6789c498de522a3f6",
            "![Dominique-Jean Chertier, le médiateur chargé",
        ),
        (
            "blogger",
            "ff6c57034823ffaad8c2bd45f98025f9",
            'For the past few months I\'ve been working on a "next-gen"',
        ),
        (
            "lifehacker",
            "116853d88221cfef0cbb5d448912c0d0",
            "[![](https://i.kinja-img.com/gawker-media/image/upload",
        ),
    ],
)
def test_golden_article_markdown_snapshot(name, md5, prefix):
    """The serializer over REAL extracted articles (byte-exact golden
    content), pinned by hash so a converter change that reshapes
    real-world output can't land silently."""
    import hashlib

    from .golden import load_golden, run_golden
    from graby_spark.markdown import to_markdown

    md = to_markdown(run_golden(load_golden(name)).html)
    assert md.startswith(prefix)
    assert hashlib.md5(md.encode()).hexdigest() == md5


def test_to_markdown_totality_and_text_preservation():
    """Hypothesis-style totality sweep over randomized small DOMs: the
    converter never raises, and every text word of the input survives
    into the markdown (modulo whitespace), including through unknown
    tags, nesting, and dropped-container edge cases."""
    import random

    rng = random.Random(42)
    tags = ["p", "div", "span", "h2", "ul", "li", "blockquote", "em",
            "strong", "a", "unknown-x", "section", "code", "pre"]

    def gen(depth):
        if depth == 0 or rng.random() < 0.4:
            return f"w{rng.randrange(1000)} "
        t = rng.choice(tags)
        inner = "".join(gen(depth - 1) for _ in range(rng.randrange(3)))
        attr = ' href="u"' if t == "a" else ""
        return f"<{t}{attr}>{inner}</{t}>"

    from graby_spark.markdown import to_markdown

    for _ in range(300):
        html = "".join(gen(4) for _ in range(rng.randrange(1, 4)))
        md = to_markdown(html)  # must not raise
        import re

        want = set(re.findall(r"w\d+", html))
        got = set(re.findall(r"w\d+", md))
        assert want == got, (html, md)
