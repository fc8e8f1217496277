"""DOM parser + serializer unit tests (SURVEY.md §7 hard part 1-2)."""

from graby_spark.dom import inner_html, parse_fragment, parse_html, serialize


def roundtrip(html: str) -> str:
    doc = parse_html(html)
    el = doc.document_element
    return serialize(el) if el is not None else ""


def test_basic_structure():
    doc = parse_html("<html><body><p>hi</p></body></html>")
    assert serialize(doc) == "<html><body><p>hi</p></body></html>"


def test_implicit_html_body():
    doc = parse_html("<p>loose</p>")
    body = doc.body()
    assert body is not None
    assert inner_html(body) == "<p>loose</p>"


def test_void_elements_selfclose():
    doc = parse_html("<div><img src='a.jpg'><br><hr></div>")
    body = doc.body()
    assert inner_html(body) == '<div><img src="a.jpg"/><br/><hr/></div>'


def test_empty_element_selfcloses():
    assert '<p/>' in roundtrip("<html><body><p></p></body></html>")
    assert '<figcaption data-x="1"/>' in roundtrip(
        '<html><body><figcaption data-x="1"></figcaption></body></html>'
    )


def test_attr_escaping():
    doc = parse_html('<div title=\'a "b" & <c>\'>x</div>')
    out = inner_html(doc.body())
    assert out == '<div title="a &quot;b&quot; &amp; &lt;c&gt;">x</div>'


def test_text_escaping():
    doc = parse_html("<p>a &amp; b &lt; c</p>")
    assert inner_html(doc.body()) == "<p>a &amp; b &lt; c</p>"


def test_entity_resolution_to_utf8():
    doc = parse_html("<p>caf&eacute; &#233;</p>")
    assert doc.body().text_content == "café é"


def test_implied_p_close():
    doc = parse_html("<p>one<p>two")
    assert inner_html(doc.body()) == "<p>one</p><p>two</p>"


def test_implied_li_close():
    doc = parse_html("<ul><li>a<li>b</ul>")
    assert inner_html(doc.body()) == "<ul><li>a</li><li>b</li></ul>"


def test_table_cells():
    doc = parse_html("<table><tr><td>a<td>b<tr><td>c</table>")
    out = inner_html(doc.body())
    assert out.count("<td>") == 3 and out.count("</td>") == 3 and out.count("<tr>") == 2


def test_script_content_preserved():
    doc = parse_html('<script type="application/ld+json">{"a":"<b>"}</script><body></body>')
    scripts = list(doc.iter("script"))
    assert scripts and scripts[0].text_content == '{"a":"<b>"}'


def test_comment_nodes():
    doc = parse_html("<div><!-- note --><p>x</p></div>")
    assert "<!-- note -->" in inner_html(doc.body())


def test_duplicate_attrs_keep_first():
    doc = parse_html('<div class="a" class="b">x</div>')
    div = next(doc.body().iter("div"))
    assert div.get("class") == "a"


def test_bad_nesting_recovery():
    doc = parse_html("<b><i>x</b></i><p>y</p>")
    assert "y" in doc.body().text_content


def test_attribute_order_preserved():
    doc = parse_html('<img width="5" height="3" src="x.png" alt="z">')
    assert inner_html(doc.body()) == '<img width="5" height="3" src="x.png" alt="z"/>'


def test_clone_detached():
    doc = parse_html("<div><p>x</p></div>")
    div = next(doc.body().iter("div"))
    c = div.clone()
    assert c.parent is None and serialize(c) == serialize(div)


def test_parse_fragment():
    nodes = parse_fragment("<p>a</p><span>b</span>")
    assert len(nodes) == 2 and nodes[0].tag == "p" and nodes[1].tag == "span"


def test_normalize_merges_text():
    from graby_spark.dom import Element, TextNode

    el = Element("p")
    el.append(TextNode("a"))
    el.append(TextNode("b"))
    el.normalize()
    assert len(el.children) == 1 and el.children[0].data == "ab"


def test_never_raises_on_garbage():
    for bad in ["", "<", "<<<>>>", "<a b=", "\x00\x01", "<html><body>" * 100]:
        parse_html(bad)  # must not raise


def test_parser_profiles_whitespace():
    """D1: 'libxml' drops blanks per the allowPCData table; 'html5' keeps
    every whitespace-only node like an html5 tree builder."""
    from graby_spark.dom import parse_html, serialize

    html = "<body><figure>\n<img src='x'>\n</figure><ul>\n<li>a</li>\n</ul></body>"
    libxml = serialize(parse_html(html))
    html5 = serialize(parse_html(html, profile="html5"))
    assert "<figure><img" in libxml          # leading blank dropped (unknown tag)
    assert "<figure>\n<img" in html5          # html5 keeps it
    assert "<ul><li>" in libxml               # ol/ul: no PCDATA -> dropped
    assert "<ul>\n<li>" in html5


def test_parser_directive_selects_profile():
    """site config 'parser: html5' flows into the Readability parse."""
    from graby_spark.extract import process, ExtractOptions
    from graby_spark.siteconfig import parse_lines

    from graby_spark.dom import serialize

    cfg5 = parse_lines(["body: //div[@id='c']", "parser: html5", "prune: no", "tidy: no"])
    cfgx = parse_lines(["body: //div[@id='c']", "prune: no", "tidy: no"])
    html = "<html><body><div id='c'><ul>\n<li>x</li></ul></div></body></html>"
    r5 = process(html, "http://x/", None, site_config=cfg5, options=ExtractOptions(xss_filter=False))
    rx = process(html, "http://x/", None, site_config=cfgx, options=ExtractOptions(xss_filter=False))
    assert "<ul>\n<li>" in serialize(r5.content)
    assert "<ul><li>" in serialize(rx.content)
