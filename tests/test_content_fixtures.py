"""Recorded-content functional tests, ported from tests/GrabyTest.php
content-fixture cases (:1097-1377) and GrabyFunctionalTest.php replayed
bodies — real pages driven through the full pipeline."""

import os

import pytest

from graby_spark.extract import ExtractOptions, extract_one
from graby_spark.siteconfig import RuleSet, load_ruleset

CONTENT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "content")
FIXTURE_CONFIGS = load_ruleset(os.path.join(os.path.dirname(__file__), "..", "fixtures", "site_config"))
NO_CONFIGS = RuleSet({})


def fetch(filename, url, ruleset=NO_CONFIGS, content_type="text/html", **opts):
    with open(os.path.join(CONTENT, filename), "rb") as fh:
        body = fh.read()
    options = ExtractOptions(**opts)
    return extract_one(body, url, ruleset, content_type=content_type, options=options)


EXPECTED = os.path.join(os.path.dirname(__file__), "..", "fixtures", "expected")


@pytest.mark.parametrize(
    ("filename", "url", "content_type", "use_configs"),
    [
        ("framablog.html",
         "https://framablog.org/2017/12/02/avancer-ensemble-vers-la-contribution/",
         "text/html; charset=utf-8", True),
        ("rollingstone.html",
         "https://www.rollingstone.com/?redirurl=/politics/news/greed-and-debt-20120829",
         "text/html", True),
        ("https___www.clubic.com_carte-graphique_carte-graphique-amd_article-478936-1-radeon-hd-7750-7770.html",
         "https://www.clubic.com/carte-graphique/carte-graphique-amd/article-478936-1-radeon-hd-7750-7770.html",
         "text/html; charset=UTF-8", True),
    ],
)
def test_full_html_snapshot_parity(filename, url, content_type, use_configs):
    """FULL-HTML byte pins on three rich-markup fixtures beyond the three
    .test goldens (r02 VERDICT #9).  The reference publishes no full-HTML
    golden for these (its own tests assert substrings, ported elsewhere in
    this file), so these are ENGINE SNAPSHOTS (fixtures/expected/*) — their
    job is to freeze the whole serializer/tidy-emulation surface so a
    refit for a new host config cannot silently change output on existing
    rich pages."""
    ruleset = FIXTURE_CONFIGS if use_configs else NO_CONFIGS
    r = fetch(filename, url, ruleset=ruleset, content_type=content_type, xss_filter=False)
    assert r.is_success
    name = filename.replace(".html", "") + ".expected.html"
    with open(os.path.join(EXPECTED, name), encoding="utf-8") as fh:
        expected = fh.read()
    assert r.html == expected


def test_bad_url_404_page():
    """GrabyTest::testBadUrl — 404 page has a title but no real article.

    The reference fails extraction entirely (libxml's recovery collapses
    the svg-laden blogspot tree); our parser recovers the tree, so the
    readability fallback yields the page shell instead — we pin the title
    parity and that no script text leaks into the content."""
    r = fetch("bjori-404.html", "https://bjori.blogspot.com/201")
    assert r.title == "bjori doesn't blog"
    assert "document.addEventListener" not in r.html
    assert not r.language
    assert not r.image


@pytest.mark.parametrize(
    ("url", "filename", "expected"),
    [
        (
            # the reference test expects the dateModified (22:09:59) because
            # it runs with the production graby-site-config corpus (external
            # composer dep, not vendored) whose lemonde.fr date rule
            # overrides JSON-LD; without a site config the documented
            # JSON-LD precedence (datePublished last, ContentExtractor.php
            # :1470-1479) yields 22:09:18
            "https://www.lemonde.fr/economie/article/2011/07/05/moody-s-abaisse-la-note-du-portugal-de-quatre-crans_1545237_3234.html",
            "lemonde-date.html",
            "2011-07-05T22:09:18+02:00",
        ),
        (
            "https://www.20minutes.fr/sport/football/2282359-20180601-video-france-italie-bleus-ambiancent-regalent-va-essayer-trop-enflammer",
            "20minutes-date.html",
            "2018-06-01T23:03:11+02:00",
        ),
    ],
)
def test_dates(url, filename, expected):
    r = fetch(filename, url)
    assert r.date == expected


@pytest.mark.parametrize(
    ("url", "filename", "expected"),
    [
        (
            "https://www.20minutes.fr/sport/football/2282359-20180601-video-france-italie-bleus-ambiancent-regalent-va-essayer-trop-enflammer",
            "20minutes-authors.html",
            ["Jean Saint-Marc"],
        ),
        (
            "https://www.liberation.fr/planete/2017/04/05/donald-trump-et-xi-jinping-tentative-de-flirt-en-floride_1560768",
            "liberation-authors.html",
            ["Raphaël Balenieri", "Frédéric Autran"],
        ),
    ],
)
def test_authors(url, filename, expected):
    r = fetch(filename, url, ruleset=FIXTURE_CONFIGS)
    assert r.authors == expected


def test_jsonld_20minutes():
    r = fetch(
        "20minutes-jsonld.html",
        "http://www.20minutes.fr/sport/football/2155935-20171022-stade-rennais-portugais-paulo-fonseca-remplacer-christian-gourcuff",
    )
    assert r.title == "Stade Rennais: Le Portugais Paulo Fonseca pour remplacer Christian Gourcuff?"
    assert r.authors == ["Jeremy Goujon"]
    assert r.summary


def test_meta_author_keithjgrant():
    r = fetch("keithjgrant.html", "https://keithjgrant.com/posts/2018/06/resilient-declarative-contextual/")
    assert r.authors == ["Keith J. Grant"]


def test_empty_nodes_removed_framablog():
    r = fetch("framablog.html", "https://framablog.org/2017/12/02/avancer-ensemble-vers-la-contribution/")
    assert "<figure><p>Après un <em>icebreaker</em>" not in r.html


def test_empty_img_nodes_preserved():
    r = fetch("empty-img-node.html", "https://example.com/empty-img-node")
    assert '<img src="https://example.com/empty.jpg" alt="Empty node image" />' in r.html


def test_keep_ol_start_attribute():
    r = fetch("timothysykes-keepol.html", "https://www.timothysykes.com/blog/10-things-know-short-selling/",
              ruleset=FIXTURE_CONFIGS)
    for start in ("2", "3", "4"):
        assert f'<ol start="{start}">' in r.html, start


def test_too_long_html_jit():
    r = fetch("blog-oracle.html", "https://blogs.oracle.com/dave/java-contended-annotation-to-help-reduce-false-sharing")
    assert r.summary != "[unable to retrieve full-text content]"
    assert r.title != "No title found"


def test_korean_page():
    r = fetch(
        "http___www.newstown.co.kr_news_articleView.html_idxno_243722.html",
        "http://www.newstown.co.kr/news/articleView.html?idxno=243722",
        content_type="text/html; charset=UTF-8",
    )
    assert "에르보리앙" in (r.title or "")
    assert "프랑스 현대적 자연주의 브랜드" in r.summary


def test_lemonde_real_page():
    r = fetch(
        "https___www.lemonde.fr_actualite-medias_article_2015_04_12_radio-france-vers-une-sortie-du-conflit_4614610_3236.html",
        "https://www.lemonde.fr/actualite-medias/article/2015/04/12/radio-france-vers-une-sortie-du-conflit_4614610_3236.html",
        content_type="text/html; charset=UTF-8",
    )
    assert r.title == "Grève à Radio France : vers une sortie du conflit ?"
    assert r.language == "fr"
    assert r.summary


def test_malformed_utf8_textplain():
    r = fetch(
        "malformed_UTF8_characters.txt",
        "http://www.ais.org/~jrh/acn/text/ACN8-1.txt",
        content_type="text/plain",
    )
    # must produce valid JSON-encodable text (GrabyTest:1097-1103)
    import json

    assert json.dumps(r.html)
    assert r.html.startswith("<pre>")


def test_footnotes_mode():
    """content_links=footnotes (O3): links gain numbered references and an
    appended references list; wikipedia is skipped (Graby.php:226-228)."""
    body = b'<html><body><div itemprop="articleBody"><p>Read <a href="http://ext.example/ref">the source</a> for all of the details about this topic.</p></div></body></html>'
    from graby_spark.extract import extract_one

    r = extract_one(body, "http://a.com/x", NO_CONFIGS,
                    options=ExtractOptions(xss_filter=False, content_links="footnotes"))
    assert '<sup>[1]</sup>' in r.html
    assert 'id="readability-footnotes"' in r.html
    assert 'href="#readabilityFootnoteLink-1"' in r.html

    r2 = extract_one(body, "http://en.wikipedia.org/x", NO_CONFIGS,
                     options=ExtractOptions(xss_filter=False, content_links="footnotes"))
    assert "readability-footnotes" not in r2.html


def test_content_links_remove_mode():
    body = b'<html><body><div itemprop="articleBody"><p>Read <a href="http://e/r">the source</a> for all the details about this topic today.</p></div></body></html>'
    from graby_spark.extract import extract_one

    r = extract_one(body, "http://a.com/x", NO_CONFIGS,
                    options=ExtractOptions(xss_filter=False, content_links="remove"))
    assert "<a " not in r.html and "the source" in r.html


@pytest.mark.parametrize(
    ("filename", "url", "content_type"),
    [
        # if_page_contains-gated next_page_link (GrabyTest:1300-1320)
        ("rollingstone.html", "https://www.rollingstone.com/?redirurl=/politics/news/greed-and-debt-20120829", "text/html"),
        # if_page_contains-gated single_page_link (GrabyTest:1278-1297)
        ("timothysykes-keepol.html", "https://www.timothysykes.com/blog/10-things-know-short-selling/", "text/html"),
        # saveXML unknown-encoding page (GrabyFunctionalTest:235)
        ("https___www.motherjones.com_politics_2012_02_mac-mcclelland-free-online-shipping-warehouses-labor_.html",
         "https://www.motherjones.com/politics/2012/02/mac-mcclelland-free-online-shipping-warehouses-labor/", "text/html; charset=UTF-8"),
        # empty replace_string in site config (GrabyFunctionalTest:253)
        ("https___www.presseportal.de_pm_103258_2930232.html", "https://www.presseportal.de/pm/103258/2930232", "text/html; charset=utf-8"),
        # multipage page-1 content (GrabyFunctionalTest:194)
        ("https___www.clubic.com_carte-graphique_carte-graphique-amd_article-478936-1-radeon-hd-7750-7770.html",
         "https://www.clubic.com/carte-graphique/carte-graphique-amd/article-478936-1-radeon-hd-7750-7770.html", "text/html; charset=UTF-8"),
    ],
)
def test_fixture_pages_extract_successfully(filename, url, content_type):
    r = fetch(filename, url, ruleset=FIXTURE_CONFIGS, content_type=content_type)
    assert r.summary is not None
    assert r.is_success
    assert r.title and r.title != "No title found"


def test_xataka_jsonld_utf8():
    """JSON-LD must be processed as UTF-8 (GrabyFunctionalTest:272-292,
    graby issue #359)."""
    r = fetch(
        "https___www.xataka.com_movilidad_coches-vendidos-2023-2024-espana.html",
        "https://www.xataka.com/movilidad/coches-vendidos-2023-2024-espana",
        ruleset=FIXTURE_CONFIGS,
        content_type="text/html; charset=UTF-8",
    )
    assert "automóvil" in r.html


def test_clubic_content():
    """GrabyFunctionalTest::testMultipage asserts the 2560x1600 benchmark
    table reached the output (the modern capture carries all pages' content
    on page 1 — no 'Page suivante' anchors remain in this recording)."""
    r = fetch(
        "https___www.clubic.com_carte-graphique_carte-graphique-amd_article-478936-1-radeon-hd-7750-7770.html",
        "https://www.clubic.com/carte-graphique/carte-graphique-amd/article-478936-1-radeon-hd-7750-7770.html",
        ruleset=FIXTURE_CONFIGS,
        content_type="text/html; charset=UTF-8",
    )
    assert "Radeon HD 7750/7770" in (r.title or "")
    assert "2560x1600" in r.html


@pytest.mark.parametrize("filename", sorted(os.listdir(CONTENT)))
def test_every_recorded_page_extracts_without_error(filename):
    """Robustness sweep: every recorded body (html, pdf, jpg, txt) runs the
    full pipeline without raising and yields a coherent result row."""
    if filename == "README":
        return
    ct = "text/html"
    if filename.endswith(".pdf"):
        ct = "application/pdf"
    elif filename.endswith(".jpg"):
        ct = "image/jpeg"
    elif filename.endswith(".txt"):
        ct = "text/plain"
    r = fetch(filename, f"https://sweep.example/{filename}", ruleset=FIXTURE_CONFIGS, content_type=ct)
    assert isinstance(r.html, str)
    assert isinstance(r.summary, str)
    assert r.title is not None


def test_gist_xss_scripts_removed():
    """GrabyTest::testContentWithXSS — no <script> survives the XSS filter."""
    r = fetch(
        "gist-xss.html",
        "https://gist.githubusercontent.com/nicosomb/94d1e08c42baff9184c313d638de1195/raw/x/gistfile1.txt",
        xss_filter=True,
    )
    assert "<script>" not in r.html


def test_xss_denied_attributes():
    """GrabyTest::testCleanupHtmlRemovesDeniedXssAttributes pins."""
    from graby_spark.extract import extract_one

    html = (
        b"<article>"
        b'<div style="position:fixed;inset:0;z-index:2147483647;background:#fff">overlay</div>'
        b'<iframe src="https://example.com/embed" srcdoc="&lt;script&gt;alert(document.domain)&lt;/script&gt;"></iframe>'
        b'<img src="x" onerror="alert(1)" />'
        b"</article>"
    )
    r = extract_one(html, "http://0.0.0.0/", NO_CONFIGS, options=ExtractOptions(xss_filter=True))
    assert "<div>overlay</div>" in r.html
    assert 'style=' not in r.html
    assert 'srcdoc=' not in r.html
    assert 'onerror=' not in r.html
    # deviations from the reference pin, both deliberate: we absolutize the
    # img src (O2 applies uniformly) and D27 marks the childless iframe
    assert '<img src="http://0.0.0.0/x" alt="image" />' in r.html
    assert '<iframe src="https://example.com/embed">' in r.html
