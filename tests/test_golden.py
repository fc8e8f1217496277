"""Golden end-to-end parity vs the reference's own fixtures
(fixtures/sites/*.test, the byte-identical oracle from
tests/GrabyTest.php:81-97 / BASELINE.json north_rule)."""

import re

import pytest

from .golden import load_golden, run_golden


def plain_text(html: str) -> str:
    text = re.sub(r"<[^>]+>", " ", html)
    return re.sub(r"[ \t\r\n]+", " ", text).strip()


CASES = ["lemonde", "blogger", "lifehacker"]


@pytest.fixture(scope="module")
def results():
    out = {}
    for name in CASES:
        case = load_golden(name)
        out[name] = (case, run_golden(case))
    return out


@pytest.mark.parametrize("name", CASES)
def test_title_exact(results, name):
    case, r = results[name]
    assert r.title == case.title


@pytest.mark.parametrize("name", CASES)
def test_language_exact(results, name):
    case, r = results[name]
    assert (r.language or "") == case.language


@pytest.mark.parametrize("name", CASES)
def test_author_exact(results, name):
    case, r = results[name]
    got = r.authors[0] if r.authors else ""
    assert got == case.author


@pytest.mark.parametrize("name", CASES)
def test_summary_byte_exact(results, name):
    case, r = results[name]
    assert r.summary == case.summary


@pytest.mark.parametrize("name", ["lemonde", "blogger"])
def test_extracted_text_byte_exact(results, name):
    """north_rule: byte-identical extracted text per url."""
    case, r = results[name]
    assert plain_text(r.html) == plain_text(case.parsed_content)


def test_lifehacker_text_byte_exact(results):
    case, r = results["lifehacker"]
    assert plain_text(r.html) == plain_text(case.parsed_content)


@pytest.mark.parametrize("name", ["lemonde", "blogger"])
def test_html_byte_exact(results, name):
    """FULL PARSED_CONTENT byte parity (tests/GrabyTest.php:97)."""
    case, r = results[name]
    assert r.html == case.parsed_content


def test_lifehacker_html_byte_exact(results):
    case, r = results["lifehacker"]
    assert r.html == case.parsed_content


@pytest.mark.parametrize("name", CASES)
def test_effective_url(results, name):
    case, r = results[name]
    assert r.effective_url == case.url_effective


def test_trace_names_fired_rules(results):
    """Per-document step trace (Monolog analog, GrabyHandler.php:19-63):
    with trace=True the row records which site-config rules fired and
    which fallback path produced the body; with trace off (the golden
    fixture runs above) the trace list stays empty — zero overhead."""
    import os

    from graby_spark.extract import ExtractOptions, extract_one
    from graby_spark.siteconfig import load_ruleset

    from .golden import FIXTURES, load_golden

    ruleset = load_ruleset(os.path.join(FIXTURES, "site_config"))
    case = load_golden("lifehacker")
    r = extract_one(
        case.raw_content,
        case.url,
        ruleset,
        content_type=case.header,
        options=ExtractOptions(xss_filter=False, trace=True),
    )
    assert r.is_success
    joined = "\n".join(r.trace)
    # the matched site-config body pattern is named verbatim; the author
    # comes from the JSON-LD path on this fixture (defined-information)
    assert "body: siteconfig //div[contains(concat(' ',normalize-space(@class),' '),' main__content ')]" in r.trace
    assert any(t.startswith("defined: og/json-ld") for t in r.trace)
    assert "config: host=www.lifehacker.com.au" in r.trace
    # find_string fired (the refresh-suppression rewrite) and strips counted
    assert any(t.startswith("find_string:") for t in r.trace)
    assert any(t.startswith("strip_id_or_class: meta__second-row") for t in r.trace)
    assert joined.endswith("result: success=True")

    # trace off -> empty journal on the same document
    _, quiet = results["lifehacker"]
    assert quiet.trace == []

    # lemonde has no site config: the trace shows the autodetect path
    lemonde = load_golden("lemonde")
    r2 = extract_one(
        lemonde.raw_content,
        lemonde.url,
        ruleset,
        content_type=lemonde.header,
        options=ExtractOptions(xss_filter=False, trace=True),
    )
    assert "config: host=www.lemonde.fr" in r2.trace
    assert any(t.startswith("body: ") for t in r2.trace)


def test_spans_point_into_source(results):
    """north_star output contract: `spans` gives source-character offsets
    of the extracted content blocks."""
    from graby_spark.charset import convert_to_utf8
    from graby_spark.textutils import pre_clean

    case, r = results["lemonde"]
    assert r.spans, "lemonde extraction must carry source spans"
    html = pre_clean(convert_to_utf8(case.raw_content, case.header))
    start, end = r.spans[0]
    assert html[start:end].startswith('<div id="articleBody"')
    assert html[start:end].endswith("</div>")
