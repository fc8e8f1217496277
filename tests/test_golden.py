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
