"""PDF route (M5) tests against the reference PDF fixtures
(GrabyFunctionalTest::testPdfFile expectations)."""

import os

from graby_spark.extract import ExtractOptions, extract_one
from graby_spark.pdf import extract_pdf
from graby_spark.siteconfig import RuleSet

FIXTURES = os.path.join(os.path.dirname(__file__), "..", "fixtures")


def load(path):
    with open(os.path.join(FIXTURES, path), "rb") as fh:
        return fh.read()


def test_documentation_pdf():
    """GrabyFunctionalTest.php:82-101 expectations."""
    data = load("content/http___img3.free.fr_im_tv_telesites_documentation.pdf")
    r = extract_one(
        data,
        "http://img3.free.fr/im_tv/telesites/documentation.pdf",
        RuleSet({}),
        content_type="application/pdf",
    )
    assert r.title == "PDF"
    assert r.date == "2008-03-05T17:56:07+01:00"
    assert r.authors == []
    assert "Free 2008" in r.html
    assert "Free 2008" in r.summary
    assert not r.image


def test_document1_metadata():
    for name in ("document1.pdf", "Document1_pdfcreator.pdf"):
        pdf = extract_pdf(load(name))
        assert pdf.title == "Document1"
        assert pdf.author == "Sebastien MALOT"
        assert pdf.creation_date.startswith("2013-09-01")
        assert "Lorem ipsum dolor sit amet" in pdf.text


def test_document1_through_pipeline():
    r = extract_one(
        load("document1.pdf"),
        "http://example.com/document1.pdf",
        RuleSet({}),
        content_type="application/pdf",
    )
    assert r.title == "Document1"
    assert r.authors == ["Sebastien MALOT"]
    assert r.date == "2013-09-01T22:20:38+02:00"
    assert "Lorem ipsum" in r.html


def test_garbage_pdf_never_raises():
    for data in (b"", b"%PDF-1.4 garbage", b"not a pdf", b"%PDF" + b"\x00" * 100):
        pdf = extract_pdf(data)
        assert isinstance(pdf.text, str)
