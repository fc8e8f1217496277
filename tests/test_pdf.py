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


def _mini_pdf_with_objstm(info_in_objstm: bytes) -> bytes:
    """A PDF 1.5-style file: one FlateDecode content stream at top level
    (streams can never live inside an ObjStm) plus an object stream
    carrying the Info dictionary — the modern-producer layout a raw byte
    scan is metadata-blind to."""
    import zlib

    content = zlib.compress(b"BT (Hello ObjStm world) Tj ET")
    # two packed objects: a page-ish dict and the Info dict
    body1 = b"<< /Type /Page >>"
    offsets = f"7 0 8 {len(body1) + 1}".encode()
    packed = offsets + b"\n" + body1 + b"\n" + info_in_objstm
    first = len(offsets) + 1
    objstm = zlib.compress(packed)
    parts = [b"%PDF-1.5\n"]
    parts.append(
        b"1 0 obj << /Length %d /Filter /FlateDecode >> stream\n" % len(content)
        + content
        + b"\nendstream endobj\n"
    )
    parts.append(
        b"2 0 obj << /Type /ObjStm /N 2 /First %d /Length %d /Filter /FlateDecode >> stream\n"
        % (first, len(objstm))
        + objstm
        + b"\nendstream endobj\n"
    )
    parts.append(b"%%EOF\n")
    return b"".join(parts)


def test_objstm_metadata_extracted():
    info = b"<< /Title (Packed Title) /Author (Obj Stm) /CreationDate (D:20240102030405Z) >>"
    pdf = extract_pdf(_mini_pdf_with_objstm(info))
    assert "Hello ObjStm world" in pdf.text
    assert pdf.title == "Packed Title"
    assert pdf.author == "Obj Stm"
    assert pdf.creation_date == "2024-01-02T03:04:05+00:00"


def test_objstm_malformed_headers_never_raise():
    import zlib

    base = _mini_pdf_with_objstm(b"<< /Title (x) >>")
    # corrupt the /First offset beyond the stream; the expander must bail
    broken = base.replace(b"/N 2 /First", b"/N 2 /First 99999 %")
    pdf = extract_pdf(broken)
    assert "Hello ObjStm world" in pdf.text
    # header ints not matching /N
    objstm = zlib.compress(b"7 0\nonly-one-pair-for-n2")
    raw = (
        b"%PDF-1.5\n2 0 obj << /Type /ObjStm /N 2 /First 4 /Length "
        + str(len(objstm)).encode()
        + b" /Filter /FlateDecode >> stream\n"
        + objstm
        + b"\nendstream endobj\n%%EOF"
    )
    assert extract_pdf(raw).title is None
