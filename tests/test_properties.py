"""Hypothesis property tests (SURVEY.md §7 milestone 5): the parser and
pipeline never crash, serialization is stable, charset decode is total."""

from hypothesis import given, settings, strategies as st

from graby_spark.charset import convert_to_utf8
from graby_spark.dom import parse_html, serialize
from graby_spark.extract import ExtractOptions, extract_one
from graby_spark.siteconfig import RuleSet
from graby_spark.textutils import excerpt, validate_date

RULESET = RuleSet({})
OPTS = ExtractOptions(xss_filter=False)


@given(st.text(max_size=2000))
@settings(max_examples=200, deadline=None)
def test_parser_never_crashes(text):
    doc = parse_html(text)
    serialize(doc)


@given(st.binary(max_size=2000))
@settings(max_examples=200, deadline=None)
def test_charset_decode_total(data):
    out = convert_to_utf8(data, "text/html")
    assert isinstance(out, str)
    out2 = convert_to_utf8(data, "text/html; charset=utf-8")
    assert isinstance(out2, str)


@given(st.binary(max_size=1500))
@settings(max_examples=100, deadline=None)
def test_extract_one_total(data):
    r = extract_one(data, "http://prop.example/x", RULESET, options=OPTS)
    assert isinstance(r.html, str)
    assert isinstance(r.summary, str)
    assert r.title is not None


@given(st.text(max_size=1000))
@settings(max_examples=200, deadline=None)
def test_excerpt_total_and_bounded(text):
    out = excerpt(text)
    # cut outputs stay near the 250-char limit + separator slack
    assert len(out) <= max(len(text), 0) + 20


@given(st.text(max_size=40))
@settings(max_examples=200, deadline=None)
def test_validate_date_total(text):
    result = validate_date(text)
    assert result is None or "T" in result


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=500))
@settings(max_examples=100, deadline=None)
def test_serialize_reparse_stable(text):
    """Serializing a parsed doc and reparsing reaches a fixpoint."""
    once = serialize(parse_html(text))
    twice = serialize(parse_html(once))
    assert serialize(parse_html(twice)) == twice


@given(st.text(max_size=3000))
@settings(max_examples=300, deadline=None)
def test_fast_parser_matches_stdlib(text):
    """The fast tokenizer and html.parser build identical trees."""
    fast = serialize(parse_html(text, engine="fast"))
    std = serialize(parse_html(text, engine="stdlib"))
    assert fast == std


@given(
    st.lists(
        st.sampled_from(
            [
                "<div>", "</div>", "<p class='a'>", "</p>", "text & more",
                "<img src=x>", "<br/>", "<script>var a = '<div>';</script>",
                "<!-- comment -->", "<a href=\"x?a=1&b=2\">", "</a>",
                "&amp; &lt; &#65; &unknown;", "<I>", "</I>", "<td>", "<ul><li>one<li>two",
                "<span style='x'>", "</span>", "<input value='\"quoted\"'>",
            ]
        ),
        max_size=30,
    )
)
@settings(max_examples=300, deadline=None)
def test_fast_parser_matches_stdlib_structured(parts):
    html = "".join(parts)
    assert serialize(parse_html(html, engine="fast")) == serialize(
        parse_html(html, engine="stdlib")
    )


def test_fast_parser_matches_stdlib_on_all_recorded_pages():
    """Engine equivalence over every recorded real-world page (not just
    the three goldens): identical serialized trees."""
    import os

    content = os.path.join(os.path.dirname(__file__), "..", "fixtures", "content")
    checked = 0
    for name in sorted(os.listdir(content)):
        if not name.endswith((".html", ".txt")) or name == "README":
            continue
        with open(os.path.join(content, name), "rb") as fh:
            html = fh.read().decode("utf-8", "replace")
        fast = serialize(parse_html(html, engine="fast"))
        std = serialize(parse_html(html, engine="stdlib"))
        assert fast == std, name
        checked += 1
    assert checked >= 15


def _excerpt_reference(text, length=250, separator=" &hellip;"):
    """The pre-fast-path excerpt pipeline, kept verbatim as the oracle for
    the prefix early-exit (textutils._excerpt_from_prefix)."""
    from graby_spark.textutils import _TAG_RE, _EDGE_SPACE_RE, _WS_RUN_RE

    text = _TAG_RE.sub(" ", text)
    text = _EDGE_SPACE_RE.sub("", text)
    text = _WS_RUN_RE.sub(" ", text).strip(" ")
    if len(text) > length:
        breakpoint_ = text.find(" ", length)
        if breakpoint_ < 0:
            return text
        return text[:breakpoint_].rstrip() + separator
    return text


@given(
    st.lists(
        st.one_of(
            st.text(alphabet=" \t\r\n\xa0 ab<>/c", max_size=30),
            st.sampled_from(["<p class='x'>", "</p>", "<br/>", "word "]),
        ),
        max_size=400,
    )
)
@settings(max_examples=300, deadline=None)
def test_excerpt_fast_path_matches_full(parts):
    # pad with a long tail so len(text) > 8192 takes the prefix fast path
    text = "".join(parts) + ("<i>t</i> tail word " * 600)
    assert excerpt(text) == _excerpt_reference(text)


@given(st.text(alphabet=" \t\r\n\x0b\x0c\xa0<>/abc", max_size=600))
@settings(max_examples=300, deadline=None)
def test_plain_text_matches_regex_twin(text):
    import re

    from graby_spark.extract import _plain_text

    tag = re.compile(r"<[^>]+>")
    ws = re.compile(r"[ \t\r\n]+")
    expected = ws.sub(" ", tag.sub(" ", text)).strip()
    assert _plain_text(text) == expected


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 12),
    st.integers(1, 12),
    st.sampled_from([1, 2, 3, 4]),
    st.booleans(),
    st.randoms(use_true_random=False),
)
def test_png_roundtrip_property(h, w, c, interlace, rnd):
    """encode_png∘decode_png is the identity for any uint8 array, any
    shape/channel-count, interlaced or not (independent per-spec filter
    and unfilter implementations)."""
    import numpy as np

    from graby_spark.operators.multimodal import decode_png, encode_png

    arr = np.array(
        [rnd.randrange(256) for _ in range(h * w * c)], dtype=np.uint8
    ).reshape(h, w, c)
    back = decode_png(encode_png(arr, interlace=interlace))
    assert np.array_equal(back, arr)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 12),
    st.integers(1, 12),
    st.integers(1, 6),
    st.booleans(),
    st.randoms(use_true_random=False),
)
def test_gif_roundtrip_property(h, w, ncol, interlace, rnd):
    """encode_gif∘decode_gif is the identity for any palette image (the
    LZW pair including width growth and the KwKwK case)."""
    import numpy as np

    from graby_spark.operators.multimodal import decode_gif, encode_gif

    pal = np.array(
        sorted({tuple(rnd.randrange(256) for _ in range(3)) for _ in range(ncol)}),
        dtype=np.uint8,
    )
    idx = np.array(
        [rnd.randrange(len(pal)) for _ in range(h * w)], dtype=np.uint8
    ).reshape(h, w)
    rgb = pal[idx]
    back = decode_gif(encode_gif(rgb, interlace=interlace))
    assert np.array_equal(back, rgb)


@settings(max_examples=30, deadline=None)
@given(
    st.integers(1, 200),
    st.integers(1, 3),
    st.randoms(use_true_random=False),
)
def test_wav_roundtrip_property(n, ch, rnd):
    """encode_wav∘decode_wav is the identity for any 16-bit PCM clip."""
    import numpy as np

    from graby_spark.operators.multimodal import decode_wav, encode_wav

    s = np.array(
        [rnd.randrange(-32768, 32768) for _ in range(n * ch)], dtype=np.int16
    ).reshape(n, ch)
    rate, back = decode_wav(encode_wav(s, 16000))
    assert rate == 16000 and np.array_equal(back, s.astype(np.int32))


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 4),
    st.integers(1, 4),
    st.randoms(use_true_random=False),
)
def test_jpeg_block_constant_exact_property(nbx, nby, rnd):
    """Baseline JPEG is bit-exact on 8x8 block-constant gray images under
    a unit quantizer — the DC-only invariant the oracle leans on — for
    ANY block values and grid shape."""
    import numpy as np

    from graby_spark.operators.jpeg import decode_jpeg, encode_jpeg

    blocks = np.array(
        [rnd.randrange(256) for _ in range(nbx * nby)], dtype=np.uint8
    ).reshape(nby, nbx)
    img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    out = decode_jpeg(encode_jpeg(img, quant_luma=np.ones((8, 8))))
    assert np.array_equal(out[:, :, 0], img)


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=200), st.integers(0, 5))
def test_media_decoders_total_on_garbage(data, which):
    """Every decoder is TOTAL on malformed input: random bytes behind a
    valid magic either decode or raise ValueError/NotImplementedError —
    never any other exception, never a hang (the crawl-scale safety
    property: one corrupt payload must not kill an executor)."""
    from graby_spark.operators.jpeg import decode_jpeg
    from graby_spark.operators.multimodal import (
        decode_gif_frames,
        decode_png,
        decode_wav,
        mp4_metadata,
    )

    prefixes = [
        b"\x89PNG\r\n\x1a\n",
        b"GIF89a",
        b"\xff\xd8\xff\xe0",
        b"RIFF\x20\x00\x00\x00WAVE",
        b"\x00\x00\x00\x14ftypisom",
        b"",
    ]
    decoders = [
        decode_png,
        lambda d: decode_gif_frames(d, max_frames=4),
        decode_jpeg,
        decode_wav,
        mp4_metadata,
        decode_png,
    ]
    payload = prefixes[which] + data
    try:
        decoders[which](payload)
    except (ValueError, NotImplementedError):
        pass


@given(st.binary(max_size=3000))
@settings(max_examples=200, deadline=None)
def test_warc_family_parsers_total(data):
    """Arbitrary bytes through the gzip-member walk and all three WARC
    record parsers (response/conversion/metadata) terminate without
    raising — corrupt archives degrade to fewer records, never to a
    failed Spark task."""
    from graby_spark.sources.warc import (
        _iter_members,
        _parse_records,
        _parse_wet,
        _parse_wat,
    )

    for member in _iter_members(data):
        list(_parse_records(member))
        list(_parse_wet(member))
        list(_parse_wat(member))


@given(st.binary(max_size=2000))
@settings(max_examples=200, deadline=None)
def test_avi_parser_total(data):
    """parse_avi on arbitrary bytes either returns a dict or raises
    ValueError — never hangs, never raises anything else."""
    from graby_spark.operators.avi import parse_avi

    try:
        meta = parse_avi(data)
    except ValueError:
        return
    assert isinstance(meta["frames"], list)


@given(st.binary(min_size=0, max_size=1000))
@settings(max_examples=100, deadline=None)
def test_avi_parser_total_behind_valid_magic(tail):
    """Garbage BEHIND a valid RIFF/AVI magic still terminates: either a
    parsed dict (possibly zero frames) or ValueError."""
    from graby_spark.operators.avi import parse_avi

    data = b"RIFF" + (len(tail) + 4).to_bytes(4, "little") + b"AVI " + tail
    try:
        meta = parse_avi(data)
        assert isinstance(meta["frames"], list)
    except ValueError:
        pass


@given(st.binary(max_size=800))
@settings(max_examples=150, deadline=None)
def test_webp_decoder_total(tail):
    """Arbitrary bytes behind a valid RIFF/WEBP container frame either
    decode, raise ValueError, or raise NotImplementedError (documented
    subset boundaries) — never hang or fail another way."""
    from graby_spark.operators.webp import decode_webp

    riff = b"WEBPVP8L" + len(tail).to_bytes(4, "little") + tail
    data = b"RIFF" + len(riff).to_bytes(4, "little") + riff
    try:
        out = decode_webp(data)
        assert out.ndim == 3 and out.shape[2] == 4
    except (ValueError, NotImplementedError):
        pass


@given(st.binary(max_size=600))
@settings(max_examples=150, deadline=None)
def test_exif_parser_total(tail):
    """parse_exif on arbitrary bytes behind a JPEG SOI (including a
    fake APP1/Exif header) always returns the dict — never raises."""
    from graby_spark.operators.exif import parse_exif

    for data in (
        tail,
        b"\xff\xd8" + tail,
        b"\xff\xd8\xff\xe1" + len(tail).to_bytes(2, "big") + b"Exif\x00\x00" + tail,
    ):
        out = parse_exif(data)
        assert set(out) >= {"orientation", "gps_lat", "gps_lon"}


@given(st.binary(max_size=800))
@settings(max_examples=150, deadline=None)
def test_ico_tiff_bmp_parsers_total(tail):
    """Arbitrary bytes behind the ICO/TIFF/BMP magics decode, raise
    ValueError, or raise NotImplementedError — never anything else."""
    from graby_spark.operators.multimodal import decode_bmp, decode_ico, decode_tiff

    for fn, prefix in (
        (decode_ico, b"\x00\x00\x01\x00"),
        (decode_tiff, b"II*\x00"),
        (decode_tiff, b"MM\x00*"),
        (decode_bmp, b"BM"),
    ):
        try:
            fn(prefix + tail)
        except (ValueError, NotImplementedError):
            pass


@given(st.binary(max_size=600))
@settings(max_examples=150, deadline=None)
def test_flac_parser_total(tail):
    """Arbitrary bytes behind the fLaC magic (and a valid STREAMINFO
    header shape) decode or raise ValueError — never hang or fail
    another way (CRC checks catch garbage frames)."""
    from graby_spark.operators.flac import decode_flac

    for data in (b"fLaC" + tail, tail):
        try:
            decode_flac(data, max_samples=4096)
        except ValueError:
            pass


@given(st.text(max_size=3000))
@settings(max_examples=200, deadline=None)
def test_doc_tables_total(text):
    """Table extraction is total over arbitrary text: a crash inside the
    mapInPandas batch would kill the whole task at corpus scale."""
    from graby_spark.operators.tables import doc_tables

    for rows in doc_tables(text):
        for is_header, cells in rows:
            assert isinstance(is_header, bool)
            assert all(isinstance(c, str) for c in cells)


_TABLE_BITS = st.lists(
    st.sampled_from(
        [
            "<table>", "</table>", "<tr>", "</tr>", "<td>", "</td>",
            "<th>", "</th>", "<thead>", "</thead>", "<tbody>", "</tbody>",
            '<td colspan="2">', '<td rowspan="3">', '<td colspan="999999">',
            '<td rowspan="-1">', "text", "<p>x</p>", "<div>",
        ]
    ),
    max_size=60,
)


@given(_TABLE_BITS)
@settings(max_examples=200, deadline=None)
def test_doc_tables_structured_soup_total(bits):
    """Adversarial table-tag soup (orphan cells, giant/negative spans,
    unclosed sections) never crashes and never produces a ragged row
    wider than the span clamp allows."""
    from graby_spark.operators.tables import doc_tables

    for rows in doc_tables("".join(bits)):
        for _, cells in rows:
            assert len(cells) <= 4000  # spans clamp at 1000 per cell
