"""Baseline JPEG codec tests (graby_spark.operators.jpeg).

encode_jpeg and decode_jpeg are independent implementations of ITU-T
T.81 baseline sequential mode, so round-trips cross-check both.  JPEG is
lossy: exactness is pinned where the math IS exact (block-constant
images under a unit quantizer — a constant block's DCT is DC-only) and
tolerance-bounded elsewhere.
"""

import numpy as np
import pytest

from graby_spark.operators.jpeg import decode_jpeg, encode_jpeg

ONES = np.ones((8, 8))


def test_flat_blocks_exact_under_unit_quant():
    for v in (0, 57, 128, 200, 255):
        img = np.full((16, 24), v, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quant_luma=ONES))
        assert out.shape == (16, 24, 1)
        assert np.array_equal(out[:, :, 0], img), v
    # each 8x8 block its own value (exercises DC-diff coding across blocks)
    rng = np.random.default_rng(5)
    blocks = rng.integers(0, 256, size=(3, 4), dtype=np.uint8)
    img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    out = decode_jpeg(encode_jpeg(img, quant_luma=ONES))
    assert np.array_equal(out[:, :, 0], img)


def test_random_content_near_lossless_under_unit_quant():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant_luma=ONES))[:, :, 0]
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 2  # DCT/IDCT float rounding only

    rgb = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(rgb, quant_luma=ONES, quant_chroma=ONES))
    err = np.abs(out.astype(int) - rgb.astype(int))
    assert err.max() <= 4  # + color-transform rounding


def test_quality_path_and_subsampling():
    xx, yy = np.meshgrid(np.arange(64), np.arange(48))
    grad = ((xx * 2 + yy) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(grad, quality=85))[:, :, 0]
    assert np.abs(out.astype(int) - grad.astype(int)).mean() < 3.0

    flat = np.zeros((32, 32, 3), dtype=np.uint8)
    flat[:, :, 0], flat[:, :, 1], flat[:, :, 2] = 200, 100, 50
    out = decode_jpeg(encode_jpeg(flat, quality=90, subsample=True))
    assert np.abs(out.astype(int) - flat.astype(int)).max() <= 6


def test_odd_sizes_and_shapes():
    rng = np.random.default_rng(5)
    for shape in [(1, 1), (7, 9), (9, 7), (8, 8), (15, 17)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quant_luma=ONES))
        assert out.shape == (*shape, 1)
    # 4:2:0 with odd dims (padding + upsample + crop path)
    img = rng.integers(0, 256, size=(13, 11, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
    assert out.shape == (13, 11, 3)


def test_entropy_segment_byte_stuffing():
    """An image engineered so the entropy stream emits 0xFF bytes (which
    must be stuffed with 0x00 and unstuffed on decode)."""
    rng = np.random.default_rng(123)
    img = rng.integers(0, 256, size=(40, 40), dtype=np.uint8)
    data = encode_jpeg(img, quant_luma=ONES)
    # the stream must contain at least one stuffed 0xFF00 outside markers
    sos = data.index(b"\xff\xda")
    assert b"\xff\x00" in data[sos:]
    out = decode_jpeg(data)[:, :, 0]
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_loud_on_unsupported_modes():
    img = np.zeros((8, 8), dtype=np.uint8)
    data = bytearray(encode_jpeg(img))
    sof = bytes(data).index(b"\xff\xc0")
    data[sof + 1] = 0xC3  # rewrite as lossless SOF3
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))
    data[sof + 1] = 0xC9  # arithmetic-coded extended sequential
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))
    data[sof + 1] = 0xC0
    data[sof + 4] = 12  # 12-bit precision
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0trunc")


def test_progressive_bit_identical_to_baseline():
    """SOF2 and SOF0 streams of the same image with the same quant
    tables carry the same quantized coefficients, so both must decode
    to bit-identical pixels — an exact cross-check of every progressive
    path (spectral bands, successive approximation, EOB runs,
    refinement correction bits) against the sequential decoder."""
    rng = np.random.default_rng(42)
    cases = [
        (rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8), {}),
        (rng.integers(0, 256, size=(33, 29, 3), dtype=np.uint8), dict(quality=50)),
        (rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8),
         dict(quality=70, subsample=True)),
        (rng.integers(0, 256, size=(16, 24), dtype=np.uint8),
         dict(quant_luma=ONES)),
        # dense coefficients (unit quant) — ZRL + long-run refinement paths
        (rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8),
         dict(quant_luma=ONES, quant_chroma=ONES)),
        (rng.integers(0, 256, size=(72, 88, 3), dtype=np.uint8),
         dict(quant_luma=ONES, quant_chroma=ONES, subsample=True)),
        # flat image — maximal shared EOB runs
        (np.full((48, 48, 3), 128, dtype=np.uint8), dict(quality=85)),
        # checkerboard — highest-frequency AC only (band-edge k=63)
        (((np.indices((32, 32)).sum(axis=0) % 2) * 255).astype(np.uint8),
         dict(quant_luma=ONES)),
    ]
    for img, kw in cases:
        base = decode_jpeg(encode_jpeg(img, **kw))
        prog = decode_jpeg(encode_jpeg(img, progressive=True, **kw))
        assert np.array_equal(base, prog), (img.shape, kw)


def test_progressive_exact_on_block_constant():
    """Block-constant images under the unit quantizer are DCT-exact, so
    the progressive stream must round-trip the exact pixels."""
    rng = np.random.default_rng(9)
    blocks = rng.integers(0, 256, size=(4, 4), dtype=np.uint8)
    img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    out = decode_jpeg(encode_jpeg(img, quant_luma=ONES, progressive=True))
    assert np.array_equal(out[:, :, 0], img)


def test_progressive_hand_assembled_stream():
    """A progressive stream assembled by hand from the T.81 spec text —
    four scans over one 8x8 gray block (DC first at Al=1, AC first of
    band [1,63] at Al=1, DC refinement, AC refinement whose only content
    is a correction bit riding an EOB run) — pins the bit conventions
    independently of our encoder.

    Coefficients: DC=80 (DPCM value 40 at Al=1, refinement bit 0),
    AC at zigzag index 1 = 13 (high bits 6 -> 12, correction bit 1)."""

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(0xC2, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    # DC table: single symbol (category 6) with a 1-bit code '0'
    dht_dc = seg(0xC4, bytes([0x00] + [1] + [0] * 15 + [6]))
    # AC table: symbol 0x03 (run 0 / size 3) code '0'; EOB0 code '10'
    dht_ac = seg(0xC4, bytes([0x10] + [1, 1] + [0] * 14 + [0x03, 0x00]))
    # DC first (Ss=0,Se=0,Ah=0,Al=1): code '0' + 6 bits of 40 -> 0101000_1 pad
    scan1 = seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01])) + bytes([0b01010001])
    # AC first (1,63,0,1): '0' + '110' (EXTEND(6,3)=6) + EOB '10' -> 011010_11
    scan2 = seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01])) + bytes([0b01101011])
    # DC refinement (0,0,1,0): one raw bit 0 (80 & 1)
    scan3 = seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10])) + bytes([0b01111111])
    # AC refinement (1,63,1,0): EOB0 '10' + correction bit 1 for the
    # nonzero-history coefficient at k=1 (13 & 1)
    scan4 = seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10])) + bytes([0b10111111])
    stream = (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac
        + scan1 + scan2 + scan3 + scan4 + b"\xff\xd9"
    )
    out = decode_jpeg(stream)
    # expected pixels computed independently: natural-order block with
    # B[0,0]=80, B[0,1]=13 (zigzag index 1), IDCT via the orthonormal basis
    C = np.zeros((8, 8))
    for u in range(8):
        a = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            C[u, x] = 0.5 * a * np.cos((2 * x + 1) * u * np.pi / 16.0)
    B = np.zeros((8, 8))
    B[0, 0], B[0, 1] = 80.0, 13.0
    expected = np.clip(np.round(C.T @ B @ C + 128.0), 0, 255).astype(np.uint8)
    assert np.array_equal(out[:, :, 0], expected)


def test_restart_intervals_both_modes():
    """DRI/RSTn: the encoder emits restart markers (DC predictions and
    EOB runs reset at each boundary) and both decoders resync — decoded
    pixels must equal the marker-free stream's decode exactly."""
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, size=(17, 25), dtype=np.uint8)
    for src, kw in [
        (img, dict(quant_luma=ONES, quant_chroma=ONES)),
        (img, dict(quality=70, subsample=True)),
        (gray, dict(quant_luma=ONES)),
    ]:
        plain = decode_jpeg(encode_jpeg(src, **kw))
        for ri in (1, 2, 5):
            seq = encode_jpeg(src, restart_interval=ri, **kw)
            prog = encode_jpeg(src, restart_interval=ri, progressive=True, **kw)
            assert b"\xff\xdd" in seq and b"\xff\xd0" in seq
            assert b"\xff\xdd" in prog and b"\xff\xd0" in prog
            assert np.array_equal(decode_jpeg(seq), plain), ri
            assert np.array_equal(decode_jpeg(prog), plain), ri


def test_progressive_dispatch_through_decode_image():
    """decode_image routes SOF2 streams through the same JPEG entry."""
    from graby_spark.operators import multimodal

    img = np.full((16, 16), 128, dtype=np.uint8)
    data = encode_jpeg(img, quant_luma=ONES, progressive=True)
    out = multimodal.decode_image(data, strict=True)
    assert out.shape == (16, 16, 1)
    assert float(out.mean()) == 128.0


def test_decode_image_dispatch_and_features():
    """multimodal.decode_image now really decodes JPEG; extract_features
    uses real pixels (a flat gray image featurizes to its level)."""
    from graby_spark.operators import multimodal

    img = np.full((16, 16), 128, dtype=np.uint8)
    data = encode_jpeg(img, quant_luma=ONES)
    out = multimodal.decode_image(data, strict=True)
    assert out.shape == (16, 16, 1)
    assert float(out.mean()) == 128.0


def test_422_chroma_both_modes():
    """4:2:2 (horizontal-only) chroma — the other sampling the web
    serves — round-trips in both coding modes and stays bit-identical
    between them."""
    rng = np.random.default_rng(77)
    img = rng.integers(0, 256, size=(21, 37, 3), dtype=np.uint8)
    seq = encode_jpeg(img, subsample="422", quant_luma=ONES, quant_chroma=ONES)
    sof = seq.index(b"\xff\xc0")
    assert seq[sof + 2 + 2 + 6 + 1] == 0x21  # luma sampling h=2, v=1
    base = decode_jpeg(seq)
    prog = decode_jpeg(
        encode_jpeg(img, subsample="422", quant_luma=ONES, quant_chroma=ONES,
                    progressive=True)
    )
    assert base.shape == (21, 37, 3)
    assert np.array_equal(base, prog)
    flat = np.full((16, 32, 3), 200, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(flat, subsample="422", quality=90))
    assert np.abs(out.astype(int) - 200).max() <= 6
    import pytest as _pytest
    with _pytest.raises(ValueError):
        encode_jpeg(img, subsample="411")
