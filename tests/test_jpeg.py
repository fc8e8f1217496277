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
    data[sof + 1] = 0xC2  # rewrite as progressive SOF2
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


def test_decode_image_dispatch_and_features():
    """multimodal.decode_image now really decodes JPEG; extract_features
    uses real pixels (a flat gray image featurizes to its level)."""
    from graby_spark.operators import multimodal

    img = np.full((16, 16), 128, dtype=np.uint8)
    data = encode_jpeg(img, quant_luma=ONES)
    out = multimodal.decode_image(data, strict=True)
    assert out.shape == (16, 16, 1)
    assert float(out.mean()) == 128.0
