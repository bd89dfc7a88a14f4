"""Lossless JPEG (T.81 Annex H, SOF3) gates: the defining property is
BIT-IDENTICAL roundtrip — no PSNR, no tolerance."""

import numpy as np
import pytest

from proj_spark.sources.jpeg import decode_jpeg
from proj_spark.sources.jpeg_lossless import encode_jpeg_lossless, predict


@pytest.mark.parametrize("sel", range(1, 8))
def test_lossless_roundtrip_every_predictor(sel):
    rng = np.random.default_rng(sel)
    img = rng.integers(0, 256, (37, 29, 3)).astype(np.uint8)
    data = encode_jpeg_lossless(img, predictor=sel)
    assert data[:2] == b"\xff\xd8" and b"\xff\xc3" in data  # SOF3
    assert np.array_equal(decode_jpeg(data), img)


def test_lossless_compresses_smooth_and_handles_extremes():
    from proj_spark.sources.datagen import raster_smooth_for

    sm = raster_smooth_for(42, 64, 48)
    data = encode_jpeg_lossless(sm, 4)
    assert len(data) < sm.size  # beats raw on smooth content
    assert np.array_equal(decode_jpeg(data), sm)
    # all-extreme values stress the category ladder (diff = +-255)
    hard = np.zeros((16, 16, 3), dtype=np.uint8)
    hard[::2, ::2] = 255
    for sel in (1, 4, 7):
        assert np.array_equal(
            decode_jpeg(encode_jpeg_lossless(hard, sel)), hard)


def test_lossless_grayscale_and_errors():
    rng = np.random.default_rng(9)
    g = rng.integers(0, 256, (20, 20)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_lossless(g))
    assert out.shape == (20, 20, 3)
    assert np.array_equal(out[:, :, 0], g)
    with pytest.raises(ValueError):
        encode_jpeg_lossless(g, predictor=0)
    with pytest.raises(ValueError):
        encode_jpeg_lossless(g, predictor=8)
    with pytest.raises(ValueError):
        predict(1, 2, 3, 9)


def test_lossless_predictor_boundary_rules():
    """H.1.1: first sample predicts from 128, first row from Ra, first
    column from Rb — a 1-pixel and 1-row/1-col image exercise all."""
    for shape in ((1, 1, 3), (1, 9, 3), (9, 1, 3), (2, 2, 3)):
        rng = np.random.default_rng(sum(shape))
        img = rng.integers(0, 256, shape).astype(np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg_lossless(img, 4)), img), shape
