"""Arithmetic-coded JPEG (T.81 Annex D/E/F) gates.

The decisive identity: the arithmetic encoder shares the coefficient
front end with the Huffman encoder, so decode(arith) must be
byte-identical to decode(huffman) at the same quality/subsampling —
any entropy-layer bug breaks it immediately (the QM coder is fully
adaptive: one wrong decision desynchronizes every later one).
"""

import numpy as np
import pytest

from proj_spark.sources.jpeg import decode_jpeg, encode_jpeg
from proj_spark.sources.jpeg_arith import (
    _TAB,
    _ArithDecoder,
    _ArithEncoder,
    encode_jpeg_arithmetic,
)


def _test_image(h=96, w=80, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = (
        110 + 70 * np.sin(xx / 9.0) * np.cos(yy / 13.0)
        + 40 * ((xx // 16 + yy // 16) % 2)
    )
    img = np.stack([base, base * 0.8 + 30, 255 - base], axis=-1)
    img += rng.normal(0, 4, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_state_table_invariants():
    assert len(_TAB) == 114
    assert _TAB[0][0] == 0x5A1D and _TAB[113][0] == 0x5A1D
    for i, (qe, nmps, nlps, sw) in enumerate(_TAB):
        assert 1 <= qe < 0x8000
        assert 0 <= nmps <= 113 and 0 <= nlps <= 113
        assert sw in (0, 1)
    # the fixed sign bin must self-loop (never adapts)
    assert _TAB[113][1] == 113 and _TAB[113][2] == 113 and _TAB[113][3] == 0
    # switch flags only on the fast-attack "MPS flip" states
    assert all(_TAB[i][3] == 1 for i in (0, 14, 36, 64, 80, 88, 95, 105,
                                         110, 112))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_coder_roundtrip_random_decisions(seed):
    """Encoder and decoder are exact mirrors: random decision streams
    over several adaptive contexts (mixed biases so renormalizations,
    carries, and 0xFF stuffing all occur) survive the roundtrip."""
    rng = np.random.default_rng(seed)
    n = 5000
    ctx = rng.integers(0, 8, n)
    # context-dependent bias: exercises both MPS and LPS paths hard
    p1 = np.array([0.02, 0.2, 0.5, 0.8, 0.98, 0.35, 0.65, 0.5])
    bits = (rng.random(n) < p1[ctx]).astype(np.int64)

    enc = _ArithEncoder()
    ebins = bytearray(8)
    for c, b in zip(ctx, bits):
        enc.encode(ebins, int(c), int(b))
    enc.flush()
    stream = bytes(enc.out) + b"\xff\xd9"  # terminate like a scan

    dec = _ArithDecoder(stream, 0)
    dbins = bytearray(8)
    got = [dec.decode(dbins, int(c)) for c in ctx]
    assert got == bits.tolist()
    assert ebins == dbins  # adaptation followed the same trajectory


def test_coder_roundtrip_fixed_bin_stays_fixed():
    rng = np.random.default_rng(42)
    bits = (rng.random(2000) < 0.5).astype(np.int64)
    enc = _ArithEncoder()
    fixed = bytearray([113])
    for b in bits:
        enc.encode(fixed, 0, int(b))
    enc.flush()
    assert fixed[0] & 0x7F == 113  # state never left the fixed entry
    dec = _ArithDecoder(bytes(enc.out) + b"\xff\xd9", 0)
    dfixed = bytearray([113])
    assert [dec.decode(dfixed, 0) for _ in bits] == bits.tolist()


def test_stream_is_ff_stuffed():
    """Entropy segment may not contain a bare 0xFF followed by a
    non-zero byte (that would read as a marker)."""
    img = _test_image()
    data = encode_jpeg_arithmetic(img, quality=95)
    body = data[2:-2]  # inside SOI..EOI
    i = body.find(b"\xff\xda")
    scan = body[i + 14:]  # skip the SOS header (12 bytes + marker)
    for j in range(len(scan) - 1):
        if scan[j] == 0xFF:
            assert scan[j + 1] == 0x00, f"unstuffed 0xFF at {j}"


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:0", "4:2:2"])
def test_arith_decode_matches_huffman_decode(subsampling):
    img = _test_image()
    hj = encode_jpeg(img, quality=90, subsampling=subsampling)
    aj = encode_jpeg_arithmetic(img, quality=90, subsampling=subsampling)
    assert aj[:2] == b"\xff\xd8" and b"\xff\xc9" in aj and b"\xff\xcc" in aj
    assert b"\xff\xc4" not in aj[:aj.find(b"\xff\xda")]  # no DHT
    ph = decode_jpeg(hj)
    pa = decode_jpeg(aj)
    assert np.array_equal(ph, pa), (
        f"arith decode diverges from huffman decode "
        f"(max |d| = {np.abs(ph.astype(int) - pa.astype(int)).max()})")


def test_arith_beats_huffman_size():
    """On a natural-ish image the adaptive QM coder should beat the
    fixed Annex K Huffman tables (typically 5-12 %)."""
    img = _test_image(h=160, w=160)
    hj = encode_jpeg(img, quality=90)
    aj = encode_jpeg_arithmetic(img, quality=90)
    assert len(aj) < len(hj), (len(aj), len(hj))


def test_arith_restart_markers_roundtrip():
    img = _test_image(h=80, w=112)
    aj = encode_jpeg_arithmetic(img, quality=85, subsampling="4:2:0",
                                restart_interval=2)
    assert b"\xff\xdd" in aj
    assert any(bytes([0xFF, 0xD0 + m]) in aj for m in range(8))
    hj = encode_jpeg(img, quality=85, subsampling="4:2:0")
    assert np.array_equal(decode_jpeg(aj), decode_jpeg(hj))


def test_arith_psnr_gate():
    """Same per-row invariant as the Huffman path: quality 90 clears
    the 40 dB PSNR bar (input_hint lossy criterion)."""
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:128, 0:96].astype(np.float64)
    img = np.clip(np.stack([
        120 + 60 * np.sin(xx / 11.0),
        100 + 50 * np.cos(yy / 9.0),
        90 + 40 * np.sin((xx + yy) / 15.0),
    ], axis=-1) + rng.normal(0, 1.5, (128, 96, 3)), 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_arithmetic(img, quality=90))
    mse = np.mean((out.astype(np.float64) - img.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / mse)
    assert psnr >= 40.0, psnr


def test_arith_gray_and_tiny_images():
    # flat image: long zero runs + EOB chains
    flat = np.full((24, 24, 3), 128, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg_arithmetic(flat)),
                          decode_jpeg(encode_jpeg(flat)))
    # non-multiple-of-8 edge padding
    img = _test_image(h=17, w=23)
    assert np.array_equal(decode_jpeg(encode_jpeg_arithmetic(img)),
                          decode_jpeg(encode_jpeg(img)))


def test_arith_extreme_coefficients():
    """Quality 5 -> huge quant steps but also max-magnitude DC swings
    at quality 100 exercise the X/M magnitude ladders."""
    rng = np.random.default_rng(3)
    img = (rng.integers(0, 2, (64, 64, 1)) * 255).astype(np.uint8)
    img = np.repeat(img, 3, axis=2)
    for q in (5, 50, 100):
        assert np.array_equal(
            decode_jpeg(encode_jpeg_arithmetic(img, quality=q)),
            decode_jpeg(encode_jpeg(img, quality=q))), q


def test_arith_decoder_survives_corruption():
    """Decoder robustness pin (the jpeg.py restart-counter tradition):
    flipping bytes anywhere in an arithmetic stream must either raise a
    clean ValueError/NotImplementedError or return SOME image — never
    hang or crash the process.  The QM decoder's guards (k<=63 bound,
    magnitude-ladder 0x8000 caps, zero-feed past markers) make every
    corrupted decision stream terminate."""
    img = _test_image(h=40, w=40)
    base = bytearray(encode_jpeg_arithmetic(img, quality=80,
                                            subsampling="4:2:0",
                                            restart_interval=2))
    rng = np.random.default_rng(17)
    scan_start = bytes(base).find(b"\xff\xda")
    for trial in range(60):
        data = bytearray(base)
        for _ in range(rng.integers(1, 4)):
            pos = int(rng.integers(scan_start, len(data) - 2))
            data[pos] ^= int(rng.integers(1, 256))
        try:
            out = decode_jpeg(bytes(data))
            assert out.shape == (40, 40, 3)  # geometry still header-driven
        except (ValueError, NotImplementedError, KeyError):
            pass  # clean rejection is fine


@pytest.mark.parametrize("seed", range(8))
def test_coder_roundtrip_property(seed):
    """Property-style widening of the fixed-seed roundtrip: random
    context counts, biases, stream lengths — including heavily skewed
    streams that stress carry propagation and 0xFF stacking."""
    rng = np.random.default_rng(1000 + seed)
    nctx = int(rng.integers(1, 16))
    n = int(rng.integers(1, 4000))
    biases = rng.uniform(0.01, 0.99, nctx)
    ctx = rng.integers(0, nctx, n)
    bits = (rng.random(n) < biases[ctx]).astype(np.int64)
    enc = _ArithEncoder()
    ebins = bytearray(nctx)
    for c, b in zip(ctx, bits):
        enc.encode(ebins, int(c), int(b))
    enc.flush()
    dec = _ArithDecoder(bytes(enc.out) + b"\xff\xd9", 0)
    dbins = bytearray(nctx)
    assert [dec.decode(dbins, int(c)) for c in ctx] == bits.tolist()
    assert ebins == dbins


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:0", "4:2:2"])
def test_progressive_arith_decode_matches_all_other_encoders(subsampling):
    """The full T.81 DCT matrix identity: baseline/progressive x
    huffman/arithmetic all decode to byte-identical pixels (shared
    coefficient front end; every entropy layer is exact)."""
    from proj_spark.sources.jpeg import encode_jpeg_progressive
    from proj_spark.sources.jpeg_arith import (
        encode_jpeg_arithmetic_progressive)

    img = _test_image(h=88, w=72)
    ref = decode_jpeg(encode_jpeg(img, 90, subsampling))
    pa = encode_jpeg_arithmetic_progressive(img, 90, subsampling)
    assert b"\xff\xca" in pa and b"\xff\xcc" in pa  # SOF10 + DAC
    assert b"\xff\xc4" not in pa[:pa.find(b"\xff\xda")]  # no DHT
    assert np.array_equal(decode_jpeg(pa), ref)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(img, 90, subsampling)), ref)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_arithmetic(img, 90, subsampling)), ref)


def test_progressive_arith_edge_cases():
    from proj_spark.sources.jpeg_arith import (
        encode_jpeg_arithmetic_progressive)

    flat = np.full((24, 24, 3), 128, dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_arithmetic_progressive(flat)),
        decode_jpeg(encode_jpeg(flat)))
    img = _test_image(h=17, w=23)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_arithmetic_progressive(img)),
        decode_jpeg(encode_jpeg(img)))
    # extreme magnitudes through the band ladders
    rng = np.random.default_rng(3)
    hard = np.repeat((rng.integers(0, 2, (64, 64, 1)) * 255)
                     .astype(np.uint8), 3, axis=2)
    for q in (5, 100):
        assert np.array_equal(
            decode_jpeg(encode_jpeg_arithmetic_progressive(hard, q)),
            decode_jpeg(encode_jpeg(hard, q))), q


def test_progressive_arith_beats_huffman_progressive_size():
    from proj_spark.sources.jpeg import encode_jpeg_progressive
    from proj_spark.sources.jpeg_arith import (
        encode_jpeg_arithmetic_progressive)

    img = _test_image(h=160, w=160)
    assert len(encode_jpeg_arithmetic_progressive(img, 90)) < \
        len(encode_jpeg_progressive(img, 90))
