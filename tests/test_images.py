"""Image payload tests: codec, pHash, PSNR invariants, Spark verify."""

import numpy as np
import pytest

from proj_spark.sources.datagen import meta_for, raster_for, splitmix64
from proj_spark.sources.images import (
    decode_image,
    decode_png,
    encode_lossy,
    encode_png,
    phash64,
    psnr,
)


def test_png_roundtrip_exact():
    arr = raster_for(12345, 37, 29)
    assert (decode_png(encode_png(arr)) == arr).all()


def test_lossy_psnr_above_40():
    # the per-row invariant: PSNR >= 40 dB for the lossy path
    # (BASELINE.json input_hint)
    for seed in (1, 99, 12345):
        arr = raster_for(seed, 48, 32)
        dec = decode_image(encode_lossy(arr), "jpeg")
        assert psnr(arr, dec) >= 40.0


def test_phash_deterministic_and_robust():
    arr = raster_for(7, 64, 48)
    h1 = phash64(arr)
    assert h1 == phash64(arr.copy())
    # lossy re-encode keeps the perceptual hash (small pixel deltas)
    dec = decode_image(encode_lossy(arr), "jpeg")
    xor = np.uint64(np.int64(h1) ^ np.int64(phash64(dec)))
    assert bin(int(xor)).count("1") <= 4


def test_stubbed_formats_raise():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff", "jpg-real")
    with pytest.raises(ValueError):
        decode_image(b"xx", "bmp")


def test_meta_deterministic():
    a = meta_for(np.arange(100, dtype=np.uint64))
    b = meta_for(np.arange(100, dtype=np.uint64))
    assert (a["hash"] == b["hash"]).all()
    assert (a["w"] >= 16).all() and (a["w"] <= 64).all()
    assert (np.abs(a["lat"]) < 85.0).all()


def test_synthesize_and_verify_spark(spark):
    from proj_spark.sources.datagen import synthesize_images
    from proj_spark.sources.images import verify_images

    imgs = synthesize_images(spark, 40, partitions=4)
    out = verify_images(imgs).toPandas()
    assert len(out) == 40
    assert out["size_ok"].all()
    assert out["phash_ok"].all()
    assert out["psnr_ok"].all()
    assert out["caption_ok"].all()
    # determinism across partition counts: same bytes either way
    one = synthesize_images(spark, 8, partitions=1).toPandas().sort_values("image_id")
    four = synthesize_images(spark, 8, partitions=4).toPandas().sort_values("image_id")
    for a, b in zip(one["bytes"], four["bytes"]):
        assert bytes(a) == bytes(b)
