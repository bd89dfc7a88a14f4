"""Tile pyramid: pixel-level invariants the SQL oracle (q63, metadata
inventory) cannot see — level-0 tiles are a LOSSLESS partition of the
source raster, per-tile pHash matches an independent recomputation,
and downscaled level dimensions follow the ceil convention.
"""

import numpy as np
import pytest

from proj_spark.operators.raster import tile_pyramid
from proj_spark.sources.datagen import synthesize_images
from proj_spark.sources.images import decode_image, decode_png, phash64


@pytest.fixture(scope="module")
def tiles(spark):
    imgs = synthesize_images(spark, 24, partitions=4)
    out = tile_pyramid(imgs, zooms=(0, 1, 2), tile=16).collect()
    src = {r["image_id"]: r for r in imgs.collect()}
    return src, out


def test_level0_reassembles_exactly(tiles):
    src, out = tiles
    by_img = {}
    for r in out:
        if r["zoom"] == 0:
            by_img.setdefault(r["image_id"], []).append(r)
    assert set(by_img) == set(src)
    for image_id, rows in by_img.items():
        ref = decode_image(bytes(src[image_id]["bytes"]),
                           src[image_id]["fmt"])
        h, w = ref.shape[:2]
        canvas = np.zeros_like(ref)
        seen = np.zeros((h, w), dtype=bool)
        for r in rows:
            blk = decode_png(bytes(r["tile_bytes"]))
            assert blk.shape[:2] == (r["tile_h"], r["tile_w"])
            y0, x0 = r["tile_y"] * 16, r["tile_x"] * 16
            canvas[y0:y0 + r["tile_h"], x0:x0 + r["tile_w"]] = blk
            assert not seen[y0:y0 + r["tile_h"], x0:x0 + r["tile_w"]].any()
            seen[y0:y0 + r["tile_h"], x0:x0 + r["tile_w"]] = True
        assert seen.all()          # full coverage, no gaps
        assert np.array_equal(canvas, ref)   # lossless partition


def test_tile_phash_matches_recompute(tiles):
    src, out = tiles
    for r in out[:50]:
        blk = decode_png(bytes(r["tile_bytes"]))
        assert r["tile_phash"] == phash64(blk)


def test_pyramid_dims_follow_ceil_convention(tiles):
    src, out = tiles
    for image_id, s in src.items():
        ref = decode_image(bytes(s["bytes"]), s["fmt"])
        h, w = ref.shape[:2]
        for z in (0, 1, 2):
            f = 1 << z
            wz, hz = (w + f - 1) // f, (h + f - 1) // f
            rows = [r for r in out
                    if r["image_id"] == image_id and r["zoom"] == z]
            nx = (wz + 15) // 16
            ny = (hz + 15) // 16
            assert len(rows) == nx * ny, (image_id, z)
            assert sum(r["tile_w"] * r["tile_h"] for r in rows) == wz * hz
