"""Multimodal operators: rawgrid video, PCM audio, bilinear resize.

Real-kernel paths are verified against direct numpy recomputation;
codec paths assert the documented NotImplementedError contract.
"""

import numpy as np
import pandas as pd
import pytest

from proj_spark.sources.datagen import raster_for, splitmix64
from proj_spark.sources.images import decode_png, phash64
from proj_spark.sources.media import (
    audio_features,
    np_resize_bilinear,
    pack_rawgrid_video,
    resize_images,
    sample_frames,
    synthesize_audio,
    synthesize_videos,
    unpack_rawgrid_video,
)


def test_rawgrid_roundtrip():
    frames = [raster_for(7 + i, 20, 14) for i in range(3)]
    data = pack_rawgrid_video(frames)
    back = unpack_rawgrid_video(data)
    assert len(back) == 3
    for a, b in zip(frames, back):
        assert (a == b).all()


def test_sample_frames_matches_direct_generation(spark):
    n, every = 12, 2
    vids = synthesize_videos(spark, n, n_frames=8, partitions=4)
    out = sample_frames(vids, every=every).toPandas()
    assert len(out) == n * 4
    assert sorted(out["frame_idx"].unique()) == [0, 2, 4, 6]
    # each sampled frame decodes to exactly the directly-generated raster
    for _, r in out.sample(8, random_state=0).iterrows():
        i = int(r["video_id"][3:])
        h = splitmix64(np.uint64(i))
        w_px = 16 + int(h & np.uint64(0xF))
        h_px = 16 + int((h >> np.uint64(8)) & np.uint64(0xF))
        want = raster_for(int(h) + int(r["frame_idx"]), w_px, h_px)
        got = decode_png(bytes(r["frame_png"]))
        assert (got == want).all()
        assert int(r["phash"]) == phash64(want)


def test_video_codec_stub_contract(spark):
    df = spark.createDataFrame(
        pd.DataFrame([{"video_id": "v0", "bytes": bytearray(b"xx"),
                       "fmt": "mp4", "n_frames": 1, "w": 2, "h": 2,
                       "fps": 1.0}]),
        schema="video_id string, bytes binary, fmt string, n_frames int, "
               "w int, h int, fps double",
    )
    with pytest.raises(Exception, match="NotImplementedError|decoder lib"):
        sample_frames(df).collect()


def test_audio_features_closed_form(spark):
    n = 30
    aud = synthesize_audio(spark, n, sample_rate=8000, duration_s=0.5,
                           partitions=4)
    meta = aud.select("audio_id", "freq_hz", "amplitude").toPandas()
    feats = audio_features(aud).toPandas().merge(meta, on="audio_id")
    assert len(feats) == n
    # pure sine: rms = A/sqrt(2), zcr = 2f/sr, duration exact
    assert np.allclose(feats["rms"], feats["amplitude"] / np.sqrt(2), atol=0.02)
    assert np.allclose(feats["zcr"], 2.0 * feats["freq_hz"] / 8000.0, atol=0.02)
    assert (feats["duration_s"] == 0.5).all()
    assert (feats["peak"] <= feats["amplitude"] + 1e-3).all()


def test_resize_bilinear_kernel():
    # same-size bilinear (align-corners=False) is the identity
    arr = raster_for(5, 24, 18)
    assert (np_resize_bilinear(arr, 24, 18) == arr).all()
    # constant image stays constant at any size
    const = np.full((10, 10, 3), 77, dtype=np.uint8)
    assert (np_resize_bilinear(const, 33, 7) == 77).all()
    # 2x downscale of a linear gradient stays a (near-)linear gradient
    g = np.tile(np.arange(0, 256, 8, dtype=np.uint8)[None, :, None], (8, 1, 3))
    small = np_resize_bilinear(g, 16, 4).astype(int)
    diffs = np.diff(small[0, :, 0])
    assert (diffs >= 12).all() and (diffs <= 20).all()


def test_resize_images_stage(spark):
    from proj_spark.sources.datagen import synthesize_images

    imgs = synthesize_images(spark, 20, partitions=4).localCheckpoint()
    out = resize_images(imgs, 8, 8).toPandas()
    assert len(out) == 20
    assert (out["w"] == 8).all() and (out["h"] == 8).all()
    for _, r in out.head(3).iterrows():
        arr = decode_png(bytes(r["bytes"]))
        assert arr.shape == (8, 8, 3)
        assert int(r["phash"]) == phash64(arr)


# ---------------------------------------------------------------------------
# WAV container (round 6: real RIFF/WAVE for the audio column)
# ---------------------------------------------------------------------------
def test_wav_roundtrip_mono_and_stereo():
    from proj_spark.sources.media import decode_wav, encode_wav

    rng = np.random.default_rng(9)
    mono = rng.integers(-32768, 32767, 400).astype("<i2")
    data = encode_wav(mono, 8000)
    s, rate, ch = decode_wav(data)
    assert rate == 8000 and ch == 1
    assert np.array_equal(s[:, 0], mono)
    stereo = rng.integers(-32768, 32767, (300, 2)).astype("<i2")
    s2, rate2, ch2 = decode_wav(encode_wav(stereo.reshape(-1), 44100,
                                           channels=2))
    assert rate2 == 44100 and ch2 == 2
    assert np.array_equal(s2, stereo)


def test_wav_chunk_walker_skips_unknown_chunks():
    import struct as _s

    from proj_spark.sources.media import decode_wav, encode_wav

    pcm = np.arange(-50, 50, dtype="<i2")
    data = bytearray(encode_wav(pcm, 16000))
    # splice a LIST chunk with an ODD length between fmt and data
    # (exercises the word-alignment rule)
    i = data.index(b"data")
    junk = b"LIST" + _s.pack("<I", 5) + b"INFOx" + b"\x00"
    data[i:i] = junk
    data[4:8] = _s.pack("<I", len(data) - 8)
    s, rate, ch = decode_wav(bytes(data))
    assert rate == 16000 and np.array_equal(s[:, 0], pcm)


def test_wav_error_paths():
    import struct as _s

    import pytest as _pt

    from proj_spark.sources.media import decode_wav, encode_wav

    with _pt.raises(ValueError):
        decode_wav(b"RIFX" + b"\x00" * 20)
    with _pt.raises(ValueError):
        encode_wav(b"\x00\x01\x02", 8000)  # not whole frames
    # non-PCM format tag (e.g. 3 = IEEE float) must raise, not garble
    good = bytearray(encode_wav(np.zeros(10, dtype="<i2"), 8000))
    i = good.index(b"fmt ") + 8
    good[i:i + 2] = _s.pack("<H", 3)
    with _pt.raises(NotImplementedError):
        decode_wav(bytes(good))


def test_audio_features_over_wav(spark):
    from pyspark.sql import functions as F

    from proj_spark.sources.media import (audio_features, encode_wav,
                                          synthesize_audio)

    aud = synthesize_audio(spark, 12, partitions=2).localCheckpoint()
    pcm_feats = audio_features(aud).toPandas().set_index("audio_id")

    def _wrap(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["pcm"] = [
                bytearray(encode_wav(bytes(p), int(sr)))
                for p, sr in zip(pdf["pcm"], pdf["sample_rate"])]
            pdf["fmt"] = "wav"
            yield pdf

    wav = aud.mapInPandas(_wrap, schema=aud.schema)
    wav_feats = audio_features(wav).toPandas().set_index("audio_id")
    # container adds headers but features must be numerically identical
    for col in ("rms", "zcr", "peak", "duration_s"):
        assert np.allclose(pcm_feats[col], wav_feats.loc[pcm_feats.index,
                                                         col], atol=0)
