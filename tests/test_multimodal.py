"""Unit tests for multimodal ops not covered by the oracle parity sweep."""

from __future__ import annotations

import hashlib

import pytest

from research_data_pipeline_spark.multimodal import media_table, ops


def test_resize_thumbnail_deterministic(spark, sf_dir):
    m = media_table(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    out = ops.resize_thumbnail(m, out_len=8).orderBy("doc_id").limit(3).collect()
    assert all(len(r.thumb) == 8 for r in out)
    assert all(r.thumb_hex == r.thumb.hex() for r in out)
    # pure function of the payload: recompute row 0 by hand
    doc = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where("doc_id = 0")
        .collect()[0]
    )
    payload = hashlib.md5(doc.text.encode()).digest() * 1  # r = 1 + 0 % 7
    block = len(payload) // 8
    expect = bytes(
        int(sum(payload[i : i + block]) / block) for i in range(0, len(payload), block)
    )[:8]
    assert bytes(out[0].thumb) == expect


def test_codec_stub_raises():
    with pytest.raises(NotImplementedError):
        ops.require_codec("PIL")
    with pytest.raises(NotImplementedError):
        ops.decode_image_real(b"\xff\xd8\xff\xe0")


def test_frame_sample_prunes_to_video(spark, sf_dir):
    m = media_table(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    out = ops.sample_frames(m).select("doc_id").distinct()
    kinds = out.join(m, "doc_id").select("kind").distinct().collect()
    assert [r.kind for r in kinds] == ["video"]


# ---------------------------------------------------------------------------
# Real PNG codec (multimodal/png.py): stdlib zlib decode — the live
# branch of decode_image_real, no fake anywhere in the path.

def _rng_image(shape, seed):
    import numpy as np

    return np.random.RandomState(seed).randint(0, 256, shape).astype(np.uint8)


def test_png_roundtrip_all_shapes_and_filters():
    import numpy as np

    from research_data_pipeline_spark.multimodal.png import decode_png, encode_png

    shapes = [(5, 7), (4, 6, 3), (3, 5, 4)]  # gray8 / RGB8 / RGBA8
    for seed, shape in enumerate(shapes):
        img = _rng_image(shape, seed)
        for ftype in range(5):  # None/Sub/Up/Average/Paeth unfilter paths
            out = decode_png(encode_png(img, filter_type=ftype))
            np.testing.assert_array_equal(out, img, err_msg=f"{shape} f{ftype}")


def test_png_gradient_known_pixels():
    """Decode a PNG we can verify pixel-by-pixel without the encoder:
    a horizontal gradient where pixel (y, x) == (x * 16) % 256."""
    import numpy as np

    from research_data_pipeline_spark.multimodal.png import decode_png, encode_png

    img = np.fromfunction(lambda y, x: (x * 16) % 256, (8, 16)).astype(np.uint8)
    out = decode_png(encode_png(img, filter_type=1))
    assert out.shape == (8, 16)
    assert out[3, 5] == 80 and out[0, 15] == 240
    np.testing.assert_array_equal(out, img)


def test_png_rejects_unsupported():
    from research_data_pipeline_spark.multimodal.png import decode_png

    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\xff\xd8\xff\xe0notapng")


def test_decode_image_real_live_png_branch():
    """decode_image_real is no longer a stub for PNG payloads."""
    import numpy as np

    from research_data_pipeline_spark.multimodal.png import encode_png

    img = _rng_image((6, 6, 3), 42)
    out = ops.decode_image_real(encode_png(img, filter_type=4))
    np.testing.assert_array_equal(out, img)
    # non-PNG bytes still hit the loud codec gate
    with pytest.raises(NotImplementedError):
        ops.decode_image_real(b"\xff\xd8\xff\xe0")


def test_real_decode_stats_spark_end_to_end(spark):
    """Real PNGs through the Spark mapInPandas operator: per-image pixel
    stats must match numpy ground truth computed on the driver."""
    import numpy as np

    from research_data_pipeline_spark.multimodal.png import encode_png

    imgs = {
        1: _rng_image((9, 4), 1),        # gray
        2: _rng_image((3, 8, 3), 2),     # rgb
        3: _rng_image((5, 5, 4), 3),     # rgba
    }
    rows = [
        (doc_id, "image", bytearray(encode_png(img, filter_type=doc_id % 5)))
        for doc_id, img in imgs.items()
    ] + [(99, "audio", bytearray(b"\x00\x01"))]  # pruned before the UDF
    media = spark.createDataFrame(
        rows, "doc_id bigint, kind string, payload binary"
    )
    got = {r.doc_id: r for r in ops.real_decode_stats(media).collect()}
    assert set(got) == set(imgs)
    for doc_id, img in imgs.items():
        r = got[doc_id]
        h, w = img.shape[:2]
        ch = 1 if img.ndim == 2 else img.shape[2]
        assert (r.width, r.height, r.channels) == (w, h, ch)
        assert r.n_pixels == h * w
        assert r.pixel_sum == int(img.sum(dtype=np.int64))
        assert r.max_pixel == int(img.max())


# ---------------------------------------------------------------------------
# Real WAV codec (multimodal/wav.py): stdlib PCM decode — the live
# audio branch, symmetric with the PNG image path.

def test_wav_roundtrip_mono_and_stereo():
    import numpy as np

    from research_data_pipeline_spark.multimodal.wav import decode_wav, encode_wav

    rng = np.random.RandomState(7)
    mono = (rng.randint(-32768, 32768, 500)).astype(np.int16)
    out, rate = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000
    np.testing.assert_array_equal(out, mono)
    stereo = rng.randint(-32768, 32768, (300, 2)).astype(np.int16)
    out2, rate2 = decode_wav(encode_wav(stereo, 44100))
    assert rate2 == 44100 and out2.shape == (300, 2)
    np.testing.assert_array_equal(out2, stereo)


def test_decode_audio_real_live_wav_branch():
    import numpy as np

    from research_data_pipeline_spark.multimodal.wav import encode_wav

    tone = (np.sin(np.linspace(0, 20, 200)) * 20000).astype(np.int16)
    samples, rate = ops.decode_audio_real(encode_wav(tone, 8000))
    np.testing.assert_array_equal(samples, tone)
    assert rate == 8000
    with pytest.raises(NotImplementedError):  # non-WAV → codec gate
        ops.decode_audio_real(b"\xff\xfb\x90\x00mp3frame")


def test_real_audio_stats_spark_end_to_end(spark):
    import numpy as np

    from research_data_pipeline_spark.multimodal.wav import encode_wav

    rng = np.random.RandomState(3)
    clips = {
        1: (rng.randint(-1000, 1000, 1600).astype(np.int16), 16000),
        2: (rng.randint(-128, 128, (441, 2)).astype(np.int16), 44100),
    }
    rows = [
        (doc_id, "audio", bytearray(encode_wav(s, r)))
        for doc_id, (s, r) in clips.items()
    ] + [(99, "image", bytearray(b"\x89PNGnotaudio"))]  # pruned pre-UDF
    media = spark.createDataFrame(
        rows, "doc_id bigint, kind string, payload binary"
    )
    got = {r.doc_id: r for r in ops.real_audio_stats(media).collect()}
    assert set(got) == set(clips)
    for doc_id, (s, rate) in clips.items():
        r = got[doc_id]
        frames = s.shape[0]
        assert (r.sample_rate, r.n_frames) == (rate, frames)
        assert r.n_channels == (1 if s.ndim == 1 else s.shape[1])
        assert r.duration_ms == frames * 1000 // rate
        assert r.sum_abs_sample == int(np.abs(s.astype(np.int64)).sum())
        assert r.peak_abs_sample == int(np.abs(s.astype(np.int64)).max())


def test_perceptual_hash64_matches_python_reference(spark, sf_dir):
    """m13's widened hash: four 16-bit bands, bit (j, a) set when
    decoded pixels a and (a+j+1) mod 16 sum above twice the global
    integer mean. Recompute from the source text independently (the
    codec trip is lossless) and check identical payloads hash
    identically (hamming 0 — the dedup property m13 relies on)."""
    m = media_table(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    got = {
        r.doc_id: (r.b0, r.b1, r.b2, r.b3)
        for r in ops.perceptual_hash(m).collect()
    }
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where("doc_id % 3 = 0").select("doc_id", "text").collect()
    )
    assert len(docs) > 0 and set(got) == {d.doc_id for d in docs}
    by_md5: dict[bytes, tuple] = {}
    for d in docs:
        md5 = hashlib.md5(d.text.encode()).digest()
        r = 1 + d.doc_id % 7
        payload = md5 * r
        mean = sum(payload) // len(payload)
        want = tuple(
            sum(
                (1 << a)
                for a in range(16)
                if md5[a] + md5[(a + j + 1) % 16] > 2 * mean
            )
            for j in range(4)
        )
        assert got[d.doc_id] == want, d.doc_id
        if md5 in by_md5:
            assert by_md5[md5] == want  # identical payloads: hamming 0
        by_md5[md5] = want


def test_audio_fingerprint64_matches_python_reference(spark, sf_dir):
    """m17's fingerprint: four 16-bit bands over the decoded PCM byte
    stream (the m13 geometry on the 16-byte cycle). Recompute from the
    source text independently — the WAV round-trip is lossless and
    little-endian, so the decoded byte cycle equals the md5 bytes."""
    m = media_table(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    got = {
        r.doc_id: (r.b0, r.b1, r.b2, r.b3)
        for r in ops.audio_fingerprint(m).collect()
    }
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where("doc_id % 3 = 1").select("doc_id", "text").collect()
    )
    assert len(docs) > 0 and set(got) == {d.doc_id for d in docs}
    for d in docs:
        md5 = hashlib.md5(d.text.encode()).digest()
        r = 1 + d.doc_id % 7
        payload = md5 * r
        mean = sum(payload) // len(payload)
        want = tuple(
            sum(
                (1 << a)
                for a in range(16)
                if md5[a] + md5[(a + j + 1) % 16] > 2 * mean
            )
            for j in range(4)
        )
        assert got[d.doc_id] == want, d.doc_id
