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
