"""Multimodal plumbing: schema, Arrow batch path, deterministic stub
features, stubbed decode raising where a real codec would run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from binance_data_framework_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    extract_features,
    frame_sample_plan,
    resize_media,
    synth_blobs,
)


def test_feature_extraction_schema_and_determinism(spark):
    blobs = synth_blobs(spark, n=32)
    feats = extract_features(blobs)
    assert feats.schema == FEATURE_SCHEMA
    a = {r["blob_id"]: r["digest"] for r in feats.collect()}
    # repartition differently -> identical features (stable under shuffle)
    b = {r["blob_id"]: r["digest"] for r in extract_features(blobs.repartition(7)).collect()}
    assert a == b and len(a) == 32
    row = feats.where(F.col("blob_id") == 3).first()
    assert len(row["feature"]) == 8
    assert all(0.0 <= x <= 1.0 for x in row["feature"])


def test_real_decode_is_stubbed(spark):
    blobs = synth_blobs(spark, n=4)
    with pytest.raises(Exception) as ei:
        extract_features(blobs, decode_stub=False).collect()
    assert "NotImplementedError" in str(ei.value) or "real media decoding" in str(ei.value)


def test_frame_sample_plan(spark):
    blobs = synth_blobs(spark, n=12)
    frames = frame_sample_plan(blobs, every_n=2)
    rows = frames.collect()
    assert all(r["frame_idx"] % 2 == 0 for r in rows)
    # only video rows produce frames
    mods = dict(blobs.select("blob_id", "modality").collect())
    assert {mods[r["blob_id"]] for r in rows} == {"video"}


def test_resize_media_stub(spark):
    blobs = synth_blobs(spark, n=9)
    out = resize_media(blobs, target=(64, 64)).collect()
    orig = {r["blob_id"]: bytes(r["data"]) for r in blobs.collect()}
    assert len(out) == 9
    for r in out:
        raw = orig[r["blob_id"]]
        expect_len = max(1, min(len(raw), len(raw) * 64 * 64 // (r["width"] * r["height"])))
        assert len(bytes(r["data"])) == expect_len
        assert bytes(r["data"]) == raw[:expect_len]  # stub is a prefix
        assert (r["new_width"], r["new_height"]) == (64, 64)
    with pytest.raises(Exception) as ei:
        resize_media(blobs, decode_stub=False).collect()
    assert "NotImplementedError" in str(ei.value) or "real media decoding" in str(ei.value)


def test_metadata_only_query_prunes_bytes(spark):
    blobs = synth_blobs(spark, n=8)
    q = blobs.groupBy("modality").agg(F.count(F.lit(1)).alias("n"))
    assert "data" not in q.columns
    assert q.count() == 3
