"""Multimodal plumbing: stub-decode ops with real Spark distribution
semantics (schemas, batching, determinism, no driver-side bytes)."""

import pytest
from pyspark.sql import functions as F

from krnel_graph_spark.functions import multimodal


@pytest.fixture()
def media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    ).limit(50)


def test_resize_images_contract(media):
    out = multimodal.resize_images(media, "payload", "doc_id", 64, 48, fake=True)
    rows = out.collect()
    assert len(rows) == 50
    assert all(r["width"] == 64 and r["height"] == 48 for r in rows)
    assert all(len(bytes(r["data"])) == (64 * 48) // 64 for r in rows)
    # deterministic: same input → same bytes
    again = {r["doc_id"]: bytes(r["data"]) for r in out.collect()}
    assert {r["doc_id"]: bytes(r["data"]) for r in rows} == again


def test_audio_features_contract(media):
    out = multimodal.extract_audio_features(media, "payload", "doc_id", feat_dim=8, fake=True)
    rows = out.collect()
    assert len(rows) == 50
    assert all(1.0 <= r["duration_s"] <= 121.0 for r in rows)
    assert all(len(r["features"]) == 8 for r in rows)


def test_real_codecs_gated(media):
    with pytest.raises(Exception, match="media libraries"):
        multimodal.resize_images(media, "payload", "doc_id", fake=False).collect()
    with pytest.raises(Exception, match="media libraries"):
        multimodal.extract_audio_features(media, "payload", "doc_id", fake=False).collect()


def test_frame_sampling_contract(media):
    out = multimodal.sample_frames(media, "payload", "doc_id", every_n=5, fake=True)
    pdf = out.toPandas()
    assert pdf.groupby("doc_id").frame_idx.is_monotonic_increasing.all()
    assert (pdf["frame_idx"] % 5 == 0).all()
