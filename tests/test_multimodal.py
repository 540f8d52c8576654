"""Multimodal plumbing tests: binary payload column + stubbed decode via
mapInPandas (schema, batching, determinism)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_spark.catalog import Catalog
from flink_spark.llm import multimodal as MM
from tests.conftest import SF_DIR


def test_attach_and_decode(spark):
    docs = Catalog(spark, SF_DIR).documents.limit(50)
    with_media = MM.attach_binary_payload(docs, "text")
    assert dict(with_media.dtypes)["payload"] == "binary"
    feats = MM.decode_features(with_media).cache()
    rows = feats.collect()
    assert len(rows) == 50
    by_id = {r["doc_id"]: r for r in rows}
    # deterministic stub: n_bytes equals utf-8 length of the text
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, text in src.items():
        assert by_id[doc_id]["n_bytes"] == len(text.encode())
        assert 0.0 < by_id[doc_id]["entropy_proxy"] <= 1.0


def test_decode_runs_twice_same_result(spark):
    docs = Catalog(spark, SF_DIR).documents.limit(20)
    m = MM.attach_binary_payload(docs, "text")
    a = sorted(tuple(r) for r in MM.decode_features(m).collect())
    b = sorted(tuple(r) for r in MM.decode_features(m).collect())
    assert a == b


def test_frame_sample_plan(spark):
    docs = Catalog(spark, SF_DIR).documents.limit(5)
    m = MM.attach_binary_payload(docs, "text", media_type="video").withColumn(
        "media_meta",
        F.struct(
            F.lit("video").alias("media_type"),
            F.lit("mp4").alias("format"),
            F.lit(0).cast("int").alias("width"),
            F.lit(0).cast("int").alias("height"),
            F.lit(3500).cast("long").alias("duration_ms"),
        ),
    )
    frames = MM.frame_sample_plan(m, every_ms=1000)
    # 3500ms at 1s sampling -> offsets 0,1000,2000,3000 = 4 per doc
    assert frames.count() == 5 * 4


def test_resize_images_rewrites_payload_and_meta(spark):
    docs = Catalog(spark, SF_DIR).documents.limit(10)
    m = MM.attach_binary_payload(docs, "text")
    out = MM.resize_images(m, width=16, height=8).collect()
    assert len(out) == 10
    for r in out:
        assert len(r.payload) == 16 * 8  # resized byte budget
        assert r.media_meta.width == 16 and r.media_meta.height == 8
        assert r.media_meta.format is not None  # untouched meta survives
