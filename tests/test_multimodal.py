"""Multimodal plumbing tests: schemas, batch shapes, determinism.

The decode/encode kernels are deterministic fakes (no codecs in the
container) — these tests pin the *plumbing* contract: schema stability,
modality filtering staying JVM-side, Arrow batch iteration, and
composition with the similarity operators.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_computing_spark.operators.multimodal import (
    FEATURE_DIM,
    blob_stats,
    blobs_from_documents,
    decode_images,
    extract_features,
    make_blob_table,
    sample_frames,
)
from distributed_computing_spark.operators.similarity import cosine_topk


def test_blob_stats_schema_and_hashes(spark):
    blobs = make_blob_table(spark, 30)
    stats = blob_stats(blobs)
    assert stats.columns == ["blob_id", "modality", "n_bytes", "sha256", "mime"]
    rows = stats.collect()
    assert all(r["n_bytes"] == 128 for r in rows)
    assert len({r["sha256"] for r in rows}) == 30  # distinct blobs


def test_decode_images_only_images_and_deterministic(spark):
    blobs = make_blob_table(spark, 30)
    feats = decode_images(blobs)
    rows = feats.collect()
    n_images = blobs.where(F.col("modality") == "image").count()
    assert len(rows) == n_images
    assert feats.schema.simpleString() == (
        "struct<blob_id:bigint,width:int,height:int,mean_r:double,mean_g:double,mean_b:double>"
    )
    again = {r["blob_id"]: (r["mean_r"], r["mean_g"], r["mean_b"]) for r in decode_images(blobs).collect()}
    first = {r["blob_id"]: (r["mean_r"], r["mean_g"], r["mean_b"]) for r in rows}
    assert first == again
    assert all(0.0 <= v <= 255.0 for t in first.values() for v in t)


def test_sample_frames_even_spacing(spark):
    blobs = make_blob_table(spark, 30)
    frames = sample_frames(blobs, k=4)
    per_blob = frames.groupBy("blob_id").count().collect()
    assert all(r["count"] == 4 for r in per_blob)
    one = sorted(
        r["frame_ts_ms"]
        for r in frames.where(F.col("blob_id") == 2).collect()
    )
    dur = blobs.where(F.col("blob_id") == 2).select("meta.duration_ms").collect()[0][0]
    assert one == [i * dur // 4 for i in range(4)]


def test_blobs_from_documents_adapter(spark, sf_dir):
    """The documents→blob adapter: payload bytes are the text's UTF-8
    encoding, metadata is a pure function of doc_id."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    blobs = blobs_from_documents(docs)
    assert blobs.count() == docs.count()
    r = blobs.join(docs, blobs.blob_id == docs.doc_id).select(
        "doc_id", "text", "modality", "data", "meta"
    ).first()
    assert bytes(r["data"]) == r["text"].encode("utf-8")
    assert r["modality"] == ["image", "audio", "video"][r["doc_id"] % 3]
    if r["modality"] == "audio":
        assert r["meta"]["width"] is None
    else:
        assert r["meta"]["width"] == 64 + r["doc_id"] % 16


def test_extract_features_compose_with_ann(spark):
    """multimodal → embedding → cosine top-k composes end-to-end."""
    blobs = make_blob_table(spark, 24)
    emb = extract_features(blobs)
    assert emb.schema.simpleString() == "struct<blob_id:bigint,embedding:array<float>>"
    sizes = emb.select(F.size("embedding").alias("s")).distinct().collect()
    assert [r["s"] for r in sizes] == [FEATURE_DIM]
    q = emb.where(F.col("blob_id") < 3)
    topk = cosine_topk(emb, q, k=3, id_col="blob_id", vec_col="embedding")
    assert topk.count() == 9


def test_decode_audio_only_audio_and_deterministic(spark):
    from distributed_computing_spark.operators.multimodal import decode_audio

    blobs = make_blob_table(spark, 30)
    stats = decode_audio(blobs)
    rows = stats.collect()
    assert len(rows) == blobs.where(F.col("modality") == "audio").count()
    assert stats.schema.simpleString() == (
        "struct<blob_id:bigint,n_samples:bigint,rms:double,peak:double>"
    )
    again = {r["blob_id"]: (r["n_samples"], r["rms"]) for r in decode_audio(blobs).collect()}
    assert again == {r["blob_id"]: (r["n_samples"], r["rms"]) for r in rows}
    for r in rows:
        assert r["n_samples"] >= 1 and 0 <= r["rms"] <= r["peak"] <= 32768
