"""Multimodal plumbing: binary payloads, batch-shaped UDFs, deterministic
stubbed decode (no image libs in this container — the seam is tested,
the codec is faked deterministically)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_web_scrapper_and_crawler_spark.operators.multimodal import (
    extract_media_features,
    frame_sample_stub,
    media_table_from_corpus,
)


def test_media_table_deterministic(spark, small_corpus):
    media = media_table_from_corpus(spark, small_corpus)
    a = {r["media_ref"]: (bytes(r["content"]), r["meta"]["n_bytes"]) for r in media.collect()}
    b = {r["media_ref"]: (bytes(r["content"]), r["meta"]["n_bytes"]) for r in media.collect()}
    assert a == b and len(a) > 0
    for content, n_bytes in a.values():
        assert len(content) == n_bytes


def test_features_stable_across_partitionings(spark, small_corpus):
    media = media_table_from_corpus(spark, small_corpus).cache()
    f1 = {r["media_ref"]: tuple(r["feature"]) for r in extract_media_features(media).collect()}
    f8 = {
        r["media_ref"]: tuple(r["feature"])
        for r in extract_media_features(media.repartition(8)).collect()
    }
    assert f1 == f8
    assert all(len(v) == 16 for v in f1.values())
    # container has no codec => the deterministic fake path must be marked
    assert all(not r["decode_ok"] for r in extract_media_features(media).collect())


def test_frame_sampling_shape(spark, small_corpus):
    media = media_table_from_corpus(spark, small_corpus)
    frames = frame_sample_stub(media, every_n=10)
    rows = frames.groupBy("media_ref").agg(F.count("*").alias("n"), F.max("frame_idx").alias("mx"))
    for r in rows.collect():
        assert r["n"] >= 1 and r["mx"] % 10 == 0
