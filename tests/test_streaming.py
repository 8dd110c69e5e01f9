"""Structured Streaming surface: watermarked window aggregation driven
to completion with the memory sink, and the foreachBatch seed-stream
bridge into the crawl engine."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from distributed_web_scrapper_and_crawler_spark.config import CrawlConfig
from distributed_web_scrapper_and_crawler_spark.plans.crawl import CrawlEngine
from distributed_web_scrapper_and_crawler_spark.streaming.rounds_stream import (
    seed_stream_crawl,
    windowed_event_counts,
)


def test_windowed_event_counts(spark, tmp_path):
    # testdata parquet stores TIMESTAMP_NTZ; event-time watermarks need
    # TIMESTAMP — rewrite with an instant-typed ts (session TZ is UTC)
    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    src = str(tmp_path / "events_src")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = windowed_event_counts(stream, window="1 day", watermark="1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM win_counts").toPandas()
    finally:
        q.stop()
    want = (
        events.groupBy(F.date_trunc("day", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
    )
    g = got[["window_start", "event_type", "n"]].sort_values(["window_start", "event_type"], ignore_index=True)
    w = want.sort_values(["window_start", "event_type"], ignore_index=True)
    pd.testing.assert_frame_equal(g, w)


def test_seed_stream_bridge(spark, small_corpus, small_spec, tmp_path):
    cfg = CrawlConfig(parity_mode=True, round_budget=64)
    eng = CrawlEngine(spark=spark, corpus=small_corpus, cfg=cfg)
    src = str(tmp_path / "seeds_src")
    spark.createDataFrame(
        [(f"http://{small_spec.hosts[0]}/page/0",), (f"http://{small_spec.hosts[1]}/page/3",)],
        "url string",
    ).write.parquet(src)
    stream = spark.readStream.schema("url string").parquet(src)
    q = seed_stream_crawl(stream, eng, rounds_per_batch=2).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert eng.state is not None
    assert eng.state.seen.count() > 0
    # idempotence: enqueue the same seeds again -> 0 new
    assert eng.enqueue_seeds([f"http://{small_spec.hosts[0]}/page/0"]) == 0


def test_stateful_stream_dedup(spark, tmp_path):
    """applyInPandasWithState cross-batch dedup: duplicates arriving in a
    LATER micro-batch must be suppressed by the per-host GroupState."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from distributed_web_scrapper_and_crawler_spark.streaming.stateful import dedup_url_stream

    src = tmp_path / "urls_src"
    src.mkdir()
    schema = pa.schema([("host", pa.string()), ("url", pa.string()), ("url_hash", pa.int64())])
    batch1 = [("a.t", "http://a.t/1", 1), ("a.t", "http://a.t/2", 2), ("b.t", "http://b.t/1", 10)]
    batch2 = [("a.t", "http://a.t/1", 1), ("a.t", "http://a.t/3", 3), ("b.t", "http://b.t/1", 10)]
    for i, rows in enumerate((batch1, batch2)):
        pq.write_table(pa.Table.from_pylist([dict(zip(("host", "url", "url_hash"), r)) for r in rows], schema=schema), str(src / f"b{i}.parquet"))

    stream = (
        spark.readStream.schema("host string, url string, url_hash long")
        .option("maxFilesPerTrigger", 1)  # forces two separate micro-batches
        .parquet(str(src))
    )
    out = dedup_url_stream(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("dwsc_stateful_dedup")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r["host"], r["url_hash"]) for r in spark.table("dwsc_stateful_dedup").collect()
    )
    # url_hash 1 and 10 reappear in batch 2 and must NOT be re-admitted
    assert got == [("a.t", 1), ("a.t", 2), ("a.t", 3), ("b.t", 10)]
