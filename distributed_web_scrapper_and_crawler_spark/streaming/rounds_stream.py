"""Structured Streaming surface.

The reference has NO stream-processing semantics (SURVEY.md §2.10) —
its consumer loop is control-plane. The engine is therefore batch-round
based by design. This module layers the two streaming capabilities a
user would expect on top, without touching the engine:

1. ``seed_stream_crawl``: a ``foreachBatch`` wrapper that treats an
   incoming stream of seed URLs as successive seed batches — each
   micro-batch enqueues into the same frontier via the engine's normal
   dedup path, then drains rounds. Exactly-once: enqueue is idempotent
   on ``(url_hash, url)`` by construction.
2. ``windowed_event_counts``: watermarked tumbling-window aggregation
   over an event stream (late data handled by the watermark) — the
   streaming analog of the dashboard queue-status counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """readStream(events) -> watermark -> window/count per event_type."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


def seed_stream_crawl(seed_stream: DataFrame, engine, rounds_per_batch: int = 4):
    """foreachBatch bridge: stream of seed URLs -> engine seed batches.

    Returns the DataStreamWriter (caller starts/stops it). Each batch:
    collect the (small) seed micro-batch on the driver, enqueue through
    the engine's canonical seed path, drain up to ``rounds_per_batch``
    rounds. Re-delivered batches are harmless: enqueue anti-joins the
    ``enqueued`` ground truth.
    """

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        urls = [r["url"] for r in batch_df.select("url").collect()]
        if not urls:
            return
        if engine.state is None:
            engine.seed(urls)
        else:
            engine.enqueue_seeds(urls)
        engine.run(max_rounds=rounds_per_batch)

    return seed_stream.writeStream.foreachBatch(handle).outputMode("update")
