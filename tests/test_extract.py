"""Link/field extraction semantics: the 3 selector families, depth deltas,
urljoin, offset ordering, media exclusion, and fused == unfused."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_web_scrapper_and_crawler_spark.config import DEFAULT_EXTRACTION_RULES
from distributed_web_scrapper_and_crawler_spark.functions.canonicalize import normalize_url_py
from distributed_web_scrapper_and_crawler_spark.operators.extract import (
    extract_fields_udf,
    extract_links_canon_udf,
    extract_links_udf,
    spans_sorted,
)
from distributed_web_scrapper_and_crawler_spark.sources.corpus import CORPUS_SPARK_SCHEMA

DOC = {
    "doc_id": "http://h.example.test/page/1",
    "spans": [
        # deliberately out of offset order: extraction must sort by offset
        {"kind": "link_book", "text": "/page/2?b=2&a=1#f", "media_ref": "", "offset": 30},
        {"kind": "text", "text": "title=The Book", "media_ref": "", "offset": 0},
        {"kind": "media", "text": "", "media_ref": "http://h.example.test/i.jpg", "offset": 20},
        {"kind": "link_next", "text": "http://h.example.test/page/2", "media_ref": "", "offset": 10},
        {"kind": "link_cat", "text": "/cat/3", "media_ref": "", "offset": 40},
        {"kind": "text", "text": "price=£9.99", "media_ref": "", "offset": 50},
    ],
}


def _df(spark):
    import pandas as pd

    return spark.createDataFrame(pd.DataFrame([DOC]), schema=CORPUS_SPARK_SCHEMA)


def test_three_families_and_depth_deltas(spark):
    rows = (
        _df(spark)
        .select(F.explode(extract_links_udf()(F.col("doc_id"), F.col("spans"))).alias("l"))
        .select("l.*")
        .collect()
    )
    # offset order: link_next(10) pos0, link_book(30) pos1, link_cat(40) pos2
    got = [(r["url"], r["depth_delta"], r["pos"]) for r in rows]
    assert got == [
        ("http://h.example.test/page/2", 0, 0),  # pagination: same depth (remote_worker.py:236)
        ("http://h.example.test/page/2?b=2&a=1#f", 1, 1),  # book: depth+1 (:220), urljoin'd
        ("http://h.example.test/cat/3", 0, 2),  # category: same depth (:252)
    ]
    # media span NOT emitted (reference never fetches images)
    assert len(rows) == 3


def test_fused_equals_unfused_plus_normalize(spark):
    unfused = (
        _df(spark)
        .select(F.explode(extract_links_udf()(F.col("doc_id"), F.col("spans"))).alias("l"))
        .select("l.url", "l.depth_delta", "l.pos")
        .collect()
    )
    fused = (
        _df(spark)
        .select(F.explode(extract_links_canon_udf(parity=True)(F.col("doc_id"), F.col("spans"))).alias("l"))
        .select("l.url", "l.depth_delta", "l.pos", "l.host", "l.path")
        .collect()
    )
    assert [(normalize_url_py(r["url"]), r["depth_delta"], r["pos"]) for r in unfused] == [
        (r["url"], r["depth_delta"], r["pos"]) for r in fused
    ]
    assert all(r["host"] == "h.example.test" for r in fused)
    assert fused[2]["path"] == "/cat/3"


def test_flat_link_path_equals_fused(spark):
    """The round plan's flat link path (JVM filter+array_sort+posexplode +
    vectorized (base, href) canonicalize, plans/round.py) must emit exactly
    what the fused array<struct> UDF emits — url, host, path, depth delta
    and pos — in both modes."""
    from distributed_web_scrapper_and_crawler_spark.functions.canonicalize import (
        canon_links_flat_udf,
    )

    for parity in (True, False):
        fused = (
            _df(spark)
            .select(
                F.explode(extract_links_canon_udf(parity=parity)(F.col("doc_id"), F.col("spans"))).alias("l")
            )
            .select("l.url", "l.host", "l.path", "l.depth_delta", "l.pos")
            .collect()
        )
        link_spans = F.expr(
            "array_sort(filter(spans, s -> s.kind IN ('link_book', 'link_next', 'link_cat')),"
            " (a, b) -> CASE WHEN a.offset < b.offset THEN -1 WHEN a.offset > b.offset THEN 1 ELSE 0 END)"
        )
        flat = (
            _df(spark)
            .select(F.col("doc_id").alias("_base"), F.posexplode(link_spans).alias("pos", "_sp"))
            .select(
                canon_links_flat_udf(parity=parity)(F.col("_base"), F.col("_sp.text")).alias("_l"),
                F.when(F.col("_sp.kind") == "link_book", F.lit(1)).otherwise(F.lit(0)).alias("depth_delta"),
                F.col("pos").cast("int").alias("pos"),
            )
            .select("_l.url", "_l.host", "_l.path", "depth_delta", "pos")
            .collect()
        )
        assert [tuple(r) for r in flat] == [tuple(r) for r in fused], f"parity={parity}"


def test_field_extraction_first_match_and_strip(spark):
    row = _df(spark).select(extract_fields_udf(DEFAULT_EXTRACTION_RULES)("spans").alias("f")).collect()[0]["f"]
    assert row["title"] == "The Book"
    assert row["price"] == "£9.99"
    assert row["rating"] is None  # absent marker => null column


def test_spans_sorted_is_offset_order(spark):
    spans = _df(spark).select(spans_sorted(F.col("spans")).alias("s")).collect()[0]["s"]
    offsets = [sp["offset"] for sp in spans]
    assert offsets == sorted(offsets)
    assert [sp["kind"] for sp in spans] == ["text", "link_next", "media", "link_book", "link_cat", "text"]
