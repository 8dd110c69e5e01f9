"""Back-to-back links-kernel micro-bench: flat vs doc granularity.

Protocol identical to the round-4 hybrid measurement (PLANS.md ledger):
one warmed local[16] session, the SAME cached pre-UDF input, alternating
A/B runs (best of N each, steal-annotated) so JIT/page-cache drift can't
favor a side. The timed segment is exactly the round's links phase up to
(and including) the canonical url/host materialization: explode +
canonicalize + a count(url) that forces every UDF batch.

Usage: python tools/microbench_links.py [n_docs] [n_runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _steal() -> int:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except (OSError, IndexError, ValueError):
        return -1


LINK_KINDS = ("link_book", "link_next", "link_cat")


def build_input(spark, n_docs: int):
    """The round's pre-UDF links input: (url, depth, seq, link_spans),
    from the same generator/spec family as bench.py's crawl corpus."""
    from distributed_web_scrapper_and_crawler_spark.config import CorpusSpec
    from distributed_web_scrapper_and_crawler_spark.sources.corpus import generate_corpus_spark

    n_hosts = 40
    spec = CorpusSpec(
        seed=1,
        n_hosts=n_hosts,
        docs_per_host=max(n_docs // n_hosts, 10),
        links_per_doc=16,
        hot_host_share=0.3,
        query_fragment_rate=0.5,
        relative_href_rate=0.4,
    )
    corpus = generate_corpus_spark(spark, spec)
    kinds = ", ".join(f"'{k}'" for k in LINK_KINDS)
    df = corpus.select(
        F.col("doc_id").alias("url"),
        F.lit(1).alias("depth"),
        F.monotonically_increasing_id().alias("seq"),
        F.expr(
            f"array_sort(filter(spans, s -> s.kind IN ({kinds})),"
            " (a, b) -> CASE WHEN a.offset < b.offset THEN -1"
            " WHEN a.offset > b.offset THEN 1 ELSE 0 END)"
        ).alias("link_spans"),
    )
    df = df.repartition(32).cache()
    n_links = df.select(F.sum(F.size("link_spans"))).first()[0]
    return df, int(n_links)


def links_flat(df, parity: bool):
    from distributed_web_scrapper_and_crawler_spark.functions.canonicalize import (
        canon_links_flat_udf,
    )

    exploded = df.select(
        F.col("seq").alias("parent_seq"),
        F.col("depth").alias("parent_depth"),
        F.col("url").alias("_base"),
        F.posexplode("link_spans").alias("pos", "_sp"),
    ).select(
        "parent_seq",
        (F.col("parent_depth") + F.when(F.col("_sp.kind") == "link_book", 1).otherwise(0))
        .cast("int")
        .alias("depth"),
        F.col("pos").cast("int").alias("pos"),
        "_base",
        F.col("_sp.text").alias("_href"),
    )
    canon = canon_links_flat_udf(parity, False)
    out = exploded.withColumn("_l", canon(F.col("_base"), F.col("_href")))
    return out.select(
        "parent_seq", "depth", "pos", F.col("_l.url").alias("url"), F.col("_l.host").alias("host")
    )


def links_doc(df, parity: bool):
    from distributed_web_scrapper_and_crawler_spark.functions.canonicalize import (
        canon_links_doc_udf,
    )

    canon = canon_links_doc_udf(parity, False)
    doc = (
        df.select(
            F.col("seq").alias("parent_seq"),
            F.col("depth").alias("parent_depth"),
            F.col("url").alias("_base"),
            F.col("link_spans").alias("_spans"),
        )
        .withColumn("_c", canon(F.col("_base"), F.expr("transform(_spans, s -> s.text)")))
        .withColumn("_kinds", F.expr("transform(_spans, s -> s.kind)"))
        .withColumn("_urls", F.col("_c.urls"))
        .withColumn("_hosts", F.col("_c.hosts"))
    )
    return doc.select(
        "parent_seq",
        "parent_depth",
        F.posexplode(F.arrays_zip("_kinds", "_urls", "_hosts")).alias("pos", "_z"),
    ).select(
        "parent_seq",
        (F.col("parent_depth") + F.when(F.col("_z._kinds") == "link_book", 1).otherwise(0))
        .cast("int")
        .alias("depth"),
        F.col("pos").cast("int").alias("pos"),
        F.col("_z._urls").alias("url"),
        F.col("_z._hosts").alias("host"),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from distributed_web_scrapper_and_crawler_spark.session import get_spark

    spark = get_spark(app_name="links-microbench", master="local[16]", shuffle_partitions=32)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    df, n_links = build_input(spark, n_docs)
    print(f"input: {df.count()} docs, {n_links} links", file=sys.stderr)

    builders = {"flat": links_flat, "doc": links_doc}
    results: dict[str, dict] = {}
    for parity in (True, False):
        mode = "parity" if parity else "production"
        # warm both paths (codegen + UDF pickling), untimed
        for b in builders.values():
            b(df, parity).select(F.count("url")).collect()
        times: dict[str, list] = {k: [] for k in builders}
        for i in range(n_runs):
            order = ("flat", "doc") if i % 2 == 0 else ("doc", "flat")
            for name in order:
                s0 = _steal()
                t0 = time.monotonic()
                builders[name](df, parity).select(F.count("url")).collect()
                times[name].append(
                    {"sec": round(time.monotonic() - t0, 3), "steal": _steal() - s0}
                )
        results[mode] = {
            k: {"best_sec": min(r["sec"] for r in v), "runs": v} for k, v in times.items()
        }
    out = {"n_docs": n_docs, "n_links": n_links, "cpus": 16, "modes": results}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
