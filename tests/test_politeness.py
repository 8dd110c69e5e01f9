"""Production-mode scheduling: per-host window budgets, robots prefix
rules, depth cap — the capabilities the reference declares but never
enforces (config.yaml:4-5, SURVEY.md §2.5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_web_scrapper_and_crawler_spark.config import CrawlConfig
from distributed_web_scrapper_and_crawler_spark.plans.crawl import CrawlEngine
from distributed_web_scrapper_and_crawler_spark.plans.politeness import (
    ROBOTS_SCHEMA,
    apply_robots,
    cancel_pending,
    claim_batch,
)


def test_per_host_budget(spark):
    rows = [
        (f"http://h{h}.t/p{i}", h * 100 + i, f"h{h}.t", 0, 0, h * 100 + i, "x")
        for h in range(3)
        for i in range(10)
    ]
    pending = spark.createDataFrame(
        rows, "url string, url_hash long, host string, depth int, discovered_round int, seq long, added_by string"
    )
    cfg = CrawlConfig(parity_mode=False, per_host_budget=4)
    claim = claim_batch(pending, cfg)
    per_host = {r["host"]: r["n"] for r in claim.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert per_host == {"h0.t": 4, "h1.t": 4, "h2.t": 4}
    # lowest (depth, seq) first within each host
    got = sorted(r["seq"] for r in claim.filter(F.col("host") == "h1.t").collect())
    assert got == [100, 101, 102, 103]


def test_depth_orders_before_seq(spark):
    rows = [
        ("http://h.t/a", 1, "h.t", 5, 0, 1, "x"),  # low seq, deep
        ("http://h.t/b", 2, "h.t", 0, 0, 9, "x"),  # high seq, shallow
    ]
    pending = spark.createDataFrame(
        rows, "url string, url_hash long, host string, depth int, discovered_round int, seq long, added_by string"
    )
    cfg = CrawlConfig(parity_mode=False, per_host_budget=1)
    assert claim_batch(pending, cfg).collect()[0]["url"] == "http://h.t/b"


def test_salted_claim_respects_budget(spark):
    rows = [
        (f"http://hot.t/p{i}", i * 7919, "hot.t", 0, 0, i, "x") for i in range(200)
    ] + [(f"http://cold.t/p{i}", i * 104729 + 3, "cold.t", 0, 0, 1000 + i, "x") for i in range(3)]
    pending = spark.createDataFrame(
        rows, "url string, url_hash long, host string, depth int, discovered_round int, seq long, added_by string"
    )
    cfg = CrawlConfig(parity_mode=False, per_host_budget=16, salt_hot_hosts=4)
    claim = claim_batch(pending, cfg)
    per_host = {r["host"]: r["n"] for r in claim.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert per_host["hot.t"] <= 16  # never exceeds the politeness budget
    assert per_host["hot.t"] >= 8  # shards spread the hot host's claims
    assert per_host["cold.t"] == 3
    # deterministic: same input => same claim set
    again = {r["url"] for r in claim_batch(pending, cfg).collect()}
    assert again == {r["url"] for r in claim.collect()}


def test_robots_prefix_filter(spark):
    links = spark.createDataFrame(
        [
            ("h.t", "/private/x"),
            ("h.t", "/public/x"),
            ("other.t", "/private/x"),  # no rule for this host => allowed
        ],
        "host string, path string",
    )
    robots = spark.createDataFrame([("h.t", ["/private"], 1.0)], ROBOTS_SCHEMA)
    got = sorted((r["host"], r["path"]) for r in apply_robots(links, robots).collect())
    assert got == [("h.t", "/public/x"), ("other.t", "/private/x")]


def test_robots_end_to_end(spark, small_corpus, small_spec, seeds):
    robots = spark.createDataFrame([(small_spec.hosts[0], ["/cat"], 1.0)], ROBOTS_SCHEMA)
    cfg = CrawlConfig(parity_mode=False, enforce_robots=True, per_host_budget=64)
    eng = CrawlEngine(spark=spark, corpus=small_corpus, cfg=cfg, robots=robots)
    eng.seed(seeds)
    eng.run()
    seen = [r["url"] for r in eng.state.seen.collect()]
    blocked = [u for u in seen if u.startswith(f"http://{small_spec.hosts[0]}/cat")]
    assert blocked == []
    # other hosts' /cat pages still crawled
    assert any("/cat/" in u for u in seen)


def test_max_depth_cap(spark, small_corpus, seeds):
    cfg = CrawlConfig(parity_mode=False, enforce_max_depth=True, max_depth=1, per_host_budget=64)
    eng = CrawlEngine(spark=spark, corpus=small_corpus, cfg=cfg)
    eng.seed(seeds)
    eng.run()
    max_depth = eng.state.done.agg(F.max("depth")).collect()[0][0]
    assert max_depth <= 1


def test_cancel_pending(spark):
    pending = spark.createDataFrame(
        [("http://h.t/a", 1, "h.t", 0, 0, 0, "x")],
        "url string, url_hash long, host string, depth int, discovered_round int, seq long, added_by string",
    )
    done = pending.limit(0).withColumn("status", F.lit("")).withColumn("completed_round", F.lit(0))
    new_pending, new_done, delta = cancel_pending(pending, done, rnd=3)
    assert new_pending.count() == 0
    row = new_done.collect()[0]
    assert row["status"] == "cancelled" and row["completed_round"] == 3
    assert delta.count() == 1


def test_time_derived_budget(spark):
    """North rule: per_host_budget = floor(round_duration / crawl_delay),
    enforced per host per round; the count knob remains a ceiling."""
    rows = [
        (f"http://h{h}.t/p{i}", h * 100 + i, f"h{h}.t", 0, 0, h * 100 + i, "x")
        for h in range(2)
        for i in range(10)
    ]
    pending = spark.createDataFrame(
        rows, "url string, url_hash long, host string, depth int, discovered_round int, seq long, added_by string"
    )
    # 6s rounds at 2s crawl-delay => 3 fetches per host per round
    cfg = CrawlConfig(parity_mode=False, per_host_budget=100, rate_limit=2.0, round_duration_s=6.0)
    claim = claim_batch(pending, cfg)
    per_host = {r["host"]: r["n"] for r in claim.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert per_host == {"h0.t": 3, "h1.t": 3}
    # explicit count knob still caps the derived value
    cfg2 = CrawlConfig(parity_mode=False, per_host_budget=2, rate_limit=2.0, round_duration_s=6.0)
    n2 = claim_batch(pending, cfg2).groupBy("host").count().collect()
    assert all(r["count"] == 2 for r in n2)
    # crawl_delay longer than the round clamps at 1, never starves
    cfg3 = CrawlConfig(parity_mode=False, per_host_budget=100, rate_limit=30.0, round_duration_s=6.0)
    n3 = claim_batch(pending, cfg3).groupBy("host").count().collect()
    assert all(r["count"] == 1 for r in n3)


def test_parse_robots_txt(spark):
    """RFC 9309 group selection: exact agent group beats '*'; comments,
    empty Disallow (allow-all) and Crawl-delay handled; the parsed table
    drives apply_robots end-to-end."""
    from distributed_web_scrapper_and_crawler_spark.plans.politeness import parse_robots_txt

    body_a = """# site A
User-agent: dwsc-spark
Disallow: /private
Disallow: /tmp
Crawl-delay: 2.5

User-agent: *
Disallow: /
"""
    body_b = """User-agent: *
Disallow:
"""
    body_c = """User-agent: otherbot
Disallow: /x
"""
    df = spark.createDataFrame(
        [("a.t", body_a), ("b.t", body_b), ("c.t", body_c)], "host string, robots_txt string"
    )
    rules = {r["host"]: r for r in parse_robots_txt(df, user_agent="dwsc-spark").collect()}
    assert rules["a.t"]["disallow_prefixes"] == ["/private", "/tmp"]  # exact group wins over *
    assert rules["a.t"]["crawl_delay_s"] == 2.5
    assert rules["b.t"]["disallow_prefixes"] == []  # empty Disallow = allow all
    assert rules["c.t"]["disallow_prefixes"] == []  # no matching group

    links = spark.createDataFrame(
        [("a.t", "/private/x"), ("a.t", "/ok"), ("b.t", "/anything")], "host string, path string"
    )
    got = sorted((r["host"], r["path"]) for r in apply_robots(links, parse_robots_txt(df, "dwsc-spark")).collect())
    assert got == [("a.t", "/ok"), ("b.t", "/anything")]
