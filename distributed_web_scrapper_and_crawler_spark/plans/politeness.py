"""Claim scheduling + politeness — the reference's dispatcher, batched.

Reference semantics: ``get_next_url`` atomically claims the single
oldest pending URL (``server.py:416-434``, sort on timestamp => global
FIFO by discovery). Its ``rate_limit`` / ``max_depth`` config knobs are
declared but never enforced (``config.yaml:4-5``, zero code refs), and
robots.txt is absent entirely — so parity mode is plain FIFO.

Engine modes:

- **parity**: claim = lowest-``seq`` ``round_budget`` pending URLs.
  Because every URL's discovery seq is strictly greater than its
  parent's claim seq, batched lowest-seq claims reproduce the serial
  FIFO claim order exactly (proof sketch in SURVEY.md §3.3; asserted by
  tests/test_crawl_parity.py at several budgets).
- **production**: window-ranked per-host batches —
  ``row_number() OVER (PARTITION BY host ORDER BY depth, seq) <= per_host_budget``
  (the north rule's priority queue), plus robots prefix rules and a
  depth cap. Claim order then guarantees per-host FIFO, not global.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from distributed_web_scrapper_and_crawler_spark.config import CrawlConfig


def effective_host_budget(cfg: CrawlConfig) -> int:
    """Per-host claims per round.

    North rule: with a scheduling-round duration and a per-host
    crawl-delay, politeness allows ``floor(round_duration / crawl_delay)``
    fetches per host per round; ``per_host_budget`` is the explicit-count
    ceiling. Clamped to >= 1 so a crawl_delay longer than the round can't
    starve a host forever (documented deviation: sub-1 budgets would need
    fetch-every-k-rounds bookkeeping the reference has no analog of)."""
    if cfg.round_duration_s is not None and cfg.rate_limit > 0:
        derived = int(cfg.round_duration_s // cfg.rate_limit)
        return max(1, min(cfg.per_host_budget, derived))
    return cfg.per_host_budget


def claim_batch(pending: DataFrame, cfg: CrawlConfig) -> DataFrame:
    if cfg.parity_mode:
        # TakeOrderedAndProject — no single-partition window even at scale
        return pending.orderBy("seq").limit(cfg.round_budget)
    budget = effective_host_budget(cfg)
    if cfg.salt_hot_hosts > 1:
        # hot-host salting (north rule): a host holding e.g. 90% of the
        # frontier would funnel its whole window through one task. Salt
        # splits each host's rank across S shards, each claiming
        # budget/S — per-(host,salt) FIFO instead of strict per-host
        # FIFO, an explicitly documented approximation for skewed
        # frontiers. Claims per host stay <= per_host_budget.
        s = cfg.salt_hot_hosts
        per_shard = max(1, budget // s)
        w = Window.partitionBy("host", "_salt").orderBy("depth", "seq")
        return (
            pending.withColumn("_salt", F.pmod(F.col("url_hash"), F.lit(s)))
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= per_shard)
            .drop("_rk", "_salt")
        )
    w = Window.partitionBy("host").orderBy("depth", "seq")
    return (
        pending.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= budget)
        .drop("_rk")
    )


ROBOTS_SCHEMA = "host string, disallow_prefixes array<string>, crawl_delay_s double"


def parse_robots_txt(robots_texts: DataFrame, user_agent: str = "*") -> DataFrame:
    """(host, robots_txt) -> the engine's robots rules table.

    A vectorized pandas UDF parses raw robots.txt bodies: the
    most-specific matching User-agent group wins (exact agent name over
    '*', per RFC 9309 §2.2.1 group selection), its Disallow paths become
    prefix rules and Crawl-delay becomes ``crawl_delay_s``. Empty
    Disallow (allow-all) and comments are handled; unknown directives
    ignored. New capability — the reference never reads robots.txt at
    all (SURVEY.md §2.5)."""
    ua = user_agent.lower()

    def parse_one(text: str) -> tuple[list[str], float | None]:
        groups: list[tuple[list[str], list[str], float | None]] = []  # (agents, disallows, delay)
        agents: list[str] = []
        disallows: list[str] = []
        delay: float | None = None
        in_group_body = False

        def flush():
            nonlocal agents, disallows, delay, in_group_body
            if agents:
                groups.append((agents, disallows, delay))
            agents, disallows, delay = [], [], None
            in_group_body = False

        for raw in (text or "").splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key, val = key.strip().lower(), val.strip()
            if key == "user-agent":
                if in_group_body:
                    flush()
                agents.append(val.lower())
            elif key == "disallow":
                in_group_body = True
                if val:
                    disallows.append(val)
            elif key == "crawl-delay":
                in_group_body = True
                try:
                    delay = float(val)
                except ValueError:
                    pass
        flush()
        exact = [g for g in groups if ua in g[0]]
        star = [g for g in groups if "*" in g[0]]
        chosen = exact or star
        if not chosen:
            return [], None
        dis = [p for g in chosen for p in g[1]]
        delays = [g[2] for g in chosen if g[2] is not None]
        return dis, (delays[0] if delays else None)

    schema = T.StructType(
        [
            T.StructField("disallow_prefixes", T.ArrayType(T.StringType())),
            T.StructField("crawl_delay_s", T.DoubleType()),
        ]
    )

    @F.pandas_udf(schema)
    def _parse(texts: pd.Series) -> pd.DataFrame:
        dis, delay = [], []
        for t in texts:
            d, c = parse_one(t)
            dis.append(d)
            delay.append(c)
        return pd.DataFrame({"disallow_prefixes": dis, "crawl_delay_s": delay})

    return robots_texts.select(
        "host", _parse(F.col("robots_txt")).alias("_r")
    ).select("host", "_r.disallow_prefixes", "_r.crawl_delay_s")


def apply_robots(links: DataFrame, robots: DataFrame) -> DataFrame:
    """Reject links whose path matches a disallow prefix for their host.

    New capability (absent in the reference — SURVEY.md §2.5); robots is
    a small rules table => broadcast left join, default allow. Pure
    Catalyst: ``exists(prefixes, p -> startswith(path, p))``.
    """
    r = robots.select("host", "disallow_prefixes")
    joined = links.join(F.broadcast(r), "host", "left")
    blocked = F.when(
        F.col("disallow_prefixes").isNotNull(),
        F.exists("disallow_prefixes", lambda p: F.col("path").startswith(p)),
    ).otherwise(F.lit(False))
    return joined.filter(~blocked).drop("disallow_prefixes")


def cancel_pending(
    pending: DataFrame, done: DataFrame, rnd: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Stop-crawl: bulk pending -> cancelled (app.py:611-633).

    Returns (new_pending, new_done, cancelled_delta) — the delta is what a
    checkpoint store appends so the mutation survives a restart."""
    cancelled = (
        pending.withColumn("status", F.lit("cancelled")).withColumn("completed_round", F.lit(rnd))
    )
    return pending.limit(0), done.unionByName(cancelled), cancelled
