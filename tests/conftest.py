from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_web_scrapper_and_crawler_spark.config import CorpusSpec
from distributed_web_scrapper_and_crawler_spark.session import get_spark
from distributed_web_scrapper_and_crawler_spark.sources.corpus import (
    CORPUS_SPARK_SCHEMA,
    generate_corpus,
)


@pytest.fixture(scope="session")
def spark():
    # AQE off: at test scale its per-job re-optimization is pure serial
    # driver overhead (same reasoning as the crawl bench, PLANS.md ledger);
    # production sessions keep it on (session.py defaults).
    # shuffle_partitions=4: every test table is tiny (<= a few thousand
    # rows), so task COUNT is pure scheduling overhead — 4 instead of 8
    # partitions halves the per-job task spam without changing any
    # partitioning-sensitive behavior (claim order, seq, parity are
    # partition-count-invariant by design and tested so).
    s = get_spark(
        app_name="dwsc-tests",
        master="local[8]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    yield s


@pytest.fixture(scope="session")
def small_spec() -> CorpusSpec:
    return CorpusSpec(seed=42, n_hosts=4, docs_per_host=12, links_per_doc=5)


@pytest.fixture(scope="session")
def small_corpus_pdf(small_spec):
    return generate_corpus(small_spec)


@pytest.fixture(scope="session")
def small_corpus(spark, small_corpus_pdf):
    df = spark.createDataFrame(small_corpus_pdf, schema=CORPUS_SPARK_SCHEMA)
    df.cache().count()
    return df


@pytest.fixture(scope="session")
def seeds(small_spec) -> list[str]:
    return [f"http://{small_spec.hosts[0]}/page/0", f"http://{small_spec.hosts[1]}/page/3"]


# -- a deliberately tiny web for the crawl-several-times test families
# (checkpoint/lifecycle): the assertions there are about durability, not
# extraction richness, and every saved round is several Spark jobs --------


@pytest.fixture(scope="session")
def tiny_spec() -> CorpusSpec:
    return CorpusSpec(seed=43, n_hosts=2, docs_per_host=4, links_per_doc=3)


@pytest.fixture(scope="session")
def tiny_corpus(spark, tiny_spec):
    df = spark.createDataFrame(generate_corpus(tiny_spec), schema=CORPUS_SPARK_SCHEMA)
    df.cache().count()
    return df


@pytest.fixture(scope="session")
def tiny_seeds(tiny_spec) -> list[str]:
    return [f"http://{tiny_spec.hosts[0]}/page/0"]


def collect_engine_state(eng) -> dict:
    """Comparable end-state snapshot (claims, seen, pages, max_seq)."""
    return {
        "claims": eng.claim_order(),
        "seen": sorted(r["url"] for r in eng.state.seen.collect()),
        "pages": sorted(r["url"] for r in eng.state.pages.collect()),
        "max_seq": eng.state.max_seq,
    }


@pytest.fixture(scope="session")
def tiny_uninterrupted(spark, tiny_corpus, tiny_seeds) -> dict:
    """End state of ONE uninterrupted full-drain parity crawl of the tiny
    corpus — the shared reference every durability/lifecycle test compares
    against (VERDICT r3 #4: each test re-ran this identical crawl; the
    round budget never binds on the tiny corpus, so engines at budget
    8/16/32/64 produce the same claims and the single reference serves
    them all)."""
    from distributed_web_scrapper_and_crawler_spark.config import CrawlConfig
    from distributed_web_scrapper_and_crawler_spark.plans.crawl import CrawlEngine

    eng = CrawlEngine(
        spark=spark, corpus=tiny_corpus, cfg=CrawlConfig(parity_mode=True, round_budget=32)
    )
    eng.seed(tiny_seeds)
    eng.run()
    return collect_engine_state(eng)


# -- interference accounting (VERDICT r4 #4): suite wall-time claims on
# this VM are meaningless without their steal regime — print the
# /proc/stat steal ticks consumed during the session so "suite took N min"
# always carries whether a co-tenant storm inflated it.
def _session_steal_ticks() -> int:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except (OSError, IndexError, ValueError):
        return -1


def pytest_sessionstart(session):
    import time as _time

    session._dwsc_steal0 = _session_steal_ticks()
    session._dwsc_t0 = _time.monotonic()


def pytest_sessionfinish(session, exitstatus):
    import time as _time

    s0 = getattr(session, "_dwsc_steal0", -1)
    s1 = _session_steal_ticks()
    wall = _time.monotonic() - getattr(session, "_dwsc_t0", _time.monotonic())
    ticks = (s1 - s0) if (s0 >= 0 and s1 >= 0) else None
    regime = "n/a"
    if ticks is not None and wall > 0:
        per_min = ticks / (wall / 60)
        regime = f"{ticks} ticks ({per_min:.0f}/min: {'STORM' if per_min > 100 else 'quiet'})"
    print(f"\n[steal] suite wall {wall:.0f}s, co-tenant steal {regime}")
