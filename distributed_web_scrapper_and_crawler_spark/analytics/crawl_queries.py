"""Crawl-engine queries for the driver contract.

These exercise the actual frontier engine (rounds, dedup, scheduling)
on a deterministic mini-corpus generated in-process — independent of
sf_dir, since the crawl corpus is the interleaved-span table of
FIXTURES.md §1, not the flat testdata ``documents``. Iterative
multi-round crawls aren't single SQL statements => no oracle_sql
(driver records rows-only checks); the REAL correctness gate for these
is tests/test_crawl_parity.py against the serial reference oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_web_scrapper_and_crawler_spark.analytics.queries import q
from distributed_web_scrapper_and_crawler_spark.config import CorpusSpec, CrawlConfig
from distributed_web_scrapper_and_crawler_spark.plans.crawl import CrawlEngine
from distributed_web_scrapper_and_crawler_spark.sources.corpus import corpus_df

_SPEC = CorpusSpec(seed=11, n_hosts=3, docs_per_host=6, links_per_doc=4)
_SEEDS = [f"http://{_SPEC.hosts[0]}/page/0"]


def _run_crawl(spark, parity=True, max_rounds=None, **cfg_kw):
    cfg = CrawlConfig(parity_mode=parity, round_budget=64, **cfg_kw)
    eng = CrawlEngine(spark=spark, corpus=corpus_df(spark, _SPEC), cfg=cfg)
    eng.seed(_SEEDS)
    eng.run(max_rounds=max_rounds)
    return eng


@q("crawl_seen_set", None, doc="full crawl: URL-seen membership (parity-tested vs oracle)")
def crawl_seen_set(spark, sf_dir):
    eng = _run_crawl(spark)
    return eng.state.seen.select("url", "round").orderBy("url")


@q("crawl_claim_order", None, doc="full crawl: deterministic global FIFO claim order")
def crawl_claim_order(spark, sf_dir):
    eng = _run_crawl(spark)
    return (
        eng.state.done.filter(F.col("status") == "completed")
        .select("url", "seq", "completed_round")
        .orderBy("completed_round", "seq")
    )


@q("crawl_pages_extracted", None, doc="full crawl: extraction fields per fetched page")
def crawl_pages_extracted(spark, sf_dir):
    eng = _run_crawl(spark)
    return eng.state.pages.select("url", "title", "price", "category", "depth").orderBy("url")


@q("crawl_production_mode", None, doc="per-host budgets + depth cap + full canonicalization")
def crawl_production_mode(spark, sf_dir):
    eng = _run_crawl(spark, parity=False, enforce_max_depth=True, max_depth=2, per_host_budget=4)
    return eng.state.seen.select("url").orderBy("url")
