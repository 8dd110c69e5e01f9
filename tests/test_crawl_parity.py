"""End-to-end parity: engine vs the serial reference oracle.

Asserts the BASELINE.json:6 correctness contract: identical claim
ordering, identical URL-seen membership, and span-sequence equality
(kind, text, media_ref, order) per emitted document — at several round
budgets (budget=1 is the reference's literal one-URL-at-a-time mode;
larger budgets must preserve the same global FIFO order, SURVEY.md §3.3).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_web_scrapper_and_crawler_spark.config import CrawlConfig
from distributed_web_scrapper_and_crawler_spark.plans.crawl import CrawlEngine
from tests.oracle import crawl_oracle


def _run_engine(spark, corpus, seeds, budget, use_bloom=True, max_rounds=None):
    cfg = CrawlConfig(parity_mode=True, round_budget=budget, use_bloom=use_bloom)
    eng = CrawlEngine(spark=spark, corpus=corpus, cfg=cfg)
    eng.seed(seeds)
    eng.run(max_rounds=max_rounds)
    return eng


def test_claim_order_and_seen_parity_full_drain(spark, small_corpus, small_corpus_pdf, seeds):
    oracle = crawl_oracle(small_corpus_pdf, seeds)
    eng = _run_engine(spark, small_corpus, seeds, budget=1000)
    assert eng.claim_order() == oracle.claim_order
    engine_seen = {r["url"] for r in eng.state.seen.select("url").collect()}
    assert engine_seen == oracle.seen
    statuses = {r["url"]: r["status"] for r in eng.state.done.select("url", "status").collect()}
    assert statuses == oracle.statuses


@pytest.mark.parametrize("budget,rounds", [(1, 8), (7, 4)])
def test_claim_order_prefix_parity(spark, small_corpus, small_corpus_pdf, seeds, budget, rounds):
    """budget=1 is the reference's literal serial dispatch (server.py:416-434
    claims exactly one pending URL); the engine's claim order must match the
    oracle claim-for-claim. Bounded to a prefix to keep rounds tractable."""
    eng = _run_engine(spark, small_corpus, seeds, budget, max_rounds=rounds)
    got = eng.claim_order()
    oracle = crawl_oracle(small_corpus_pdf, seeds)  # full run; compare prefix
    assert len(got) > 0
    assert got == oracle.claim_order[: len(got)]


def test_span_sequence_invariant(spark, small_corpus, small_corpus_pdf, seeds):
    """Per-row invariant (BASELINE.json:15): for every emitted document the
    engine's span sequence equals the oracle's (kind, text, media_ref,
    order-by-offset) tuple sequence."""
    oracle = crawl_oracle(small_corpus_pdf, seeds)
    eng = _run_engine(spark, small_corpus, seeds, budget=64)
    rows = eng.state.pages.select("url", "spans").collect()
    engine_pages = {
        r["url"]: [(sp["kind"], sp["text"], sp["media_ref"]) for sp in r["spans"]] for r in rows
    }
    oracle_pages = {u: p["span_seq"] for u, p in oracle.pages.items()}
    assert engine_pages == oracle_pages


def test_field_extraction_parity(spark, small_corpus, small_corpus_pdf, seeds):
    oracle = crawl_oracle(small_corpus_pdf, seeds)
    eng = _run_engine(spark, small_corpus, seeds, budget=64)
    fields = ("title", "price", "rating", "availability", "category", "description")
    got = {r["url"]: tuple(r[f] for f in fields) for r in eng.state.pages.collect()}
    want = {u: tuple(p[f] for f in fields) for u, p in oracle.pages.items()}
    assert got == want


def test_bloom_off_equals_bloom_on(spark, small_corpus, seeds):
    a = _run_engine(spark, small_corpus, seeds, budget=32, use_bloom=True)
    b = _run_engine(spark, small_corpus, seeds, budget=32, use_bloom=False)
    assert a.claim_order() == b.claim_order()


def test_depth_semantics(spark, small_corpus, small_corpus_pdf, seeds):
    """link_book => depth+1; link_next/link_cat => same depth
    (remote_worker.py:220,:236,:252)."""
    oracle = crawl_oracle(small_corpus_pdf, seeds)
    eng = _run_engine(spark, small_corpus, seeds, budget=64)
    got = {r["url"]: r["depth"] for r in eng.state.pages.select("url", "depth").collect()}
    want = {u: p["depth"] for u, p in oracle.pages.items()}
    assert got == want


def test_interrupted_equals_uninterrupted(spark, small_corpus, seeds):
    full = _run_engine(spark, small_corpus, seeds, budget=64)
    part = _run_engine(spark, small_corpus, seeds, budget=64, max_rounds=2)
    part.run()  # continue to drain
    assert part.claim_order() == full.claim_order()
    a = {r["url"] for r in part.state.seen.collect()}
    b = {r["url"] for r in full.state.seen.collect()}
    assert a == b
