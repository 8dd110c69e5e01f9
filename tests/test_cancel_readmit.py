"""Cancel + re-admission lifecycle — the deletable-entry capability the
reference lacks (cancelled URLs are blocked forever by its any-status
queue check, server.py:440-443). Covered with both seen-filter kinds:
cuckoo (in-place delete) and bloom (rebuild)."""

from __future__ import annotations

import pytest

from distributed_web_scrapper_and_crawler_spark.config import CrawlConfig
from distributed_web_scrapper_and_crawler_spark.plans.crawl import CrawlEngine


@pytest.mark.parametrize("filter_kind", ["bloom", "cuckoo", "sharded"])
def test_cancel_then_readmit_then_recrawl(spark, tiny_corpus, tiny_seeds, filter_kind):
    cfg = CrawlConfig(parity_mode=True, round_budget=8, seen_filter=filter_kind)
    eng = CrawlEngine(spark=spark, corpus=tiny_corpus, cfg=cfg)
    eng.seed(tiny_seeds)
    # one round is enough state for the lifecycle under test: done rows to
    # cancel, discovered links left pending
    eng.run(max_rounds=1)

    n_cancelled = eng.cancel()
    assert n_cancelled > 0
    assert eng.state.pending_count == 0
    # drained: cancelled URLs are NOT re-enqueuable (reference semantics)
    assert eng.enqueue_seeds([eng.state.done.collect()[0]["url"]]) in (0, 1)

    cancelled_urls = [
        r["url"] for r in eng.state.done.filter("status = 'cancelled'").collect()
    ]
    n_readmitted = eng.readmit_cancelled()
    assert n_readmitted == n_cancelled
    # now the same URLs can be enqueued again and get crawled
    n = eng.enqueue_seeds(cancelled_urls)
    assert n == len(cancelled_urls)
    eng.run()
    seen = {r["url"] for r in eng.state.seen.collect()}
    in_corpus = {r["doc_id"] for r in tiny_corpus.select("doc_id").collect()}
    for u in cancelled_urls:
        if u in in_corpus:
            assert u in seen


def test_cuckoo_engine_matches_bloom_engine(spark, tiny_corpus, tiny_seeds, tiny_uninterrupted):
    """The seen filter is a correctness-neutral prefilter: a cuckoo engine
    must claim in exactly the order of the shared bloom-engine reference
    (tiny_uninterrupted; budgets never bind on the tiny corpus, so the
    comparison also pins budget invariance)."""
    cfg = CrawlConfig(parity_mode=True, round_budget=64, seen_filter="cuckoo")
    eng = CrawlEngine(spark=spark, corpus=tiny_corpus, cfg=cfg, bloom_capacity=1 << 14)
    eng.seed(tiny_seeds)
    eng.run()
    assert eng.claim_order() == tiny_uninterrupted["claims"]
