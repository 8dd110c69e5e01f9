"""Resumability: kill after round k, resume from the snapshot, final state
identical to an uninterrupted run (SURVEY.md §5.5 / north-rule checkpoint
contract)."""

from __future__ import annotations

import os
import shutil

from distributed_web_scrapper_and_crawler_spark.config import CrawlConfig
from distributed_web_scrapper_and_crawler_spark.plans.crawl import CrawlEngine


def _collect_state(eng):
    return {
        "claims": eng.claim_order(),
        "seen": sorted(r["url"] for r in eng.state.seen.collect()),
        "pages": sorted(r["url"] for r in eng.state.pages.collect()),
        "max_seq": eng.state.max_seq,
    }


def test_kill_resume_equals_uninterrupted(spark, small_corpus, seeds, tmp_path):
    cfg = CrawlConfig(parity_mode=True, round_budget=32)
    ckpt = str(tmp_path / "ckpt")

    eng = CrawlEngine(spark=spark, corpus=small_corpus, cfg=cfg, ckpt_dir=ckpt)
    eng.seed(seeds)
    eng.run(max_rounds=2)
    del eng  # "crash"

    eng2 = CrawlEngine(spark=spark, corpus=small_corpus, cfg=cfg, ckpt_dir=ckpt)
    eng2.resume()
    assert eng2.state.round == 1
    eng2.run()

    eng3 = CrawlEngine(spark=spark, corpus=small_corpus, cfg=cfg)
    eng3.seed(seeds)
    eng3.run()
    assert _collect_state(eng2) == _collect_state(eng3)


def test_uncommitted_round_is_invisible(spark, small_corpus, seeds, tmp_path):
    """A round dir without _MANIFEST.json (crash mid-write) must be ignored:
    the manifest is the atomic commit marker."""
    cfg = CrawlConfig(parity_mode=True, round_budget=32)
    ckpt = str(tmp_path / "ckpt")
    eng = CrawlEngine(spark=spark, corpus=small_corpus, cfg=cfg, ckpt_dir=ckpt)
    eng.seed(seeds)
    eng.run(max_rounds=2)
    # simulate a crash mid-write of round 1: drop its manifest
    os.remove(os.path.join(ckpt, "round_000001", "_MANIFEST.json"))

    eng2 = CrawlEngine(spark=spark, corpus=small_corpus, cfg=cfg, ckpt_dir=ckpt)
    eng2.resume()
    assert eng2.state.round == 0  # round 1 never happened
    eng2.run()

    eng3 = CrawlEngine(spark=spark, corpus=small_corpus, cfg=cfg)
    eng3.seed(seeds)
    eng3.run()
    assert _collect_state(eng2) == _collect_state(eng3)


def test_compaction_preserves_state(spark, small_corpus, seeds, tmp_path):
    cfg = CrawlConfig(parity_mode=True, round_budget=4)
    ckpt = str(tmp_path / "ckpt")
    eng = CrawlEngine(spark=spark, corpus=small_corpus, cfg=cfg, ckpt_dir=ckpt)
    eng.store.compact_every = 2  # force frequent compaction
    eng.seed(seeds)
    eng.run(max_rounds=5)
    eng2 = CrawlEngine(spark=spark, corpus=small_corpus, cfg=cfg, ckpt_dir=ckpt)
    eng2.resume()
    a = sorted(r["url"] for r in eng.state.enqueued.collect())
    b = sorted(r["url"] for r in eng2.state.enqueued.collect())
    assert a == b
    assert eng2.state.round == eng.state.round
