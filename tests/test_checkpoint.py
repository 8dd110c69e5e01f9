"""Resumability: kill after round k, resume from the snapshot, final state
identical to an uninterrupted run (SURVEY.md §5.5 / north-rule checkpoint
contract)."""

from __future__ import annotations

import os
import shutil

from distributed_web_scrapper_and_crawler_spark.config import CrawlConfig
from distributed_web_scrapper_and_crawler_spark.plans.crawl import CrawlEngine


from tests.conftest import collect_engine_state as _collect_state


def test_kill_resume_equals_uninterrupted(spark, tiny_corpus, tiny_seeds, tmp_path, tiny_uninterrupted):
    cfg = CrawlConfig(parity_mode=True, round_budget=32)
    ckpt = str(tmp_path / "ckpt")

    eng = CrawlEngine(spark=spark, corpus=tiny_corpus, cfg=cfg, ckpt_dir=ckpt)
    eng.seed(tiny_seeds)
    eng.run(max_rounds=2)
    del eng  # "crash"

    eng2 = CrawlEngine(spark=spark, corpus=tiny_corpus, cfg=cfg, ckpt_dir=ckpt)
    eng2.resume()
    assert eng2.state.round == 1
    eng2.run()
    assert _collect_state(eng2) == tiny_uninterrupted


def test_uncommitted_round_is_invisible(spark, tiny_corpus, tiny_seeds, tmp_path, tiny_uninterrupted):
    """A round dir without _MANIFEST.json (crash mid-write) must be ignored:
    the manifest is the atomic commit marker."""
    cfg = CrawlConfig(parity_mode=True, round_budget=32)
    ckpt = str(tmp_path / "ckpt")
    eng = CrawlEngine(spark=spark, corpus=tiny_corpus, cfg=cfg, ckpt_dir=ckpt)
    eng.seed(tiny_seeds)
    eng.run(max_rounds=2)
    # simulate a crash mid-write of round 1: drop its manifest
    os.remove(os.path.join(ckpt, "round_000001", "_MANIFEST.json"))

    eng2 = CrawlEngine(spark=spark, corpus=tiny_corpus, cfg=cfg, ckpt_dir=ckpt)
    eng2.resume()
    assert eng2.state.round == 0  # round 1 never happened
    eng2.run()
    assert _collect_state(eng2) == tiny_uninterrupted


def test_checkpoint_every_2_loses_nothing(spark, tiny_corpus, tiny_seeds, tmp_path, tiny_uninterrupted):
    """checkpoint_every > 1 buffers skipped rounds' deltas and unions them
    into the next durable write — resume state must equal a fresh run
    (ADVICE r1 #1: non-durable rounds were silently dropped)."""
    # budget 32 matches the shared tiny_uninterrupted reference; the budget
    # never binds on the tiny corpus so the buffering behavior under test
    # is unchanged
    cfg = CrawlConfig(parity_mode=True, round_budget=32)
    ckpt = str(tmp_path / "ckpt")
    eng = CrawlEngine(spark=spark, corpus=tiny_corpus, cfg=cfg, ckpt_dir=ckpt, checkpoint_every=2)
    eng.seed(tiny_seeds)
    eng.run(max_rounds=3)  # rounds 0,1,2: round 1 is non-durable, flushed at stop
    del eng

    eng2 = CrawlEngine(spark=spark, corpus=tiny_corpus, cfg=cfg, ckpt_dir=ckpt, checkpoint_every=2)
    eng2.resume()
    assert eng2.state.round == 2
    eng2.run()
    assert _collect_state(eng2) == tiny_uninterrupted


def test_lifecycle_mutations_survive_restart(spark, tiny_corpus, tiny_seeds, tmp_path):
    """enqueue_seeds / cancel / readmit must commit to the store so a
    restart can't resurrect cancelled URLs or re-crawl stream-enqueued
    seeds (ADVICE r1 #2)."""
    from pyspark.sql import functions as F

    cfg = CrawlConfig(parity_mode=True, round_budget=8)
    ckpt = str(tmp_path / "ckpt")
    eng = CrawlEngine(spark=spark, corpus=tiny_corpus, cfg=cfg, ckpt_dir=ckpt)
    eng.seed(tiny_seeds)
    eng.run(max_rounds=2)
    n_cancelled = eng.cancel()
    assert n_cancelled > 0
    live_cancelled = {
        r["url"] for r in eng.state.done.filter("status = 'cancelled'").collect()
    }
    del eng  # "crash" right after cancel

    eng2 = CrawlEngine(spark=spark, corpus=tiny_corpus, cfg=cfg, ckpt_dir=ckpt)
    eng2.resume()
    stored_cancelled = {
        r["url"] for r in eng2.state.done.filter("status = 'cancelled'").collect()
    }
    assert stored_cancelled == live_cancelled  # cancel survived the restart
    assert eng2.state.pending_count == 0

    # readmit + re-enqueue, crash again, resume: the re-crawl must proceed
    eng2.readmit_cancelled()
    n = eng2.enqueue_seeds(sorted(live_cancelled))
    assert n == len(live_cancelled)
    enq_live = eng2.state.enqueued.count()
    del eng2

    eng3 = CrawlEngine(spark=spark, corpus=tiny_corpus, cfg=cfg, ckpt_dir=ckpt)
    eng3.resume()
    assert eng3.state.done.filter("status = 'cancelled'").count() == 0  # readmit survived
    assert eng3.state.enqueued.count() == enq_live  # enqueue_seeds survived
    assert eng3.state.pending_count == len(live_cancelled)
    eng3.run()
    seen = {r["url"] for r in eng3.state.seen.collect()}
    in_corpus = {r["doc_id"] for r in tiny_corpus.select("doc_id").collect()}
    assert {u for u in live_cancelled if u in in_corpus} <= seen


def test_compaction_preserves_state(spark, tiny_corpus, tiny_seeds, tmp_path):
    cfg = CrawlConfig(parity_mode=True, round_budget=4)
    ckpt = str(tmp_path / "ckpt")
    eng = CrawlEngine(spark=spark, corpus=tiny_corpus, cfg=cfg, ckpt_dir=ckpt)
    eng.store.compact_every = 2  # force frequent compaction
    eng.seed(tiny_seeds)
    eng.run(max_rounds=5)
    eng2 = CrawlEngine(spark=spark, corpus=tiny_corpus, cfg=cfg, ckpt_dir=ckpt)
    eng2.resume()
    a = sorted(r["url"] for r in eng.state.enqueued.collect())
    b = sorted(r["url"] for r in eng2.state.enqueued.collect())
    assert a == b
    assert eng2.state.round == eng.state.round


def test_table_format_probe(spark, tmp_path):
    """The store probes for an ACID runtime (Iceberg jar > delta-spark >
    parquet-manifest fallback) and configures itself accordingly; every
    other test in this file exercises whichever backend the environment
    offers (VERDICT r1 #9)."""
    from distributed_web_scrapper_and_crawler_spark.plans.checkpoint import CheckpointStore
    from distributed_web_scrapper_and_crawler_spark.session import probe_table_format

    fmt = probe_table_format()
    assert fmt in ("iceberg", "delta", "parquet-manifest")
    store = CheckpointStore(spark, str(tmp_path / "s"))
    assert store.storage_format == ("delta" if fmt == "delta" else "parquet")


def test_delta_branch_exercised_with_stub(spark, tmp_path, monkeypatch):
    """Force storage_format='delta' and drive the Delta read/write branches
    with stub writer/reader objects — the sandbox ships no delta-spark, so
    this is the honest way to keep the ACID path executed (VERDICT r2 #5).
    If delta-spark IS present, test_kill_resume_* already round-trips it."""
    from types import SimpleNamespace

    import distributed_web_scrapper_and_crawler_spark.session as sess
    from distributed_web_scrapper_and_crawler_spark.plans.checkpoint import CheckpointStore

    monkeypatch.setattr(sess, "probe_table_format", lambda: "delta")
    store = CheckpointStore(spark, str(tmp_path / "d"))
    assert store.storage_format == "delta"

    # _write must route through .format('delta')
    calls: dict = {}

    class _W:
        def mode(self, m):
            calls["mode"] = m
            return self

        def format(self, f):
            calls["format"] = f
            return self

        def save(self, p):
            calls["path"] = p

    store._write(SimpleNamespace(write=_W()), str(tmp_path / "d" / "t"))
    assert calls == {"mode": "overwrite", "format": "delta", "path": str(tmp_path / "d" / "t")}

    # _read must load each path via format('delta') and union the parts
    class _FakeDF:
        def __init__(self, paths):
            self.paths = paths

        def unionByName(self, other):
            return _FakeDF(self.paths + other.paths)

    class _R:
        def format(self, f):
            assert f == "delta"
            return self

        def load(self, p):
            return _FakeDF([p])

    store.spark = SimpleNamespace(read=_R())
    out = store._read(None, ["p1", "p2", "p3"])
    assert out.paths == ["p1", "p2", "p3"]


def test_flush_caches_pins_buffered_deltas(spark, tiny_corpus, tiny_seeds, tmp_path, tiny_uninterrupted):
    """flush_caches(materialize=True) destroys retained broadcasts; buffered
    (not-yet-durable) deltas from checkpoint_every > 1 are lazy plans over
    those broadcasts and must be localCheckpointed first, or the eventual
    flush_to_store() dies with 'Broadcast destroyed' and the buffered rounds
    are unrecoverable (ADVICE r4 medium)."""
    # sharded filter: the one mode whose retained handles are Broadcasts
    # (destroy()ed, not unpersisted => lazy readers fail, never recompute)
    cfg = CrawlConfig(
        parity_mode=True,
        round_budget=32,
        lazy_output_tables=True,
        seen_filter="sharded",
        bloom_shards=4,
    )
    ckpt = str(tmp_path / "ckpt")
    eng = CrawlEngine(
        spark=spark, corpus=tiny_corpus, cfg=cfg, ckpt_dir=ckpt, checkpoint_every=3
    )
    eng.seed(tiny_seeds)
    # round 1 is non-durable: its deltas sit in _buffered_deltas as lazy
    # plans over the caches/broadcasts retained by lazy_output_tables
    for _ in range(2):
        from distributed_web_scrapper_and_crawler_spark.plans.round import run_round

        res = run_round(eng.spark, eng.state, eng.corpus, eng.cfg, bloom=eng.bloom)
        assert not res.drained
        eng._materialize(res)
    assert eng._buffered_deltas and eng._retained_caches
    eng.flush_caches(materialize=True)  # user frees memory mid-crawl
    eng.flush_to_store()  # must NOT hit destroyed broadcasts
    eng.run()  # finish the crawl

    eng2 = CrawlEngine(
        spark=spark, corpus=tiny_corpus, cfg=cfg, ckpt_dir=ckpt, checkpoint_every=3
    )
    eng2.resume()
    eng2.run()
    assert _collect_state(eng2) == tiny_uninterrupted
