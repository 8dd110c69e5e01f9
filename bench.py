"""Benchmark harness.

Prints ONE JSON line:
  {"metric": ..., "value": <total headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "crawl": {urls_per_sec, ...}, "cpus": N}

Env knobs:
  SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default 32)
  SPARK_GRAFT_BENCH_MODE  full | queries | crawl   (default full)
  SPARK_GRAFT_CRAWL_DOCS  synthetic-web size for the crawl bench (default 800000)
  SPARK_GRAFT_CRAWL_RUNS  quiet-gated crawl attempts, best kept (default 2)
  SPARK_GRAFT_QUIET_WAIT_S  max sec to wait for a quiet window before each
                            crawl attempt (default 300; 0 disables gating)

Interference accounting (VERDICT r4 #1): this VM takes bursty co-tenant
CPU steal (multi-minute storms of 150-300 ticks/15 s vs quiet spells of
< 20 — see BENCH.md). Every section of the JSON line therefore carries
the /proc/stat steal ticks consumed DURING it, the crawl section is
best-of-N with each attempt gated on a bounded quiet-window wait (the
same protocol tools/scaling_evidence.py uses), and ALL crawl attempts
are reported so the steal correlation is visible in the artifact itself.

The crawl section measures the north-rule metric (URLs scheduled+deduped
per second) on the real engine: production-mode rounds (per-host window
budgets, Bloom-prefiltered dedup) over a deterministic synthetic web.
Scaling evidence (local[2] vs local[8], the single protocol in BASELINE.md) is produced by
tools/scaling_evidence.py, which shells out to this file at two
parallelism levels on the SAME cached corpus.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

def _steal_ticks() -> int:
    """Cumulative steal ticks (USER_HZ, normally 10 ms) across all cpus —
    /proc/stat 'cpu' line field 8. -1 where unavailable (non-Linux)."""
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except (OSError, IndexError, ValueError):
        return -1


def _steal_delta(s0: int, s1: int) -> int | None:
    return None if s0 < 0 or s1 < 0 else s1 - s0


def wait_for_quiet(max_wait_s: int, threshold: int = 60, window_s: int = 15) -> dict:
    """Block until a window_s sample shows < threshold steal ticks, or the
    bounded wait budget runs out (identical gate to
    tools/scaling_evidence.py). Returns what happened so the artifact
    records whether the following run started quiet or gave up mid-storm."""
    t0 = time.monotonic()
    last = -1
    while max_wait_s > 0 and _steal_ticks() >= 0:
        s0 = _steal_ticks()
        time.sleep(window_s)
        last = _steal_ticks() - s0
        if last < threshold or (time.monotonic() - t0) > max_wait_s:
            break
    return {
        "waited_sec": round(time.monotonic() - t0, 1),
        "last_window_ticks": last,
        "quiet": 0 <= last < threshold,
    }


HEADLINE = [
    "flagship_q1",
    "revenue_by_nation",
    "topk_per_group",
    "sessionize",
    "text_search",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "embedding_topk",
    "token_stats",
    "recent_activity",
]


def bench_queries(spark, sf_dir: str) -> tuple[dict[str, float], dict[str, int | None]]:
    from distributed_web_scrapper_and_crawler_spark.analytics import QUERY_REGISTRY

    # JVM/codegen warmup, untimed (JMH-style): the first query in a cold
    # JVM otherwise pays whole-stage-codegen compilation + JIT for the
    # whole session. Warms code paths on the TINY sf, never the bench
    # input's page cache.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir):
        for name in ("flagship_q1", "topk_per_group"):
            QUERY_REGISTRY[name].fn(spark, warm_dir).count()

    out: dict[str, float] = {}
    steal: dict[str, int | None] = {}
    for name in HEADLINE:
        fn = QUERY_REGISTRY[name].fn
        best = None
        best_steal = None
        # min of 2 runs per query: this VM takes bursty co-tenant CPU
        # steal (see BENCH.md); steal only ever slows a run
        for _ in range(2):
            s0 = _steal_ticks()
            t0 = time.monotonic()
            fn(spark, sf_dir).count()
            dt = time.monotonic() - t0
            if best is None or dt < best:
                best, best_steal = dt, _steal_delta(s0, _steal_ticks())
        out[name] = round(best, 3)
        steal[name] = best_steal  # ticks taken during the KEPT (fastest) run
    return out, steal


def _bench_corpus(spark, n_docs: int):
    """Deterministic bench corpus, cached to /tmp keyed by its spec.

    Generated DISTRIBUTED (one task per host, per-host seeded RNG —
    sources/corpus.py generate_corpus_spark): the serial pandas generator
    costs ~2 min of driver time at 400k docs; parallel generation is
    ~10 s and the corpus shape/statistics are identical."""
    from distributed_web_scrapper_and_crawler_spark.config import CorpusSpec
    from distributed_web_scrapper_and_crawler_spark.sources.corpus import (
        generate_corpus_spark,
        read_corpus,
    )

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
    key = hashlib.md5(("v2:" + repr(spec)).encode()).hexdigest()[:12]
    path = f"/tmp/dwsc_bench_corpus_{key}.parquet"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        generate_corpus_spark(spark, spec).write.mode("overwrite").parquet(path)
    return read_corpus(spark, path), spec


def bench_crawl(spark, n_docs: int, rounds: int = 4, seed_frac: float = 0.3) -> dict:
    """Steady-state throughput: the north metric is URLs scheduled+deduped
    per second on a LARGE frontier — so pre-seed a fat frontier (the
    10^10-frontier stand-in) instead of timing the BFS cold start, whose
    1-seed warm-up rounds measure fixed overhead, not the engine."""
    from distributed_web_scrapper_and_crawler_spark.config import CrawlConfig
    from distributed_web_scrapper_and_crawler_spark.plans.crawl import CrawlEngine

    corpus, spec = _bench_corpus(spark, n_docs)
    # parquet splits would cache the corpus as ~5 fat partitions, capping
    # the fetch-join + extraction stages at 5 tasks; repartition once on
    # the JOIN KEY (fixed count — identical across scaling levels) so the
    # copartitioned fetch join reads the cache in place and only the claim
    # side shuffles each round
    corpus = corpus.repartition(64, "doc_id").cache()
    corpus.count()
    # AQE's per-job re-optimization is measurable serial driver time on
    # the hand-sized round plans (see PLANS.md ledger); analytics queries
    # keep it on
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    cfg = CrawlConfig(
        parity_mode=False,
        per_host_budget=1 << 17,  # politeness window enforced, batches stay fat
        use_bloom=True,
        allowed_domains=("example.test",),
        lazy_output_tables=True,
        # claim-side-only shuffle into the corpus's cached partitioning:
        # kills the per-round driver-side broadcast collect+build (serial
        # at every parallelism level — scaling-efficiency tax)
        fetch_join="copartition",
        # the per-round fetched-row count job is serial overhead the north
        # metric doesn't need (links_found still collected)
        collect_fetch_stats=False,
        # hot-host salting (north-rule skew handling): host 0 carries 30%
        # of the frontier; unsalted, its claim window sorts on ONE core
        # and flat-lines the scaling ratio (PLANS.md ledger)
        salt_hot_hosts=8,
        # links-phase Arrow granularity A/B knob (VERDICT r4 #3)
        links_kernel=os.environ.get("SPARK_GRAFT_LINKS_KERNEL", "auto"),
    )
    eng = CrawlEngine(spark=spark, corpus=corpus, cfg=cfg, bloom_capacity=1 << 22)
    step = max(1, int(1 / seed_frac))
    seeds = [
        f"http://{h}/page/{i}"
        for h in spec.hosts
        for i in range(0, spec.docs_per_host, step)
    ]
    eng.seed(seeds)  # seeding excluded: the metric times scheduling rounds
    t0 = time.monotonic()
    eng.run(max_rounds=rounds)
    wall = time.monotonic() - t0
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # release the engine's retained caches/broadcasts AND the corpus cache
    # before the next best-of-N attempt: leaving them resident would run
    # later attempts under earlier attempts' storage-memory footprint,
    # biasing the comparison toward attempt 0 (ADVICE r5 low)
    eng.flush_caches(materialize=False)
    corpus.unpersist(blocking=True)
    claimed = sum(s["urls_claimed"] for s in eng.round_stats)
    links = sum(s["links_found"] for s in eng.round_stats)
    new = sum(s["links_new"] for s in eng.round_stats)
    # per-phase totals across rounds (claim / links / dedup_seq / bloom_add /
    # fetched_count / materialize) — the scaling harness records these per
    # level so a sub-0.8 efficiency can be attributed to its serial term
    phases: dict[str, float] = {}
    for s in eng.round_stats:
        for k, v in s.get("phases", {}).items():
            phases[k] = round(phases.get(k, 0.0) + v, 3)
    return {
        "rounds": len(eng.round_stats),
        "n_seeds": len(seeds),
        "urls_claimed": claimed,
        "links_deduped": links,
        "links_new": new,
        "wall_sec": round(wall, 2),
        "urls_per_sec": round((claimed + links) / wall, 1),
        "scheduled_per_sec": round(claimed / wall, 1),
        "phases": phases,
    }


def bench_crawl_best_of(spark, n_docs: int, n_runs: int, quiet_wait_s: int) -> tuple[dict, list[dict]]:
    """Best (highest urls_per_sec) of n_runs crawl attempts, each gated on
    a bounded quiet-window wait and annotated with its during-run steal.
    All attempts are returned for the artifact — a single un-gated number
    on this VM is noise (VERDICT r4 #1; judge-reproduced 2x storm swing)."""
    best = None
    attempts: list[dict] = []
    for i in range(max(1, n_runs)):
        gate = wait_for_quiet(quiet_wait_s)
        s0 = _steal_ticks()
        r = bench_crawl(spark, n_docs)
        r["steal_ticks"] = _steal_delta(s0, _steal_ticks())
        r["quiet_gate"] = gate
        r["run_idx"] = i
        attempts.append(r)
        if best is None or r["urls_per_sec"] > best["urls_per_sec"]:
            best = r
    return best, attempts


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mode = os.environ.get("SPARK_GRAFT_BENCH_MODE", "full")
    crawl_docs = int(os.environ.get("SPARK_GRAFT_CRAWL_DOCS", "800000"))
    crawl_runs = int(os.environ.get("SPARK_GRAFT_CRAWL_RUNS", "2"))
    quiet_wait_s = int(os.environ.get("SPARK_GRAFT_QUIET_WAIT_S", "300"))

    from distributed_web_scrapper_and_crawler_spark.session import get_spark

    # shuffle_partitions FIXED across parallelism levels — the scaling
    # comparison must differ only in local[N] (BASELINE.md protocol)
    spark = get_spark(app_name="dwsc-bench", master=f"local[{cpus}]", shuffle_partitions=32)

    steal_start = _steal_ticks()
    t_start = time.monotonic()
    queries: dict[str, float] = {}
    queries_steal: dict = {}
    crawl: dict = {}
    crawl_attempts: list[dict] = []
    if mode in ("full", "queries"):
        # same bounded quiet gate the crawl attempts use: the per-query
        # min-of-2 shields against short bursts, but a storm outlasting
        # the whole section (r6 dry run: queries 13.6 s @ 12.9k ticks vs
        # 9.6 s quiet in r5) needs the section START gated too. Capped
        # below the crawl gates: the section is min-of-2-shielded, so a
        # long wait buys less here than total-runtime headroom costs.
        qgate = wait_for_quiet(min(quiet_wait_s, 120))
        sq0 = _steal_ticks()
        queries, queries_steal = bench_queries(spark, sf_dir)
        queries_steal["_section_total"] = _steal_delta(sq0, _steal_ticks())
        queries_steal["_gate"] = qgate
    if mode in ("full", "crawl"):
        crawl, crawl_attempts = bench_crawl_best_of(
            spark, crawl_docs, crawl_runs, quiet_wait_s
        )

    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    steal_total = _steal_delta(steal_start, _steal_ticks())
    bench_wall = round(time.monotonic() - t_start, 1)
    detail_path = os.environ.get(
        "SPARK_GRAFT_DETAIL_PATH",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL_last.json"),
    )
    result, detail = compose_artifacts(
        queries, queries_steal, crawl, crawl_attempts,
        cpus=cpus, sf_val=sf_val, steal_total=steal_total,
        bench_wall=bench_wall, quiet_wait_s=quiet_wait_s,
        detail_path=detail_path,
    )
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
    except OSError:
        result["detail_file"] = None  # read-only checkout: the line stands alone
    print(json.dumps(result))


def compose_artifacts(
    queries: dict,
    queries_steal: dict,
    crawl: dict,
    crawl_attempts: list,
    *,
    cpus: int,
    sf_val,
    steal_total,
    bench_wall: float,
    quiet_wait_s: int,
    detail_path: str | None,
) -> tuple[dict, dict]:
    """(printed one-line result, side-file detail) — split so the size
    contract is unit-testable.

    COMPACT one-line artifact (VERDICT r5 #1: the r5 line carried every
    crawl attempt + per-query steal and overflowed the driver's 2000-byte
    tail capture → BENCH_r05.json parsed:null). The printed line keeps the
    headline totals, the KEPT crawl run (with its steal + gate outcome)
    and the aggregate steal; the full per-attempt / per-query-steal detail
    goes to a side file the line points at. tests/test_bench_artifact.py
    pins the line under the capture window with representative inputs."""
    crawl_compact = {
        k: crawl[k]
        for k in (
            "rounds", "urls_claimed", "links_deduped", "wall_sec",
            "urls_per_sec", "scheduled_per_sec", "steal_ticks", "run_idx",
        )
        if k in crawl
    }
    if "quiet_gate" in crawl:
        crawl_compact["quiet"] = crawl["quiet_gate"].get("quiet")
    detail = {
        "queries": queries,
        "queries_steal": queries_steal,
        "crawl_best": crawl,
        "crawl_attempts": crawl_attempts,
        "cpus": cpus,
        "sf": sf_val,
        "steal": {
            "unit": "ticks_10ms",
            "total": steal_total,
            "bench_wall_sec": bench_wall,
            "quiet_gate_max_wait_s": quiet_wait_s,
        },
    }
    result = {
        "metric": "headline_queries_total_plus_crawl",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_val,
        "crawl": crawl_compact,
        "cpus": cpus,
        # steal ticks are USER_HZ (10 ms) of cpu time the hypervisor gave a
        # co-tenant during the bench; > ~100/min = wall times storm-inflated
        "steal": {"unit": "ticks_10ms", "total": steal_total,
                  "bench_wall_sec": bench_wall,
                  "queries_section": queries_steal.get("_section_total"),
                  "queries_gate_quiet": (queries_steal.get("_gate") or {}).get("quiet")},
        "detail_file": detail_path,
    }
    return result, detail


if __name__ == "__main__":
    main()
