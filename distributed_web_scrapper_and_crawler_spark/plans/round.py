"""One scheduling round — the engine's replacement for the reference's
entire worker/server/broker control plane (SURVEY.md §3.1 Spark trace).

A round turns steps 1-7 of the reference's per-URL loop into ONE
declarative plan over a whole batch::

    pending --window/limit--> claim --inner join corpus--> fetched
      fetched --Arrow UDFs--> pages + exploded links
      links --canonicalize/allow/dedup--> candidates
      candidates --bloom prefilter + anti-join enqueued--> new frontier rows
      state' = (pending - claim + new, done + claim, seen + fetched, ...)

Every boundary that was a socket / broker hop / Mongo round-trip in the
reference (server.py:378-414, distributed_crawler.py:282-291) is a
shuffle or a broadcast here, planned by Catalyst + AQE.

Scale notes (the 100 TB design points):
- claim⋈corpus: claim is usually the small side early on => AQE picks
  broadcast; at steady state both sides are large — on a real cluster
  the corpus is bucketed by ``url`` so this is a shuffle-free bucket
  join (local-mode parquet can't bucket; documented, not faked).
- dedup anti-join: the Bloom prefilter removes the definite-negatives
  (~all links in steady state) from the shuffle; only the maybe-dup
  residue joins against ``enqueued``.
- intra-batch dedup window partitions by (url_hash, url) — same key as
  the anti-join, so the exchange is reused, and hot-host skew lands on
  AQE's skew-join handling (hash keys spread hot *hosts* anyway).
- no ``collect()`` anywhere in the data path; the only driver traffic
  is bucket counts (tiny) and per-partition bloom bitmaps.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_web_scrapper_and_crawler_spark.config import CrawlConfig
from distributed_web_scrapper_and_crawler_spark.functions.canonicalize import (
    allowed_domain_filter,
    attach_canon_links,
    canon_links_doc_udf,
    canon_links_flat_udf,
)
from distributed_web_scrapper_and_crawler_spark.operators.bloom import (
    NumpyBloom,
    add_df_to_filter,
    filter_maybe_contains_udf,
)
from distributed_web_scrapper_and_crawler_spark.operators.extract import (
    extract_fields_udf,
    spans_sorted,
)
from distributed_web_scrapper_and_crawler_spark.plans.politeness import apply_robots, claim_batch
from distributed_web_scrapper_and_crawler_spark.plans.seq import assign_global_seq
from distributed_web_scrapper_and_crawler_spark.plans.state import METRICS_SCHEMA, CrawlState

FRONTIER_COLS = ["url", "url_hash", "host", "depth", "discovered_round", "seq", "added_by"]


@dataclass
class RoundResult:
    state: CrawlState
    deltas: dict[str, DataFrame]
    stats: dict
    drained: bool  # True when no pending URL was claimable
    caches: tuple[DataFrame, ...] = ()  # to unpersist once state is materialized


def run_round(
    spark: SparkSession,
    state: CrawlState,
    corpus: DataFrame,
    cfg: CrawlConfig,
    bloom: NumpyBloom | None = None,
    robots: DataFrame | None = None,
    collect_partition_metrics: bool = False,
) -> RoundResult:
    rnd = state.round + 1
    t0 = time.monotonic()

    round_broadcasts: list = []  # per-round shard broadcasts (released with caches)
    phase_t: dict[str, float] = {}
    # diagnostic: absolute (epoch) phase windows so tools/phase_diag.py can
    # intersect them with the Spark REST API's job intervals and attribute
    # each phase's wall to "job running" vs "driver gap" (serial time)
    phase_abs: dict[str, tuple[float, float]] = {}
    _abs = bool(os.environ.get("DWSC_PHASE_ABS"))

    # phase starts capture BOTH clocks (ADVICE r6 low): reconstructing the
    # epoch start from a monotonic delta at mark time mixes clock domains —
    # NTP slew between start and mark would skew the absolute window that
    # tools/phase_diag.py intersects with Spark job intervals
    def _now() -> tuple[float, float]:
        return (time.monotonic(), time.time() if _abs else 0.0)

    def _mark(name: str, t_start: float | tuple[float, float]) -> None:
        mono0, epoch0 = t_start if isinstance(t_start, tuple) else (t_start, 0.0)
        phase_t[name] = round(time.monotonic() - mono0, 3)
        if _abs:
            phase_abs[name] = (epoch0 or time.time() - phase_t[name], time.time())

    # exact pending_count is tracked arithmetically — drain detection is
    # free, no claim job needed to discover an empty frontier
    if state.pending_count == 0:
        return RoundResult(state, {}, {"round": rnd, "urls_claimed": 0}, drained=True)

    t = _now()
    claim = claim_batch(state.pending, cfg).cache()
    n_claimed = claim.count()
    _mark("claim", t)
    if n_claimed == 0:
        claim.unpersist()
        return RoundResult(state, {}, {"round": rnd, "urls_claimed": 0}, drained=True)

    rest_pending = state.pending.join(claim.select("url_hash", "url"), ["url_hash", "url"], "left_anti")

    # -- fetch: join the claimed batch against the corpus (the "network") --
    # The claim batch is budget-bounded (small); the corpus is the 100 TB
    # side. Broadcasting the claim keeps the corpus UNSHUFFLED — without
    # it every round pays a full corpus exchange. On a real cluster the
    # equivalent is a bucket join on the Iceberg corpus; flag off for
    # unbounded claim batches.
    corpus_keyed = corpus.withColumnRenamed("doc_id", "url")
    fetch_mode = cfg.fetch_join or ("broadcast" if cfg.broadcast_fetch else "shuffle")
    if fetch_mode == "broadcast":
        claim_side = F.broadcast(claim)
    elif fetch_mode == "copartition":
        # corpus is cached hash-partitioned on the key: only the ~budget-
        # sized claim side shuffles, and each task builds a tiny hash table
        # of its claim partition — removes the broadcast's driver-side
        # collect+build (serial per round at any cluster size)
        claim_side = claim.hint("shuffle_hash")
    else:
        claim_side = claim
    # ONE left join yields both outcomes: matched rows are the fetch,
    # null-extended rows are the failures — the separate claim ⋈ fetched
    # anti-join used to cost a second join (and a second driver-side
    # broadcast build) every round
    joined = (
        claim_side.join(corpus_keyed.withColumn("_hit", F.lit(True)), "url", "left").cache()
    )
    fetched = joined.filter(F.col("_hit").isNotNull()).drop("_hit")
    failed = joined.filter(F.col("_hit").isNull()).select(*claim.columns)

    # -- pages: field extraction + ordered span sequence -------------------
    fields = extract_fields_udf(cfg.extraction_rules)
    pages_delta = fetched.select(
        fields("spans").alias("_f"),
        "url",
        "depth",
        F.lit(rnd).alias("round"),
        spans_sorted(F.col("spans")).alias("spans"),
    ).select("_f.*", "url", "depth", "round", "spans")

    # -- link extraction (the table-generating function, SURVEY.md §2.3) --
    # JVM-side: prune non-link spans, sort by offset, posexplode — kind
    # filter, pos rank and depth delta all stay in whole-stage codegen.
    # Only TWO FLAT STRING COLUMNS (base url, href) cross Arrow into the
    # vectorized canonicalize kernel — the old fused array<struct> UDF
    # paid a per-doc struct->python-dict conversion plus per-link dict
    # construction for the round's biggest intermediate (PLANS.md ledger).
    # pos semantics unchanged: rank among link spans ordered by offset.
    link_spans = F.expr(
        "array_sort(filter(spans, s -> s.kind IN ('link_book', 'link_next', 'link_cat')),"
        " (a, b) -> CASE WHEN a.offset < b.offset THEN -1 WHEN a.offset > b.offset THEN 1 ELSE 0 END)"
    )
    # canonicalization over two flat string columns. Default 'arrow': the
    # vectorized pandas kernel — measured faster than per-row JVM regex on
    # this box (config.py canon_impl note; PLANS.md round-4 ledger).
    # 'hybrid': fast-path links canonicalize in whole-stage codegen and
    # only residue strings cross Arrow (attach_canon_links). Either way,
    # path is computed only when robots enforcement will read it — a third
    # string column over the round's biggest intermediate is pure
    # transfer cost otherwise.
    need_path = bool(cfg.enforce_robots and robots is not None)
    if cfg.resolved_links_kernel() == "doc":
        # DOC granularity (VERDICT r4 #3): one Arrow crossing per document
        # — base ships once, hrefs as one array<string>; outputs come back
        # as parallel arrays and the explode happens AFTER the kernel, so
        # pos/kind/depth still never leave codegen. arrays_zip aligns
        # kinds with the kernel outputs positionally (the kernel is
        # order-preserving by construction).
        canon_doc = canon_links_doc_udf(cfg.parity_mode, need_path)
        doc = fetched.select(
            F.col("seq").alias("parent_seq"),
            F.col("depth").alias("parent_depth"),
            F.col("url").alias("_base"),
            link_spans.alias("_spans"),
        ).withColumn(
            "_c", canon_doc(F.col("_base"), F.expr("transform(_spans, s -> s.text)"))
        )
        doc = (
            doc.withColumn("_kinds", F.expr("transform(_spans, s -> s.kind)"))
            .withColumn("_urls", F.col("_c.urls"))
            .withColumn("_hosts", F.col("_c.hosts"))
        )
        zip_cols = ["_kinds", "_urls", "_hosts"]
        if need_path:
            doc = doc.withColumn("_paths", F.col("_c.paths"))
            zip_cols.append("_paths")
        links = doc.select(
            "parent_seq",
            "parent_depth",
            F.posexplode(F.arrays_zip(*zip_cols)).alias("pos", "_z"),
        ).select(
            "parent_seq",
            (
                F.col("parent_depth")
                + F.when(F.col("_z._kinds") == "link_book", F.lit(1)).otherwise(F.lit(0))
            )
            .cast("int")
            .alias("depth"),
            F.col("pos").cast("int").alias("pos"),
            F.col("_z._urls").alias("url"),
            F.col("_z._hosts").alias("host"),
            *([F.col("_z._paths").alias("path")] if need_path else []),
        )
    else:
        exploded = fetched.select(
            F.col("seq").alias("parent_seq"),
            F.col("depth").alias("parent_depth"),
            F.col("url").alias("_base"),
            F.posexplode(link_spans).alias("pos", "_sp"),
        ).select(
            "parent_seq",
            (
                F.col("parent_depth")
                + F.when(F.col("_sp.kind") == "link_book", F.lit(1)).otherwise(F.lit(0))
            )
            .cast("int")
            .alias("depth"),
            F.col("pos").cast("int").alias("pos"),
            "_base",
            F.col("_sp.text").alias("_href"),
        )
        if cfg.canon_impl == "hybrid":
            links = attach_canon_links(
                exploded, "_base", "_href", parity=cfg.parity_mode, include_path=need_path
            )
        else:
            canon_flat = canon_links_flat_udf(cfg.parity_mode, need_path)
            links = exploded.withColumn("_l", canon_flat(F.col("_base"), F.col("_href")))
            links = links.select(
                *exploded.columns,
                F.col("_l.url").alias("url"),
                F.col("_l.host").alias("host"),
                *([F.col("_l.path").alias("path")] if need_path else []),
            )
        links = links.drop("_base", "_href")
    # allow-filter on netloc substring — identical pre/post normalization
    # because normalize preserves netloc (distributed_crawler.py:67-78)
    links = links.filter(allowed_domain_filter(F.col("host"), cfg.allowed_domains, parity=cfg.parity_mode))
    if cfg.enforce_max_depth:
        links = links.filter(F.col("depth") <= cfg.max_depth)
    if cfg.enforce_robots and robots is not None:
        links = apply_robots(links, robots)
    if need_path:
        links = links.drop("path")
    links = links.withColumn("url_hash", F.xxhash64("url"))

    # -- intra-batch dedup: first discovery wins (SURVEY.md §2.4) ----------
    # Hash aggregate, NOT a sort window: min(struct(parent_seq, pos, ...))
    # is exactly "row_number() over (partition by url order by parent_seq,
    # pos) = 1" but with MAP-SIDE partial aggregation — the raw links table
    # is ~16x its unique set on dup-heavy rounds, so partial agg collapses
    # the shuffle volume by that factor before it hits the wire (the
    # dominant bandwidth cost of a round; PLANS.md ledger). The dup count
    # rides along, so the links_found stat costs one tiny job over the
    # (cached, already-unique) result instead of a count over the raw
    # links — extraction now runs exactly once per round.
    t = _now()
    unique_links = (
        links.groupBy("url_hash", "url")
        .agg(
            F.min(F.struct("parent_seq", "pos", "depth", "host")).alias("_first"),
            F.count(F.lit(1)).alias("_dups"),
        )
        .select(
            "url_hash",
            "url",
            F.col("_first.parent_seq").alias("parent_seq"),
            F.col("_first.pos").alias("pos"),
            F.col("_first.depth").alias("depth"),
            F.col("_first.host").alias("host"),
            "_dups",
        )
        .cache()
    )
    n_links = unique_links.agg(F.sum("_dups")).first()[0] if cfg.collect_stats else -1
    n_links = int(n_links) if n_links is not None else 0
    unique_links = unique_links.drop("_dups")
    _mark("links", t)

    # -- cross-round dedup: bloom prefilter + ground-truth anti-join -------
    # The "definitely new skips the anti-join" shortcut is only sound for
    # filters with ZERO false negatives (Bloom/ShardedBloom always; a
    # CuckooFilter until an overflowed insert or a delete sets .degraded —
    # then every link pays the anti-join: slower, never wrong).
    if bloom is not None and cfg.use_bloom and not getattr(bloom, "degraded", False):
        from distributed_web_scrapper_and_crawler_spark.operators.bloom import (
            ShardedBloom,
            sharded_probe_maybe,
        )

        if isinstance(bloom, ShardedBloom):
            # shard-local probe: tasks fetch only their shard's bits; the
            # per-round shard broadcasts ride the round's cache lifecycle
            # (destroyed once the round's state is materialized) so a long
            # crawl doesn't accumulate one bitmap set per round
            flagged = sharded_probe_maybe(
                spark, bloom, unique_links, "url_hash", out_broadcasts=round_broadcasts
            )
        else:
            maybe = filter_maybe_contains_udf(spark, bloom)
            flagged = unique_links.withColumn("_maybe", maybe("url_hash"))
        definite_new = flagged.filter(~F.col("_maybe")).drop("_maybe")
        residue = (
            flagged.filter(F.col("_maybe"))
            .drop("_maybe")
            .join(state.enqueued, ["url_hash", "url"], "left_anti")
        )
        new_links = definite_new.unionByName(residue)
    else:
        new_links = unique_links.join(state.enqueued, ["url_hash", "url"], "left_anti")

    # -- dense discovery seq (deterministic ordering backbone) -------------
    # cache BEFORE assign_global_seq: its bucket-count action is the first
    # pass over the dedup pipeline; without the cache every downstream
    # consumer (bloom add, pending/enqueued deltas) re-runs the window +
    # anti-join + probe-UDF chain from scratch.
    t = _now()
    candidates = new_links.cache()
    new_links, n_new = assign_global_seq(candidates, start=state.max_seq)
    _mark("dedup_seq", t)

    pending_delta = new_links.select(
        "url",
        "url_hash",
        "host",
        "depth",
        F.lit(rnd).alias("discovered_round"),
        "seq",
        F.lit(f"round:{rnd}").alias("added_by"),
    )

    done_delta = (
        fetched.select(*FRONTIER_COLS)
        .withColumn("status", F.lit("completed"))
        .withColumn("completed_round", F.lit(rnd))
        .unionByName(
            failed.select(*FRONTIER_COLS)
            .withColumn("status", F.lit("failed"))
            .withColumn("completed_round", F.lit(rnd))
        )
    )
    seen_delta = fetched.select("url", "url_hash", F.lit(rnd).alias("round"))
    enqueued_delta = pending_delta.select("url", "url_hash")

    if bloom is not None and cfg.use_bloom and n_new and not getattr(bloom, "degraded", False):
        # a degraded filter is never consulted again — skip maintaining it.
        # Fold from the CACHED pre-seq candidates: the url_hash set is
        # identical to new_links', and reading new_links here would re-run
        # the seq window + offset join once more per round.
        t = _now()
        add_df_to_filter(bloom, candidates, "url_hash")
        _mark("bloom_add", t)

    wall_ms = int((time.monotonic() - t0) * 1000)
    t = _now()
    n_fetched = (
        fetched.count() if (cfg.collect_stats and cfg.collect_fetch_stats) else -1
    )
    _mark("fetched_count", t)
    stats = {
        "round": rnd,
        "urls_claimed": n_claimed,
        "urls_fetched": n_fetched,
        "links_found": n_links,
        "links_new": n_new,
        "dedup_hits": (n_links - n_new) if cfg.collect_stats else -1,
        "wall_ms": wall_ms,
        "phases": phase_t,
        **({"phases_abs": phase_abs} if _abs else {}),
    }
    # uncollected stats persist as NULLs, never sentinels — a downstream
    # sum()/avg() over the metrics table must skip them, not mis-sum -1s
    _n_fetched = n_fetched if (cfg.collect_stats and cfg.collect_fetch_stats) else None
    _n_links = n_links if cfg.collect_stats else None
    _dedup = (n_links - n_new) if cfg.collect_stats else None
    metric_rows = [(rnd, -1, n_claimed, _n_fetched, _n_links, n_new, _dedup, wall_ms)]
    if collect_partition_metrics:
        per_part = (
            new_links.groupBy(F.spark_partition_id().alias("pid")).agg(F.count(F.lit(1)).alias("n")).collect()
        )
        metric_rows += [(rnd, int(r["pid"]), 0, 0, 0, int(r["n"]), 0, 0) for r in per_part]
    metrics_delta = spark.createDataFrame(metric_rows, METRICS_SCHEMA)

    new_state = state.evolve(
        pending=rest_pending.unionByName(pending_delta),
        done=state.done.unionByName(done_delta),
        seen=state.seen.unionByName(seen_delta),
        enqueued=state.enqueued.unionByName(enqueued_delta),
        pages=state.pages.unionByName(pages_delta),
        metrics=state.metrics.unionByName(metrics_delta),
        max_seq=state.max_seq + n_new,
        round=rnd,
        pending_count=state.pending_count - n_claimed + n_new,
    )
    deltas = {
        "done": done_delta,
        "seen": seen_delta,
        "enqueued": enqueued_delta,
        "pages": pages_delta,
        "metrics": metrics_delta,
    }
    return RoundResult(
        new_state,
        deltas,
        stats,
        drained=False,
        caches=(claim, joined, unique_links, candidates, *round_broadcasts),
    )
