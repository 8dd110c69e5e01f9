"""Crawl configuration — the engine analog of the reference's ``config.yaml``.

The reference loads a YAML dict (``/root/reference/config.yaml:1-37``) with
crawler params (``allowed_domains``, ``max_depth``, ``rate_limit``,
``start_url``, ``user_agent``) and ``extraction_rules``. Here the same
surface is a frozen dataclass built on the driver and captured by the
(broadcast-serialized) Arrow UDF closures.

Two extra flags control reference-parity vs production behavior:

- ``parity_mode``: reference-exact semantics — path-B URL normalization
  (drop query+fragment, keep case, ``distributed_crawler.py:75-78``), NO
  max-depth / rate-limit enforcement (the reference declares both in
  ``config.yaml:4-5`` but never reads them — zero code references), global
  FIFO claim order (``server.py:416-434``).
- production mode: full canonicalization (lowercase scheme/host, sorted
  query params, fragment strip), per-host politeness budgets, robots
  rules, depth cap — the north-rule capabilities the reference lacks.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ExtractionRule:
    """One field-extraction rule (analog of ``config.yaml:9-27``).

    The reference's CSS selectors become span *markers*: a text span whose
    payload starts with ``{marker}=`` yields the field value. ``type`` is
    kept for parity (text vs href) though all synthetic markers are text.
    """

    field: str
    marker: str
    type: str = "text"  # 'text' | 'href'


DEFAULT_EXTRACTION_RULES: tuple[ExtractionRule, ...] = tuple(
    ExtractionRule(field=f, marker=f)
    for f in ("title", "price", "rating", "availability", "category", "description")
)


@dataclass(frozen=True)
class CrawlConfig:
    """Engine configuration; defaults mirror the reference's config.yaml."""

    allowed_domains: tuple[str, ...] = ("example.test",)
    max_depth: int = 3
    rate_limit: float = 1.0  # seconds between requests per host (production mode)
    user_agent: str = "DWSC-Spark/0.1"
    extraction_rules: tuple[ExtractionRule, ...] = DEFAULT_EXTRACTION_RULES

    # --- engine behavior ------------------------------------------------
    parity_mode: bool = True
    # URLs claimed per scheduling round. In parity mode the claim set is the
    # lowest-seq ``round_budget`` pending URLs (global FIFO == reference
    # order); in production mode it is a per-host window budget.
    round_budget: int = 1024
    # production-mode politeness: max URLs per host per round. When
    # ``round_duration_s`` is set, the effective budget is DERIVED as
    # floor(round_duration_s / rate_limit) per the north rule — a host
    # with crawl_delay 1.0s inside a 16s scheduling round gets 16 claims;
    # ``per_host_budget`` then acts as a hard ceiling. With
    # ``round_duration_s=None`` the count knob stands alone (round-1
    # behavior, kept for benchmarks that want explicit fat batches).
    per_host_budget: int = 16
    round_duration_s: float | None = None
    enforce_max_depth: bool = False
    enforce_robots: bool = False
    # >1 => salt the per-host claim window across this many shards so a
    # hot host's rank doesn't funnel through one task (north-rule skew
    # handling). Trades strict per-host FIFO for per-(host,salt) FIFO.
    salt_hot_hosts: int = 0
    # Pre-filter in front of the ground-truth anti-joins.
    use_bloom: bool = True
    bloom_fpp: float = 0.01
    # 'bloom' (default: one flat filter, mergeable partials),
    # 'sharded' (bits split by pmod(url_hash, bloom_shards) — the 10^10
    # path: no single broadcast/merge exceeds one shard's bits), or
    # 'cuckoo' (supports DELETE => cancelled-URL re-admission without a
    # rebuild; degrades to always-maybe after overflow/delete).
    seen_filter: str = "bloom"
    bloom_shards: int = 16
    # Collect per-round link/fetch counts for the metrics table. Costs two
    # extra Spark jobs per round; benchmarks turn it off (claim count and
    # new-link count are structural — always collected).
    collect_stats: bool = True
    # The per-round fetched-row count is its own (cheap but serial) Spark
    # job; benchmarks turn it off independently of collect_stats because
    # the north metric needs links_found but not urls_fetched.
    collect_fetch_stats: bool = True
    # Broadcast the (budget-bounded) claim batch into the fetch join so the
    # corpus side never shuffles; disable for unbounded claim batches.
    broadcast_fetch: bool = True
    # Fetch-join strategy override: None derives from broadcast_fetch
    # ("broadcast" / "shuffle"). "copartition" shuffles ONLY the claim side
    # into the corpus's existing hash partitioning (corpus must be cached
    # pre-partitioned on its doc_id/url key) with a per-partition hash
    # build — no driver-side broadcast collect+build (that build is serial
    # time every round, identical at every cluster size), and no bound on
    # claim size. The bucket-join analog for an Iceberg corpus.
    fetch_join: str | None = None
    # Keep the write-only output tables (done/seen/pages/metrics) as lazy
    # unions over retained round caches instead of checkpointing them every
    # round. Each skipped checkpoint is a serial driver job; benchmarks
    # enable this (outputs are only read at the end). Costs cache memory
    # proportional to total fetched rows — bound crawls only.
    lazy_output_tables: bool = False
    # Link-canonicalization implementation: 'arrow' (default) runs the
    # vectorized pandas kernel over two flat string columns — measured
    # FASTER on this box than per-row JVM regex (1.60 s vs 1.76-1.95 s per
    # 1M-link batch, PLANS.md round-4 ledger) because the kernel is
    # batched C while the Catalyst expression pays ~12 regex executions
    # per row; 'hybrid' canonicalizes fast-path links entirely in
    # whole-stage codegen and ships only residue strings across Arrow —
    # byte-identical (tests/test_canonicalize.py hybrid sweep), preferable
    # on deployments where Python worker processes are the scarce
    # resource (memory-tight executors, no Arrow IPC budget).
    canon_impl: str = "arrow"
    # Granularity of the Arrow crossing in the links phase: 'flat' ships
    # (base, href) per LINK (the base string ~16x duplicated on dup-heavy
    # rounds); 'doc' ships (base, array<href>) per DOCUMENT so each base
    # crosses once, with parallel-array outputs re-aligned by
    # arrays_zip+posexplode in codegen. 'auto' (default) resolves to 'doc'
    # under canon_impl='arrow' and 'flat' under 'hybrid' (which
    # canonicalizes post-explode in the JVM). Measured (VERDICT r4 #3
    # experiment, PLANS.md round-5 ledger): at the 200k-doc crawl bench the
    # doc kernel's best quiet run beat flat's by 21% wall (34.9 s vs
    # 44.4 s, links phase 13.3 s vs 15.8 s) — the in-session microbench
    # alone read neutral; the win appears at crawl level where the links
    # intermediate feeds the dedup shuffle and round caches.
    links_kernel: str = "auto"

    def __post_init__(self) -> None:
        # round.py dispatches on == 'hybrid'; without this a typo ('jvm',
        # 'hybird') would silently run the arrow path
        if self.canon_impl not in ("arrow", "hybrid"):
            raise ValueError(
                f"unknown canon_impl {self.canon_impl!r}: use arrow|hybrid"
            )
        if self.links_kernel not in ("auto", "flat", "doc"):
            raise ValueError(
                f"unknown links_kernel {self.links_kernel!r}: use auto|flat|doc"
            )
        if self.links_kernel == "doc" and self.canon_impl == "hybrid":
            raise ValueError(
                "links_kernel='doc' requires canon_impl='arrow': the hybrid "
                "path canonicalizes after the posexplode"
            )

    def resolved_links_kernel(self) -> str:
        """'auto' -> 'doc' on the arrow canon path, 'flat' under hybrid."""
        if self.links_kernel == "auto":
            return "doc" if self.canon_impl == "arrow" else "flat"
        return self.links_kernel

    def field_names(self) -> list[str]:
        return [r.field for r in self.extraction_rules]


@dataclass(frozen=True)
class CorpusSpec:
    """Knobs of the deterministic synthetic web (FIXTURES.md §1).

    Every knob is seeded; the same spec always yields byte-identical
    parquet. ``hot_host_share`` concentrates links on host 0 to exercise
    skew handling; ``disallowed_hosts`` exercise the substring allow-filter
    (``distributed_crawler.py:67-73``)."""

    seed: int = 42
    n_hosts: int = 8
    docs_per_host: int = 40
    links_per_doc: int = 6
    dup_link_rate: float = 0.25
    hot_host_share: float = 0.5
    relative_href_rate: float = 0.2
    query_fragment_rate: float = 0.2
    media_spans_per_doc: int = 2
    text_spans_per_doc: int = 3
    disallowed_hosts: tuple[str, ...] = ("forbidden.test", "evil.test")
    field: str = "example.test"  # allowed domain root

    @property
    def hosts(self) -> list[str]:
        return [f"h{i:03d}.{self.field}" for i in range(self.n_hosts)]
