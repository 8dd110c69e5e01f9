"""Crawl-engine queries for the driver contract.

These exercise the actual frontier engine (rounds, dedup, scheduling)
on a deterministic mini-corpus — independent of sf_dir, since the crawl
corpus is the interleaved-span table of FIXTURES.md §1, not the flat
testdata ``documents``. Full-drain iterative crawls aren't single SQL
statements => no oracle_sql for those (driver records rows-only checks;
their REAL gate is tests/test_crawl_parity.py against the serial
reference oracle). BOUNDED crawls however ARE triple-checkable (VERDICT
r5 #3): a fixed-round crawl over the committed fixture parquet unrolls
into chained DuckDB CTEs (claim = top-N by seq or the per-host
politeness window, link explode = span unnest + the three kind/depth
rules, canonicalization = urljoin for root-relative hrefs + parity
strip or full canon with sorted query params, dedup = first-discovery
window + anti-join on the enqueued set, seq = dense rank from the
max_seq watermark). Three entries use this: ``crawl_claim_order`` (done
table: claim order/statuses), ``crawl_pages_extracted`` (pages table:
marker field extraction) and ``crawl_production_mode`` (seen table
under the production claim window + full canon + depth cap) — so the
driver's row-count + schema + value-hash gate covers the crawl,
extraction AND politeness kernels end-to-end, not just the analytics
tables.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from distributed_web_scrapper_and_crawler_spark.analytics.queries import q
from distributed_web_scrapper_and_crawler_spark.config import CorpusSpec, CrawlConfig
from distributed_web_scrapper_and_crawler_spark.plans.crawl import CrawlEngine
from distributed_web_scrapper_and_crawler_spark.sources.corpus import corpus_df, read_corpus

_SPEC = CorpusSpec(seed=11, n_hosts=3, docs_per_host=6, links_per_doc=4)
_SEEDS = [f"http://{_SPEC.hosts[0]}/page/0"]

# committed parquet of generate_corpus(_SPEC) — the one corpus BOTH the
# Spark engine and the DuckDB oracle read (tools/make_crawl_fixture.py)
_FIXTURE = os.path.normpath(
    os.path.join(os.path.dirname(__file__), "..", "..", "fixtures", "crawl_mini_corpus.parquet")
)
# second seed targets a page absent from the corpus: exercises the
# failed-fetch branch (left-join miss -> status='failed', no links)
_FIFO_SEEDS = [f"http://{_SPEC.hosts[0]}/page/0", f"http://{_SPEC.hosts[0]}/page/999"]
_FIFO_BUDGET = 8
_FIFO_ROUNDS = 3


def _run_crawl(spark, parity=True, max_rounds=None, **cfg_kw):
    cfg = CrawlConfig(parity_mode=parity, round_budget=64, **cfg_kw)
    eng = CrawlEngine(spark=spark, corpus=corpus_df(spark, _SPEC), cfg=cfg)
    eng.seed(_SEEDS)
    eng.run(max_rounds=max_rounds)
    return eng


def _fifo_oracle_sql(seeds: list[str], budget: int, rounds: int, corpus_path: str) -> str:
    """Chained-CTE DuckDB twin of a bounded parity crawl (VERDICT r5 #3).

    One CTE block per scheduling round, mirroring plans/round.py exactly:

    - claim: ``ORDER BY seq LIMIT budget`` == claim_batch's parity path
      (plans/politeness.py:49-50, the reference's global FIFO,
      server.py:416-434);
    - fetch: LEFT JOIN corpus on url = doc_id — hit rows complete, miss
      rows fail (plans/round.py:125-135);
    - links: unnest link spans, pos = rank by offset among link spans,
      depth+1 only for link_book (plans/round.py:151-247; reference
      remote_worker.py:220/236/252);
    - parity canonicalization: urljoin (absolute hrefs pass through,
      root-relative hrefs join the base origin — the only relative form
      the generator emits) then strip query+fragment
      (functions/canonicalize.py normalize_url_py,
      distributed_crawler.py:75-78);
    - allow-filter: case-sensitive netloc substring
      (distributed_crawler.py:67-73);
    - dedup: first discovery wins (min (parent_seq, pos) per url), then
      anti-join against the enqueued-ever set (plans/round.py:249-312);
    - seq: dense rank in (parent_seq, pos) order from the max_seq
      watermark (plans/seq.py).
    """
    return _fifo_cte_prefix(seeds, budget, rounds, corpus_path) + _fifo_done_select(rounds)


def _fifo_cte_prefix(seeds: list[str], budget: int, rounds: int, corpus_path: str) -> str:
    """The shared chained-CTE round unroll (see _fifo_oracle_sql docstring);
    callers append a final SELECT over done{r} / fet{r} / enq{r}."""
    seed_vals = ", ".join(f"('{u}', CAST({i} AS BIGINT))" for i, u in enumerate(seeds))
    sql = [
        f"WITH corpus AS (SELECT doc_id, spans FROM read_parquet('{corpus_path}')),",
        f"seeds(url, seq) AS (VALUES {seed_vals}),",
        "pend0 AS (SELECT url, seq, CAST(0 AS BIGINT) AS depth,"
        " CAST(0 AS BIGINT) AS discovered_round FROM seeds),",
        "enq0 AS (SELECT url, seq, depth, discovered_round FROM pend0),",
    ]
    for r in range(rounds):
        sql.append(
            f"""
claim{r} AS (SELECT * FROM pend{r} ORDER BY seq LIMIT {budget}),
fet{r} AS (SELECT c.url, c.seq, c.depth, c.discovered_round, d.spans,
                  d.doc_id IS NOT NULL AS hit
           FROM claim{r} c LEFT JOIN corpus d ON d.doc_id = c.url),
done{r} AS (SELECT url, seq, depth, discovered_round,
                   CAST({r} AS BIGINT) AS completed_round,
                   CASE WHEN hit THEN 'completed' ELSE 'failed' END AS status
            FROM fet{r}),
ls{r} AS (SELECT seq AS parent_seq, depth AS parent_depth, url AS base,
                 unnest(spans) AS s
          FROM fet{r} WHERE hit),
lk{r} AS (SELECT parent_seq, parent_depth, base, s.kind AS kind,
                 s.text AS href, s."offset" AS off
          FROM ls{r}
          WHERE s.kind IN ('link_book', 'link_next', 'link_cat')),
lp{r} AS (SELECT *, row_number() OVER (PARTITION BY parent_seq ORDER BY off) - 1 AS pos
          FROM lk{r}),
cn{r} AS (SELECT parent_seq, pos,
                 parent_depth + CASE WHEN kind = 'link_book' THEN 1 ELSE 0 END AS depth,
                 CASE WHEN href LIKE 'http://%' OR href LIKE 'https://%'
                      THEN regexp_extract(href, '^[^?#]*')
                      ELSE regexp_extract(base, '^(https?://[^/?#]*)', 1)
                           || regexp_extract(href, '^[^?#]*')
                 END AS url
          FROM lp{r}),
al{r} AS (SELECT * FROM cn{r}
          WHERE contains(regexp_extract(url, '^https?://([^/?#]*)', 1), 'example.test')),
dd{r} AS (SELECT url, depth, parent_seq, pos FROM (
            SELECT *, row_number() OVER (PARTITION BY url ORDER BY parent_seq, pos) AS rn
            FROM al{r}) WHERE rn = 1),
nw{r} AS (SELECT d.* FROM dd{r} d
          WHERE NOT EXISTS (SELECT 1 FROM enq{r} e WHERE e.url = d.url)),
sq{r} AS (SELECT url, CAST(depth AS BIGINT) AS depth,
                 (SELECT max(seq) + 1 FROM enq{r})
                   + row_number() OVER (ORDER BY parent_seq, pos) - 1 AS seq,
                 CAST({r} AS BIGINT) AS discovered_round
          FROM nw{r}),
enq{r + 1} AS (SELECT url, seq, depth, discovered_round FROM enq{r}
               UNION ALL SELECT url, seq, depth, discovered_round FROM sq{r}),
pend{r + 1} AS (SELECT p.url, p.seq, p.depth, p.discovered_round FROM pend{r} p
                WHERE NOT EXISTS (SELECT 1 FROM claim{r} c WHERE c.url = p.url)
                UNION ALL SELECT url, seq, depth, discovered_round FROM sq{r}),"""
        )
    return "\n".join(sql)


def _fifo_done_select(rounds: int) -> str:
    done_union = " UNION ALL ".join(f"SELECT * FROM done{r}" for r in range(rounds))
    return (
        f"\nalldone AS ({done_union}) "
        "SELECT url, seq, depth, discovered_round, completed_round, status "
        "FROM alldone ORDER BY seq, completed_round"
    )


def _fifo_pages_oracle_sql(
    seeds: list[str], budget: int, rounds: int, corpus_path: str, fields: tuple[str, ...]
) -> str:
    """Chained-CTE twin of the bounded crawl's PAGES table: the same round
    unroll, final-selected as field extraction per fetched page.

    Extraction semantics mirrored from operators/extract.py
    extract_fields_udf (the reference's CSS-selector config,
    distributed_crawler.py:199-215): a field's value is the FIRST text
    span in offset order whose payload starts with ``{marker}=``,
    remainder stripped — expressed as DuckDB ``arg_min(...) FILTER`` over
    the exploded span rows, left-joined back so pages with no matching
    span still emit a row with null fields."""
    pages_union = " UNION ALL ".join(
        f"SELECT url, CAST(depth AS BIGINT) AS depth, spans FROM fet{r} WHERE hit"
        for r in range(rounds)
    )
    field_aggs = ",\n    ".join(
        f"arg_min(trim(substr(txt, {len(f) + 2})), off)"
        f" FILTER (WHERE starts_with(txt, '{f}=')) AS {f}"
        for f in fields
    )
    return (
        _fifo_cte_prefix(seeds, budget, rounds, corpus_path)
        + f"""
allpages AS ({pages_union}),
sp AS (SELECT url, unnest(spans) AS s FROM allpages),
tx AS (SELECT url, s.text AS txt, s."offset" AS off FROM sp
       WHERE s.kind = 'text'),
flds AS (SELECT url,
    {field_aggs}
  FROM tx GROUP BY url)
SELECT p.url, {", ".join("f." + f for f in fields)}, p.depth
FROM allpages p LEFT JOIN flds f ON f.url = p.url
ORDER BY p.url"""
    )


def _fifo_prod_oracle_sql(
    seeds: list[str], host_budget: int, rounds: int, max_depth: int, corpus_path: str
) -> str:
    """Chained-CTE twin of a bounded PRODUCTION-mode crawl, final-selected
    as the seen table (successfully fetched url + fetch round).

    Differences from the parity chain, mirroring the engine's production
    paths:

    - claim: per-host politeness window ``row_number() OVER (PARTITION BY
      host ORDER BY depth, seq) <= host_budget`` (plans/politeness.py:67-73,
      salting off) instead of the global FIFO;
    - canonicalization: FULL canon (functions/canonicalize.py
      canonicalize_url_py — north rule): fragment stripped, query params
      SORTED and kept (the generator's only query form is k=v pairs joined
      by '&', so ``list_sort(string_split(q, '&'))`` is exactly
      ``urlencode(sorted(parse_qsl(q)))`` here), host lowercased;
    - depth cap: links filtered to ``depth <= max_depth``
      (plans/round.py enforce_max_depth);
    - seen: only fetch HITS enter the seen set, with their fetch round
      (plans/round.py:353) — query-suffixed canon URLs miss the corpus
      join and fail, exactly like the engine."""
    seed_vals = ", ".join(f"('{u}', CAST({i} AS BIGINT))" for i, u in enumerate(seeds))
    qsort = (
        "nullif(array_to_string(list_sort(string_split("
        "regexp_extract(absu, '\\?([^#]*)', 1), '&')), '&'), '')"
    )
    sql = [
        f"WITH corpus AS (SELECT doc_id, spans FROM read_parquet('{corpus_path}')),",
        f"seeds(url, seq) AS (VALUES {seed_vals}),",
        "pend0 AS (SELECT url, seq, CAST(0 AS BIGINT) AS depth,"
        " CAST(0 AS BIGINT) AS discovered_round,"
        " lower(regexp_extract(url, '^https?://([^/?#]*)', 1)) AS host FROM seeds),",
        "enq0 AS (SELECT url, seq FROM pend0),",
    ]
    for r in range(rounds):
        sql.append(
            f"""
claim{r} AS (SELECT url, seq, depth, discovered_round, host FROM (
    SELECT *, row_number() OVER (PARTITION BY host ORDER BY depth, seq) AS rk
    FROM pend{r}) WHERE rk <= {host_budget}),
fet{r} AS (SELECT c.url, c.seq, c.depth, d.spans, d.doc_id IS NOT NULL AS hit
           FROM claim{r} c LEFT JOIN corpus d ON d.doc_id = c.url),
ls{r} AS (SELECT seq AS parent_seq, depth AS parent_depth, url AS base,
                 unnest(spans) AS s
          FROM fet{r} WHERE hit),
lk{r} AS (SELECT parent_seq, parent_depth, base, s.kind AS kind,
                 s.text AS href, s."offset" AS off
          FROM ls{r}
          WHERE s.kind IN ('link_book', 'link_next', 'link_cat')),
lp{r} AS (SELECT *, row_number() OVER (PARTITION BY parent_seq ORDER BY off) - 1 AS pos
          FROM lk{r}),
ab{r} AS (SELECT parent_seq, pos,
                 parent_depth + CASE WHEN kind = 'link_book' THEN 1 ELSE 0 END AS depth,
                 CASE WHEN href LIKE 'http://%' OR href LIKE 'https://%' THEN href
                      ELSE regexp_extract(base, '^(https?://[^/?#]*)', 1) || href
                 END AS absu
          FROM lp{r}),
cn{r} AS (SELECT parent_seq, pos, depth,
                 regexp_extract(absu, '^[^?#]*')
                   || coalesce('?' || {qsort}, '') AS url
          FROM ab{r}),
al{r} AS (SELECT *, lower(regexp_extract(url, '^https?://([^/?#]*)', 1)) AS host
          FROM cn{r}
          WHERE contains(lower(regexp_extract(url, '^https?://([^/?#]*)', 1)),
                         'example.test')
            AND depth <= {max_depth}),
dd{r} AS (SELECT url, depth, host, parent_seq, pos FROM (
            SELECT *, row_number() OVER (PARTITION BY url ORDER BY parent_seq, pos) AS rn
            FROM al{r}) WHERE rn = 1),
nw{r} AS (SELECT d.* FROM dd{r} d
          WHERE NOT EXISTS (SELECT 1 FROM enq{r} e WHERE e.url = d.url)),
sq{r} AS (SELECT url, CAST(depth AS BIGINT) AS depth, host,
                 (SELECT max(seq) + 1 FROM enq{r})
                   + row_number() OVER (ORDER BY parent_seq, pos) - 1 AS seq,
                 CAST({r} AS BIGINT) AS discovered_round
          FROM nw{r}),
enq{r + 1} AS (SELECT url, seq FROM enq{r} UNION ALL SELECT url, seq FROM sq{r}),
pend{r + 1} AS (SELECT p.url, p.seq, p.depth, p.discovered_round, p.host FROM pend{r} p
                WHERE NOT EXISTS (SELECT 1 FROM claim{r} c WHERE c.url = p.url)
                UNION ALL
                SELECT url, seq, depth, discovered_round, host FROM sq{r}),"""
        )
    seen_union = " UNION ALL ".join(
        f"SELECT url, CAST({r} AS BIGINT) AS round FROM fet{r} WHERE hit" for r in range(rounds)
    )
    sql.append(f"allseen AS ({seen_union}) SELECT url, round FROM allseen ORDER BY url")
    return "\n".join(sql)


@q("crawl_seen_set", None, doc="full crawl: URL-seen membership (parity-tested vs oracle)")
def crawl_seen_set(spark, sf_dir):
    eng = _run_crawl(spark)
    return eng.state.seen.select("url", "round").orderBy("url")


@q(
    "crawl_claim_order",
    _fifo_oracle_sql(_FIFO_SEEDS, _FIFO_BUDGET, _FIFO_ROUNDS, _FIXTURE),
    doc="bounded parity crawl (3 FIFO rounds, budget 8, one missing-page seed) "
    "on the committed fixture corpus: claim order, fetch failure, kind/depth "
    "rules, dedup + seq — full chained-CTE DuckDB oracle (VERDICT r5 #3); "
    "full-drain claim order stays parity-gated in tests/test_crawl_parity.py",
)
def crawl_claim_order(spark, sf_dir):
    cfg = CrawlConfig(parity_mode=True, round_budget=_FIFO_BUDGET)
    eng = CrawlEngine(spark=spark, corpus=read_corpus(spark, _FIXTURE), cfg=cfg)
    eng.seed(_FIFO_SEEDS)
    eng.run(max_rounds=_FIFO_ROUNDS)
    return (
        eng.state.done.select(
            "url",
            F.col("seq").cast("long").alias("seq"),
            F.col("depth").cast("long").alias("depth"),
            F.col("discovered_round").cast("long").alias("discovered_round"),
            F.col("completed_round").cast("long").alias("completed_round"),
            "status",
        ).orderBy("seq", "completed_round")
    )


_PAGE_FIELDS = ("title", "price", "category")


@q(
    "crawl_pages_extracted",
    _fifo_pages_oracle_sql(_FIFO_SEEDS, _FIFO_BUDGET, _FIFO_ROUNDS, _FIXTURE, _PAGE_FIELDS),
    doc="bounded parity crawl (same 3 FIFO rounds as crawl_claim_order): "
    "marker field extraction per fetched page vs a chained-CTE oracle whose "
    "final select mirrors extract_fields_udf (first text span in offset "
    "order with '{marker}=' prefix, remainder stripped) — puts the "
    "extraction kernel in the driver's value-hash gate; full-drain pages "
    "stay parity-gated (span-sequence equality) in tests/test_crawl_parity.py",
)
def crawl_pages_extracted(spark, sf_dir):
    cfg = CrawlConfig(parity_mode=True, round_budget=_FIFO_BUDGET)
    eng = CrawlEngine(spark=spark, corpus=read_corpus(spark, _FIXTURE), cfg=cfg)
    eng.seed(_FIFO_SEEDS)
    eng.run(max_rounds=_FIFO_ROUNDS)
    return eng.state.pages.select(
        "url", *_PAGE_FIELDS, F.col("depth").cast("long").alias("depth")
    ).orderBy("url")


_PROD_BUDGET = 4
_PROD_DEPTH = 2


@q(
    "crawl_production_mode",
    _fifo_prod_oracle_sql(_FIFO_SEEDS, _PROD_BUDGET, _FIFO_ROUNDS, _PROD_DEPTH, _FIXTURE),
    doc="bounded PRODUCTION crawl (3 rounds, per-host window budget 4, "
    "depth cap 2, full canonicalization with sorted query params) on the "
    "committed fixture: seen-set membership + fetch round vs a chained-CTE "
    "oracle mirroring the politeness window, full canon and hit-only seen "
    "semantics; the full-drain production path stays unit/parity-gated",
)
def crawl_production_mode(spark, sf_dir):
    cfg = CrawlConfig(
        parity_mode=False,
        per_host_budget=_PROD_BUDGET,
        enforce_max_depth=True,
        max_depth=_PROD_DEPTH,
    )
    eng = CrawlEngine(spark=spark, corpus=read_corpus(spark, _FIXTURE), cfg=cfg)
    eng.seed(_FIFO_SEEDS)
    eng.run(max_rounds=_FIFO_ROUNDS)
    return eng.state.seen.select(
        "url", F.col("round").cast("long").alias("round")
    ).orderBy("url")
