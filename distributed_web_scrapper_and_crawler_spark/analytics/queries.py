"""The analytics surface: every dashboard/API query of the reference
(SURVEY.md §2.6-2.7, §3.4) plus the training-data pipeline operators,
each as a (spark, sf_dir) -> DataFrame callable with a DuckDB-equivalent
oracle SQL string.

Contract rules (driver compares row-count + schema + order-insensitive
value hash at sf0.01):
- every computed column is aliased identically in Spark and SQL;
- doubles are rounded (4 dp default) on BOTH sides — sum order across
  engines differs in the last ulp;
- timestamps are emitted as formatted strings (Spark session TZ is UTC);
- counts are BIGINT on both sides (DuckDB sum(int) is HUGEINT => cast).

Reference parity notes are cited per query; crawl-engine queries that
aren't SQL-expressible carry ``sql=None`` (driver does rows-only checks).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_web_scrapper_and_crawler_spark.functions.text import (
    doc_fingerprint,
    doc_fingerprint_sql,
    lang_hits,
    lang_hits_sql,
    md5_long_sql,
    tokens_bpe,
    tokens_ws,
)
from distributed_web_scrapper_and_crawler_spark.operators import ann, dedup
from distributed_web_scrapper_and_crawler_spark.operators.spread import spread_small_scan


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None => rows-only check
    doc: str = ""
    # True => excluded from the driver-facing __spark_entry__ registry
    # (which must stay within the driver's 50-entry check budget,
    # VERDICT r4 #2) and gated instead by tests/test_registry_budget.py,
    # which runs the IDENTICAL row-count+schema+value-hash check vs
    # DuckDB at sf0.01. Only redundant parameterizations of operators
    # whose more general sibling remains driver-checked may be gated.
    pytest_gated: bool = False


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


QUERY_REGISTRY: dict[str, QuerySpec] = {}


def q(name: str, sql: str | None, doc: str = "", pytest_gated: bool = False):
    def deco(fn):
        QUERY_REGISTRY[name] = QuerySpec(fn=fn, sql=sql, doc=doc, pytest_gated=pytest_gated)
        return fn

    return deco


# =====================================================================
# §1 Core reference analytics (dashboard/API parity)
# =====================================================================


@q(
    "stats_endpoint",
    """SELECT count(*) AS n_docs,
              count(DISTINCT source) AS n_sources,
              round(avg(n_chars), 4) AS avg_chars
       FROM documents""",
    doc="/stats endpoint: count + distinct domains + $avg (api.py:27-42)",
)
def stats_endpoint(spark, sf_dir):
    return t(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


@q(
    "status_counts",
    """SELECT event_type, count(*) AS n
       FROM events GROUP BY event_type ORDER BY event_type""",
    doc="queue-status counts as ONE hash-agg, not 5 scans (app.py:331-348)",
)
def status_counts(spark, sf_dir):
    return t(spark, sf_dir, "events").groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).orderBy("event_type")


@q(
    "per_worker_counts",
    """SELECT user_id, count(*) AS n FROM events
       GROUP BY user_id ORDER BY n DESC, user_id LIMIT 20""",
    doc="per-worker page counts (app.py:322-325)",
)
def per_worker_counts(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("user_id"))
        .limit(20)
    )


@q(
    "price_stats",
    """SELECT round(avg(l_extendedprice), 4) AS avg_price,
              round(min(l_extendedprice), 4) AS min_price,
              round(max(l_extendedprice), 4) AS max_price
       FROM lineitem""",
    doc="dashboard price mean/min/max (app.py:751-758)",
)
def price_stats(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.min("l_extendedprice"), 4).alias("min_price"),
        F.round(F.max("l_extendedprice"), 4).alias("max_price"),
    )


@q(
    "price_histogram",
    """SELECT CAST(floor(l_extendedprice / 1000) AS BIGINT) AS bucket, count(*) AS n
       FROM lineitem GROUP BY 1 ORDER BY bucket""",
    doc="price histogram (app.py:763)",
)
def price_histogram(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


@q(
    "category_histogram",
    """SELECT o_orderpriority, count(*) AS n FROM orders
       GROUP BY o_orderpriority ORDER BY n DESC, o_orderpriority""",
    doc="category value_counts (app.py:767)",
)
def category_histogram(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("o_orderpriority"))
    )


@q(
    "recent_activity",
    """SELECT * FROM (
         (SELECT 'click' AS kind, event_id AS item_id,
                 strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
          FROM events WHERE event_type = 'click'
          ORDER BY ts DESC, event_id LIMIT 10)
         UNION ALL
         (SELECT 'purchase' AS kind, event_id AS item_id,
                 strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
          FROM events WHERE event_type = 'purchase'
          ORDER BY ts DESC, event_id LIMIT 10)
       ) ORDER BY ts_str DESC, item_id LIMIT 20""",
    doc="recent-activity feed: two top-10s merged, re-sorted, top-20 (app.py:350-388)",
)
def recent_activity(spark, sf_dir):
    # Round-7 measured negative (PLANS.md ledger): a single-scan per-kind
    # row_number (WindowGroupLimit) re-read 0.47 s vs 0.39 s for this
    # two-branch shape at sf1.0 — each branch's ORDER BY..LIMIT 10 plans
    # as TakeOrderedAndProject (per-partition top-10 + driver merge, NO
    # exchange), and the second scan of the page-cached file is cheaper
    # than the window's exchange+sort. Kept as-is.
    ev = t(spark, sf_dir, "events")

    def top10(kind):
        return (
            ev.filter(F.col("event_type") == kind)
            .orderBy(F.desc("ts"), F.asc("event_id"))
            .limit(10)
            .select(
                F.lit(kind).alias("kind"),
                F.col("event_id").alias("item_id"),
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
            )
        )

    return top10("click").unionByName(top10("purchase")).orderBy(F.desc("ts_str"), F.asc("item_id")).limit(20)


@q(
    "pending_preview",
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date
       FROM orders WHERE o_orderstatus = 'O'
       ORDER BY o_orderdate, o_orderkey LIMIT 5""",
    doc="pending-queue preview: oldest 5 (app.py:671)",
)
def pending_preview(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .orderBy("o_orderdate", "o_orderkey")
        .limit(5)
        .select("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"))
    )


def search_documents(spark, sf_dir, query: str, k: int = 10) -> DataFrame:
    """User-parameterized multi-term text search — the engine analog of the
    reference's ``/search?q=`` endpoint (api.py:44-62): whitespace-split the
    query, score = total across-term frequency, require every term present
    (Mongo $text is OR-ish but opaque; AND + term-frequency is the
    documented contract, SURVEY.md §2.7), top-k by (score desc, doc_id)."""
    terms = [w.lower() for w in query.split() if w]
    score = F.lit(0).cast("long")
    present = F.lit(True)
    for w in terms:
        # user terms are DATA, not pattern: regex-escape them (a query like
        # 'c++' or '(' must search literally, not throw a pattern error),
        # and pass the pattern as a Column literal so no SQL-string
        # escaping layer can reinterpret the backslashes
        pat = rf"\b{re.escape(w)}\b"
        hits = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(pat), F.lit(0))).cast("long")
        score = score + hits
        present = present & (hits > 0)
    # spread: the documents parquet is ONE row group, so the per-doc regex
    # scoring otherwise serializes on one core (no-op at scale)
    return (
        spread_small_scan(t(spark, sf_dir, "documents"), "doc_id")
        .select("doc_id", score.alias("score"), present.alias("_p"))
        .filter(F.col("_p"))
        .drop("_p")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def _search_sql(terms: list[str], k: int = 10) -> str:
    def hit(w: str) -> str:
        # mirror the Spark path's escaping: term is literal data inside the
        # pattern; double single-quotes for the SQL string literal
        pat = rf"\b{re.escape(w.lower())}\b".replace("'", "''")
        return f"len(regexp_extract_all(lower(text), '{pat}'))"

    score = " + ".join(hit(w) for w in terms)
    present = " AND ".join(f"{hit(w)} > 0" for w in terms)
    return f"""SELECT doc_id, CAST({score} AS BIGINT) AS score
       FROM documents WHERE {present}
       ORDER BY score DESC, doc_id LIMIT {k}"""


@q(
    "text_search",
    _search_sql(["spark"]),
    doc="text-search top-k by term frequency (api.py:44-62; Mongo textScore is opaque — documented weaker contract, SURVEY.md §2.7)",
)
def text_search(spark, sf_dir):
    return search_documents(spark, sf_dir, "spark")


@q(
    "text_search_multi",
    _search_sql(["table", "scan"]),
    doc="parameterized multi-term search (the /search?q= surface, api.py:44-62): "
    "all terms required, score = summed term frequency",
    # same operator as text_search with |terms|>1; text_search +
    # text_search_ranked stay driver-checked (50-entry budget)
    pytest_gated=True,
)
def text_search_multi(spark, sf_dir):
    return search_documents(spark, sf_dir, "table scan")


def search_documents_ranked(spark, sf_dir, query: str, k: int = 10) -> DataFrame:
    """BM25-ranked text search — the relevance-scored upgrade of
    ``search_documents`` closing the documented weaker-than-reference
    contract (Mongo ``$text`` textScore, /root/reference/api.py:52-55).

    Okapi BM25 (k1=1.2, b=0.75) over the same \\b-word term frequencies:
    idf(w) = ln(1 + (N - df + 0.5)/(df + 0.5)), dl = whitespace token
    count. OR semantics (any term present), top-k by (score desc, doc_id).
    Shape: one scan computes per-term tf + dl; corpus stats (N, avgdl,
    per-term df) are ONE aggregated row broadcast back — no second scan
    shuffle, no driver collect of data rows.
    """
    terms = [w.lower() for w in query.split() if w]
    docs = t(spark, sf_dir, "documents")
    if not terms:
        # empty/whitespace query: no term can be present => empty result
        # (mirrors search_documents; without this, sum() over an empty
        # generator yields the Python int 0 and .filter(0 > 0) throws)
        return docs.select("doc_id", F.lit(0.0).alias("score")).limit(0)
    tf_cols = []
    for i, w in enumerate(terms):
        pat = rf"\b{re.escape(w)}\b"
        tf_cols.append(
            F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(pat), F.lit(0)))
            .cast("double")
            .alias(f"_tf{i}")
        )
    base = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("double").alias("_dl"),
        *tf_cols,
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[F.sum((F.col(f"_tf{i}") > 0).cast("double")).alias(f"_df{i}") for i in range(len(terms))],
    )
    k1, b = 1.2, 0.75
    scored = base.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0) + (F.col("_n") - F.col(f"_df{i}") + 0.5) / (F.col(f"_df{i}") + 0.5)
        )
        tf = F.col(f"_tf{i}")
        score = score + idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl")))
    return (
        scored.withColumn("score", F.round(score, 4))
        .filter(sum(F.col(f"_tf{i}") for i in range(len(terms))) > 0)
        .select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def _search_ranked_sql(terms: list[str], k: int = 10) -> str:
    """DuckDB twin of search_documents_ranked — identical BM25 math."""
    if not terms:
        return "SELECT doc_id, 0.0 AS score FROM documents LIMIT 0"

    def tf(w: str) -> str:
        pat = rf"\b{re.escape(w.lower())}\b".replace("'", "''")
        return f"CAST(len(regexp_extract_all(lower(text), '{pat}')) AS DOUBLE)"

    tf_sel = ", ".join(f"{tf(w)} AS _tf{i}" for i, w in enumerate(terms))
    df_sel = ", ".join(
        f"sum(CASE WHEN _tf{i} > 0 THEN 1.0 ELSE 0.0 END) AS _df{i}" for i in range(len(terms))
    )
    score = " + ".join(
        f"ln(1.0 + (_n - _df{i} + 0.5) / (_df{i} + 0.5))"
        f" * (_tf{i} * 2.2) / (_tf{i} + 1.2 * (1 - 0.75 + 0.75 * _dl / _avgdl))"
        for i in range(len(terms))
    )
    any_tf = " + ".join(f"_tf{i}" for i in range(len(terms)))
    return f"""WITH base AS (
         SELECT doc_id,
                CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS _dl,
                {tf_sel}
         FROM documents),
       stats AS (
         SELECT CAST(count(*) AS DOUBLE) AS _n, avg(_dl) AS _avgdl, {df_sel} FROM base)
       SELECT doc_id, round({score}, 4) AS score
       FROM base CROSS JOIN stats
       WHERE ({any_tf}) > 0
       ORDER BY score DESC, doc_id LIMIT {k}"""


@q(
    "text_search_ranked",
    _search_ranked_sql(["table", "scan"]),
    doc="BM25-ranked multi-term search (relevance-scored /search?q=, api.py:52-55): "
    "idf-weighted term frequency with length normalization, oracle reproduces the idf math",
)
def text_search_ranked(spark, sf_dir):
    return search_documents_ranked(spark, sf_dir, "table scan")


@q(
    "price_range_filter",
    """SELECT count(*) AS n, round(sum(l_extendedprice), 2) AS revenue
       FROM lineitem WHERE l_extendedprice BETWEEN 1000 AND 5000""",
    doc="dashboard price-range filter (app.py:715-722)",
)
def price_range_filter(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_extendedprice").between(1000, 5000))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("revenue"))
    )


@q(
    "price_clean",
    """SELECT round(avg(CAST(regexp_replace(dirty, '[^0-9]', '', 'g') AS DOUBLE) / 100), 4) AS avg_price
       FROM (SELECT concat('$', CAST(CAST(floor(l_extendedprice * 100) AS BIGINT) AS VARCHAR), ' USD') AS dirty
             FROM lineitem)""",
    doc="price-clean projection: strip currency chars, cast (app.py:110-122)",
)
def price_clean(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    dirty = F.concat(
        F.lit("$"), F.floor(F.col("l_extendedprice") * 100).cast("long").cast("string"), F.lit(" USD")
    )
    clean = F.regexp_replace(dirty, "[^0-9]", "").cast("double") / 100
    return li.agg(F.round(F.avg(clean), 4).alias("avg_price"))


@q(
    "events_per_day",
    """SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
              round(sum(value), 2) AS total_value
       FROM events GROUP BY 1 ORDER BY day""",
    doc="epoch->datetime projection + daily rollup (app.py:150-151)",
)
def events_per_day(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("day")
    )


@q(
    "flagship_q1",
    """SELECT l_returnflag, l_linestatus,
              round(sum(l_quantity), 2) AS sum_qty,
              round(sum(l_extendedprice), 2) AS sum_base_price,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
              round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
              round(avg(l_quantity), 4) AS avg_qty,
              round(avg(l_extendedprice), 4) AS avg_price,
              round(avg(l_discount), 4) AS avg_disc,
              count(*) AS count_order
       FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""",
    doc="flagship: TPC-H Q1-style pricing summary (partial agg map-side, one shuffle)",
)
def flagship_q1(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@q(
    "topk_per_group",
    """SELECT o_orderpriority, o_orderkey, o_totalprice, rk FROM (
         SELECT o_orderpriority, o_orderkey, o_totalprice,
                CAST(row_number() OVER (PARTITION BY o_orderpriority
                                        ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
         FROM orders)
       WHERE rk <= 3 ORDER BY o_orderpriority, rk""",
    doc="top-k per group via window rank (the claim-scheduler pattern on plain tables)",
)
def topk_per_group(spark, sf_dir):
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    # spread: orders is 2 row groups, and Spark's WindowGroupLimit rule
    # runs a partial top-k sort per SCAN partition before the exchange —
    # on 2 scan partitions that local sort serializes on 2 of N cores
    # (the measured bulk of the query). Hash-repartitioning on the unique
    # key first parallelizes the partial sort; the window result is
    # unchanged (total order, deterministic tie-break). No-op at scale.
    return (
        spread_small_scan(t(spark, sf_dir, "orders"), "o_orderkey")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rk")
        .orderBy("o_orderpriority", "rk")
    )


@q(
    "revenue_by_nation",
    """SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
       FROM orders JOIN customer ON o_custkey = c_custkey
                   JOIN nation ON c_nationkey = n_nationkey
       GROUP BY n_name ORDER BY n_name""",
    doc="join+agg: broadcast the dims (nation ~25 rows), shuffle only on n_name",
)
def revenue_by_nation(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
        .orderBy("n_name")
    )


@q(
    "customers_without_orders",
    """SELECT c_mktsegment, count(*) AS n FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                         AND o.o_orderdate >= TIMESTAMP '1998-01-01')
       GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    doc="anti-join (the frontier dedup primitive) on plain tables",
)
def customers_without_orders(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "1998-01-01")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        c.join(o, "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c_mktsegment")
    )


@q(
    "active_customers_1995",
    """SELECT c_mktsegment, count(*) AS n FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                     AND o.o_orderdate >= TIMESTAMP '1995-01-01'
                     AND o.o_orderdate < TIMESTAMP '1996-01-01')
       GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    doc="semi-join (EXISTS) on plain tables",
)
def active_customers_1995(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = (
        t(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1996-01-01"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        c.join(o, "c_custkey", "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c_mktsegment")
    )


@q(
    "sessionize",
    """WITH g AS (
         SELECT user_id, ts,
                CASE WHEN CAST(epoch(ts) AS BIGINT)
                          - CAST(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS BIGINT)
                          > 1800
                     OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                     THEN 1 ELSE 0 END AS new_session
         FROM events)
       SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions
       FROM g GROUP BY user_id ORDER BY n_sessions DESC, user_id LIMIT 20""",
    doc="sessionization: lag + gap>30min flag + sum (guide OLAP pattern)",
)
def sessionize(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = t(spark, sf_dir, "events").withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | ((F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))) > 1800),
            1,
        ).otherwise(0),
    )
    return (
        ev.groupBy("user_id")
        .agg(F.sum("new_session").cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("user_id"))
        .limit(20)
    )


@q(
    "politeness_budget_rank",
    """SELECT o_orderpriority AS host, o_orderkey AS url_id,
              CAST(rk AS BIGINT) AS rk FROM (
         SELECT o_orderpriority, o_orderkey,
                row_number() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_orderdate, o_orderkey) AS rk
         FROM orders WHERE o_orderstatus = 'O')
       WHERE rk <= 2 ORDER BY host, rk""",
    doc="the window-ranked per-host claim batch (north rule) exercised on plain tables",
)
def politeness_budget_rank(spark, sf_dir):
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderdate", "o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 2)
        .select(F.col("o_orderpriority").alias("host"), F.col("o_orderkey").alias("url_id"), "rk")
        .orderBy("host", "rk")
    )


# =====================================================================
# §3 Raw-HTML ingestion (the reference's actual input format)
# =====================================================================


@q(
    "html_extract",
    """SELECT doc_id,
              'Doc ' || CAST(doc_id AS VARCHAR) AS title,
              '£' || CAST(n_chars AS VARCHAR) AS price,
              'In stock' AS availability,
              'cat-' || lang AS category,
              '/page/' || CAST(doc_id + 1 AS VARCHAR) AS book_href,
              '/page/' || CAST(doc_id AS VARCHAR) || '?p=2' AS next_href,
              CAST(1 AS BIGINT) AS n_media
       FROM documents WHERE doc_id < 200 ORDER BY doc_id""",
    doc="html_to_spans ingestion (VERDICT r1 #3): HTML is BUILT from documents "
    "columns with pure Catalyst concat, parsed by the stdlib-DOM selector "
    "engine (the reference's BeautifulSoup path, remote_worker.py:180-254), "
    "then field-extracted through the normal span pipeline; the oracle knows "
    "the expected output directly from the source columns — if the parser "
    "mis-extracts anything, the value hash diverges",
)
def html_extract(spark, sf_dir):
    from distributed_web_scrapper_and_crawler_spark.config import DEFAULT_EXTRACTION_RULES
    from distributed_web_scrapper_and_crawler_spark.operators.extract import extract_fields_udf
    from distributed_web_scrapper_and_crawler_spark.operators.html import html_to_spans_udf

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    did = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit('<html><body><ul class="breadcrumb"><li><a href="/">Home</a></li>'),
        F.lit('<li><a>Books</a></li><li><a href="/c">cat-'),
        F.col("lang"),
        F.lit('</a></li></ul><div class="product_main"><h1>Doc '),
        did,
        F.lit('</h1><p class="price_color">£'),
        F.col("n_chars").cast("string"),
        F.lit('</p><p class="availability">\n  In stock \n</p></div>'),
        F.lit('<article class="product_pod"><h3><a href="/page/'),
        (F.col("doc_id") + 1).cast("string"),
        F.lit('">t</a></h3></article>'),
        F.lit('<ul class="pager"><li class="next"><a href="/page/'),
        did,
        F.lit('?p=2">n</a></li></ul><img src="http://img.test/'),
        did,
        F.lit('.jpg"/></body></html>'),
    )
    spans_df = d.select("doc_id", html_to_spans_udf()(html).alias("spans"))
    fields = extract_fields_udf(DEFAULT_EXTRACTION_RULES)
    return (
        spans_df.select(
            "doc_id",
            fields("spans").alias("_f"),
            F.expr("filter(spans, s -> s.kind = 'link_book')[0].text").alias("book_href"),
            F.expr("filter(spans, s -> s.kind = 'link_next')[0].text").alias("next_href"),
            F.expr("size(filter(spans, s -> s.kind = 'media'))").cast("long").alias("n_media"),
        )
        .select(
            "doc_id",
            F.col("_f.title").alias("title"),
            F.col("_f.price").alias("price"),
            F.col("_f.availability").alias("availability"),
            F.col("_f.category").alias("category"),
            "book_href",
            "next_href",
            "n_media",
        )
        .orderBy("doc_id")
    )
