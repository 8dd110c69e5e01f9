"""Driver check-budget discipline (VERDICT r4 #2).

The driver compares at most 50 registry entries per round; anything past
that silently rotates out of CORRECTNESS_r{N}.json. Invariants here:

1. the driver-facing registry never exceeds the budget (queries() itself
   raises past 50 — exercised);
2. the pytest-gated set is EXACTLY the documented redundant
   parameterizations, each with its more general sibling still
   driver-checked;
3. every gated query passes the driver's own gate — row-count + sorted
   column names + order-insensitive values vs its DuckDB oracle at
   sf0.01 — so gating never weakens correctness evidence.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e
from distributed_web_scrapper_and_crawler_spark.analytics import QUERY_REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# gated query -> its more general sibling that stays driver-checked
GATED = {
    "lsh_candidate_pairs_b2r4": "lsh_candidate_pairs",
    "text_search_multi": "text_search",
    "ann_lsh_topk": "ann_lsh_topk_multiprobe",
}


def test_driver_registry_within_budget():
    qs = e.queries()
    assert len(qs) <= e.DRIVER_CHECK_BUDGET, (
        f"{len(qs)} driver-facing entries: the driver would silently rotate "
        f"{len(qs) - e.DRIVER_CHECK_BUDGET} out of CORRECTNESS_r{{N}}.json"
    )
    # every oracle key is a driver-checked query
    assert set(e.oracle_sql()) <= set(qs)


def test_gated_set_is_exactly_documented():
    assert set(e.pytest_gated_queries()) == set(GATED)
    driver_names = set(e.queries())
    for gated, sibling in GATED.items():
        assert gated not in driver_names
        assert sibling in driver_names, (
            f"{gated} is gated but its sibling {sibling} is not driver-checked"
        )


def test_budget_overflow_raises(monkeypatch):
    from distributed_web_scrapper_and_crawler_spark.analytics.queries import QuerySpec

    registry = dict(QUERY_REGISTRY)
    for i in range(e.DRIVER_CHECK_BUDGET + 1):
        registry[f"_overflow_{i}"] = QuerySpec(fn=lambda s, d: None, sql=None)
    monkeypatch.setattr(e, "QUERY_REGISTRY", registry)
    with pytest.raises(RuntimeError, match="budget"):
        e.queries()


@pytest.mark.parametrize(
    "name", ["crawl_claim_order", "crawl_pages_extracted", "crawl_production_mode"]
)
def test_bounded_crawl_matches_duckdb_oracle(spark, name):
    """VERDICT r5 #3: the bounded parity crawl entries carry full DuckDB
    oracles (chained per-round CTEs over the committed fixture corpus;
    claim order/statuses and marker field extraction). Pin the driver's
    gate in the suite so a kernel or fixture drift fails here, not only
    in CORRECTNESS_r{N}.json."""
    duckdb = pytest.importorskip("duckdb")
    from distributed_web_scrapper_and_crawler_spark.analytics.crawl_queries import _FIXTURE

    assert os.path.exists(_FIXTURE), "committed mini-corpus fixture missing"
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from selfcheck import normalize

    spec = QUERY_REGISTRY[name]
    assert spec.sql is not None and not spec.pytest_gated
    a = normalize(spec.fn(spark, SF_DIR).toPandas())
    b = normalize(duckdb.connect().execute(spec.sql).fetchdf())
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b) and len(a) > 0
    if name == "crawl_claim_order":
        # both seed outcomes present: a completed fetch and a corpus miss
        assert set(a["status"]) == {"completed", "failed"}
    elif name == "crawl_pages_extracted":
        # extraction really extracted something on this corpus
        assert a["title"].notna().any()
    else:
        # the production crawl fetched across multiple rounds
        assert a["round"].nunique() > 1
    assert a.equals(b), "bounded FIFO crawl diverged from its DuckDB oracle"


@pytest.mark.parametrize("name", sorted(GATED))
def test_gated_query_matches_oracle(spark, name):
    """The driver-identical gate, run on exactly the entries the driver no
    longer sees."""
    duckdb = pytest.importorskip("duckdb")
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"no testdata at {SF_DIR}")
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from selfcheck import TABLES, normalize

    spec = QUERY_REGISTRY[name]
    assert spec.pytest_gated and spec.sql is not None
    spdf = spec.fn(spark, SF_DIR).toPandas()

    con = duckdb.connect()
    for tname in TABLES:
        con.execute(f"CREATE VIEW {tname} AS SELECT * FROM '{SF_DIR}/{tname}.parquet'")
    opdf = con.execute(spec.sql).fetchdf()

    a, b = normalize(spdf), normalize(opdf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    assert a.equals(b), f"{name}: value mismatch vs DuckDB oracle"


def test_prod_canon_sql_twin_matches_python_canon():
    """Property-pin the production-mode oracle's canonicalization CTE
    against functions.canonicalize.canonicalize_url_py over every URL
    shape the corpus generator emits (absolute / root-relative hrefs,
    with and without the '?b=2&a=1#frag' suffix, multi-segment paths).
    The driver's hash gate only covers the committed fixture; this keeps
    the SQL twin honest if the generator's shapes widen."""
    duckdb = pytest.importorskip("duckdb")
    from distributed_web_scrapper_and_crawler_spark.functions.canonicalize import (
        canonicalize_url_py,
    )

    bases = [
        "http://h000.example.test/page/0",
        "http://h001.example.test/cat/3",
        "http://h002.example.test/page/12",
    ]
    hrefs = []
    for target in ("/page/5", "/cat/0", "http://h001.example.test/page/7"):
        for suffix in ("", "?b=2&a=1#frag"):
            hrefs.append(target + suffix)
    rows = [(b, h) for b in bases for h in hrefs]

    # the oracle's ab{r} -> cn{r} expressions, verbatim shapes
    qsort = (
        "nullif(array_to_string(list_sort(string_split("
        "regexp_extract(absu, '\\?([^#]*)', 1), '&')), '&'), '')"
    )
    sql = f"""
    WITH inp(base, href) AS (VALUES {', '.join(f"('{b}', '{h}')" for b, h in rows)}),
    ab AS (SELECT base, href,
        CASE WHEN href LIKE 'http://%' OR href LIKE 'https://%' THEN href
             ELSE regexp_extract(base, '^(https?://[^/?#]*)', 1) || href END AS absu
        FROM inp)
    SELECT base, href,
           regexp_extract(absu, '^[^?#]*') || coalesce('?' || {qsort}, '') AS url
    FROM ab
    """
    got = duckdb.connect().execute(sql).fetchall()
    from urllib.parse import urljoin

    for base, href, sql_url in got:
        py_url = canonicalize_url_py(urljoin(base, href))
        assert sql_url == py_url, (base, href, sql_url, py_url)
