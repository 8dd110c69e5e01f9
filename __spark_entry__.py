"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries live in ``distributed_web_scrapper_and_crawler_spark/analytics/``;
this module only adapts the registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from distributed_web_scrapper_and_crawler_spark.analytics import QUERY_REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spec = QUERY_REGISTRY["flagship_q1"]
    return spec.fn(spark, "/root/testdata/sf0.001")


# The driver checks at most this many registry entries; exceeding it
# silently rotates queries out of CORRECTNESS_r{N}.json (observed r4:
# 53 entries -> 3 dropped). Entries marked pytest_gated are excluded
# here and gated by tests/test_registry_budget.py instead, which runs
# the identical DuckDB comparison — no silent rotation either way.
DRIVER_CHECK_BUDGET = 50


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (minus the
    explicitly pytest-gated redundant parameterizations — see
    pytest_gated_queries() and COVERAGE.md)."""
    out = {name: spec.fn for name, spec in QUERY_REGISTRY.items() if not spec.pytest_gated}
    if len(out) > DRIVER_CHECK_BUDGET:
        raise RuntimeError(
            f"driver-facing registry has {len(out)} entries > budget "
            f"{DRIVER_CHECK_BUDGET}: mark redundant variants pytest_gated "
            "(and cover them in tests/test_registry_budget.py) instead of "
            "letting the driver silently rotate queries out"
        )
    return out


def pytest_gated_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry entries NOT sent to the driver (50-entry budget): each is a
    redundant parameterization whose more general sibling stays
    driver-checked; tests/test_registry_budget.py runs the same
    row-count+schema+value-hash DuckDB check on these at sf0.01."""
    return {name: spec.fn for name, spec in QUERY_REGISTRY.items() if spec.pytest_gated}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; non-SQL-expressible crawl ops are
    omitted (driver records rows-only checks; their real gate is the
    pytest parity suite vs the serial reference oracle)."""
    return {
        name: spec.sql
        for name, spec in QUERY_REGISTRY.items()
        if spec.sql is not None and not spec.pytest_gated
    }
