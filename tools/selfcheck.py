"""Replicates the driver's correctness gate locally: for every query in
__spark_entry__.queries(), run the Spark query and the DuckDB oracle at
sf0.01 and compare row-count + column names + order-insensitive values.

Usage: python tools/selfcheck.py [query ...]   (default: all)
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    return pdf


def main(names: list[str]) -> int:
    import __spark_entry__ as e
    from distributed_web_scrapper_and_crawler_spark.session import get_spark

    spark = get_spark(app_name="selfcheck", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for tname in TABLES:
        con.execute(
            f"CREATE VIEW {tname} AS SELECT * FROM '{SF_DIR}/{tname}.parquet'"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    # pytest-gated entries (excluded from the driver's 50-entry budget)
    # still get the identical check here
    from distributed_web_scrapper_and_crawler_spark.analytics import QUERY_REGISTRY

    for gname, gfn in e.pytest_gated_queries().items():
        qs[gname] = gfn
        if QUERY_REGISTRY[gname].sql is not None:
            oracles[gname] = QUERY_REGISTRY[gname].sql
    names = names or list(qs)
    n_fail = 0
    for name in names:
        t0 = time.monotonic()
        try:
            sdf = qs[name](spark, SF_DIR)
            spdf = sdf.toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spdf)} rows (no oracle) [{time.monotonic()-t0:.1f}s]")
            continue
        try:
            opdf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        a, b = normalize(spdf), normalize(opdf)
        problems = []
        if list(a.columns) != list(b.columns):
            problems.append(f"columns {list(a.columns)} vs {list(b.columns)}")
        elif len(a) != len(b):
            problems.append(f"rowcount {len(a)} vs {len(b)}")
        elif not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad_cols = [c for c in a.columns if neq[c].any()]
            for c in bad_cols[:2]:
                i = neq[c].idxmax()
                problems.append(f"col {c} row {i}: {a[c][i]!r} vs {b[c][i]!r}")
            # dtype-only mismatch?
            if not bad_cols:
                problems.append(f"dtypes {dict(a.dtypes)} vs {dict(b.dtypes)}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(str(p) for p in problems))
            n_fail += 1
        else:
            dts = [f"{c}:{a[c].dtype}" for c in a.columns]
            print(f"OK    {name}: {len(a)} rows [{time.monotonic()-t0:.1f}s] {dts}")
    print(f"\n{len(names) - n_fail}/{len(names)} passed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
