"""Physical-plan shape regression tests.

The scale story rests on plan properties the functional gates can't see:
a query can stay hash-green while silently regressing to a row-at-a-time
Python UDF or an all-pairs join that dies at 100x the data. Sweep every
non-crawl registry query's physical plan at sf0.001 and pin:

- ZERO ``BatchEvalPython`` (row-at-a-time Python UDF) anywhere — the
  brief's hard rule (BASELINE.json input_hint: "vectorized pandas/Arrow
  UDFs (no per-row Python) throughout"); Arrow/pandas evals are allowed.
- No ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` outside the two
  documented exemptions:
  * ``embedding_topk`` — the EXPLICIT exact O(n^2) baseline (broadcast
    query rows x corpus, JVM-codegen cosine; operators/ann.py:41-66),
    kept as ground truth beside its sub-quadratic twins
    (``ann_lsh_topk_multiprobe``, ``ivf_ann_topk``), which must NOT
    nest-loop;
  * ``text_search_ranked`` — BM25 attaches a SINGLE broadcast stats row
    (corpus size + avg doc length) to the scan; a 1-row broadcast
    nest-loop is the intended plan (analytics/queries.py:276-370).

Crawl queries are excluded: building their DataFrames runs multi-round
engine crawls (minutes); their plan discipline is covered by the parity
suite + the bench phase accounting.
"""

import os

import pytest

from distributed_web_scrapper_and_crawler_spark.analytics import QUERY_REGISTRY

SF_DIR_SMALL = "/root/testdata/sf0.001"

ALLPAIRS_EXEMPT = {"embedding_topk", "text_search_ranked"}

_NAMES = sorted(n for n in QUERY_REGISTRY if not n.startswith("crawl_"))


@pytest.mark.parametrize("name", _NAMES)
def test_no_per_row_python_and_no_stray_allpairs(spark, name):
    if not os.path.isdir(SF_DIR_SMALL):
        pytest.skip(f"no testdata at {SF_DIR_SMALL}")
    df = QUERY_REGISTRY[name].fn(spark, SF_DIR_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF entered the plan (the brief "
        "requires Arrow-vectorized or pure-Catalyst expressions)"
    )
    if name not in ALLPAIRS_EXEMPT:
        for marker in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            assert marker not in plan, (
                f"{name}: {marker} appeared — an all-pairs join shape "
                "outside the documented exact baselines cannot survive "
                "a 100x scale-up"
            )
