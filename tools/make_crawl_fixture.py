"""Write the committed mini-corpus fixture for the oracle-checked bounded
FIFO crawl query (VERDICT r5 #3).

The crawl registry entries run on an in-process corpus; a DuckDB oracle
however needs the SAME bytes visible to both engines, so the _SPEC
corpus is materialized ONCE to fixtures/crawl_mini_corpus.parquet
(serial generator — byte-identical per spec) and committed. Re-run this
script only if CorpusSpec/_SPEC semantics change; the committed file is
the contract.

Usage: python tools/make_crawl_fixture.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_web_scrapper_and_crawler_spark.analytics.crawl_queries import _SPEC
from distributed_web_scrapper_and_crawler_spark.sources.corpus import (
    generate_corpus,
    write_corpus_parquet,
)

out = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "crawl_mini_corpus.parquet",
)
pdf = generate_corpus(_SPEC)
write_corpus_parquet(pdf, out)
print(f"wrote {out}: {len(pdf)} docs")
