"""Span extraction — the engine's "table-generating function".

The reference turns one fetched page into many ``(url, depth)`` rows via
three BeautifulSoup selector families with *different depth semantics*
(SURVEY.md §2.3):

====================  =========================  =================================
span kind             emitted depth              reference site
====================  =========================  =================================
``link_book``         parent depth **+ 1**       remote_worker.py:208-222 (:220)
``link_next``         parent depth (unchanged)   remote_worker.py:225-238 (:236)
``link_cat``          parent depth (unchanged)   remote_worker.py:241-254 (:252)
====================  =========================  =================================

All families absolutize with ``urljoin(base_url, href)``
(remote_worker.py:216, distributed_crawler.py:234). ``media`` spans are
recorded but never enqueued (the reference never fetches images).

Spark shape: one vectorized Arrow UDF per document returning
``ARRAY<STRUCT<url, depth_delta, pos>>`` followed by ``posexplode`` —
the UDTF-equivalent. Field extraction (config.yaml:9-27 analog) is a
second Series→struct pandas UDF. No per-row Python UDFs anywhere.
"""

from __future__ import annotations

from functools import lru_cache
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from distributed_web_scrapper_and_crawler_spark.config import ExtractionRule

_LINK_DELTA = {"link_book": 1, "link_next": 0, "link_cat": 0}

_LINKS_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("depth_delta", T.IntegerType()),
            T.StructField("pos", T.IntegerType()),
        ]
    )
)


def extract_links_udf():
    """pandas UDF (doc_url, spans) -> array<struct<url, depth_delta, pos>>.

    ``pos`` is the link's rank among the document's link spans ordered by
    ``offset`` — the deterministic stand-in for the reference's "insertion
    order while iterating soup.select(...)", and the tiebreak that makes
    crawl ordering total (SURVEY.md §3.3).
    """

    @F.pandas_udf(_LINKS_SCHEMA)
    def _extract(doc_urls: pd.Series, spans_col: pd.Series) -> pd.Series:
        out = []
        for base, spans in zip(doc_urls, spans_col):
            if spans is None:
                out.append([])
                continue
            links = []
            pos = 0
            for sp in sorted(spans, key=lambda s: s["offset"]):
                delta = _LINK_DELTA.get(sp["kind"])
                if delta is None:
                    continue
                href = sp["text"]
                # unconditional, like the reference (distributed_crawler.py:
                # 234,245,256): urljoin's urlunsplit round-trip also strips
                # tab/CR/LF and drops empty ?/# from absolute hrefs
                absu = urljoin(base, href)
                links.append({"url": absu, "depth_delta": delta, "pos": pos})
                pos += 1
            out.append(links)
        return pd.Series(out)

    return _extract


_LINKS_CANON_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("host", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("depth_delta", T.IntegerType()),
            T.StructField("pos", T.IntegerType()),
        ]
    )
)


def extract_links_canon_udf(parity: bool = True):
    """Fused link extraction + urljoin + canonicalization — ONE Arrow
    crossing for the hot path (the per-round links table is the biggest
    intermediate; two separate pandas-UDF stages measurably dominate
    round time). Semantics identical to extract_links_udf followed by
    canonicalize_udf; parity asserted by tests/test_extract.py."""
    from distributed_web_scrapper_and_crawler_spark.functions.canonicalize import (
        canonicalize_url_py,
        normalize_url_py,
    )
    from urllib.parse import urlsplit

    canon = normalize_url_py if parity else canonicalize_url_py

    @F.pandas_udf(_LINKS_CANON_SCHEMA)
    def _extract(doc_urls: pd.Series, spans_col: pd.Series) -> pd.Series:
        out = []
        for base, spans in zip(doc_urls, spans_col):
            if spans is None:
                out.append([])
                continue
            links = []
            pos = 0
            for sp in sorted(spans, key=lambda s: s["offset"]):
                delta = _LINK_DELTA.get(sp["kind"])
                if delta is None:
                    continue
                href = sp["text"]
                # unconditional urljoin — reference-exact (see extract_links_udf)
                absu = urljoin(base, href)
                s = urlsplit(absu)
                links.append(
                    {
                        # parity: RAW netloc (reference allow-filter is
                        # case-sensitive, distributed_crawler.py:67-73)
                        "url": canon(absu),
                        "host": s.netloc if parity else s.netloc.lower(),
                        "path": s.path or "/",
                        "depth_delta": delta,
                        "pos": pos,
                    }
                )
                pos += 1
            out.append(links)
        return pd.Series(out)

    return _extract


@lru_cache(maxsize=8)
def extract_fields_udf(rules: tuple[ExtractionRule, ...]):
    """pandas UDF spans -> struct(<field> string, ...) per the rule set.
    Cached per rule tuple (hashable): the round loop builds it every round.

    A rule matches the first text span whose payload starts with
    ``{marker}=`` (the span-marker analog of the reference's CSS
    selectors, distributed_crawler.py:199-215); the value is
    ``get_text().strip()``-equivalent: the remainder, stripped.
    Rules with a null selector are pruned at config time
    (distributed_crawler.py:203).
    """
    markers = [(r.field, r.marker + "=") for r in rules if r.marker]
    schema = T.StructType([T.StructField(f, T.StringType()) for f, _ in markers])

    @F.pandas_udf(schema)
    def _fields(spans_col: pd.Series) -> pd.DataFrame:
        cols: dict[str, list] = {f: [] for f, _ in markers}
        for spans in spans_col:
            found = {f: None for f, _ in markers}
            if spans is not None:
                for sp in sorted(spans, key=lambda s: s["offset"]):
                    if sp["kind"] != "text":
                        continue
                    txt = sp["text"] or ""
                    for f, pref in markers:
                        if found[f] is None and txt.startswith(pref):
                            found[f] = txt[len(pref) :].strip()
            for f, _ in markers:
                cols[f].append(found[f])
        return pd.DataFrame(cols)

    return _fields


def spans_sorted(spans_col: Column) -> Column:
    """Span sequence sorted by offset — pure Catalyst (array_sort with a
    comparator), no UDF. This is the per-row invariant surface:
    (kind, text, media_ref, order-by-offset) per BASELINE.json:15."""
    return F.array_sort(
        spans_col,
        lambda a, b: F.when(a["offset"] < b["offset"], -1).when(a["offset"] > b["offset"], 1).otherwise(0),
    )
