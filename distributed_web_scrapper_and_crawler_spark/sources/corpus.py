"""Deterministic synthetic web of interleaved text+media span documents.

This is the engine's "network": a fetch is an equi-join of the scheduled
batch against this corpus on the canonical URL (the sandbox has no real
HTTP; the reference's ``requests.get`` at ``distributed_crawler.py:187-192``
becomes ``scheduled JOIN corpus ON url = doc_id``).

Schema is exactly the input hint of BASELINE.json:15::

    doc_id: string  (canonical page URL — doubles as the fetch join key)
    spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>

Span kinds mirror the reference's three CSS-selector families plus payload
(FIXTURES.md §1):

- ``text``       prose; some carry ``field=value`` extraction markers
                 (the analog of config.yaml:9-27 selectors)
- ``link_book``  href → emitted link gets depth+1  (remote_worker.py:220)
- ``link_next``  href → same depth                 (remote_worker.py:236)
- ``link_cat``   href → same depth                 (remote_worker.py:252)
- ``media``      media_ref only; recorded, never enqueued

Everything is seeded ``numpy.random.RandomState`` — same ``CorpusSpec``
=> byte-identical corpus, the precondition for oracle parity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from distributed_web_scrapper_and_crawler_spark.config import CorpusSpec

SPAN_FIELDS = [
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
]

CORPUS_ARROW_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(pa.struct(SPAN_FIELDS))),
    ]
)

SPANS_SPARK_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("offset", T.IntegerType()),
        ]
    )
)

CORPUS_SPARK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", SPANS_SPARK_SCHEMA),
    ]
)

N_CATS = 4  # category pages per host

_WORDS = (
    "spark frontier crawl fetch parse span media link host depth queue "
    "round bloom filter shard shuffle merge rank batch arrow vector"
).split()


def _page_url(host: str, i: int) -> str:
    return f"http://{host}/page/{i}"


def _cat_url(host: str, c: int) -> str:
    return f"http://{host}/cat/{c}"


def generate_corpus(spec: CorpusSpec) -> pd.DataFrame:
    """Build the corpus as a pandas DataFrame (doc_id, spans:list[dict]).

    Link graph: every host's page i links next→page i+1 (same depth),
    cat→category pages (same depth), book→random product pages with a
    ``hot_host_share`` concentration on host 0 (the skew case). A slice of
    links point at disallowed hosts (allow-filter test) and a slice carry
    ``?b=2&a=1#frag`` suffixes that collapse under normalization.
    """
    rng = np.random.RandomState(spec.seed)
    hosts = spec.hosts
    all_pages = [(h, i) for h in hosts for i in range(spec.docs_per_host)]
    rows: list[dict] = []

    def mk_href(target_url: str, cur_host: str) -> str:
        # relative hrefs exercise urljoin (distributed_crawler.py:234)
        if target_url.startswith(f"http://{cur_host}/") and rng.rand() < spec.relative_href_rate:
            href = target_url[len(f"http://{cur_host}") :]  # root-relative
        else:
            href = target_url
        if rng.rand() < spec.query_fragment_rate:
            href += "?b=2&a=1#frag"
        return href

    def doc_rows(doc_url: str, host: str, page_i: int | None) -> list[dict]:
        spans: list[dict] = []
        hid = host.split(".")[0]
        # extraction-marker text spans (the config.yaml:9-27 analog)
        price = float(rng.randint(500, 6000)) / 100.0
        spans.append(_t(f"title=Book {hid} #{page_i if page_i is not None else 'cat'}"))
        spans.append(_t(f"price=£{price:.2f}"))
        spans.append(_t(f"rating={int(rng.randint(1, 6))} stars"))
        spans.append(_t(f"availability=In stock ({int(rng.randint(0, 30))} available)"))
        spans.append(_t(f"category=cat-{int(rng.randint(0, N_CATS))}"))
        spans.append(_t(f"description={' '.join(rng.choice(_WORDS, 8))}"))
        for _ in range(spec.text_spans_per_doc):
            spans.append(_t(" ".join(rng.choice(_WORDS, 12))))
        # media spans — recorded, never enqueued
        for m in range(spec.media_spans_per_doc):
            spans.append(
                {"kind": "media", "text": "", "media_ref": f"http://{host}/img/{rng.randint(0, 999)}.jpg"}
            )
        # link_next: pagination chain within host (same depth)
        if page_i is not None and page_i + 1 < spec.docs_per_host:
            spans.append(_l("link_next", mk_href(_page_url(host, page_i + 1), host)))
        # link_cat: category links (same depth)
        for c in rng.choice(N_CATS, size=min(2, N_CATS), replace=False):
            spans.append(_l("link_cat", mk_href(_cat_url(host, int(c)), host)))
        # link_book: product links (depth+1), hot-host skewed
        emitted: list[str] = []
        for _ in range(spec.links_per_doc):
            if emitted and rng.rand() < spec.dup_link_rate:
                tgt = emitted[int(rng.randint(0, len(emitted)))]  # dup-heavy edges
            elif rng.rand() < 0.06 and spec.disallowed_hosts:
                bad = spec.disallowed_hosts[int(rng.randint(0, len(spec.disallowed_hosts)))]
                tgt = f"http://{bad}/page/{int(rng.randint(0, 10))}"
            else:
                if rng.rand() < spec.hot_host_share:
                    th = hosts[0]
                else:
                    th = hosts[int(rng.randint(0, len(hosts)))]
                tgt = _page_url(th, int(rng.randint(0, spec.docs_per_host)))
            emitted.append(tgt)
            spans.append(_l("link_book", mk_href(tgt, host)))
        # deterministic interleave, then strictly-increasing offsets
        order = rng.permutation(len(spans))
        spans = [spans[j] for j in order]
        for k, sp in enumerate(spans):
            sp["offset"] = k * 10 + int(rng.randint(0, 10))  # strictly increasing
        return spans

    def _t(text: str) -> dict:
        return {"kind": "text", "text": text, "media_ref": ""}

    def _l(kind: str, href: str) -> dict:
        return {"kind": kind, "text": href, "media_ref": ""}

    for host, i in all_pages:
        rows.append({"doc_id": _page_url(host, i), "spans": doc_rows(_page_url(host, i), host, i)})
    for host in hosts:
        for c in range(N_CATS):
            rows.append({"doc_id": _cat_url(host, c), "spans": doc_rows(_cat_url(host, c), host, None)})
    return pd.DataFrame(rows)


def _host_docs(spec: CorpusSpec, host_idx: int) -> list[dict]:
    """All documents of ONE host, from a host-derived seed — the unit of
    the PARALLEL generator. Content is deterministic per (spec, host)
    regardless of partitioning; the stream differs from generate_corpus's
    single sequential RNG (both are fixed, documented schemes — tests and
    the parity oracle use the serial one, the bench corpus uses this)."""
    rng = np.random.RandomState((spec.seed * 1_000_003 + host_idx * 7919) % (2**31 - 1))
    hosts = spec.hosts
    host = hosts[host_idx]

    def _t(text: str) -> dict:
        return {"kind": "text", "text": text, "media_ref": ""}

    def _l(kind: str, href: str) -> dict:
        return {"kind": kind, "text": href, "media_ref": ""}

    def mk_href(target_url: str) -> str:
        if target_url.startswith(f"http://{host}/") and rng.rand() < spec.relative_href_rate:
            href = target_url[len(f"http://{host}") :]
        else:
            href = target_url
        if rng.rand() < spec.query_fragment_rate:
            href += "?b=2&a=1#frag"
        return href

    def doc_rows(doc_url: str, page_i: int | None) -> list[dict]:
        spans: list[dict] = []
        hid = host.split(".")[0]
        price = float(rng.randint(500, 6000)) / 100.0
        spans.append(_t(f"title=Book {hid} #{page_i if page_i is not None else 'cat'}"))
        spans.append(_t(f"price=£{price:.2f}"))
        spans.append(_t(f"rating={int(rng.randint(1, 6))} stars"))
        spans.append(_t(f"availability=In stock ({int(rng.randint(0, 30))} available)"))
        spans.append(_t(f"category=cat-{int(rng.randint(0, N_CATS))}"))
        spans.append(_t(f"description={' '.join(rng.choice(_WORDS, 8))}"))
        for _ in range(spec.text_spans_per_doc):
            spans.append(_t(" ".join(rng.choice(_WORDS, 12))))
        for _ in range(spec.media_spans_per_doc):
            spans.append(
                {"kind": "media", "text": "", "media_ref": f"http://{host}/img/{rng.randint(0, 999)}.jpg"}
            )
        if page_i is not None and page_i + 1 < spec.docs_per_host:
            spans.append(_l("link_next", mk_href(_page_url(host, page_i + 1))))
        for c in rng.choice(N_CATS, size=min(2, N_CATS), replace=False):
            spans.append(_l("link_cat", mk_href(_cat_url(host, int(c)))))
        emitted: list[str] = []
        for _ in range(spec.links_per_doc):
            if emitted and rng.rand() < spec.dup_link_rate:
                tgt = emitted[int(rng.randint(0, len(emitted)))]
            elif rng.rand() < 0.06 and spec.disallowed_hosts:
                bad = spec.disallowed_hosts[int(rng.randint(0, len(spec.disallowed_hosts)))]
                tgt = f"http://{bad}/page/{int(rng.randint(0, 10))}"
            else:
                th = hosts[0] if rng.rand() < spec.hot_host_share else hosts[int(rng.randint(0, len(hosts)))]
                tgt = _page_url(th, int(rng.randint(0, spec.docs_per_host)))
            emitted.append(tgt)
            spans.append(_l("link_book", mk_href(tgt)))
        order = rng.permutation(len(spans))
        spans = [spans[j] for j in order]
        for k, sp in enumerate(spans):
            sp["offset"] = k * 10 + int(rng.randint(0, 10))
        return spans

    rows = [
        {"doc_id": _page_url(host, i), "spans": doc_rows(_page_url(host, i), i)}
        for i in range(spec.docs_per_host)
    ]
    rows += [
        {"doc_id": _cat_url(host, c), "spans": doc_rows(_cat_url(host, c), None)}
        for c in range(N_CATS)
    ]
    return rows


def generate_corpus_spark(spark: SparkSession, spec: CorpusSpec) -> DataFrame:
    """Distributed corpus generation: one task per host partition,
    per-host seeded RNG — the serial pandas generator takes ~2 min for a
    400k-doc bench web on the driver; this generates the same SHAPE in
    parallel (identical schema/statistics, per-host-deterministic
    content)."""
    hosts = spark.range(0, spec.n_hosts, 1, numPartitions=spec.n_hosts)

    def gen(it):
        for pdf in it:
            for hidx in pdf["id"]:
                rows = _host_docs(spec, int(hidx))
                yield pd.DataFrame(
                    {"doc_id": [r["doc_id"] for r in rows], "spans": [r["spans"] for r in rows]}
                )

    return hosts.mapInPandas(gen, CORPUS_SPARK_SCHEMA)


def write_corpus_parquet(pdf: pd.DataFrame, path: str) -> None:
    table = pa.Table.from_pandas(pdf, schema=CORPUS_ARROW_SCHEMA, preserve_index=False)
    pq.write_table(table, path)


def read_corpus(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(CORPUS_SPARK_SCHEMA).parquet(path)


def corpus_df(spark: SparkSession, spec: CorpusSpec) -> DataFrame:
    """Generate + load as a Spark DataFrame (Arrow path)."""
    pdf = generate_corpus(spec)
    return spark.createDataFrame(pdf, schema=CORPUS_SPARK_SCHEMA)
