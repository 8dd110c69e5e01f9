"""Raw-HTML ingestion (operators/html.py): the stdlib DOM + mini-CSS
selector engine must reproduce the reference's BeautifulSoup extraction
(remote_worker.py:180-254) — three link families with their depth
semantics, config.yaml:9-27 field rules, relative-href absolutization —
and feed the normal crawl engine end-to-end."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from distributed_web_scrapper_and_crawler_spark.config import CrawlConfig
from distributed_web_scrapper_and_crawler_spark.operators.html import (
    html_doc_to_spans,
    html_to_spans_udf,
    parse_html,
    select,
    select_one,
)
from distributed_web_scrapper_and_crawler_spark.plans.crawl import CrawlEngine
from distributed_web_scrapper_and_crawler_spark.sources.corpus import CORPUS_SPARK_SCHEMA

_BOOK_PAGE = """
<html><body>
<ul class="breadcrumb"><li><a href="/">Home</a></li><li><a>Books</a></li>
  <li><a href="/cat/poetry">Poetry</a></li></ul>
<div class="product_main"><h1>A Light in the Attic</h1>
  <p class="price_color">£51.77</p>
  <p class="star-rating Three">x</p>
  <p class="availability">
      In stock (22 available)
  </p></div>
<aside class="side_categories"><ul class="nav-list">
  <li><a href="../category/poetry_23/index.html">Poetry</a></li></ul></aside>
<article class="product_pod"><h3><a href="catalogue/tipping_999/index.html">T</a></h3></article>
<article class="product_pod"><h3><a href="catalogue/soumission_998/index.html">S</a></h3></article>
<ul class="pager"><li class="next"><a href="page-2.html">next</a></li></ul>
<img src="media/cover.jpg"/>
</body></html>"""


def test_golden_spans():
    """Hand oracle: exact (kind, text/media_ref) sequence, reference
    family order, get_text().strip() semantics on fields."""
    spans = html_doc_to_spans(_BOOK_PAGE)
    got = [(s["kind"], s["text"] or s["media_ref"]) for s in spans]
    assert got == [
        ("text", "title=A Light in the Attic"),
        ("text", "price=£51.77"),
        ("text", "rating=x"),
        ("text", "availability=In stock (22 available)"),
        ("text", "category=Poetry"),
        ("link_book", "catalogue/tipping_999/index.html"),
        ("link_book", "catalogue/soumission_998/index.html"),
        ("link_next", "page-2.html"),
        ("link_cat", "../category/poetry_23/index.html"),
        ("media", "media/cover.jpg"),
    ]
    assert [s["offset"] for s in spans] == list(range(10))


def test_selector_engine_details():
    root = parse_html(_BOOK_PAGE)
    # nth-child counts element children (3rd li of the breadcrumb)
    el = select_one(root, ".breadcrumb li:nth-child(3) a")
    assert el is not None and el.get_text() == "Poetry"
    # descendant combinator skips levels (.side_categories ... a)
    assert len(select(root, ".side_categories .nav-list a")) == 1
    # compound class on a multi-class element
    assert select_one(root, ".product_main .star-rating") is not None
    # missing selector => None (rule skipped, distributed_crawler.py:203)
    assert select_one(root, ".product_main .does-not-exist") is None


def test_get_text_document_order():
    """Mixed content: text interleaved with inline children must come out
    in document order — <h1>A <i>Light</i> here</h1> -> 'A Light here'
    (BeautifulSoup get_text semantics, remote_worker.py:191)."""
    root = parse_html(
        '<div class="product_main"><h1>A <i>Light</i> in the <b>Attic</b>!</h1></div>'
    )
    el = select_one(root, ".product_main h1")
    assert el is not None and el.get_text() == "A Light in the Attic!"
    # field extraction path sees the same ordered text
    spans = html_doc_to_spans(
        '<div class="product_main"><h1>A <i>Light</i> in the <b>Attic</b></h1></div>'
    )
    assert ("text", "title=A Light in the Attic") in [(s["kind"], s["text"]) for s in spans]


def test_malformed_html_no_crash():
    spans = html_doc_to_spans("<div class=product_pod><h3><a href='x.html'>t</div></p></body>")
    assert ("link_book", "x.html") in [(s["kind"], s["text"]) for s in spans]
    assert html_doc_to_spans(None if False else "") == []


@pytest.fixture(scope="module")
def html_corpus(spark):
    """A 3-page HTML site: page0 -> page1 (book, depth+1) -> page2 (next,
    same depth); page1 links a disallowed host; relative hrefs throughout."""

    def page(i: int, body: str) -> tuple[str, str]:
        return (f"http://site.example.test/page/{i}", f"<html><body>{body}</body></html>")

    rows = [
        page(0, '<div class="product_pod"><h3><a href="/page/1">b</a></h3></div>'
                '<div class="product_main"><h1>Zero</h1></div>'),
        page(1, '<ul class="pager"><li class="next"><a href="page/2">n</a></li></ul>'
                '<div class="product_pod"><h3><a href="http://forbidden.test/x">bad</a></h3></div>'
                '<div class="product_main"><h1>One</h1></div>'),
        page(2, '<div class="product_main"><h1>Two</h1></div>'),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "html"])
    raw = spark.createDataFrame(pdf)
    corpus = raw.select("doc_id", html_to_spans_udf()(F.col("html")).alias("spans"))
    df = spark.createDataFrame(corpus.toPandas(), schema=CORPUS_SPARK_SCHEMA)
    df.cache().count()
    return df


def test_crawl_from_raw_html(spark, html_corpus):
    """End-to-end: raw HTML -> spans -> the unmodified crawl engine.
    Asserts depth semantics (+1 book, +0 next), the allow filter, and
    that relative hrefs resolve exactly as urllib.parse.urljoin does
    (the reference's absolutization, remote_worker.py:216)."""
    from urllib.parse import urljoin

    cfg = CrawlConfig(parity_mode=True, round_budget=16, allowed_domains=("example.test",))
    eng = CrawlEngine(spark=spark, corpus=html_corpus, cfg=cfg)
    eng.seed(["http://site.example.test/page/0"])
    eng.run()
    seen = {r["url"] for r in eng.state.seen.collect()}
    assert seen == {"http://site.example.test/page/0", "http://site.example.test/page/1"}
    # page1's relative 'page/2' resolves per urljoin (=> /page/page/2,
    # absent from the corpus => enqueued then failed), and the forbidden
    # host link is filtered
    expect_next = urljoin("http://site.example.test/page/1", "page/2")
    statuses = {r["url"]: r["status"] for r in eng.state.done.collect()}
    assert statuses.get(expect_next) == "failed"
    assert not any("forbidden.test" in u for u in statuses)
    # depth semantics: page1 via link_book => depth 1
    pages = {r["url"]: (r["depth"], r["title"]) for r in eng.state.pages.collect()}
    assert pages["http://site.example.test/page/0"] == (0, "Zero")
    assert pages["http://site.example.test/page/1"] == (1, "One")
