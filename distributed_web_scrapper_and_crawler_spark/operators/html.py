"""Raw-HTML ingestion: ``html_to_spans`` — the bridge from real pages to
the engine's interleaved span documents.

The reference's workers parse fetched HTML with BeautifulSoup CSS
selectors (``/root/reference/remote_worker.py:180-254``,
``distributed_crawler.py:196-260``) — three link-selector families plus
the ``config.yaml:9-27`` extraction rules. The engine consumes span
documents; this operator produces them FROM raw HTML, so a user whose
input is real pages gets the same crawl semantics:

====================  ===============================  ==================
selector (reference)  emitted span                     cite
====================  ===============================  ==================
``.product_pod`` →    ``link_book`` (href text)        remote_worker.py:208-222
``h3 a[href]``
``.pager .next a``    ``link_next``                    remote_worker.py:225-238
``.side_categories    ``link_cat``                     remote_worker.py:241-254
.nav-list a``
extraction rules      ``text`` span ``field=value``    remote_worker.py:184-198
``img[src]``          ``media`` (media_ref)            (new; reference
                                                       never fetches imgs)
====================  ===============================  ==================

No bs4/lxml in the image — the DOM is built with stdlib
``html.parser.HTMLParser`` and matched by a mini CSS engine that covers
exactly the selector grammar the reference uses: ``tag``, ``.class``,
``tag.class``, descendant combinator (space), and ``:nth-child(k)``.
Spark shape: ONE vectorized pandas UDF html -> spans array (Arrow batch
in, Arrow batch out, no per-row Python UDFs), after which the existing
extraction/crawl plans apply unchanged.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F

from distributed_web_scrapper_and_crawler_spark.config import (
    DEFAULT_EXTRACTION_RULES,
    ExtractionRule,
)
from distributed_web_scrapper_and_crawler_spark.sources.corpus import SPANS_SPARK_SCHEMA

_VOID_TAGS = {"img", "br", "hr", "meta", "link", "input", "area", "base", "col", "embed", "source", "track", "wbr"}


class _El:
    __slots__ = ("tag", "attrs", "classes", "children", "nodes", "parent", "nth")

    def __init__(self, tag: str, attrs: dict, parent: "_El | None"):
        self.tag = tag
        self.attrs = attrs
        self.classes = set((attrs.get("class") or "").split())
        self.children: list[_El] = []  # element children only
        # document-order child nodes: str (text node) or _El — get_text must
        # interleave text with inline children (<h1>A <i>B</i> C</h1> -> "A B C"),
        # matching BeautifulSoup get_text() (remote_worker.py:191)
        self.nodes: list = []
        self.parent = parent
        self.nth = 0  # 1-based index among parent's ELEMENT children

    def get_text(self) -> str:
        out: list[str] = []
        for n in self.nodes:
            out.append(n if isinstance(n, str) else n.get_text())
        return "".join(out)

    def iter(self):
        yield self
        for c in self.children:
            yield from c.iter()


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _El("[root]", {}, None)
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        parent = self.stack[-1]
        el = _El(tag, dict(attrs), parent)
        parent.children.append(el)
        parent.nodes.append(el)
        el.nth = len(parent.children)
        if tag not in _VOID_TAGS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in _VOID_TAGS:
            self.stack.pop()

    def handle_endtag(self, tag):
        # pop to the nearest matching open tag (tolerant of mis-nesting)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        self.stack[-1].nodes.append(data)


def parse_html(html: str) -> _El:
    tb = _TreeBuilder()
    tb.feed(html or "")
    return tb.root


class _Part:
    __slots__ = ("tag", "classes", "nth")

    def __init__(self, token: str):
        self.nth = None
        if ":nth-child(" in token:
            token, rest = token.split(":nth-child(", 1)
            self.nth = int(rest.rstrip(")"))
        pieces = token.split(".")
        self.tag = pieces[0] or None
        self.classes = set(p for p in pieces[1:] if p)

    def matches(self, el: _El) -> bool:
        if self.tag and el.tag != self.tag:
            return False
        if not self.classes.issubset(el.classes):
            return False
        if self.nth is not None and el.nth != self.nth:
            return False
        return True


def _compile(selector: str) -> list[_Part]:
    return [_Part(tok) for tok in selector.split()]


def _matches_chain(el: _El, parts: list[_Part]) -> bool:
    if not parts[-1].matches(el):
        return False
    # ancestors must match the remaining parts in order (descendant combinator)
    i = len(parts) - 2
    node = el.parent
    while i >= 0 and node is not None:
        if parts[i].matches(node):
            i -= 1
        node = node.parent
    return i < 0


def select(root: _El, selector: str) -> list[_El]:
    """All elements matching the (space-combined) selector, document order."""
    parts = _compile(selector)
    return [el for el in root.iter() if el is not root and _matches_chain(el, parts)]


def select_one(root: _El, selector: str) -> "_El | None":
    found = select(root, selector)
    return found[0] if found else None


# the reference's three link families (SURVEY.md §2.3): (span kind,
# container selector, inner selector or None => container carries href)
LINK_FAMILIES: tuple[tuple[str, str, str | None], ...] = (
    ("link_book", ".product_pod", "h3 a"),  # remote_worker.py:208-222
    ("link_next", ".pager .next a", None),  # remote_worker.py:225-238
    ("link_cat", ".side_categories .nav-list a", None),  # remote_worker.py:241-254
)

# config.yaml:9-27 selectors (description has selector: null => pruned,
# exactly like distributed_crawler.py:203)
HTML_FIELD_SELECTORS: tuple[tuple[str, str], ...] = (
    ("title", ".product_main h1"),
    ("price", ".product_main .price_color"),
    ("rating", ".product_main .star-rating"),
    ("availability", ".product_main .availability"),
    ("category", ".breadcrumb li:nth-child(3) a"),
)


def html_doc_to_spans(html: str) -> list[dict]:
    """One HTML document -> the engine's span list (kind, text, media_ref,
    offset). Field spans carry ``field=value`` markers so the existing
    ``extract_fields_udf`` consumes them unchanged; link spans carry raw
    hrefs (absolutization happens in the fused link UDF, like always)."""
    root = parse_html(html)
    spans: list[dict] = []

    def emit(kind: str, text: str, media_ref: str = "") -> None:
        spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": len(spans)})

    for fld, sel in HTML_FIELD_SELECTORS:
        el = select_one(root, sel)
        if el is not None:
            # element.get_text().strip() — remote_worker.py:191
            emit("text", f"{fld}={el.get_text().strip()}")
    for kind, container, inner in LINK_FAMILIES:
        for el in select(root, container):
            tgt = select_one(el, inner) if inner else el
            href = (tgt.attrs.get("href") or "") if tgt is not None else ""
            if href:
                emit(kind, href)
    for img in select(root, "img"):
        src = img.attrs.get("src") or ""
        if src:
            emit("media", "", media_ref=src)
    return spans


def html_to_spans_udf():
    """pandas UDF: html string column -> spans array (corpus span schema)."""

    @F.pandas_udf(SPANS_SPARK_SCHEMA)
    def _to_spans(htmls: pd.Series) -> pd.Series:
        return pd.Series([html_doc_to_spans(h) if h is not None else [] for h in htmls])

    return _to_spans


def html_extraction_rules() -> tuple[ExtractionRule, ...]:
    """Rules matching the marker spans html_doc_to_spans emits."""
    return DEFAULT_EXTRACTION_RULES
