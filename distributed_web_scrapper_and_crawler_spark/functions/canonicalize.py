"""URL normalization / canonicalization — vectorized Arrow UDFs.

Two modes:

- **parity** (reference-exact): ``normalize_url_py`` replicates
  ``DistributedCrawler.normalize_url`` (``/root/reference/distributed_crawler.py:75-78``):
  ``f"{scheme}://{netloc}{path}"`` — drops query string AND fragment,
  preserves case. This is the dedup key of the reference's path-B crawl.
- **full** (north-rule production): lowercase scheme+host, sort query
  params, strip fragment, drop default ports — a superset that the
  reference lacks; flag-gated so parity tests stay exact.

The Spark-facing surface is a single pandas UDF returning a struct
``(url, host, path)`` so one Arrow crossing yields every derived column
(host for politeness partitioning, path for robots prefix checks).
"""

from __future__ import annotations

from functools import lru_cache
from urllib.parse import parse_qsl, urlencode, urljoin, urlsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def url_parts_py(url: str) -> tuple[str, str, str]:
    """(scheme, netloc, path) via one urlsplit."""
    s = urlsplit(url)
    return s.scheme, s.netloc, s.path


def normalize_url_py(url: str) -> str:
    """Reference-exact normalization (distributed_crawler.py:75-78)."""
    s = urlsplit(url)
    return f"{s.scheme}://{s.netloc}{s.path}"


def canonicalize_url_py(url: str) -> str:
    """Production canonicalization (north rule, BASELINE.json:6).

    Lowercase scheme/host, strip fragment, strip default port, sort query
    params, collapse empty path to '/'.
    """
    s = urlsplit(url)
    scheme = s.scheme.lower()
    netloc = s.netloc.lower()
    dp = _DEFAULT_PORTS.get(scheme)
    if dp and netloc.endswith(dp):
        netloc = netloc[: -len(dp)]
    path = s.path or "/"
    query = urlencode(sorted(parse_qsl(s.query, keep_blank_values=True)))
    return f"{scheme}://{netloc}{path}" + (f"?{query}" if query else "")


_CANON_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("path", T.StringType()),
    ]
)


def canonicalize_udf(parity: bool = True):
    """pandas UDF: raw url -> struct(url, host, path) under the given mode.

    In parity mode ``host`` is the RAW netloc — the reference's allow
    filter substring-matches the unlowered netloc
    (``any(d in parsed.netloc)``, distributed_crawler.py:67-73), so a
    mixed-case host must stay mixed-case for the filter to agree.
    Production mode lowercases (part of full canonicalization)."""

    canon = normalize_url_py if parity else canonicalize_url_py

    @F.pandas_udf(_CANON_SCHEMA)
    def _canon(urls: pd.Series) -> pd.DataFrame:
        out_url, out_host, out_path = [], [], []
        for u in urls:
            s = urlsplit(u if u is not None else "")
            out_host.append(s.netloc if parity else s.netloc.lower())
            out_path.append(s.path or "/")
            out_url.append(canon(u) if u is not None else None)
        return pd.DataFrame({"url": out_url, "host": out_host, "path": out_path})

    return _canon


# slow-path triggers inside a path being MERGED by urljoin: a segment that
# is exactly '.' or '..' (resolved), or an empty '//' segment (urljoin
# collapses internal empty segments: `segments[1:-1] = filter(None, ...)`)
_MERGE_SLOW = r"(?:^|/)\.\.?(?:/|$)|//"
# urlsplit's WHATWG cleanup (bpo-43882): lstrip C0-control-or-space, then
# remove tab/CR/LF anywhere. One combined pass per series.
_URL_CLEAN = r"^[\x00-\x20]+|[\t\r\n]"


def _canon_links_pd(base: pd.Series, href: pd.Series, parity: bool) -> pd.DataFrame:
    """Vectorized absolutize + canonicalize for a FLAT (base, href) batch —
    the crawl's hottest loop (every discovered link crosses it).

    Contract: byte-identical to the reference's unconditional
    ``urljoin(base, href)`` (distributed_crawler.py:234,245,256) followed
    by ``normalize_url_py``/``canonicalize_url_py``, for every non-empty
    base (the crawl invariant — base is the fetched page URL). urlsplit's
    WHATWG cleanup (lstrip C0-control/space, strip tab/CR/LF anywhere —
    bpo-43882) applies to BOTH urljoin operands inside the stdlib, so it
    is applied once up front here and every later branch — fast or
    per-row fallback — sees exactly the bytes the stdlib would.

    Fast paths are pure pandas string kernels; any row outside them falls
    back to the per-row stdlib path: foreign or mixed-case scheme, a
    ``.``/``..`` dot SEGMENT in the href OR in the base's path (urljoin
    resolves dot segments when merging relative refs — but keeps them in
    absolute hrefs, which therefore stay fast), protocol-relative ``//``,
    absolute href without a netloc (``http:///x`` resolves against the
    base), href query/fragment, production-mode query strings that need
    param sorting. Equivalence is pinned by the fixture sweep AND a
    Hypothesis property test in tests/test_canonicalize.py.
    """
    href = href.fillna("").str.replace(_URL_CLEAN, "", regex=True)
    base = base.fillna("").str.replace(_URL_CLEAN, "", regex=True)
    n = len(href)
    # absolute iff lowercase http(s) scheme AND a non-empty netloc:
    # urljoin resolves 'http:///x' (empty netloc) against the base
    is_abs = href.str.match(r"https?://[^/?#]")
    rel = ~is_abs

    absu = pd.Series([None] * n, index=href.index, dtype=object)
    absu[is_abs] = href[is_abs]
    if rel.any():
        h_rel = href[rel]
        # simple relative: non-empty, no scheme, no query/fragment of its
        # own, and none of urljoin's merge rewrites ('.'/'..' segments are
        # resolved; '//' anywhere — including protocol-relative — is
        # collapsed by the internal empty-segment filter)
        simple = (h_rel != "") & ~h_rel.str.contains(
            r"^[A-Za-z][A-Za-z0-9+.-]*:|(?:^|/)\.\.?(?:/|$)|//|[?#]", regex=True
        )
        bm = base[rel].str.extract(r"^(https?://[^/?#]*)(/[^?#]*)")
        origin, bpath = bm[0], bm[1]
        rooted = h_rel.str.startswith("/")
        root_rel = simple & rooted & origin.notna()
        absu.loc[root_rel[root_rel].index] = origin[root_rel] + h_rel[root_rel]
        # dot segments / '//' in the BASE path are rewritten by urljoin's
        # merge => such rows must take the stdlib path (rooted hrefs
        # ignore the base path entirely, so only this branch checks)
        plain_rel = simple & ~rooted & bpath.notna() & ~bpath.str.contains(_MERGE_SLOW, na=False)
        if plain_rel.any():
            idx = plain_rel[plain_rel].index
            bdir = bpath[plain_rel].str.replace(r"/[^/]*$", "/", regex=True)
            absu.loc[idx] = origin[plain_rel] + bdir + h_rel[plain_rel]
    rest = absu.isna()
    if rest.any():
        absu[rest] = [urljoin(b, h) for b, h in zip(base[rest], href[rest])]

    # canonicalize: vector path only for well-formed lowercase http(s);
    # ONE extract yields scheme/netloc/path/has-query for every branch
    am = absu.str.extract(r"^(https?)://([^/?#]*)([^?#]*)(\?)?")
    scheme, netloc, path = am[0], am[1], am[2]
    vec = scheme.notna()
    url = pd.Series([None] * n, index=href.index, dtype=object)
    if parity:
        # normalize_url_py == f"{scheme}://{netloc}{path}" (drops query+frag)
        url[vec] = scheme[vec] + "://" + netloc[vec] + path[vec]
        host = netloc.copy()
        slow = ~vec
        if slow.any():
            url[slow] = [normalize_url_py(u) for u in absu[slow]]
            host[slow] = [urlsplit(u).netloc for u in absu[slow]]
    else:
        nl = netloc.str.lower()
        # query rows need param sorting => per-row slow path
        vecp = vec & am[3].isna()
        nls = nl.copy()
        m80 = vecp & (scheme == "http") & nl.str.endswith(":80")
        if m80.any():
            nls[m80] = nl[m80].str[:-3]
        m443 = vecp & (scheme == "https") & nl.str.endswith(":443")
        if m443.any():
            nls[m443] = nl[m443].str[:-4]
        p = path.where(path != "", "/")
        url[vecp] = scheme[vecp] + "://" + nls[vecp] + p[vecp]
        host = nl.copy()
        slow = ~vecp
        if slow.any():
            url[slow] = [canonicalize_url_py(u) for u in absu[slow]]
            host[slow] = [urlsplit(u).netloc.lower() for u in absu[slow]]
    out_path = path.where(path != "", "/")
    pslow = ~vec
    if pslow.any():
        out_path[pslow] = [urlsplit(u).path or "/" for u in absu[pslow]]
    return pd.DataFrame({"url": url, "host": host, "path": out_path})


@lru_cache(maxsize=4)
def canon_links_flat_udf(parity: bool = True):
    """pandas UDF (base, href) -> struct(url, host, path) over FLAT string
    columns — the vectorized hot path used by plans/round.py after a
    JVM-side posexplode (sort/pos/depth stay in codegen; only two string
    columns cross Arrow). Cached per mode: the round loop calls this every
    round, and a fresh function object would re-pay closure pickling on
    every query."""

    @F.pandas_udf(_CANON_SCHEMA)
    def _canon(base: pd.Series, href: pd.Series) -> pd.DataFrame:
        return _canon_links_pd(base, href, parity)

    return _canon


def allowed_domain_filter(host_col, allowed_domains: tuple[str, ...], parity: bool = True):
    """Column predicate: reference's substring-on-netloc allow filter.

    ``any(domain in parsed.netloc for domain in allowed_domains)``
    (distributed_crawler.py:67-73) — deliberately substring, not suffix,
    and in parity mode CASE-SENSITIVE on the domain string exactly like
    the reference. In production mode hosts are lowercased by
    canonicalization, so the configured domains are lowercased too —
    otherwise a mixed-case entry silently matches nothing. Pure Catalyst
    (no UDF): OR of ``contains``.
    """
    pred = F.lit(False)
    for d in allowed_domains:
        pred = pred | host_col.contains(d if parity else d.lower())
    return pred
