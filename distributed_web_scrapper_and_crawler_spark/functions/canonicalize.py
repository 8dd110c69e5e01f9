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
# remove tab/CR/LF anywhere.
_URL_CLEAN = r"^[\x00-\x20]+|[\t\r\n]"
# detection twin of _URL_CLEAN: matches iff the replace would change the
# string (leading C0/space, or tab/CR/LF anywhere)
_URL_DIRTY = r"^[\x00-\x20]|[\t\r\n]"


def _clean_urlish(s: pd.Series) -> pd.Series:
    """Apply urlsplit's cleanup, allocation-free on the clean common case:
    one regex SCAN over all rows, then rewrite only the dirty ones —
    real-world link batches are overwhelmingly clean, and an unconditional
    .str.replace would copy every string in the crawl's hottest loop."""
    s = s.fillna("")
    dirty = s.str.contains(_URL_DIRTY, regex=True)
    if dirty.any():
        s = s.copy()
        s[dirty] = s[dirty].str.replace(_URL_CLEAN, "", regex=True)
    return s


# queries whose raw-pair string sort is PROVABLY identical to
# urlencode(sorted(parse_qsl(q, keep_blank_values=True))):
# - full pair(&pair)* structure, every pair carrying '=' (parse_qsl drops
#   empty chunks and appends '=' to bare keys otherwise);
# - key chars limited to [A-Za-z_~] — every code point ABOVE '=' (0x3D),
#   so string order of 'k=v' equals tuple order (k, v) even when one key
#   is a prefix of another;
# - value chars limited to unreserved [A-Za-z0-9_.~-] minus '=' —
#   unquote_plus/quote_plus round-trip them byte-identically (no %XX, no
#   '+', and no value '=' that urlencode would escape to %3D).
_SORTABLE_Q = r"^[A-Za-z_~]+=[A-Za-z0-9_.~\-]*(?:&[A-Za-z_~]+=[A-Za-z0-9_.~\-]*)*$"


def _append_canon_query(base_url: pd.Series, q: pd.Series) -> pd.Series:
    """base_url + canonical (param-sorted) query, vectorized where provable.

    Byte-identical to canonicalize_url_py's query handling: rows whose raw
    query fits ``_SORTABLE_Q`` get a plain split/sort/join (no urllib
    machinery); other non-empty queries run the real parse_qsl+urlencode
    per row — but only on the query STRING, the scheme/host/path work
    stays vectorized either way."""
    has_q = q.notna() & (q != "")
    if not has_q.any():
        return base_url
    out = base_url.copy()
    sortable = has_q & q.str.match(_SORTABLE_Q, na=False)
    if sortable.any():
        si = sortable[sortable].index
        out.loc[si] = base_url[sortable] + "?" + pd.Series(
            ["&".join(sorted(s.split("&"))) for s in q[sortable]], index=si
        )
    hard = has_q & ~sortable
    if hard.any():
        hi = hard[hard].index
        vals = []
        for bu, s in zip(base_url[hard], q[hard]):
            enc = urlencode(sorted(parse_qsl(s, keep_blank_values=True)))
            vals.append(f"{bu}?{enc}" if enc else bu)
        out.loc[hi] = vals
    return out


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
    import numpy as np

    # rows where BOTH inputs are null are hybrid-mode placeholders (the
    # JVM fast path already produced their outputs; the inputs are nulled
    # so Arrow ships validity bits, not string bytes) — emit null outputs
    # without touching the per-row fallback
    null_both = base.isna() & href.isna()
    href = _clean_urlish(href)
    base = _clean_urlish(base)
    n = len(href)
    # absolute iff lowercase http(s) scheme AND a non-empty netloc:
    # urljoin resolves 'http:///x' (empty netloc) against the base
    is_abs = href.str.match(r"https?://[^/?#]") & ~null_both
    rel = ~is_abs

    url = pd.Series([None] * n, index=href.index, dtype=object)
    host = pd.Series([None] * n, index=href.index, dtype=object)
    out_path = pd.Series([None] * n, index=href.index, dtype=object)
    handled = is_abs | null_both

    # -- fast relative branches: outputs are ASSEMBLED from the pieces the
    # branch already knows (origin, branch path, raw query), never
    # re-extracted from the joined string — one less full-width regex pass
    if rel.any():
        h_rel = href[rel]
        # split at the first '?'/'#': path part drives the merge; the raw
        # query (text between the first '?' and any '#') is dropped by
        # parity-normalize and param-sorted by production-canonicalize;
        # fragments are dropped by both
        hm = h_rel.str.extract(r"^([^?#]*)(?:\?([^#]*))?")
        h_pre, h_q = hm[0], hm[1]
        # simple relative: non-empty path part, no scheme, and none of
        # urljoin's merge rewrites ('.'/'..' segments are resolved; '//'
        # anywhere — including protocol-relative — is collapsed by the
        # internal empty-segment filter). A query/fragment no longer
        # disqualifies: it never participates in the path merge. An EMPTY
        # path part ('?q', '#f') hits urljoin's take-the-base-path branch
        # => stdlib.
        simple = (h_pre != "") & ~h_pre.str.contains(
            r"^[A-Za-z][A-Za-z0-9+.-]*:|(?:^|/)\.\.?(?:/|$)|//", regex=True
        )
        bm = base[rel].str.extract(r"^(https?://[^/?#]*)(/[^?#]*)")
        origin, bpath = bm[0], bm[1]
        rooted = h_pre.str.startswith("/")
        root_rel = simple & rooted & origin.notna()
        # dot segments / '//' in the BASE path are rewritten by urljoin's
        # merge => such rows must take the stdlib path (rooted hrefs
        # ignore the base path entirely, so only this branch checks)
        plain_rel = simple & ~rooted & bpath.notna() & ~bpath.str.contains(_MERGE_SLOW, na=False)
        fastrel = root_rel | plain_rel
        if fastrel.any():
            path_rel = pd.Series([None] * len(h_rel), index=h_rel.index, dtype=object)
            path_rel[root_rel] = h_pre[root_rel]
            if plain_rel.any():
                bdir = bpath[plain_rel].str.replace(r"/[^/]*$", "/", regex=True)
                path_rel[plain_rel] = bdir + h_pre[plain_rel]
            # origin == scheme://netloc with a guaranteed-lowercase scheme
            # (the extract pattern is case-sensitive) => netloc by slicing
            https = origin.str.startswith("https://", na=False)
            netloc_rel = origin.str.slice(7)
            if https.any():
                netloc_rel[https] = origin[https].str.slice(8)
            fi = fastrel[fastrel].index
            handled.loc[fi] = True
            pr = path_rel[fastrel]  # starts with '/', never empty
            out_path.loc[fi] = pr
            if parity:
                # normalize_url_py == scheme://netloc + path — the query
                # and fragment are dropped wholesale, so url IS origin+path
                url.loc[fi] = origin[fastrel] + pr
                host.loc[fi] = netloc_rel[fastrel]
            else:
                sch = https[fastrel]
                nl = netloc_rel[fastrel].str.lower()
                nls = nl.copy()
                m80 = ~sch & nl.str.endswith(":80")
                if m80.any():
                    nls[m80] = nl[m80].str[:-3]
                m443 = sch & nl.str.endswith(":443")
                if m443.any():
                    nls[m443] = nl[m443].str[:-4]
                base_url = (
                    pd.Series(np.where(sch.to_numpy(), "https://", "http://"), index=fi) + nls + pr
                )
                url.loc[fi] = _append_canon_query(base_url, h_q[fastrel])
                host.loc[fi] = nl

    # -- absolute hrefs: the one branch that still needs an extract, run
    # over the abs subset only (is_abs guarantees a match)
    if is_abs.any():
        ai = is_abs[is_abs].index
        am = href[is_abs].str.extract(r"^(https?)://([^/?#]*)([^?#]*)(?:\?([^#]*))?")
        scheme_a, netloc_a, path_a, q_a = am[0], am[1], am[2], am[3]
        p_a = path_a.where(path_a != "", "/")
        out_path.loc[ai] = p_a
        if parity:
            # normalize drops query+fragment; path kept verbatim (may be '')
            url.loc[ai] = scheme_a + "://" + netloc_a + path_a
            host.loc[ai] = netloc_a
        else:
            nl = netloc_a.str.lower()
            host.loc[ai] = nl
            nls = nl.copy()
            m80 = (scheme_a == "http") & nl.str.endswith(":80")
            if m80.any():
                nls[m80] = nl[m80].str[:-3]
            m443 = (scheme_a == "https") & nl.str.endswith(":443")
            if m443.any():
                nls[m443] = nl[m443].str[:-4]
            url.loc[ai] = _append_canon_query(scheme_a + "://" + nls + p_a, q_a)

    # -- everything else: per-row stdlib, one urljoin + one urlsplit
    restm = ~handled
    if restm.any():
        ri = restm[restm].index
        urls_r, hosts_r, paths_r = [], [], []
        for b, h in zip(base[restm], href[restm]):
            u = urljoin(b, h)
            if parity:
                s = urlsplit(u)
                urls_r.append(f"{s.scheme}://{s.netloc}{s.path}")  # == normalize_url_py
                hosts_r.append(s.netloc)
            else:
                urls_r.append(canonicalize_url_py(u))
                s = urlsplit(u)
                hosts_r.append(s.netloc.lower())
            paths_r.append(s.path or "/")
        url.loc[ri] = urls_r
        host.loc[ri] = hosts_r
        out_path.loc[ri] = paths_r
    return pd.DataFrame({"url": url, "host": host, "path": out_path})


_CANON_SCHEMA_NOPATH = T.StructType(
    [T.StructField("url", T.StringType()), T.StructField("host", T.StringType())]
)


@lru_cache(maxsize=8)
def canon_links_flat_udf(parity: bool = True, include_path: bool = True):
    """pandas UDF (base, href) -> struct(url, host[, path]) over FLAT
    string columns — the vectorized hot path used by plans/round.py after
    a JVM-side posexplode (sort/pos/depth stay in codegen; only two
    string columns cross Arrow). ``include_path=False`` drops the path
    column from the Arrow RETURN batch — the round plan discards it
    unless robots enforcement is on, and a third string column over the
    round's biggest intermediate is pure transfer cost. Cached per mode:
    the round loop calls this every round, and a fresh function object
    would re-pay closure pickling on every query."""

    schema = _CANON_SCHEMA if include_path else _CANON_SCHEMA_NOPATH

    @F.pandas_udf(schema)
    def _canon(base: pd.Series, href: pd.Series) -> pd.DataFrame:
        out = _canon_links_pd(base, href, parity)
        return out if include_path else out[["url", "host"]]

    return _canon


@lru_cache(maxsize=8)
def canon_links_doc_udf(parity: bool = True, include_path: bool = True):
    """DOC-granularity canonicalize: ``(base, hrefs: array<string>) ->
    struct(urls: array<string>, hosts: array<string>[, paths])``.

    The flat kernel ships the parent URL across Arrow once PER LINK —
    ~16x duplicated bytes on the round's biggest intermediate (VERDICT
    r4 #3). Here each base string crosses ONCE per document; the kernel
    flattens with ``np.repeat`` (object-pointer fan-out, no string
    copies), reuses ``_canon_links_pd`` verbatim — so every
    byte-equality proof for the flat kernel covers this one — and
    re-chunks the outputs with ``np.split`` (again pointer slices).
    Outputs are PARALLEL ARRAYS, not array<struct>: per-link Python
    struct/dict construction is exactly what made the old fused
    array<struct> UDF lose to the flat kernel (PLANS.md ledger); a
    struct-of-arrays return keeps the per-doc Python work to three list
    headers. The caller re-aligns positionally with ``arrays_zip`` +
    ``posexplode`` — order is preserved end-to-end.
    """
    import numpy as np

    fields = [
        T.StructField("urls", T.ArrayType(T.StringType())),
        T.StructField("hosts", T.ArrayType(T.StringType())),
    ]
    if include_path:
        fields.append(T.StructField("paths", T.ArrayType(T.StringType())))
    schema = T.StructType(fields)

    @F.pandas_udf(schema)
    def _canon(base: pd.Series, hrefs: pd.Series) -> pd.DataFrame:
        # null hrefs arrays (e.g. a null spans column upstream) count as 0
        # links: the flat kernel's posexplode drops such rows, so emitting
        # an empty array keeps the two kernels equal (ADVICE r5 medium)
        counts = np.fromiter(
            (0 if h is None else len(h) for h in hrefs), dtype=np.int64, count=len(hrefs)
        )
        total = int(counts.sum())
        if total == 0:
            empty = [[] for _ in range(len(base))]
            out = {"urls": empty, "hosts": list(empty)}
            if include_path:
                out["paths"] = list(empty)
            return pd.DataFrame(out, index=base.index)
        flat_base = pd.Series(np.repeat(base.to_numpy(), counts))
        flat_href = pd.Series(
            np.concatenate(
                [np.asarray(h, dtype=object) for h in hrefs if h is not None and len(h)]
            )
        )
        flat = _canon_links_pd(flat_base, flat_href, parity)
        # np.split at the doc boundaries: each chunk is an object-pointer
        # view, which Arrow accepts as a list element directly
        cuts = np.cumsum(counts)[:-1]
        out = {
            "urls": np.split(flat["url"].to_numpy(), cuts),
            "hosts": np.split(flat["host"].to_numpy(), cuts),
        }
        if include_path:
            out["paths"] = np.split(flat["path"].to_numpy(), cuts)
        return pd.DataFrame(out, index=base.index)

    return _canon


def _jvm_canon(b: F.Column, h: F.Column, parity: bool):
    """The kernel's fast-path branch logic re-expressed in Catalyst:
    returns (fast, url, host, path) Columns where ``fast`` marks rows the
    JVM expressions fully canonicalize (same triggers as
    ``_canon_links_pd``'s fast branches) and url/host/path are their
    outputs — whole-stage codegen, no Python, no Arrow. Byte-equality
    with the pandas kernel (and so with urljoin + normalize/canonicalize)
    is pinned by the hybrid sweep in tests/test_canonicalize.py. All
    regexes are ASCII char classes valid in both Java and Python regex;
    array_sort's binary UTF8 ordering equals Python's str sort on the
    ASCII-only sortable-query charset."""
    b = F.coalesce(b, F.lit(""))
    h = F.coalesce(h, F.lit(""))
    clean = ~b.rlike(_URL_DIRTY) & ~h.rlike(_URL_DIRTY)
    h_pre = F.regexp_extract(h, r"^([^?#]*)", 1)
    has_q = h.rlike(r"^[^#]*\?")
    h_q = F.regexp_extract(h, r"^[^?#]*\?([^#]*)", 1)
    is_abs = h.rlike(r"^https?://[^/?#]")
    # absolute pieces (h_pre carries no ?/# by construction)
    nl_a = F.regexp_extract(h_pre, r"^https?://([^/]*)", 1)
    p_a = F.regexp_extract(h_pre, r"^https?://[^/]*(.*)$", 1)
    # relative pieces
    origin = F.regexp_extract(b, r"^(https?://[^/?#]*)", 1)
    bpath = F.regexp_extract(b, r"^https?://[^/?#]*(/[^?#]*)", 1)
    rooted = h_pre.startswith("/")
    simple = (h_pre != "") & ~h_pre.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:|(^|/)\.\.?(/|$)|//")
    root_ok = simple & rooted & (origin != "")
    plain_ok = simple & ~rooted & (bpath != "") & ~bpath.rlike(_MERGE_SLOW)
    bdir = F.regexp_replace(bpath, r"/[^/]*$", "/")
    p_rel = F.when(rooted, h_pre).otherwise(F.concat(bdir, h_pre))
    nl_rel = F.regexp_extract(origin, r"^https?://(.*)$", 1)
    sch = F.when(
        F.when(is_abs, h_pre).otherwise(origin).startswith("https://"), F.lit("https")
    ).otherwise(F.lit("http"))
    nl_raw = F.when(is_abs, nl_a).otherwise(nl_rel)
    p_raw = F.when(is_abs, p_a).otherwise(p_rel)
    p_out = F.when(p_raw == "", F.lit("/")).otherwise(p_raw)
    fast = clean & (is_abs | root_ok | plain_ok)
    if parity:
        # normalize drops query+fragment wholesale
        url = F.when(is_abs, h_pre).otherwise(F.concat(origin, p_rel))
        return fast, url, nl_raw, p_out
    q_ok = ~has_q | (h_q == "") | h_q.rlike(_SORTABLE_Q)
    fast = fast & q_ok
    nl = F.lower(nl_raw)
    nls = (
        F.when((sch == "http") & nl.endswith(":80"), F.regexp_replace(nl, ":80$", ""))
        .when((sch == "https") & nl.endswith(":443"), F.regexp_replace(nl, ":443$", ""))
        .otherwise(nl)
    )
    q_sorted = F.when(
        has_q & (h_q != ""),
        F.concat(F.lit("?"), F.array_join(F.array_sort(F.split(h_q, "&")), "&")),
    ).otherwise(F.lit(""))
    url = F.concat(sch, F.lit("://"), nls, p_out, q_sorted)
    return fast, url, nl, p_out


def attach_canon_links(
    df, base_col: str, href_col: str, parity: bool = True, include_path: bool = True
):
    """df + canonical (url, host[, path]) columns — the HYBRID hot path.

    Fast-path rows (the overwhelming majority of real link batches) are
    canonicalized entirely in whole-stage codegen by ``_jvm_canon``; only
    residue rows' strings cross Arrow into the pandas kernel — the UDF's
    inputs are NULLed for fast rows, so the Arrow batch carries validity
    bits instead of string bytes, and ``_canon_links_pd`` short-circuits
    the all-null rows. The slow struct is materialized as its own
    projection column so CollapseProject cannot clone the (non-cheap)
    PythonUDF into each field reference — one Arrow crossing per batch.
    """
    b, h = F.col(base_col), F.col(href_col)
    fast, jvm_url, jvm_host, jvm_path = _jvm_canon(b, h, parity)
    udf = canon_links_flat_udf(parity, include_path)
    df = df.withColumn("_cl_fast", fast).withColumn(
        "_cl_slow",
        udf(
            F.when(F.col("_cl_fast"), F.lit(None).cast("string")).otherwise(b),
            F.when(F.col("_cl_fast"), F.lit(None).cast("string")).otherwise(h),
        ),
    )
    out = df.withColumn(
        "url", F.when(F.col("_cl_fast"), jvm_url).otherwise(F.col("_cl_slow.url"))
    ).withColumn("host", F.when(F.col("_cl_fast"), jvm_host).otherwise(F.col("_cl_slow.host")))
    if include_path:
        out = out.withColumn(
            "path", F.when(F.col("_cl_fast"), jvm_path).otherwise(F.col("_cl_slow.path"))
        )
    return out.drop("_cl_fast", "_cl_slow")


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
