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

from urllib.parse import parse_qsl, urlencode, urlsplit

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
