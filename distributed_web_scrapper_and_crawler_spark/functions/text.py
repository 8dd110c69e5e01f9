"""Text-analysis column builders — pure Catalyst expressions (no UDFs).

Large-scale training-data pipeline primitives over a document table:
language-ID (stopword-hit heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), document fingerprinting, char n-gram
shingling, and a cross-engine 60-bit hash.

Everything here is expressible in ANSI SQL as well (the DuckDB oracle
side lives in ``analytics/queries.py``), which is exactly why these are
built-ins-only: whole-stage codegen on the Spark side, bit-identical
semantics on the oracle side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 60-bit hash derived from md5 — identical in Spark and DuckDB
# (conv(substr(md5(x),1,15),16,10) == CAST('0x'||substr(md5(x),1,15) AS UBIGINT)).
# Used wherever the oracle must reproduce hashing (minhash, simhash);
# xxhash64 stays the engine-internal fingerprint (no oracle needs it).


def md5_long(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}),1,15)) AS UBIGINT)::BIGINT"


BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"


def tokens_ws(col_name: str) -> Column:
    """Whitespace tokens, empties dropped."""
    return F.expr(f"filter(split({col_name}, '\\\\s+'), t -> t <> '')")


def tokens_bpe(col_name: str) -> Column:
    """BPE-ish pre-tokenization: letter runs | digit runs | punct runs."""
    # Spark SQL string literals eat one backslash level => escape the regex
    pat = BPE_TOKEN_RE.replace("\\", "\\\\")
    return F.expr(f"regexp_extract_all({col_name}, '{pat}', 0)")


def char_ngrams(col_name: str, n: int = 8) -> Column:
    """All character n-grams (shingles); short strings yield one gram."""
    return F.expr(
        f"transform(sequence(1, greatest(length({col_name})-{n - 1}, 1)), i -> substr({col_name}, i, {n}))"
    )


def char_ngrams_sql(expr: str, n: int = 8) -> str:
    return (
        f"list_transform(range(1, greatest(length({expr})-{n - 1}, 1)+1), i -> substr({expr}, i, {n}))"
    )


# language-ID heuristic: per-language stopword alternations; predicted
# language = argmax hit count with a fixed tie-break order.
LANG_STOPWORDS: dict[str, str] = {
    "en": "the|and|of|to|in|is|a",
    "de": "der|die|das|und|ist|ein",
    "fr": "le|la|les|et|est|un",
    "es": "el|la|los|y|es|un",
}


def lang_hits(col_name: str, lang: str) -> Column:
    pat = f"\\\\b({LANG_STOPWORDS[lang]})\\\\b"
    return F.size(F.expr(f"regexp_extract_all(lower({col_name}), '{pat}', 0)"))


def lang_hits_sql(expr: str, lang: str) -> str:
    pat = f"\\b({LANG_STOPWORDS[lang]})\\b"
    return f"len(regexp_extract_all(lower({expr}), '{pat}'))"


def quality_features(col_name: str) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio features for quality scoring."""
    toks = tokens_ws(col_name)
    n_tokens = F.size(toks)
    n_chars = F.length(col_name)
    n_punct = F.size(F.expr(f"regexp_extract_all({col_name}, '[^A-Za-z0-9\\\\s]', 0)"))
    n_stop = lang_hits(col_name, "en")
    return {
        "n_tokens": n_tokens,
        "n_chars": n_chars,
        "mean_token_len": F.round((n_chars - (n_tokens - 1)) / n_tokens, 4),
        "punct_ratio": F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4),
        "stopword_ratio": F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 4),
    }


def doc_fingerprint(col_name: str) -> Column:
    """Content fingerprint: md5 of whitespace-normalized lowercased text."""
    return F.md5(F.trim(F.regexp_replace(F.lower(F.col(col_name)), "\\s+", " ")))


def doc_fingerprint_sql(expr: str) -> str:
    return f"md5(trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g')))"
