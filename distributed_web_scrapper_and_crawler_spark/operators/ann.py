"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot products stay JVM-side (``aggregate``/``zip_with`` over doubles,
  whole-stage codegen'd); the query side is broadcast so the scan of the
  big side never shuffles.
- ``lsh_ann_topk``: the scale path — random-hyperplane LSH. Hyperplane
  weights are ±1 derived from md5 of (plane, dim) (deterministic, no RNG
  state), signatures bucket the corpus, and top-k runs within buckets
  (+ optional multi-probe by flipping one bit). At 10^10 rows the bucket
  join touches ~n/2^planes candidates per query instead of n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from distributed_web_scrapper_and_crawler_spark.functions.text import md5_long


def _as_double(col: str) -> str:
    return f"transform({col}, x -> cast(x as double))"


def cosine_expr(a: str, b: str) -> F.Column:
    """cosine(a, b) as a pure Catalyst expression over two array columns."""
    dot = f"aggregate(zip_with({_as_double(a)}, {_as_double(b)}, (x, y) -> x * y), 0D, (s, v) -> s + v)"
    na = f"sqrt(aggregate({_as_double(a)}, 0D, (s, v) -> s + v * v))"
    nb = f"sqrt(aggregate({_as_double(b)}, 0D, (s, v) -> s + v * v))"
    return F.expr(f"({dot}) / nullif(({na}) * ({nb}), 0D)")


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_to: int = 4,
) -> DataFrame:
    """Exact top-k neighbors per query (self-matches excluded).

    (q_id, neighbor_id, score). Score rounded for cross-engine float
    stability; ties broken by neighbor id — fully deterministic.
    """
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("neighbor_id"))
        .withColumn("score", F.round(cosine_expr("q_vec", "c_vec"), round_to))
        .select("q_id", "neighbor_id", "score")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("q_id", "neighbor_id", "score", F.col("_rk").alias("rank"))
    )


def near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    round_to: int = 4,
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold. Exact (O(n²) compare) —
    the small-corpus oracle; at scale run lsh_ann_topk buckets first."""
    l = emb.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    r = emb.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    return (
        l.join(r, F.col("a") < F.col("b"))
        .withColumn("score", F.round(cosine_expr("va", "vb"), round_to))
        .filter(F.col("score") >= threshold)
        .select("a", "b", "score")
    )


def _hyperplane_sig(vec_col: str, n_planes: int) -> F.Column:
    """LSH signature: bit j = 1 iff sum_d v[d] * w(j,d) > 0, where
    w(j,d) = +1 if md5_long('j:d') is even else -1 — deterministic
    pseudo-random hyperplanes shared by build and probe sides."""
    bits = []
    for j in range(n_planes):
        w = (
            f"transform(sequence(0, size({vec_col}) - 1), "
            f"d -> case when pmod(conv(substr(md5(concat('{j}', ':', d)),1,15),16,10), 2) = 0 "
            f"then 1D else -1D end)"
        )
        dot = f"aggregate(zip_with({_as_double(vec_col)}, ({w}), (x, y) -> x * y), 0D, (s, v) -> s + v)"
        bits.append(F.when(F.expr(dot) > 0, F.lit(1 << j)).otherwise(F.lit(0)))
    sig = F.lit(0)
    for b in bits:
        sig = sig + b
    return sig.cast("int")


def lsh_ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 4,
    round_to: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket.

    Recall/latency tradeoff via n_planes (buckets = 2^planes). The
    signature is computed once per side; the join is a plain equi-join
    on the bucket id — shuffle-partitioned, skew handled by AQE.
    """
    sig = _hyperplane_sig(vec_col, n_planes)
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), sig.alias("bucket"))
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"), sig.alias("bucket"))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("q_id") != F.col("neighbor_id"))
        .withColumn("score", F.round(cosine_expr("q_vec", "c_vec"), round_to))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("q_id", "neighbor_id", "score", F.col("_rk").alias("rank"))
    )
