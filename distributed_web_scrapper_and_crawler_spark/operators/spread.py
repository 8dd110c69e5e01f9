"""Small-input scan-parallelism guard, shared by the analytics operators.

A few-MB single-file parquet scan yields 1-4 partitions (often a single
row group), so expensive per-row work downstream — shingle hashing,
regex token counting, cosine scoring — would serialize on as many cores
until the first exchange (measured 3-8x the whole query wall at sf0.1;
at sf1.0 the documents/embeddings tables are still ONE row group each).
Repartitioning the small document/vector rows is far cheaper than the
serialized compute. No-op at scale: any real corpus scan already has
>= defaultParallelism splits, so no shuffle is added on the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition ``df`` to defaultParallelism iff its scan has fewer
    partitions. Pass ``key_cols`` to hash-partition on them — a keyed
    repartition skips the local sort a round-robin ``repartition(n)``
    pays for retry determinism (SPARK-23207, optimization guide §2.5)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, *key_cols) if key_cols else df.repartition(target)
    return df
