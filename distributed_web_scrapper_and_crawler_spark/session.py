"""SparkSession factory with the engine's standard configuration.

All knobs chosen for the 100 TB design point but safe on ``local[N]``:
AQE on (round batch sizes vary 1000x between round 1 and steady state),
skew-join on (hot hosts), Arrow on (every UDF in the engine is a
vectorized pandas UDF), UTC session TZ (DuckDB-oracle comparability).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def _default_local_dir() -> str:
    if os.path.isdir("/dev/shm"):
        d = "/dev/shm/dwsc-spark-local"
        os.makedirs(d, exist_ok=True)
        return d
    return "/tmp"


def get_spark(
    app_name: str = "dwsc-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    so the bench harness can run the same job at two parallelism levels
    (local[8] vs local[32]) for the N-vs-4N scaling-efficiency evidence.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # shuffle/spill scratch on tmpfs when available: local-mode shuffles
        # otherwise serialize on ext4 write latency and mask CPU scaling
        .config("spark.local.dir", os.environ.get("SPARK_GRAFT_LOCAL_DIR", _default_local_dir()))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
