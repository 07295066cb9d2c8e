"""SparkSession factory.

One place to encode the engine's execution posture:

- UTC session timezone (the reference formats epoch seconds with
  ``time.gmtime`` — UTC — at ``walletDataConsumer.py:96``; pinning the
  session TZ makes ``from_unixtime``/``date_format`` reproduce it).
- AQE on: runtime coalescing, skew-join splitting, dynamic join
  strategy switch — the knobs that let a plan tuned at sf0.1 survive a
  100x scale-up.
- Arrow on: vectorized pandas-UDF transfer for the slow path.
- ``spark.sql.shuffle.partitions`` sized to the machine locally; on a
  real cluster AQE coalesces from a deliberately-high initial number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "datalake_polygonscan_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Local default is ``local[N]`` with N from ``$SPARK_GRAFT_CPUS``;
    on a cluster, pass ``master=None`` with spark-submit providing it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # scalar @udf data crosses the Python boundary as Arrow batches
        # instead of pickled rows (guide §4.3; off by default only for
        # legacy type-coercion compat — the full registry is
        # oracle-verified under it)
        .config("spark.sql.execution.pythonUDF.arrow.enabled", "true")
        # NOTE (optimization round 10): preferSortMergeJoin=false +
        # adaptive.maxShuffledHashJoinLocalMapThreshold were A/B-tested
        # and REJECTED: the multi-join TPC-H entries regressed ~2x
        # (q5 1.2 -> 3.1 s, q9 1.6 -> 2.7 s at sf0.1) — at these
        # post-broadcast sizes sort-merge's codegen path beat the
        # shuffled-hash builds it replaced.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # INT96 (the legacy default) writes NO min/max statistics —
        # breaks both row-group skipping and io/skipping.py manifests
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # testdata events.parquet stores TIMESTAMP(NANOS) which Spark's
        # parquet reader rejects; read as long, convert in tables.py
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
