"""SparkSession factory tuned for the engine.

Design notes (100 TB target):
- AQE on: runtime coalescing of shuffle partitions + skew-join splitting is
  the first line of defense against Zipf-skewed term merges.
- Arrow on with a bounded record batch: `content` columns are large strings,
  so unbounded batches would blow executor memory inside pandas UDFs.
- UTC session timezone so DuckDB-oracle comparisons are stable.
- shuffle.partitions defaults to the local core count; on a real cluster this
  is overridden via spark-submit --conf (or left to AQE's coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mtix_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    suppress_window_warn: bool = True,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            shuffle_partitions = os.cpu_count() if inner == "*" else int(inner)
        else:
            shuffle_partitions = 200
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    # Silence WindowExec's "No Partition Defined" warning: the only
    # unpartitioned windows in the engine are final ≤k-row rank windows
    # that Catalyst has already rewritten onto TakeOrderedAndProject
    # (per-partition partial top-k; audited in PLANS.md — the window sees at
    # most k rows, so "moving all data to a single partition" never
    # happens). The warning fires at plan time regardless (even a literal
    # partition key folds away), so the honest fix is the logger, not the
    # plan. TRADE-OFF (ADVICE r3): the logger level is session-global, so
    # user-authored queries with GENUINE unpartitioned windows in the same
    # session lose the warning too. Set MTIX_KEEP_WINDOW_WARN=1 (or pass
    # suppress_window_warn=False) when running mixed workloads where that
    # warning matters.
    if suppress_window_warn and not os.environ.get("MTIX_KEEP_WINDOW_WARN"):
        try:
            jvm = spark.sparkContext._jvm
            jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
                "org.apache.spark.sql.execution.window.WindowExec",
                jvm.org.apache.logging.log4j.Level.ERROR,
            )
        except Exception:
            pass  # non-log4j2 deployments just keep the warning
    return spark
