"""SparkSession bootstrap for the engine.

The reference (ankane/polars-ruby) runs a single-process Rust engine with a
rayon pool (``/root/reference/ext/polars/src/functions/meta.rs:14``
``threadpool_size``); our execution substrate is a Spark cluster.  This module
centralizes the session defaults that make Spark behave like the reference's
semantics contract:

- ANSI off: polars ``cast(strict: false)`` and arithmetic return null on
  error (``/root/reference/lib/polars/expr.rb:1234``); Spark 4 defaults ANSI
  on, so we disable it to get try_cast/null-on-overflow semantics.
- Session timezone UTC: polars datetimes are tz-naive-UTC by default.
- AQE on: runtime re-planning (skew joins, partition coalescing) is our
  answer to the reference's in-process morsel parallelism at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Hidden column used to materialize the reference's implicit row order
#: (see operators/row_index.py).
ROW_IDX = "__row_idx__"


def configure(builder: SparkSession.Builder) -> SparkSession.Builder:
    """Apply engine defaults to an existing builder (idempotent)."""
    return (
        builder.config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # polars column names are case-sensitive ("A" and "a" coexist —
        # name.to_lowercase doctest); Spark's default folds them together
        .config("spark.sql.caseSensitive", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for the pandas boundary (map_rows / map_elements / exports).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # PySpark 4 captures the Python call site for every DataFrame/Column
        # API call to enrich error messages (SPARK-44098 dataFrameDebugging).
        # Each wrapped call pays ~3 py4j round-trips (getActiveSession +
        # conf.get + PySparkCurrentOrigin.set) plus a Python traceback walk
        # — measured 30-40% of plan-construction time on expression-heavy
        # operators (q107 2.55→1.84 s construct, q167 1.53→0.90 s).  The
        # engine's compiler issues tens of thousands of Column calls per
        # query, and its own errors carry operator context already, so the
        # call-site enrichment is pure driver overhead here.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # Bigger Arrow batches amortize the Python-worker round-trip for the
        # vectorized stages (ANN matmuls): measured 2× on brute-force cosine
        # top-k vs the 10k default; 64k rows × ~64-dim float is still ≪
        # executor memory.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
    )


def get_spark(app_name: str = "polars-ruby-spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Return (or create) the engine's SparkSession.

    Local testing uses ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the
    caller's session (spark-submit) wins and we only layer runtime-safe confs.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = configure(SparkSession.builder.appName(app_name).master(master))
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    return builder.getOrCreate()
