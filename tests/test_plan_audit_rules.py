"""plan_audit rule tests (round-6): the unpartitioned-window rule must
flag a global window over data — including behind Sort/Project wrappers —
while passing partitioned windows and the sanctioned bounded frames."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tools.plan_audit import unpartitioned_window_violations


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_flags_deliberate_global_window(spark):
    df = spark.range(1000)
    bad = df.withColumn("c", F.sum("id").over(Window.orderBy("id")))
    assert unpartitioned_window_violations(_plan(bad)) >= 1
    # ... even behind an extra projection wrapper
    bad2 = bad.select((F.col("c") * 2).alias("c2"), "id")
    assert unpartitioned_window_violations(_plan(bad2)) >= 1


def test_passes_partitioned_window(spark):
    df = spark.range(1000).withColumn("g", F.col("id") % 10)
    ok = df.withColumn(
        "c", F.sum("id").over(Window.partitionBy("g").orderBy("id")))
    assert unpartitioned_window_violations(_plan(ok)) == 0
    # unordered partitioned window (whole-group frame) also passes
    ok2 = df.withColumn("c", F.count("*").over(Window.partitionBy("g")))
    assert unpartitioned_window_violations(_plan(ok2)) == 0


def test_passes_limit_bounded_global_window(spark):
    df = spark.range(1000).limit(5)
    ok = df.withColumn("c", F.sum("id").over(Window.orderBy("id")))
    assert unpartitioned_window_violations(_plan(ok)) == 0


def test_flags_keyless_bounded_frame_over_row_indexed_data(spark):
    """Late round-10 tightening: a bare ``__rix_pid__`` substring in the
    sanction scan also matched the row-index JOIN sitting under a
    full-data window, so the old keyless BOUNDED-frame limited-fill shape
    passed silently.  The rule now requires the Aggregate keyed on the
    partition id; the full-data shape must be flagged."""
    import polars_ruby_spark as pl

    df = pl.DataFrame({"v": [1.0, None, 3.0, None]}).with_row_index("ri")
    bad = df._sdf.withColumn("x", F.last("v", True).over(
        Window.orderBy("ri").rowsBetween(-2, 0)))
    assert unpartitioned_window_violations(_plan(bad)) >= 1
    # the legitimate O(partitions) offsets window inside with_row_index
    # itself (aggregate keyed on __rix_pid__) stays sanctioned
    assert unpartitioned_window_violations(_plan(df._sdf)) == 0
