"""Plan inspection helpers (explain / pushdown verification)."""

from __future__ import annotations


def explain(frame, format: str = "formatted") -> str:
    """Return Catalyst's explain string for a LazyFrame/DataFrame."""
    sdf = frame.to_spark() if hasattr(frame, "to_spark") else frame
    qe = sdf._jdf.queryExecution()
    mode = sdf.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(format)
    return qe.explainString(mode)


def has_pushed_filters(frame) -> bool:
    """True if the parquet scan carries PushedFilters (guard against
    UDF-above-scan regressions — BASELINE.md measurement plan)."""
    s = explain(frame)
    return "PushedFilters: [" in s and "PushedFilters: []" not in s
