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


def plan_summary(frame) -> dict:
    """Scale-relevant plan-shape counters — the engine-side face of
    ``tools/plan_audit.py`` for interactive tuning (how many full-data
    exchanges, did the filter reach the scan, is Python in the path)."""
    import re

    sdf = frame.to_spark() if hasattr(frame, "to_spark") else frame
    s = sdf._jdf.queryExecution().executedPlan().toString()
    return {
        "exchanges": len(re.findall(
            r"Exchange hashpartitioning|Exchange rangepartitioning", s)),
        "single_partition_exchanges": len(re.findall(
            r"Exchange SinglePartition", s)),
        "broadcasts": len(re.findall(r"BroadcastExchange", s)),
        "scans": len(re.findall(r"Scan parquet|FileScan", s)),
        "pushed_filters": has_pushed_filters(frame),
        "wholestage_codegen": "WholeStageCodegen" in s,
        "python_stages": len(re.findall(
            r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", s)),
    }
