"""Dataset profiling: one-pass per-column statistics (beyond-reference; the
data-quality summary a pipeline runs before committing a 100 TB ingest).

All statistics for all columns are computed in ONE aggregate over ONE scan
(a single two-phase keyless agg — the canonical map-side-combined global
aggregate), then pivoted to long form with a ``stack`` generator, which is
a zero-shuffle projection over the one-row result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile(sdf: DataFrame, numeric_cols: list[str],
            string_cols: list[str]) -> DataFrame:
    """→ one row per profiled column:
    ``(col_name, n_nulls, n_distinct, min_num, max_num, mean, p50,
    min_str, max_str)`` — numeric stats null for string columns and vice
    versa.  ``p50`` is the EXACT interpolated median (``percentile``), not
    an approximation, so it is oracle-able; swap for
    ``approx_percentile`` at scales where exact quantiles are not worth a
    full sort of distinct values.
    """
    aggs, n = [], 0
    for c in numeric_cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{n}"),
            F.count_distinct(F.col(c)).alias(f"nd_{n}"),
            F.min(c).cast("double").alias(f"mn_{n}"),
            F.max(c).cast("double").alias(f"mx_{n}"),
            F.round(F.avg(c), 4).alias(f"av_{n}"),
            F.round(F.percentile(F.col(c), F.lit(0.5)), 4).alias(f"p5_{n}"),
        ]
        n += 1
    for c in string_cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{n}"),
            F.count_distinct(F.col(c)).alias(f"nd_{n}"),
            F.min(c).alias(f"ms_{n}"),
            F.max(c).alias(f"xs_{n}"),
        ]
        n += 1
    one = sdf.agg(*aggs)
    parts, i = [], 0
    for c in numeric_cols:
        parts.append(f"'{c}', nn_{i}, nd_{i}, mn_{i}, mx_{i}, av_{i}, p5_{i}, "
                     f"CAST(NULL AS STRING), CAST(NULL AS STRING)")
        i += 1
    for c in string_cols:
        parts.append(f"'{c}', nn_{i}, nd_{i}, CAST(NULL AS DOUBLE), "
                     f"CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), "
                     f"CAST(NULL AS DOUBLE), ms_{i}, xs_{i}")
        i += 1
    stack = (f"stack({len(parts)}, {', '.join(parts)}) AS "
             "(col_name, n_nulls, n_distinct, min_num, max_num, mean, p50, "
             "min_str, max_str)")
    return one.selectExpr(stack)
