"""Skew-aware aggregation patterns (beyond-reference; 100 TB toolbox).

AQE handles skewed JOINS, and partial aggregation handles skewed algebraic
aggs — but a per-key window (`row_number().over(partitionBy(hot_key))`)
still funnels every row of a hot key through ONE task.  The salted two-phase
form here bounds task size: phase 1 takes top-k within (key, salt) slices,
phase 2 reduces the ≤ salt·k survivors per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def top_k_per_key(sdf: DataFrame, keys, order_by, k: int,
                  descending: bool = True, salt: int | None = None) -> DataFrame:
    """Top-k rows per key by `order_by` (include a tiebreaker column for
    deterministic output).  `salt=N` enables the two-phase skew-safe plan.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    ordering = [F.col(c).desc() if descending else F.col(c).asc()
                for c in order_by]

    def _topk(df, partition_cols):
        w = Window.partitionBy(*partition_cols).orderBy(*ordering)
        return (df.withColumn("__rn__", F.row_number().over(w))
                .filter(F.col("__rn__") <= k).drop("__rn__"))

    if salt:
        # deterministic per-row salt (rand() re-rolls on task retry, which
        # could drop or duplicate rows under speculative execution)
        salted = sdf.withColumn(
            "__salt__", F.pmod(F.xxhash64(*[F.col(c) for c in sdf.columns]),
                               F.lit(salt)))
        cand = _topk(salted, keys + ["__salt__"]).drop("__salt__")
        return _topk(cand, keys)
    return _topk(sdf, keys)
