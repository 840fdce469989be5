"""Deterministic sampling for training-data mixes (beyond-reference).

RNG-based sampling (``df.sample``) is not reproducible across engines, runs,
or repartitionings — a resumable 100 TB pipeline needs membership decided by
the ROW, not by execution order.  ``hash_sample`` keeps a row iff
``md5(id) mod buckets < rate(group) * buckets``: bit-identical across
engines (oracle-able), stable under re-partitioning, and the per-group rates
express training-mix weights (e.g. upsample wiki, downsample crawl).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hash_bucket(id_col, buckets: int = 10_000):
    """Deterministic bucket in [0, buckets): first 8 md5 hex chars of the
    stringified id.  Pure codegen projection (md5+conv), no RNG state."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
    return h.cast("long") % buckets


def hash_sample(sdf: DataFrame, rates: dict[str, float], group_col: str = "source",
                id_col: str = "doc_id", default_rate: float = 0.0,
                buckets: int = 10_000) -> DataFrame:
    """Per-group deterministic downsample: ``rates`` maps group value →
    sampling rate in [0, 1]; rows in unlisted groups use ``default_rate``.

    Scale shape: a single flat filter projection — no shuffle, no RNG, and
    the filter sits directly above the scan so column pruning survives.
    Membership is a pure function of the id, so re-running any subset of
    partitions (speculative tasks, pipeline resume) selects the same rows.
    """
    rate = F.lit(float(default_rate))
    for val, r in sorted(rates.items()):
        rate = F.when(F.col(group_col) == val, F.lit(float(r))).otherwise(rate)
    return sdf.filter(hash_bucket(id_col, buckets) < rate * buckets)
