"""Event-time streaming over the events table shape (beyond-reference).

The reference has NO event-time streaming (SURVEY §2.10 — no watermarks or
late-data policy anywhere in the repo); this module is the Spark-native
extension: ``readStream`` → windowed aggregation with watermarks, sharing the
duration-string grammar with ``group_by_dynamic`` so batch and streaming use
one window API.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.duration import parse_duration
from ..session import get_spark


def scan_stream(path: str, schema=None, format: str = "parquet", spark=None):
    """Lazy streaming scan of a directory of files (file-source stream)."""
    s = spark or get_spark()
    reader = s.readStream.format(format)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        # file streams need a schema: probe the existing files (batch, cheap)
        reader = reader.schema(s.read.format(format).load(path).schema)
    from ..frame import LazyFrame

    return LazyFrame(reader.load(path))


def windowed_agg(lf, ts_column: str, every: str, aggs: dict,
                 watermark: str = "10m", by: list | None = None):
    """Tumbling-window streaming aggregation with a watermark.

    ``aggs`` maps output name → aggregate Expr (same Exprs as batch
    ``group_by_dynamic``); late rows beyond ``watermark`` are dropped —
    Spark's state store bounds memory at scale.
    """
    from ..group_by import _agg_columns

    dur = parse_duration(every)
    wm = parse_duration(watermark)
    sdf = lf._sdf.withWatermark(ts_column, f"{wm.total_seconds()} seconds")
    agg_cols, _ = _agg_columns(sdf, [], {k: v for k, v in aggs.items()})
    win = F.window(F.col(ts_column), f"{dur.total_seconds()} seconds")
    by_cols = [F.col(b) for b in (by or [])]
    out = sdf.groupBy(win.alias("__w__"), *by_cols).agg(*agg_cols)
    out = out.select(
        F.col("__w__.start").alias(ts_column),
        *[c for c in out.columns if c != "__w__"],
    )
    from ..frame import LazyFrame

    return LazyFrame(out)


def sink_stream(lf, path: str, checkpoint: str, format: str = "parquet",
                mode: str = "append", trigger_once: bool = True):
    """Start the streaming sink; returns the StreamingQuery."""
    writer = (lf._sdf.writeStream.format(format).outputMode(mode)
              .option("path", path).option("checkpointLocation", checkpoint))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
