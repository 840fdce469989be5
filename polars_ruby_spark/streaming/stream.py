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


def _watermarked(sdf, ts_column: str, wm):
    """Apply a watermark; Spark requires TIMESTAMP (tz) event time, but the
    engine stores naive datetimes as TIMESTAMP_NTZ — cast (value-preserving:
    session tz is pinned UTC) and report so callers can cast back."""
    ntz = dict(sdf.dtypes).get(ts_column) == "timestamp_ntz"
    if ntz:
        sdf = sdf.withColumn(ts_column, F.col(ts_column).cast("timestamp"))
    return sdf.withWatermark(ts_column, f"{wm.total_seconds()} seconds"), ntz


def scan_stream(path: str, schema=None, format: str = "parquet", spark=None,
                max_files_per_trigger: int | None = None):
    """Lazy streaming scan of a directory of files (file-source stream)."""
    s = spark or get_spark()
    reader = s.readStream.format(format)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
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
    sdf, ntz = _watermarked(lf._sdf, ts_column, wm)
    agg_cols, _ = _agg_columns(sdf, [], {k: v for k, v in aggs.items()})
    win = F.window(F.col(ts_column), f"{dur.total_seconds()} seconds")
    by_cols = [F.col(b) for b in (by or [])]
    out = sdf.groupBy(win.alias("__w__"), *by_cols).agg(*agg_cols)
    start = F.col("__w__.start")
    out = out.select(
        (start.cast("timestamp_ntz") if ntz else start).alias(ts_column),
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


def session_window_agg(lf, ts_column: str, gap: str, aggs: dict,
                       by: list | None = None):
    """Session windows (dynamic gap-based grouping) — native
    ``F.session_window``, works on batch and streaming frames alike.

    A new session starts when the gap since the previous event is ≥ ``gap``
    (Spark merges events whose [ts, ts+gap) ranges overlap).  Scale: state
    (streaming) or aggregation (batch) shuffles once on (by, session).
    """
    from ..group_by import _agg_columns

    g = parse_duration(gap)
    sdf = lf._sdf
    agg_cols, _ = _agg_columns(sdf, [], dict(aggs))
    win = F.session_window(F.col(ts_column), f"{g.total_seconds()} seconds")
    by_cols = [F.col(b) for b in (by or [])]
    out = sdf.groupBy(win.alias("__w__"), *by_cols).agg(*agg_cols)
    out = out.select(
        F.col("__w__.start").alias("session_start"),
        *[c for c in out.columns if c != "__w__"],
    )
    from ..frame import LazyFrame

    return LazyFrame(out)


def dedup_stream(lf, keys, ts_column: str, watermark: str = "10m",
                 within_watermark: bool = True):
    """Streaming exact deduplication — the streaming face of the batch
    ``operators.dedup`` family (training pipelines ingest continuously).

    ``within_watermark=True`` → ``dropDuplicatesWithinWatermark``: state for
    a key is dropped once the watermark passes it, so state stays bounded at
    100 TB/day ingest (duplicates further apart than the watermark pass —
    the documented contract).  ``False`` → exact-forever ``dropDuplicates``
    (state grows with distinct keys; use only for bounded key domains).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    wm = parse_duration(watermark)
    sdf, ntz = _watermarked(lf._sdf, ts_column, wm)
    out = (sdf.dropDuplicatesWithinWatermark(keys) if within_watermark
           else sdf.dropDuplicates(keys))
    if ntz:
        out = out.withColumn(ts_column, F.col(ts_column).cast("timestamp_ntz"))
    from ..frame import LazyFrame

    return LazyFrame(out)


def stream_stream_join(left, right, on, ts_left: str, ts_right: str,
                       watermark: str = "10m", within: str = "5m",
                       how: str = "inner"):
    """Watermarked stream-stream equi-join with a time-bound: right rows
    must land within ``[ts_left - within, ts_left + within]``.

    Both sides carry watermarks and the join has an event-time range
    condition — the two requirements that let Spark evict join state, which
    is what makes a stream-stream join runnable indefinitely at scale.
    """
    wm = parse_duration(watermark)
    w = parse_duration(within)
    on = [on] if isinstance(on, str) else list(on)
    ls, ntz_l = _watermarked(left._sdf, ts_left, wm)
    rs, ntz_r = _watermarked(right._sdf, ts_right, wm)
    # disambiguate: rename right's join keys (and a same-named event-time
    # column) then join on equality exprs
    if ts_right == ts_left:
        rs = rs.withColumnRenamed(ts_right, ts_right + "_r")
        ts_right = ts_right + "_r"
    for c in on:
        rs = rs.withColumnRenamed(c, f"__r_{c}__")
    span = int(w.total_seconds())
    cond = None
    for c in on:
        eq = ls[c] == rs[f"__r_{c}__"]
        cond = eq if cond is None else (cond & eq)
    cond = cond & (rs[ts_right] >= ls[ts_left] - F.expr(f"INTERVAL {span} SECONDS"))
    cond = cond & (rs[ts_right] <= ls[ts_left] + F.expr(f"INTERVAL {span} SECONDS"))
    out = ls.join(rs, cond, how).drop(*[f"__r_{c}__" for c in on])
    # NTZ event-time columns were cast to TIMESTAMP for the watermark —
    # cast back so the joined output matches windowed_agg/dedup_stream
    # (advice r2)
    if ntz_l:
        out = out.withColumn(ts_left, F.col(ts_left).cast("timestamp_ntz"))
    if ntz_r:
        out = out.withColumn(ts_right, F.col(ts_right).cast("timestamp_ntz"))
    from ..frame import LazyFrame

    return LazyFrame(out)


def stateful_running_count(lf, key: str, out_name: str = "n"):
    """Custom stateful streaming operator: running per-key event count kept
    in the state store across micro-batches (applyInPandasWithState —
    SURVEY §2.10 'custom stateful operators' extension).

    Emits one updated (key, count) row per key per micro-batch; pair with
    ``outputMode("update")``.  State is one bigint per key — bounded.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    sdf = lf._sdf
    key_field = sdf.schema[key]
    out_schema = StructType([key_field, StructField(out_name, LongType())])
    state_schema = StructType([StructField("n", LongType())])

    def fn(key_tuple, pdfs, state):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({key: [key_tuple[0]], out_name: [n]})

    out = sdf.groupBy(key).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout)
    from ..frame import LazyFrame

    return LazyFrame(out)
