"""Upsample: densify a time grid (data_frame.rb:2113-2131).

Spark plan: per-group min/max → ``F.sequence`` calendar grid → ``explode`` →
left join the original rows back on (by, time).  The grid generation is a
tiny aggregate; the join shuffles on (by, time) once.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.duration import parse_duration


def upsample(df, time_column: str, every: str, by=None):
    from ..frame import DataFrame

    dur = parse_duration(every)
    by = [by] if isinstance(by, str) else list(by or [])
    sdf = df.to_spark()

    if dur.is_calendar:
        step = F.expr(f"INTERVAL {dur.months} MONTH")
    else:
        step = F.expr(f"INTERVAL {int(dur.total_seconds() * 1e6)} MICROSECOND")

    bounds = sdf.groupBy(*[F.col(c) for c in by]).agg(
        F.min(time_column).alias("__lo__"), F.max(time_column).alias("__hi__"))
    grid = bounds.select(
        *[F.col(c) for c in by],
        F.explode(F.sequence(F.col("__lo__"), F.col("__hi__"), step)).alias(time_column),
    )
    out = grid.join(sdf, on=by + [time_column], how="left").orderBy(
        *[F.col(c) for c in by], F.col(time_column))
    # keep the frame's ORIGINAL column order (upsample doctest: time
    # first) — the join puts the by-keys in front
    return DataFrame(out.select(*sdf.columns))
