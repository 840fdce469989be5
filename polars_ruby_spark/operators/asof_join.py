"""As-of (point-in-time) join — custom operator (no Spark built-in).

Parity: ``/root/reference/lib/polars/lazy_frame.rb:1523-1593`` (``join_asof``:
strategy backward/forward/nearest, optional ``by`` pre-grouping, ``tolerance``).

Strategy (SURVEY §7.3 "custom operators"): the **union-merge** plan —

1. tag left rows (carrying a synthetic left row id) and right rows (carrying
   a struct of all right payload columns);
2. union them on (by-keys, time-key);
3. one window sort per ``by`` group ordered by (time, tag) lets
   ``last(right_payload, ignorenulls)`` compute, for every left row, the most
   recent right row at-or-before it (backward) — a single shuffle on the
   by-keys, no range-join explosion, AQE-skew friendly;
4. unpack the payload struct, apply the tolerance filter.

forward = same plan with reversed ordering; nearest = take both candidates
and pick the closer.  This scales: cost ≍ sort-merge on (by, time), which is
the optimal single-pass algorithm for asof at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.duration import parse_duration
from ..session import ROW_IDX

_TAG = "__asof_tag__"  # 0 = right, 1 = left (right sorts first at equal time)
_PAYLOAD = "__asof_payload__"


def _tolerance_us(tolerance):
    if tolerance is None:
        return None
    if isinstance(tolerance, str):
        return parse_duration(tolerance).microseconds
    return tolerance  # numeric key → numeric tolerance


def join_asof(left, right, on=None, left_on=None, right_on=None, by=None,
              by_left=None, by_right=None, strategy: str = "backward",
              tolerance=None, suffix: str = "_right"):
    from ..frame import LazyFrame

    lon = left_on or on
    ron = right_on or on
    if lon is None or ron is None:
        raise ValueError("join_asof requires `on` or left_on/right_on")
    bl = ([by] if isinstance(by, str) else list(by or [])) or (
        [by_left] if isinstance(by_left, str) else list(by_left or []))
    br = ([by] if isinstance(by, str) else list(by or [])) or (
        [by_right] if isinstance(by_right, str) else list(by_right or []))

    lsdf = left._sdf.drop(ROW_IDX) if ROW_IDX in left._sdf.columns else left._sdf
    rsdf = right._sdf.drop(ROW_IDX) if ROW_IDX in right._sdf.columns else right._sdf

    # right payload: every right column except its by-keys AND its on-key —
    # polars drops the right time column (data_frame.rb:2223 doctest shows
    # only date/population/gdp in the output)
    payload_cols = [c for c in rsdf.columns if c not in br and c != ron]
    out_names = {}
    for c in payload_cols:
        out_names[c] = c + suffix if (c in lsdf.columns) else c

    time_t = dict(lsdf.dtypes)[lon] if isinstance(lon, str) else None

    l_tagged = lsdf.select(
        *[F.col(c) for c in lsdf.columns],
        F.col(lon).alias("__asof_t__"),
        F.lit(1).alias(_TAG),
        F.lit(None).cast(
            rsdf.select(F.struct(*[F.col(c) for c in payload_cols])).schema[0].dataType
        ).alias(_PAYLOAD),
        *[F.lit(None).cast(dict(rsdf.dtypes)[c]).alias(f"__rby_{c}__") for c in br],
    )
    r_tagged = rsdf.select(
        *[F.lit(None).cast(t).alias(c) for c, t in lsdf.dtypes],
        F.col(ron).cast(dict(lsdf.dtypes)[lon]).alias("__asof_t__"),
        F.lit(0).alias(_TAG),
        F.struct(*[F.col(c) for c in payload_cols]).alias(_PAYLOAD),
        *[F.col(c).alias(f"__rby_{c}__") for c in br],
    )
    # align by-keys: left rows keep their own by values in the left columns;
    # for the union we need ONE set of grouping columns.
    group_cols = []
    for lb, rb in zip(bl, br):
        group_cols.append(
            F.coalesce(F.col(lb), F.col(f"__rby_{rb}__")).alias(f"__gby_{lb}__"))

    unioned = l_tagged.unionByName(r_tagged).select(
        "*", *group_cols) if group_cols else l_tagged.unionByName(r_tagged)
    gnames = [f"__gby_{lb}__" for lb in bl]

    # Global asof (no `by`): a single ordered window would funnel ALL rows to
    # one partition — a 100 TB failure mode.  Instead range-bucket on time
    # (one tiny min/max action), run the union-merge locally per bucket, and
    # fix up each bucket's prefix with a carry-in table of ≤ n_buckets rows.
    bucketed = not gnames
    if bucketed:
        n_buckets = 64
        tnum = F.col("__asof_t__").cast("double")
        stats = unioned.select(F.min(tnum).alias("lo"), F.max(tnum).alias("hi")).first()
        lo, hi = stats["lo"], stats["hi"]
        width = ((hi - lo) / n_buckets) if (hi is not None and hi > lo) else 1.0
        bucket = F.least(F.floor((tnum - F.lit(lo)) / F.lit(width)),
                         F.lit(n_buckets - 1)).cast("int")
        unioned = unioned.withColumn("__bucket__", bucket)
        gnames = ["__bucket__"]

    def pick(ordering_desc: bool):
        if ordering_desc:
            # tag ASC within equal times: rights enter the frame before the
            # left row, so forward matches INCLUDE equal timestamps
            w = Window.partitionBy(*gnames).orderBy(
                F.col("__asof_t__").desc(), F.col(_TAG).asc()
            ).rowsBetween(Window.unboundedPreceding, 0)
        else:
            w = Window.partitionBy(*gnames).orderBy(
                F.col("__asof_t__").asc(), F.col(_TAG).asc()
            ).rowsBetween(Window.unboundedPreceding, 0)
        matched = F.last(_PAYLOAD, ignorenulls=True).over(w)
        mtime = F.last(F.when(F.col(_TAG) == 0, F.col("__asof_t__")),
                       ignorenulls=True).over(w)
        return matched, mtime

    need_back = strategy in ("backward", "nearest")
    need_fwd = strategy in ("forward", "nearest")
    if not (need_back or need_fwd):
        raise ValueError(f"unknown asof strategy {strategy!r}")
    cols = ["*"]
    if need_back:
        pb, tb = pick(False)
        cols += [pb.alias("__pb__"), tb.alias("__tb__")]
    if need_fwd:
        pf, tf = pick(True)
        cols += [pf.alias("__pf__"), tf.alias("__tf__")]
    u2 = unioned.select(*cols)

    if bucketed:
        rights = unioned.filter(F.col(_TAG) == 0)
        buckets = unioned.select("__bucket__").distinct()
        if need_back:
            per_b = rights.groupBy("__bucket__").agg(
                F.max_by(_PAYLOAD, F.col("__asof_t__")).alias("p"),
                F.max("__asof_t__").alias("t"))
            wprev = Window.orderBy("__bucket__").rowsBetween(
                Window.unboundedPreceding, -1)
            carry = buckets.join(per_b, "__bucket__", "left").select(
                "__bucket__",
                F.last("p", ignorenulls=True).over(wprev).alias("__cb_p__"),
                F.last("t", ignorenulls=True).over(wprev).alias("__cb_t__"))
            u2 = (u2.join(F.broadcast(carry), "__bucket__", "left")
                  .withColumn("__pb__", F.coalesce("__pb__", "__cb_p__"))
                  .withColumn("__tb__", F.coalesce("__tb__", "__cb_t__"))
                  .drop("__cb_p__", "__cb_t__"))
        if need_fwd:
            per_b = rights.groupBy("__bucket__").agg(
                F.min_by(_PAYLOAD, F.col("__asof_t__")).alias("p"),
                F.min("__asof_t__").alias("t"))
            wnext = Window.orderBy("__bucket__").rowsBetween(
                1, Window.unboundedFollowing)
            carry = buckets.join(per_b, "__bucket__", "left").select(
                "__bucket__",
                F.first("p", ignorenulls=True).over(wnext).alias("__cf_p__"),
                F.first("t", ignorenulls=True).over(wnext).alias("__cf_t__"))
            u2 = (u2.join(F.broadcast(carry), "__bucket__", "left")
                  .withColumn("__pf__", F.coalesce("__pf__", "__cf_p__"))
                  .withColumn("__tf__", F.coalesce("__tf__", "__cf_t__"))
                  .drop("__cf_p__", "__cf_t__"))

    if strategy == "backward":
        u2 = u2.withColumn("__m__", F.col("__pb__")).withColumn("__mt__", F.col("__tb__"))
    elif strategy == "forward":
        u2 = u2.withColumn("__m__", F.col("__pf__")).withColumn("__mt__", F.col("__tf__"))
    else:  # nearest
        back_closer = (
            F.col("__tf__").isNull()
            | (F.col("__tb__").isNotNull()
               & (_dist(F.col("__asof_t__"), F.col("__tb__"))
                  <= _dist(F.col("__asof_t__"), F.col("__tf__"))))
        )
        u2 = (u2.withColumn("__m__", F.when(back_closer, F.col("__pb__"))
                            .otherwise(F.col("__pf__")))
              .withColumn("__mt__", F.when(back_closer, F.col("__tb__"))
                          .otherwise(F.col("__tf__"))))

    out = u2.filter(F.col(_TAG) == 1)

    tol = _tolerance_us(tolerance)
    if tol is not None:
        if str(dict(lsdf.dtypes)[lon]).startswith("timestamp"):
            dist = F.abs(F.unix_micros(F.col("__asof_t__")) - F.unix_micros(F.col("__mt__")))
            within = dist <= tol
        else:
            within = _dist(F.col("__asof_t__"), F.col("__mt__")) <= tol
        out = out.withColumn("__m__", F.when(within, F.col("__m__")))

    sel = [F.col(c) for c in lsdf.columns]
    for c in payload_cols:
        sel.append(F.col("__m__").getField(c).alias(out_names[c]))
    return LazyFrame(out.select(*sel))


def _dist(a, b):
    d = a.cast("double") - b.cast("double")
    return F.abs(d)
