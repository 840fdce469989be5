"""Reshape operators: pivot / transpose / to_dummies / hstack.

Parity: ``/root/reference/lib/polars/data_frame.rb:2999`` (pivot), ``:1004``
(transpose), ``:4048`` (to_dummies), ``:2524`` (hstack).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..session import ROW_IDX

_AGG = {
    "first": F.first,
    "last": F.last,
    "sum": F.sum,
    "max": F.max,
    "min": F.min,
    "mean": F.avg,
    "median": F.median,
    "len": lambda c: F.count(F.lit(1)),
    "count": F.count,
}


def pivot(df, on, index=None, values=None, aggregate_function: str = "first",
          separator: str = "_"):
    """groupBy(index).pivot(on).agg — native Catalyst pivot.

    Scale note: the distinct values of ``on`` become columns; Spark collects
    them on the driver (bounded by spark.sql.pivotMaxValues) — same
    wide-result constraint the reference has.
    """
    from ..frame import DataFrame

    on = [on] if isinstance(on, str) else list(on)
    index = [index] if isinstance(index, str) else list(index or [])
    sdf = df.to_spark()
    if values is None:
        values = [c for c in sdf.columns if c not in on and c not in index]
    values = [values] if isinstance(values, str) else list(values)
    aggf = _AGG[aggregate_function]
    pivot_col = on[0] if len(on) == 1 else None
    g = sdf.groupBy(*[F.col(c) for c in index])
    if pivot_col is None:
        sdf = sdf.withColumn("__pv__", F.concat_ws(separator, *[F.col(c) for c in on]))
        pivot_col = "__pv__"
        g = sdf.groupBy(*[F.col(c) for c in index])
    # polars orders pivoted columns by FIRST APPEARANCE, not sorted (pivot
    # doctest: y before x when y appears first); passing the explicit value
    # list also skips Spark's implicit distinct job
    from ..session import ROW_IDX

    ri = df.lazy()._ensure_row_index()._sdf if ROW_IDX not in sdf.columns \
        else sdf
    if pivot_col == "__pv__" and "__pv__" not in ri.columns:
        ri = ri.withColumn("__pv__", F.concat_ws(
            separator, *[F.col(c) for c in on]))
    ordered_vals = [
        r[0] for r in ri.groupBy(F.col(pivot_col))
        .agg(F.min(F.col(ROW_IDX)).alias("__first__"))
        .orderBy("__first__").collect()]
    p = g.pivot(pivot_col, ordered_vals)
    if len(values) == 1:
        out = p.agg(aggf(F.col(values[0])))
    else:
        out = p.agg(*[aggf(F.col(v)).alias(v) for v in values])
    if index:
        # polars pivot also keeps ROW order = first appearance of the
        # index key (pivot doctest: 'one' before 'two'); join the per-key
        # first-row ordinal (AQE broadcasts the small side) and sort
        ordtab = ri.groupBy(*[F.col(c) for c in index]).agg(
            F.min(F.col(ROW_IDX)).alias("__rord__"))
        out = (out.join(ordtab, on=index, how="left")
               .orderBy("__rord__").drop("__rord__"))
    return DataFrame(out)


def transpose(df, include_header: bool = False, header_name: str = "column"):
    """Small-frame only (like the reference's eager transpose): collects."""
    from ..frame import DataFrame

    pdf = df.to_pandas().T
    pdf.columns = [f"column_{i}" for i in range(len(pdf.columns))]
    if include_header:
        pdf.insert(0, header_name, pdf.index)
    spark = df._sdf.sparkSession
    return DataFrame(spark.createDataFrame(pdf.reset_index(drop=True)))


def to_dummies(df, columns=None, separator: str = "_", drop_first: bool = False):
    """One-hot encode: when(col==v,1) fan-out per distinct value."""
    from ..frame import DataFrame

    sdf = df.to_spark()
    columns = [columns] if isinstance(columns, str) else (columns or sdf.columns)
    out_cols = []
    for c in sdf.columns:
        if c not in columns:
            out_cols.append(F.col(c))
            continue
        vals = [r[0] for r in sdf.select(c).distinct().orderBy(c).collect()]
        if drop_first:
            vals = vals[1:]
        for v in vals:
            out_cols.append(
                F.when(F.col(c) == F.lit(v), 1).otherwise(0).cast("tinyint")
                .alias(f"{c}{separator}{v}"))
    return DataFrame(sdf.select(*out_cols))


def hstack(left, right):
    """Horizontal concat: zip by row index (no native Spark op — SURVEY §2.7)."""
    from ..frame import DataFrame
    from ..operators.row_index import with_row_index

    l = with_row_index(left.to_spark(), "__hz__")
    r = with_row_index(right.to_spark(), "__hz__")
    for c in r.columns:
        if c != "__hz__" and c in l.columns:
            r = r.withColumnRenamed(c, c + "_right")
    return DataFrame(l.join(r, "__hz__", "full").orderBy("__hz__").drop("__hz__"))


def unstack(df, step: int, how: str = "vertical", columns=None, fill_values=None):
    """data_frame.rb:3180 — reshape a tall frame into `step`-wide columns.

    vertical: column c of length n becomes ceil(n/step) columns c_0..c_k,
    each `step` tall (values read down the column).  horizontal: values read
    across.  Small-frame op (driver-side width expansion), like transpose.
    """
    from pyspark.sql import functions as F

    from ..frame import DataFrame
    from ..operators.row_index import with_row_index

    sdf = df.to_spark()
    cols = [columns] if isinstance(columns, str) else (columns or sdf.columns)
    n = sdf.count()
    import math as _math

    n_out = _math.ceil(n / step)
    idx = with_row_index(sdf, "__i__")
    if how == "vertical":
        slot = F.floor(F.col("__i__") / step)   # which output column
        row = F.col("__i__") % step             # which output row
    else:
        slot = F.col("__i__") % n_out
        row = F.floor(F.col("__i__") / n_out)
    idx = idx.withColumn("__slot__", slot).withColumn("__row__", row)
    out = None
    for c in cols:
        piv = (idx.groupBy("__row__").pivot("__slot__", list(range(n_out)))
               .agg(F.first(c)))
        piv = piv.select("__row__", *[F.col(str(s)).alias(f"{c}_{s}")
                                      for s in range(n_out)])
        out = piv if out is None else out.join(piv, "__row__")
    out = out.orderBy("__row__").drop("__row__")
    if fill_values is not None:
        out = out.fillna(fill_values)
    return DataFrame(out)
