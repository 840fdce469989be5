"""Module-level functions (parity: /root/reference/lib/polars/functions/).

Horizontal aggregations, folds, concat, ranges, corr/cov, concat_str/format,
struct ctor, sql_expr — SURVEY §2.4/§2.7/§2.8.
"""

from __future__ import annotations

import builtins
import functools

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..exprs import (Expr, _merge_agg_flags, _probe_type, col, lit, when,
                     wrap_expr)
from .chrono import chrono_to_java
from .duration import Duration, parse_duration

__all__ = [
    "sum", "min", "max", "mean", "first", "last", "count", "len",
    "sum_horizontal", "min_horizontal", "max_horizontal", "mean_horizontal",
    "any_horizontal", "all_horizontal", "cum_sum_horizontal",
    "fold", "cum_fold", "reduce", "concat_str", "format", "concat_list",
    "struct", "corr", "cov", "arctan2", "int_range", "date_range",
    "datetime_range", "repeat", "sql_expr", "coalesce", "chrono_to_java",
    "parse_duration", "Duration",
]


def _exprs(args):
    out = []
    for a in args:
        if isinstance(a, (list, tuple)):
            out.extend(_exprs(a))
        elif isinstance(a, str):
            out.append(col(a))
        else:
            out.append(wrap_expr(a))
    return out


# vertical convenience (functions/aggregation/vertical.rb:44-277):
# sugar for col(*names).<agg> — multiple names give PER-COLUMN vertical
# aggregates (expr_test.rb: min(["a","b"]) → {a: [1], b: [2]}), never a
# horizontal fold (that's min_horizontal & co.)
def _vertical(names, method):
    es = _exprs(names)
    if builtins.len(es) == 1:
        return getattr(es[0], method)()
    return Expr(multi_fn=lambda df: [getattr(e, method)() for e in es])


def sum(*names):
    return _vertical(names, "sum")


def min(*names):
    return _vertical(names, "min")


def max(*names):
    return _vertical(names, "max")


def mean(*names):
    return _exprs(names)[0].mean()


def first(name=None):
    return (col(name) if name else col("*")).first()


def last(name=None):
    return (col(name) if name else col("*")).last()


def count(name=None):
    return col(name).count() if name else len()


def len():
    def fn(df, part):
        from ..exprs import _EVAL_ARRAY_STACK

        if _EVAL_ARRAY_STACK:
            # inside an eval-array context (list.eval / rolling
            # collect-window): the series length is the array size
            return F.size(_EVAL_ARRAY_STACK[-1]).cast("long")
        from ..exprs import bind_context

        c = F.count(F.lit(1))
        if part is not None:
            return c.over(Window.partitionBy(*part))
        if bind_context.rolling_window is not None:
            return c.over(bind_context.rolling_window)
        return c

    return Expr(fn, name="len", is_agg=True)._set_meta("len", ())


# horizontal (row-wise) aggregations (functions/aggregation/horizontal.rb:34-235)
def sum_horizontal(*exprs):
    es = _exprs(exprs)
    out = functools.reduce(lambda a, b: a._lift2(b, lambda x, y: x + F.coalesce(y, F.lit(0))),
                           es[1:], es[0]._lift(lambda c: F.coalesce(c, F.lit(0))))
    return out.alias("sum")


def min_horizontal(*exprs):
    es = _exprs(exprs)

    def fn(df, part):
        return F.least(*[e._fn(df, part) for e in es])

    from ..exprs import _wire_hook_parts
    return _wire_hook_parts(_merge_agg_flags(Expr(fn, name="min"), es),
                            es, lambda cols: F.least(*cols))


def max_horizontal(*exprs):
    es = _exprs(exprs)

    def fn(df, part):
        return F.greatest(*[e._fn(df, part) for e in es])

    from ..exprs import _wire_hook_parts
    return _wire_hook_parts(_merge_agg_flags(Expr(fn, name="max"), es),
                            es, lambda cols: F.greatest(*cols))


def mean_horizontal(*exprs):
    es = _exprs(exprs)

    def fn(df, part):
        cols = [e._fn(df, part) for e in es]
        total = functools.reduce(lambda a, b: a + F.coalesce(b.cast("double"), F.lit(0.0)), cols,
                                 F.lit(0.0))
        cnt = functools.reduce(lambda a, b: a + F.when(b.isNotNull(), 1).otherwise(0), cols,
                               F.lit(0))
        return total / cnt

    def build(cols):
        total = functools.reduce(
            lambda a, b: a + F.coalesce(b.cast("double"), F.lit(0.0)),
            cols, F.lit(0.0))
        cnt = functools.reduce(
            lambda a, b: a + F.when(b.isNotNull(), 1).otherwise(0),
            cols, F.lit(0))
        return total / cnt

    from ..exprs import _wire_hook_parts
    return _wire_hook_parts(_merge_agg_flags(Expr(fn, name="mean"), es),
                            es, build)


def any_horizontal(*exprs):
    es = _exprs(exprs)

    def fn(df, part):
        return functools.reduce(lambda a, b: a | b, [e._fn(df, part) for e in es])

    from ..exprs import _wire_hook_parts
    return _wire_hook_parts(
        _merge_agg_flags(Expr(fn, name="any"), es), es,
        lambda cols: functools.reduce(lambda a, b: a | b, cols))


def all_horizontal(*exprs):
    es = _exprs(exprs)

    def fn(df, part):
        return functools.reduce(lambda a, b: a & b, [e._fn(df, part) for e in es])

    from ..exprs import _wire_hook_parts
    return _wire_hook_parts(
        _merge_agg_flags(Expr(fn, name="all"), es), es,
        lambda cols: functools.reduce(lambda a, b: a & b, cols))


def cum_sum_horizontal(*exprs):
    es = _exprs(exprs)

    def fn(df, part):
        acc = None
        fields = []
        for e in es:
            c = e._fn(df, part)
            acc = c if acc is None else acc + c
            fields.append(acc.alias(e._name or "x"))
        return F.struct(*fields)

    return _merge_agg_flags(Expr(fn, name="cum_sum"), es)


# folds (functions/lazy.rb:745-778): the lambda runs at plan-build time over
# Expr objects — column count is static, so NO Python UDF is involved.
def fold(acc, function, exprs):
    es = _exprs(exprs)
    out = wrap_expr(acc)
    for e in es:
        out = function(out, e)
    return out


reduce = lambda function, exprs: fold(_exprs(exprs)[0], function, _exprs(exprs)[1:])  # noqa: E731


def cum_fold(acc, function, exprs):
    es = _exprs(exprs)

    def fn(df, part):
        a = wrap_expr(acc)
        fields = []
        for e in es:
            a = function(a, e)
            fields.append(a._fn(df, part).alias(e._name or "x"))
        return F.struct(*fields)

    return _merge_agg_flags(Expr(fn, name="cum_fold"), es)


# string builders (functions/as_datatype.rb:213,251)
def concat_str(exprs, *more_exprs, separator: str = "",
               ignore_nulls: bool = False, sep: str | None = None):
    if sep is not None:  # reference kw name (functions/as_datatype.rb)
        separator = sep
    base = list(exprs) if isinstance(exprs, (list, tuple)) else [exprs]
    es = _exprs(base + list(more_exprs))

    def fn(df, part):
        cols = [e._fn(df, part).cast("string") for e in es]
        if ignore_nulls:
            return F.concat_ws(separator, *cols)
        # concat_ws skips nulls; polars default propagates null
        out = F.concat_ws(separator, *cols)
        anynull = functools.reduce(lambda a, b: a | b.isNull(), cols, F.lit(False))
        return F.when(anynull, F.lit(None)).otherwise(out)

    def build(cols, _sep=separator, _ign=ignore_nulls):
        cs = [c.cast("string") for c in cols]
        out = F.concat_ws(_sep, *cs)
        if _ign:
            return out
        anynull = functools.reduce(
            lambda a, b: a | b.isNull(), cs, F.lit(False))
        return F.when(anynull, F.lit(None)).otherwise(out)

    from ..exprs import _wire_hook_parts
    return _wire_hook_parts(
        _merge_agg_flags(Expr(fn, name=es[0]._name if es else None), es),
        es, build)


def format(fstring: str, *args):
    """functions/as_datatype.rb:251 — '{}' placeholders."""
    parts = fstring.split("{}")
    es = _exprs(args)
    if builtins.len(parts) - 1 != builtins.len(es):
        raise ValueError("format placeholder/arg count mismatch")

    def fn(df, part):
        cols = []
        for i, p in enumerate(parts):
            if p:
                cols.append(F.lit(p))
            if i < builtins.len(es):
                cols.append(es[i]._fn(df, part).cast("string"))
        return F.concat(*cols)

    return _merge_agg_flags(Expr(fn, name="format"), es)


def concat_list(exprs):
    """functions/as_datatype.rb:239 — horizontal list concat; scalar inputs
    wrap into single-element lists (polars semantics)."""
    from pyspark.sql import types as T

    es = _exprs([exprs] if isinstance(exprs, Expr) else exprs)

    def fn(df, part):
        cols = []
        for e in es:
            for ee in e._expand(df):  # all()/exclude()/regex selectors
                c = ee._fn(df, part)
                try:
                    dt = _probe_type(df, c)
                except Exception:
                    dt = None
                cols.append(c if isinstance(dt, T.ArrayType) else F.array(c))
        return F.concat(*cols)

    return _merge_agg_flags(Expr(fn, name=es[0]._name if es else None), es)


def struct(*exprs, **named):
    """functions/as_datatype.rb:149."""
    es = _exprs(exprs)
    named_es = [(k, wrap_expr(v)) for k, v in named.items()]

    def fn(df, part):
        cols = []
        for i, e in enumerate(es):
            # expand regex/multi selectors (lazy_frame_test.rb:
            # struct(col("^t_.$")))
            for ee in e._expand(df):
                cols.append(ee._fn(df, part)
                            .alias(ee._name or e._name or f"field_{i}"))
        cols += [v._fn(df, part).alias(k) for k, v in named_es]
        return F.struct(*cols)

    # a struct of AGGREGATES is itself an aggregate (polars:
    # agg(struct(sum, mean)) — otherwise the agg compiler would wrap it
    # in an implicit implode and nest aggregates)
    parts = list(es) + [v for _, v in named_es]
    out = Expr(fn, name="struct",
               is_agg=bool(parts) and all(e._is_agg for e in parts),
               needs_order=any(e._needs_order for e in parts))
    out._scrambles_order = any(e._scrambles_order for e in parts)
    fnames = ([ee._name or f"field_{i}" for i, ee in enumerate(es)]
              + [k for k, _ in named_es])

    def build(cols, _names=fnames):
        return F.struct(*[c.alias(n) for c, n in zip(cols, _names)])

    from ..exprs import _wire_hook_parts
    return _wire_hook_parts(out, parts, build)


# correlations (functions/lazy.rb:679,730)
def _corr_eval_arrays(ea, eb, df, method):
    """corr over the active eval array (list.eval / rolling collect-window):
    element values of both operands, ranked for spearman, sum-formula
    pearson — all JVM HOFs, no window, no join."""
    from ..exprs import (_ELEMENT_STACK, _EVAL_ARRAY_STACK, _arr_avg_ranks,
                         _arr_pearson, _eval_materialize, _eval_vals)

    arr = _EVAL_ARRAY_STACK[-1]
    # every intermediate array is pinned as a column (attribute): without
    # CSE in interpreted HOFs, inline multi-referenced subtrees re-evaluate
    # multiplicatively (the round-6 65s-vs-2s q143 lesson)
    xa = _eval_materialize(_eval_vals(ea, arr, df))
    xb = _eval_materialize(_eval_vals(eb, arr, df))
    if method == "spearman":
        if not _ELEMENT_STACK:
            # top-level in the eval context (rolling collect-window): the
            # per-window rank math runs in the vectorized Arrow kernel —
            # interpreted HOF ranks were 9s vs ~1s at sf0.1, and the
            # kernel's lexsort is the O(w log w) polars' native rank pays
            from .._udf_helpers import spearman_arrays_udf

            # NaN data is RANKED (sorts greatest, NaNs tie — engine rank /
            # polars / DuckDB ordering), while nulls leave the rank base.
            # The UDF sees both as NaN after the double cast, so data NaN
            # canonicalizes to float64-max JVM-side (round-11; keeps the
            # collect-window route consistent with the band and spear2-
            # kernel routes, differentially verified)
            _fmax = 1.7976931348623157e308

            def _canon(v):
                d = v.cast("double")
                return F.when(F.isnan(d), F.lit(_fmax)).otherwise(d)

            to_d = [F.transform(c, _canon) for c in (xa, xb)]
            return spearman_arrays_udf()(*to_d)
        # nested under another HOF lambda (a Python UDF cannot reference
        # lambda variables) — exact JVM formula, attribute-pinned hops
        xa = _eval_materialize(_arr_avg_ranks(xa, _eval_materialize))
        xb = _eval_materialize(_arr_avg_ranks(xb, _eval_materialize))
    return _arr_pearson(xa, xb, materialize=_eval_materialize)


def corr(a, b, method: str = "pearson", ddof: int = 1):
    ea, eb = _exprs([a])[0], _exprs([b])[0]
    if method == "pearson":
        def fn(df, part):
            from ..exprs import _EVAL_ARRAY_STACK

            if _EVAL_ARRAY_STACK:
                return _corr_eval_arrays(ea, eb, df, "pearson")
            from ..exprs import bind_context

            c = F.corr(ea._fn(df, None), eb._fn(df, None))
            if part is not None:
                return c.over(Window.partitionBy(*part))
            if bind_context.rolling_window is not None:
                return c.over(bind_context.rolling_window)
            return c

        return Expr(fn, name="corr",
                    is_agg=True)._set_meta("corr", (ea, eb))
    if method == "spearman":
        # Spark disallows a window (rank) inside an aggregate (corr), so
        # spearman pre-projects average ranks in a sub-plan and aggregates
        # the pearson corr of the ranks on top (the classic two-stage).
        ra, rb = ea.rank("average"), eb.rank("average")

        def fn(df, part):
            from ..exprs import _EVAL_ARRAY_STACK, bind_context

            if _EVAL_ARRAY_STACK:
                return _corr_eval_arrays(ea, eb, df, "spearman")
            if part is not None or bind_context.grouped_agg:
                # every grouped context routes through a hook now: over()
                # via _grouped_remap_fn (round-3), group_by().agg() via
                # _agg_pre_fn (round-4), dynamic/rolling/cube/rollup via
                # the window-keyed pre-stage or grouping-set expansion
                # (round-5).  Only compositions the hooks cannot reach
                # land here.
                raise NotImplementedError(
                    "spearman corr composed in a way the agg pre-stage "
                    "hook does not reach: pre-project per-group ranks "
                    "with col(x).rank('average').over(keys) via "
                    "with_columns, then aggregate pearson corr of the "
                    "ranks")
            # UNGROUPED whole-column ranks via the distinct-prefix tables
            # (round-11): the keyless rank window funneled BOTH columns
            # through one SinglePartition sort per rank — the prefix-table
            # join shape is multi-task end-to-end and produces the
            # identical average ranks (q165/q168 parity).
            from ..operators.row_index import global_avg_rank_join_multi

            base = df.select(ea._fn(df, None).alias("__sa__"),
                             eb._fn(df, None).alias("__sb__"))
            r2 = global_avg_rank_join_multi(
                base, [("__sa__", "__ra__"), ("__sb__", "__rb__")])
            sub = r2.agg(F.corr(F.col("__ra__"), F.col("__rb__"))
                         .alias("__sc__"))
            # one-row scalar, lifted into a literal at bind time (one
            # distributed rank+corr sub-job — same plan-time-action trade
            # as reshape's -1 inference)
            return F.lit(sub.collect()[0][0])

        out = Expr(fn, name="corr",
                   is_agg=True)._set_meta("corr", (ea, eb))

        def remap(sdf, key_exprs):
            # over(keys): materialize per-group average ranks as columns
            # (rank's own grouped window binding), then ONE windowed pearson
            # corr of the ranks — two sequential window stages, one exchange
            # on the keys, no per-row arrays.
            from ..exprs import _next_gord_name

            keys = [ke._fn(sdf, None) for ke in key_exprs]
            # NB: builtins.len — this module shadows `len` with pl.len
            kn = [f"__sp_k{i}__" for i, _ in enumerate(keys)]
            base = sdf.select("*", *[k.alias(n) for k, n in zip(keys, kn)])
            kcols = [F.col(n) for n in kn]
            base = (base.withColumn("__sp_ra__", ra._fn(base, kcols))
                    .withColumn("__sp_rb__", rb._fn(base, kcols)))
            tmp = _next_gord_name()
            c = F.corr(F.col("__sp_ra__"), F.col("__sp_rb__")).over(
                Window.partitionBy(*kcols))
            out_sdf = base.withColumn(tmp, c).drop(
                "__sp_ra__", "__sp_rb__", *kn)
            # rank's value-ordered windows scramble physical row order, but
            # ROW_IDX VALUES stay correct — the bind marks hook results
            # order-dirty and the deferred restore sorts at exports (round-11;
            # the former eager orderBy(ROW_IDX) paid a mid-plan range
            # Exchange + full Sort between this hook and any sibling bind)
            return out_sdf, tmp

        out._grouped_remap_fn = remap

        def agg_pre(sdf, key_cols):
            # group_by(keys).agg(spearman): per-group average ranks as
            # helper columns (windows partitioned by the SAME keys the
            # groupBy hashes — one logical exchange), then a plain pearson
            # corr aggregate on top (functions/lazy.rb:679; round-4)
            from ..exprs import _next_gord_name

            # partition the rank windows by the key Columns DIRECTLY (no
            # aliased copies) so the window exchange and the groupBy hash the
            # same attributes and Spark reuses one exchange
            na, nb = _next_gord_name(), _next_gord_name()
            base = sdf.withColumn(na, ra._fn(sdf, key_cols))
            base = base.withColumn(nb, rb._fn(base, key_cols))
            return base, F.corr(F.col(na), F.col(nb))

        out._agg_pre_fn = agg_pre
        return out
    raise ValueError(method)


def cov(a, b, ddof: int = 1):
    ea, eb = _exprs([a])[0], _exprs([b])[0]
    aggf = F.covar_samp if ddof == 1 else F.covar_pop

    def fn(df, part):
        from ..exprs import bind_context

        c = aggf(ea._fn(df, None), eb._fn(df, None))
        if part is not None:
            return c.over(Window.partitionBy(*part))
        if bind_context.rolling_window is not None:
            return c.over(bind_context.rolling_window)
        return c

    # meta breadcrumb (round-9): the rolling sliding kernel recognizes
    # cov leaves by label + the ddof payload
    return Expr(fn, name="cov", is_agg=True)._set_meta(
        "cov", (ea, eb), ddof)


def arctan2(y, x):
    ey, ex = _exprs([y])[0], _exprs([x])[0]
    return ey._lift2(ex, F.atan2)


def coalesce(*exprs):
    es = _exprs(exprs)

    def fn(df, part):
        return F.coalesce(*[e._fn(df, part) for e in es])

    from ..exprs import _wire_hook_parts
    return _wire_hook_parts(
        _merge_agg_flags(Expr(fn, name=es[0]._name if es else None), es),
        es, lambda cols: F.coalesce(*cols))


# ranges (functions/range/*.rb) — frame producers
def _range_producer(build_sdf, default_name: str, eager: bool):
    """Shared shape for int/date/datetime/time ranges: ``eager`` → a named
    Series; lazy → an Expr usable only as the sole select expression
    (row-count-defining generator), matching the reference's Expr return."""
    if eager:
        from ..series import Series

        return Series._from_spark(build_sdf(), default_name)

    from ..exprs import Expr

    def fn(df, part):
        raise NotImplementedError(
            f"{default_name} range composed with other expressions: select "
            "it alone (row-count-defining) or pass eager=true")

    e = Expr(fn, name=default_name)

    def frame_fn(lf, out_name):
        from ..frame import LazyFrame

        out = build_sdf()
        if out_name and out_name != default_name:
            out = out.withColumnRenamed(default_name, out_name)
        return LazyFrame(out)

    e._frame_fn = frame_fn
    return e


def int_range(start, end=None, step: int = 1, eager: bool = False,
              dtype=None, spark=None):
    """functions/range/int_range.rb:31 — Expr named 'arange' (sole-select
    row generator backed by ``spark.range``), or a Series with eager."""
    from ..session import get_spark

    if end is None:
        start, end = 0, start
    s = spark or get_spark()
    return _range_producer(
        lambda: s.range(start, end, step).withColumnRenamed("id", "arange"),
        "arange", eager)


arange = int_range  # reference alias (int_range.rb:58)


def date_range(start, end, interval: str = "1d", eager: bool = False, closed: str = "both",
               spark=None):
    from ..session import get_spark
    from .. import frame

    dur = parse_duration(interval)
    s = spark or get_spark()
    if dur.is_calendar:
        step = f"INTERVAL {dur.months} MONTH"
    else:
        step = f"INTERVAL {int(dur.total_seconds())} SECOND"
    def build():
        sdf = s.range(1).select(
            F.explode(
                F.sequence(F.lit(start).cast("date"), F.lit(end).cast("date"),
                           F.expr(step))
            ).alias("date"))
        if closed in ("left", "none"):
            sdf = sdf.filter(F.col("date") != F.lit(end).cast("date"))
        if closed in ("right", "none"):
            sdf = sdf.filter(F.col("date") != F.lit(start).cast("date"))
        return sdf

    return _range_producer(build, "date", eager)


def datetime_range(start, end, interval: str = "1d", eager: bool = False,
                   closed: str = "both", time_unit=None, time_zone=None,
                   spark=None):
    """datetime_range.rb — calendar intervals (mo/q/y, incl. mixed
    month+sub-month like '1mo10d') step via make_interval; fixed spans via
    a µs interval.  time_unit accepted for parity (ns/ms truncate to the
    engine's µs cap, SURVEY §1.3)."""
    from ..session import get_spark

    dur = parse_duration(interval)
    s = spark or get_spark()
    if dur.is_calendar:
        us = int(dur.microseconds)
        step = (f"make_interval(0, {int(dur.months)}, 0, 0, 0, 0, "
                f"{us / 1e6!r})" if us else
                f"make_interval(0, {int(dur.months)}, 0, 0, 0, 0, 0)")
    else:
        step = f"INTERVAL {int(dur.total_seconds() * 1e6)} MICROSECOND"

    def build():
        sdf = s.range(1).select(
            F.explode(
                F.sequence(F.lit(start).cast("timestamp"),
                           F.lit(end).cast("timestamp"), F.expr(step))
            ).alias("datetime"))
        if closed in ("left", "none"):
            sdf = sdf.filter(
                F.col("datetime") != F.lit(end).cast("timestamp"))
        if closed in ("right", "none"):
            sdf = sdf.filter(
                F.col("datetime") != F.lit(start).cast("timestamp"))
        return sdf

    return _range_producer(build, "datetime", eager)


def repeat(value, n: int, dtype=None, eager: bool = False, name: str | None = None,
           spark=None):
    """Column of ``value`` repeated ``n`` times (functions/repeat.rb:37).
    ``eager`` → a Series named 'repeat' (reference doctest); lazy → an
    EXPR (row generator in a sole select, composable with append — the
    repeat.rb / expr.rb rechunk doctests), generated via spark.range (no
    driver materialization)."""
    from ..session import get_spark
    from ..datatypes import to_spark_type
    from .. import frame, series
    from ..exprs import Expr

    nm = name or "repeat"

    def build(sp):
        c = F.lit(value)
        if dtype is not None:
            c = c.cast(to_spark_type(dtype))
        return sp.range(n).select(c.alias(nm))

    if eager:
        s = spark or get_spark()
        return series.Series._from_spark(build(s), nm)

    def fn(df, part):
        if n == 1:
            c = F.lit(value)
            return c.cast(to_spark_type(dtype)) if dtype is not None else c
        raise NotImplementedError(
            f"repeat({n}) generates {n} rows: use it as the sole select "
            "expression (or eager: true)")

    e = Expr(fn, name=nm)

    def frame_fn(lf, out_name):
        sdf = build(lf._sdf.sparkSession)
        if out_name and out_name != nm:
            sdf = sdf.toDF(out_name)
        return frame.LazyFrame(sdf)

    e._frame_fn = frame_fn
    return e._set_meta("lit", (), value)


def sql_expr(sql: str) -> Expr:
    """functions/lazy.rb:1272 — SQL fragment → Expr, via F.expr (native)."""
    return Expr(lambda df, part: F.expr(sql), name=None)


def arg_sort_by(exprs, descending: bool = False):
    """functions/lazy.rb:978 — row positions that would sort by the given
    keys (ordered collect + positional pick, same remap as Expr.sort_by)."""
    from pyspark.sql import Window

    from ..session import ROW_IDX

    es = _exprs(exprs)

    def fn(df, part):
        keys = F.struct(*[e._fn(df, part) for e in es])
        both = Window.partitionBy(*(part or [])).orderBy(ROW_IDX).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)
        ordinal = F.row_number().over(
            Window.partitionBy(*(part or [])).orderBy(ROW_IDX)) - 1
        pairs = F.array_sort(
            F.collect_list(F.struct(keys.alias("k"), ordinal.alias("i"))).over(both))
        if descending:
            pairs = F.reverse(pairs)
        pos = F.row_number().over(
            Window.partitionBy(*(part or [])).orderBy(ROW_IDX))
        return F.element_at(pairs, pos)["i"].cast("long")

    # named after the first key expression (py-polars convention)
    e = Expr(fn, name=es[0]._name or "arg_sort_by", needs_order=True)

    def frame_fn(lf, out_name):
        # sole-select path: plain sort projection of the row index —
        # scalable (one range shuffle), unlike the ordered-collect remap
        # which materializes an n-element array per row when ungrouped
        # (same fix as Expr.arg_sort)
        from ..frame import LazyFrame

        out_name = out_name or es[0]._name or "arg_sort_by"
        df = lf._ensure_row_index()._sdf
        order = [(ee._fn(df, None).desc() if descending else
                  ee._fn(df, None).asc()) for ee in es]
        return LazyFrame(df.orderBy(*order, F.col(ROW_IDX))
                         .select(F.col(ROW_IDX).cast("long").alias(out_name)))

    e._frame_fn = frame_fn
    return e


# -- module-level delegates & ranges (functions/aggregation, lazy.rb) --------

def _nary(f, *parts):
    es = [wrap_expr(p) for p in parts]

    def fn(df, part):
        return f(*[e._fn(df, part) for e in es])

    return _merge_agg_flags(Expr(fn), es)


def any(*names):
    out = [e.any() for e in _exprs(names)]
    return out[0] if names.__len__() == 1 else out


def median(name):
    return col(name).median()


def n_unique(name):
    return col(name).n_unique()


def approx_n_unique(name):
    return col(name).approx_n_unique()


def quantile(name, q, interpolation: str = "nearest"):
    return col(name).quantile(q, interpolation)


def std(name, ddof: int = 1):
    return col(name).std(ddof)


def var(name, ddof: int = 1):
    return col(name).var(ddof)


def cum_sum(*names):
    out = [col(n).cum_sum() for n in names]
    return out[0] if out.__len__() == 1 else out


def cum_count(*names):
    out = [col(n).cum_count() for n in names]
    return out[0] if out.__len__() == 1 else out


def head(column, n: int = 10):
    return col(column).head(n)


def tail(column, n: int = 10):
    return col(column).tail(n)


def implode(name):
    return col(name).implode()


def to_list(name):
    # deprecated reference alias of implode
    return col(name).implode()


def groups(name):
    # deprecated reference alias of agg_groups
    return col(name).agg_groups()


def exclude(*names):
    return col("*").exclude(*names)


def arctan2d(y, x):
    return arctan2(y, x)._lift(F.degrees)


def pearson_corr(a, b, ddof: int = 1):
    return corr(a, b, method="pearson", ddof=ddof)


def spearman_rank_corr(a, b, ddof: int = 1):
    return corr(a, b, method="spearman", ddof=ddof)


def from_epoch(column, time_unit: str = "s"):
    e = wrap_expr(col(column) if isinstance(column, str) else column)
    if time_unit == "d":
        return e._lift(lambda c: F.date_add(F.lit("1970-01-01").cast("date"),
                                            c.cast("int")))
    factor = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": 0.001}[time_unit]
    return e._lift(lambda c: F.timestamp_micros(
        (c.cast("double") * F.lit(factor)).cast("long")))


def arg_where(condition, eager: bool = False):
    """Row indices where the predicate holds (functions/lazy.rb:1092).

    Sole-select → one row per match (row-count-changing, doctest shape);
    grouped agg context → list of indices (same convention as head/gather).
    Scale: the select path is a flat filter over the row-indexed frame —
    no window, no shuffle beyond the row index itself."""
    from ..session import ROW_IDX

    e = wrap_expr(condition)

    def fn(df, part):
        # agg context: polars evaluates per sub-series → GROUP-LOCAL
        # 0-based positions (round-5; was global ROW_IDX values).  Collect
        # (i, cond) in row order, then positions where cond holds.
        c = e._fn(df, part)
        pairs = F.array_sort(F.collect_list(
            F.struct(F.col(ROW_IDX).alias("i"), c.alias("v"))))
        flags = F.transform(pairs, lambda p: p["v"])
        idx = F.transform(
            flags, lambda x, i: F.when(x, i.cast("long")))
        return F.filter(idx, lambda x: x.isNotNull())

    out = Expr(fn, is_agg=True, needs_order=True, name=e._name or "arg_where")

    def frame_fn(lf, out_name):
        from ..frame import LazyFrame

        out_name = out_name or e._name or "arg_where"
        df = lf._ensure_dense_index()._sdf  # values-as-positions
        sel = (df.filter(e._fn(df, None))
               .select(F.col(ROW_IDX).cast("long").alias(out_name),
                       F.col(ROW_IDX).alias("__aw_ord__")))
        return LazyFrame(sel).sort("__aw_ord__").drop("__aw_ord__")

    out._frame_fn = frame_fn
    return out


def duration(*, weeks=0, days=0, hours=0, minutes=0, seconds=0,
             milliseconds=0, microseconds=0, nanoseconds=0, time_unit="us"):
    """Duration expr from components (functions/as_datatype.rb:35) —
    composes with Datetime arithmetic via a day-time interval."""
    def c(x):
        return wrap_expr(x)

    secs = (c(seconds)._lift2(c(milliseconds), lambda a, b: a + b * F.lit(0.001))
            ._lift2(c(microseconds), lambda a, b: a + b * F.lit(1e-6))
            ._lift2(c(nanoseconds), lambda a, b: a + b * F.lit(1e-9)))
    return _nary(
        lambda w, d, h, m, s: F.make_interval(
            F.lit(0), F.lit(0), w.cast("int"), d.cast("int"), h.cast("int"),
            m.cast("int"), s.cast("decimal(18,6)")),
        weeks, days, hours, minutes, secs)


def date_ranges(start, end, interval: str = "1d", closed: str = "both"):
    """Per-row list of dates from start to end columns (range/date_range.rb)."""
    dur = parse_duration(interval)
    step = (f"INTERVAL {dur.months} MONTH" if dur.is_calendar
            else f"INTERVAL {int(dur.total_seconds())} SECOND")
    s, e = wrap_expr(start if not isinstance(start, str) else col(start)), \
        wrap_expr(end if not isinstance(end, str) else col(end))
    out = s._lift2(e, lambda a, b: F.sequence(
        a.cast("date"), b.cast("date"), F.expr(step)))
    if closed in ("left", "none"):
        out = out._lift2(e, lambda arr, b: F.filter(
            arr, lambda x: x != b.cast("date")))
    if closed in ("right", "none"):
        out = out._lift2(s, lambda arr, a: F.filter(
            arr, lambda x: x != a.cast("date")))
    return out


def datetime_ranges(start, end, interval: str = "1d", closed: str = "both"):
    dur = parse_duration(interval)
    step = f"INTERVAL {int(dur.total_seconds() * 1e6)} MICROSECOND"
    s, e = wrap_expr(start if not isinstance(start, str) else col(start)), \
        wrap_expr(end if not isinstance(end, str) else col(end))
    out = s._lift2(e, lambda a, b: F.sequence(
        a.cast("timestamp"), b.cast("timestamp"), F.expr(step)))
    if closed in ("left", "none"):
        out = out._lift2(e, lambda arr, b: F.filter(
            arr, lambda x: x != b.cast("timestamp")))
    if closed in ("right", "none"):
        out = out._lift2(s, lambda arr, a: F.filter(
            arr, lambda x: x != a.cast("timestamp")))
    return out


def _time_ns(v):
    import datetime as _dt

    if isinstance(v, _dt.time):
        return ((v.hour * 3600 + v.minute * 60 + v.second) * 1_000_000
                + v.microsecond) * 1000
    return int(v)


def time_range(start=None, stop=None, interval: str = "1h",
               closed: str = "both", eager: bool = False, spark=None):
    """Range of Time values (ns since midnight; range/time_range.rb:35)."""
    from ..session import get_spark
    from .. import frame

    dur = parse_duration(interval)
    if dur.is_calendar:
        raise ValueError("invalid interval unit for time_range")
    lo = _time_ns(start) if start is not None else 0
    hi = _time_ns(stop) if stop is not None else 24 * 3600 * 10**9 - 1
    step = int(dur.total_seconds() * 1e9)
    s = spark or get_spark()

    def build():
        sdf = s.range(1).select(F.explode(F.sequence(
            F.lit(lo), F.lit(hi), F.lit(step))).alias("time"))
        if closed in ("left", "none"):
            sdf = sdf.filter(F.col("time") != hi)
        if closed in ("right", "none"):
            sdf = sdf.filter(F.col("time") != lo)
        return sdf

    return _range_producer(build, "time", eager)


def time_ranges(start, stop, interval: str = "1h", closed: str = "both"):
    dur = parse_duration(interval)
    if dur.is_calendar:
        raise ValueError("invalid interval unit for time_ranges")
    step = int(dur.total_seconds() * 1e9)
    s, e = wrap_expr(start if not isinstance(start, str) else col(start)), \
        wrap_expr(stop if not isinstance(stop, str) else col(stop))
    out = s._lift2(e, lambda a, b: F.sequence(
        a.cast("long"), b.cast("long"), F.lit(step)))
    if closed in ("left", "none"):
        out = out._lift2(e, lambda arr, b: F.filter(arr, lambda x: x != b))
    if closed in ("right", "none"):
        out = out._lift2(s, lambda arr, a: F.filter(arr, lambda x: x != a))
    return out


def ones(n: int, dtype=None, eager: bool = True, spark=None):
    return repeat(1.0 if dtype is None else 1, n, dtype=dtype, eager=eager,
                  name="ones", spark=spark)


def zeros(n: int, dtype=None, eager: bool = True, spark=None):
    return repeat(0.0 if dtype is None else 0, n, dtype=dtype, eager=eager,
                  name="zeros", spark=spark)


def select(*exprs, **named):
    """Run expressions without a frame context (lazy.rb select) — a unit
    (1-row, 0-col) frame."""
    from ..session import get_spark
    from .. import frame

    base = frame.DataFrame(get_spark().range(1).drop("id"))
    return base.select(*exprs, **named)


def set_random_seed(seed: int):
    """Default seed for seeded ops when none is passed (random.rb)."""
    from ..config import _STATE

    _STATE["random_seed"] = int(seed)


def get_dummies(df, columns=None, separator: str = "_"):
    # deprecated reference alias of DataFrame#to_dummies
    return df.to_dummies(columns=columns, separator=separator)
