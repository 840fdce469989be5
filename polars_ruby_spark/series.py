"""Series: a named single-column frame with Expr method dispatch.

The reference implements every Series op by round-tripping through a
one-column frame select (``/root/reference/lib/polars/expr_dispatch.rb:11-20``:
``s.to_frame.select(expr.send(method, ...)).to_series``).  We use exactly the
same trick: ``__getattr__`` forwards unknown methods to the Expr layer, so
the entire Expr surface (and its namespaces) is available on Series with zero
duplicated code.
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from .exprs import Expr, col

_EXPORTS = {"to_list", "to_a", "to_pandas", "dtype", "name", "len", "__len__"}


class Series:
    def __init__(self, name: str | Iterable = "", values: Iterable | None = None,
                 dtype=None, spark=None):
        if values is None and not isinstance(name, str):
            name, values = "", name
        self._name = name or ""
        if spark is None:
            from .session import get_spark

            spark = get_spark()
        if values is not None:
            from .datatypes import to_spark_type

            vals = list(values)
            if not vals:
                # empty series: pandas inference has no rows to work with —
                # build from an explicit schema (Null dtype when none given,
                # matching polars' empty-series default)
                from pyspark.sql import types as T

                t = to_spark_type(dtype) if dtype is not None else T.NullType()
                self._sdf = spark.createDataFrame(
                    [], schema=T.StructType(
                        [T.StructField(self._name or "values", t)]))
                return
            from .sources.io import pylists_to_sdf

            # Arrow-first: preserves NaN values and integral dtypes under
            # nulls (the pandas path nulls NaN and floats int columns)
            sdf = pylists_to_sdf({self._name or "values": vals}, spark=spark)
            if dtype is not None:
                from pyspark.sql import types as T

                from .datatypes import Array as _Arr
                from .datatypes import Duration as _Dur
                from .datatypes import cast_is_noop

                cn = self._name or "values"
                inferred = sdf.schema.fields[0].dataType
                is_dur = dtype is _Dur or isinstance(dtype, _Dur)
                if cast_is_noop(dtype, inferred):
                    pass  # bare family class / Unknown: inference wins
                elif is_dur and isinstance(
                        inferred, (T.LongType, T.DoubleType, T.IntegerType,
                                   T.FloatType, T.DecimalType)):
                    # numeric counts in the requested unit → real intervals
                    unit = dtype.time_unit if isinstance(dtype, _Dur) else "us"
                    per_sec = {"ns": 1e9, "us": 1e6, "ms": 1e3, "s": 1.0}[unit]
                    sdf = sdf.select(F.make_dt_interval(
                        secs=F.col(cn).cast("double") / per_sec).alias(cn))
                else:
                    t = to_spark_type(dtype)
                    sdf = sdf.select(sdf[0].cast(t).alias(cn))
                if isinstance(dtype, _Arr) and dtype.width is not None:
                    # null rows are legal at any width; size(NULL) is -1 under
                    # legacy sizeOfNull, so guard explicitly
                    bad = sdf.where(
                        F.col(cn).isNotNull()
                        & (F.size(F.col(cn)) != dtype.width)).limit(1).count()
                    if bad:
                        raise ValueError("not all elements have the "
                                         f"specified width {dtype.width}")
            self._sdf = sdf
            # _name stays "" for unnamed series (series.rb: Series.new([1]).
            # name == ""); only the internal sdf column uses the "values"
            # placeholder
        else:
            self._sdf = None

    @classmethod
    def _from_spark(cls, sdf: SparkDF, name: str) -> "Series":
        s = cls.__new__(cls)
        s._sdf = sdf.select(sdf.columns[0]) if len(sdf.columns) > 1 else sdf
        s._name = name
        return s

    # -- core -----------------------------------------------------------------
    @property
    def name(self) -> str:
        return self._name

    @property
    def dtype(self):
        return self._sdf.schema.fields[0].dataType

    @property
    def inner_dtype(self):
        # series.rb inner_dtype — list element type, nil otherwise
        from pyspark.sql import types as T

        dt = self.dtype
        return dt.elementType if isinstance(dt, T.ArrayType) else None

    def to_frame(self):
        from .frame import DataFrame

        return DataFrame(self._sdf.withColumnRenamed(self._sdf.columns[0], self._name))

    def to_list(self) -> list:
        from pyspark.sql import Row

        def conv(v):
            if isinstance(v, Row):
                return v.asDict(recursive=True)
            if isinstance(v, list):
                return [conv(x) for x in v]
            return v

        return [conv(r[0]) for r in self._sdf.collect()]

    to_a = to_list

    def to_pandas(self):
        return self._sdf.toPandas()[self._sdf.columns[0]]

    def len(self) -> int:
        return self._sdf.count()

    def __len__(self) -> int:
        return self.len()

    def rename(self, name: str, in_place: bool = False) -> "Series":
        if in_place:
            self._name = name
            return self
        return Series._from_spark(self._sdf, name)

    def alias(self, name: str) -> "Series":
        return Series._from_spark(self._sdf, name)

    def item(self) -> Any:
        rows = self._sdf.limit(2).collect()
        if len(rows) != 1:
            raise ValueError("item() requires length-1 Series")
        return rows[0][0]

    def n_chunks(self) -> int:
        # logically one chunk (see DataFrame.n_chunks)
        return 1

    def chunk_lengths(self) -> list[int]:
        return [self.len()]

    def rechunk(self, in_place: bool = False) -> "Series":
        return self

    # -- expr dispatch (the reference's ExprDispatch trick) ---------------------
    def _dispatch(self, make_expr, extra_series=()) -> Any:
        from .frame import DataFrame as _DF

        # unnamed series ride an internal placeholder column — an empty
        # column name breaks nested Catalyst naming (sort fallbacks) — but
        # the RESULT keeps the series' real name ('' stays '')
        nm = self._name or "values"
        frame = _DF(self._sdf.withColumnRenamed(self._sdf.columns[0], nm))
        for s in extra_series:
            # Series arguments ride along as positionally-aligned columns
            # (series.rb ExprDispatch materializes the same way)
            frame = frame.hstack(s.to_frame())
        frame = frame.lazy()
        e = make_expr(col(nm))
        out = frame.select(e.alias(nm) if e._name is None else e)
        sdf = out._sdf
        from .session import ROW_IDX

        if len([c for c in sdf.columns if c != ROW_IDX]) == 1:
            return Series._from_spark(sdf, self._name)
        return out.collect()

    def _dispatch_args(self, method_of, args, kwargs) -> Any:
        """Dispatch a namespace/expr method whose args may contain Series:
        each Series arg becomes an hstacked column referenced by a col()."""
        extras = []

        def sub(a):
            if isinstance(a, Series):
                nm = f"__sarg_{len(extras)}"
                extras.append(a.rename(nm))
                return col(nm)
            return a

        args2 = [sub(a) for a in args]
        kwargs2 = {k: sub(v) for k, v in kwargs.items()}
        return self._dispatch(
            lambda e: method_of(e)(*args2, **kwargs2), extra_series=extras)

    def __getattr__(self, item: str):
        if item.startswith("_"):
            raise AttributeError(item)
        expr_attr = getattr(Expr, item, None)
        if expr_attr is None:
            raise AttributeError(f"Series has no method {item!r}")

        def call(*args, **kwargs):
            return self._dispatch_args(lambda e: getattr(e, item), args, kwargs)

        return call

    # namespaces
    @property
    def str(self):
        return _SeriesNS(self, "str")

    @property
    def dt(self):
        return _SeriesNS(self, "dt")

    @property
    def list(self):
        return _SeriesNS(self, "list")

    arr = list

    @property
    def struct(self):
        return _SeriesStructNS(self, "struct")

    @property
    def bin(self):
        return _SeriesNS(self, "bin")

    @property
    def cat(self):
        return _SeriesCatNS(self, "cat")

    # -- scalar reductions materialize ------------------------------------------
    def _scalar(self, method, *args, **kwargs):
        e = getattr(col(self._name), method)(*args, **kwargs)
        row = self.to_frame().lazy().select(e)._sdf.collect()[0]
        return row[0]

    def sum(self):
        # series_test.rb: sum of an empty series is 0, not nil
        r = self._scalar("sum")
        return 0 if r is None else r

    def mean(self):
        return self._scalar("mean")

    def median(self):
        return self._scalar("median")

    def min(self):
        return self._scalar("min")

    def max(self):
        return self._scalar("max")

    def std(self, ddof: int = 1):
        return self._scalar("std", ddof)

    def var(self, ddof: int = 1):
        return self._scalar("var", ddof)

    def n_unique(self):
        return self._scalar("n_unique")

    def null_count(self):
        return self._scalar("null_count")

    def arg_max(self):
        # series.rb arg_max returns an Integer, not a 1-row Series
        return self._scalar("arg_max")

    def arg_min(self):
        return self._scalar("arg_min")

    def quantile(self, q: float, interpolation: str = "nearest"):
        if not 0.0 <= q <= 1.0:
            raise ValueError("quantile should be between 0.0 and 1.0")
        return self._scalar("quantile", q, interpolation)

    def count(self):
        return self._scalar("count")

    def product(self):
        return self._scalar("product")

    def entropy(self, base: float = None, normalize: bool = False):
        # series.rb:1144 defaults (base: Math::E, normalize: false) differ
        # from the Expr form (expr.rb:6637: base 2, normalize true)
        import math

        base = math.e if base is None else base
        return self._scalar("entropy", base=base, normalize=normalize)

    def skew(self, bias: bool = True):
        return self._scalar("skew", bias=bias)

    def nan_max(self):
        # series.rb nan_max — aggregate, returns a scalar (NaN-propagating)
        return self._scalar("nan_max")

    def nan_min(self):
        return self._scalar("nan_min")

    def search_sorted(self, element, side: str = "any"):
        # series.rb:2236 — scalar element gives an Integer position
        if isinstance(element, (list, tuple, Series)):
            return self._dispatch(
                lambda e: e.search_sorted(element, side=side))
        return self._scalar("search_sorted", element, side)

    def kurtosis(self, fisher: bool = True, bias: bool = True):
        return self._scalar("kurtosis", fisher=fisher, bias=bias)

    # -- row-subset ops (frame-level, flat — the Expr forms are agg-context
    #    listops and would yield one row holding a list) -----------------------
    def _via_frame(self, f) -> "Series":
        return Series._from_spark(f(self.to_frame().lazy())._sdf, self._name)

    def head(self, n: int = 10) -> "Series":
        return self._via_frame(lambda lf: lf.head(n))

    def tail(self, n: int = 10) -> "Series":
        return self._via_frame(lambda lf: lf.tail(n))

    def limit(self, n: int = 10) -> "Series":
        return self._via_frame(lambda lf: lf.limit(n))

    def slice(self, offset: int, length: int | None = None) -> "Series":
        return self._via_frame(lambda lf: lf.slice(offset, length))

    def top_k(self, k: int = 5) -> "Series":
        return self._via_frame(lambda lf: lf.sort(self._name, descending=True)
                               .head(k))

    def bottom_k(self, k: int = 5) -> "Series":
        return self._via_frame(lambda lf: lf.sort(self._name).head(k))

    def unique(self, maintain_order: bool = False) -> "Series":
        return self._via_frame(lambda lf: lf.unique())

    def arg_unique(self) -> "Series":
        """Index of the first occurrence of each distinct value, flat."""
        from .operators.row_index import with_row_index

        base = with_row_index(self._sdf, "__i__")
        out = (base.groupBy(self._sdf.columns[0])
               .agg(F.min("__i__").alias("__first__"))
               .orderBy("__first__")
               .select(F.col("__first__").cast("long").alias(self._name)))
        return Series._from_spark(out, self._name)

    def gather(self, indices) -> "Series":
        """Rows at the given positions (flat, series.rb take)."""
        from .operators.row_index import with_row_index

        idx = list(indices.to_a() if isinstance(indices, Series) else indices)
        n = self.len()
        idx = [i if i >= 0 else n + i for i in idx]
        base = with_row_index(self._sdf, "__i__")
        # broadcast-join a (position → output ordinal) table: scales to any
        # index-list size the driver can hold, no per-index plan nodes
        spark = self._sdf.sparkSession
        lut = spark.createDataFrame(
            [(int(i), k) for k, i in enumerate(idx)], "__i__ long, __ord__ long")
        out = (base.join(F.broadcast(lut), "__i__")
               .orderBy("__ord__").select(self._sdf.columns[0]))
        return Series._from_spark(out, self._name)

    take = gather

    def filter(self, mask) -> "Series":
        """Keep rows where the boolean mask holds (series.rb filter) — the
        mask may be a Series or a plain list; zipped by row position."""
        from .operators.row_index import with_row_index

        if isinstance(mask, (list, tuple)):
            mask = Series("", list(mask))
        if isinstance(mask, Series):
            left = with_row_index(self._sdf, "__i__")
            right = with_row_index(
                mask._sdf.select(F.col(mask._sdf.columns[0]).alias("__m__")),
                "__i__")
            out = (left.join(right, "__i__")
                   .filter(F.col("__m__")).orderBy("__i__")
                   .select(self._sdf.columns[0]))
            return Series._from_spark(out, self._name)
        # Expr mask
        return self._dispatch(lambda e: e.filter(mask))

    def dot(self, other) -> float:
        """Inner product with another Series (series.rb dot), zipped by row
        position."""
        from .operators.row_index import with_row_index

        if isinstance(other, Series):
            left = with_row_index(
                self._sdf.select(F.col(self._sdf.columns[0]).alias("__a__")),
                "__i__")
            right = with_row_index(
                other._sdf.select(F.col(other._sdf.columns[0]).alias("__b__")),
                "__i__")
            row = (left.join(right, "__i__")
                   .agg(F.sum(F.col("__a__") * F.col("__b__"))).collect()[0])
            return row[0]
        return self._scalar("dot", other)

    # -- arithmetic via dispatch ---------------------------------------------------
    def value_counts(self, sort: bool = False, name: str = "count"):
        """series.rb value_counts → groupBy(col).count() (SURVEY §2.4)."""
        from pyspark.sql import functions as F

        from .frame import DataFrame

        out = self._sdf.groupBy(self._name).agg(F.count(F.lit(1)).alias(name))
        if sort:
            out = out.orderBy(F.col(name).desc(), F.col(self._name))
        return DataFrame(out)

    # -- series-specific container ops (series.rb; not Expr-delegable) -------
    def append(self, other: "Series") -> "Series":
        # series.rb append MUTATES self (series_test.rb: a.append(b);
        # assert_series [1,2,3,4], a) and returns it
        self._sdf = self._sdf.unionByName(
            other._sdf.withColumnRenamed(other._sdf.columns[0],
                                         self._sdf.columns[0]))
        return self

    def extend_constant(self, value, n: int) -> "Series":
        from pyspark.sql import functions as F

        cn = self._sdf.columns[0]
        field = self._sdf.schema[cn].dataType
        tail = self._sdf.sparkSession.range(n).select(
            F.lit(value).cast(field).alias(cn))
        return Series._from_spark(self._sdf.unionByName(tail), self._name)

    def zip_with(self, mask: "Series", other: "Series") -> "Series":
        """Row-wise: self where mask else other (series.rb zip_with)."""
        from pyspark.sql import functions as F

        merged = (self.to_frame()
                  .hstack(mask.rename("__m__").to_frame())
                  .hstack(other.rename("__o__").to_frame()).to_spark())
        out = merged.select(F.when(F.col("__m__"), F.col(self._name))
                            .otherwise(F.col("__o__")).alias(self._name))
        return Series._from_spark(out, self._name)

    def new_from_index(self, index: int, length: int) -> "Series":
        v = self.to_frame().lazy().slice(index, 1)._sdf.collect()[0][0]
        return Series(self._name, [v] * length)

    def scatter(self, indices, values) -> "Series":
        """Set values at positions (series.rb scatter/set_at_idx) — a
        broadcast-join remap on the row index, not a driver loop."""
        from pyspark.sql import functions as F

        from .operators.row_index import with_row_index

        idx = [indices] if isinstance(indices, int) else list(indices)
        vals = values if isinstance(values, (list, tuple)) else [values] * len(idx)
        spark = self._sdf.sparkSession
        cn = self._sdf.columns[0]
        field = self._sdf.schema[cn].dataType
        upd = spark.createDataFrame(
            [(int(i), v) for i, v in zip(idx, vals)], ["__i__", "__v__"]
        ).select(F.col("__i__").cast("long").alias("__i__"),
                 F.col("__v__").cast(field).alias("__v__"))
        base = with_row_index(self._sdf, "__i__")
        out = (base.join(F.broadcast(upd), "__i__", "left")
               .orderBy("__i__")
               .select(F.coalesce("__v__", cn).alias(cn)))
        return Series._from_spark(out, self._name)

    set_at_idx = scatter

    def set(self, mask: "Series", value) -> "Series":
        from pyspark.sql import functions as F

        merged = self.to_frame().hstack(mask.rename("__m__").to_frame()).to_spark()
        cn = self._name
        out = merged.select(F.when(F.col("__m__"), F.lit(value).cast(
            self._sdf.schema[self._sdf.columns[0]].dataType))
            .otherwise(F.col(cn)).alias(cn))
        return Series._from_spark(out, self._name)

    def eq_missing(self, other) -> "Series":
        return self._null_safe_cmp(other, negate=False)

    def ne_missing(self, other) -> "Series":
        return self._null_safe_cmp(other, negate=True)

    def _null_safe_cmp(self, other, negate: bool) -> "Series":
        from pyspark.sql import functions as F

        if isinstance(other, Series):
            merged = self.to_frame().hstack(
                other.rename("__rhs__").to_frame()).to_spark()
            c = F.col(self._name).eqNullSafe(F.col("__rhs__"))
        else:
            merged = self.to_frame().to_spark()
            c = F.col(self._name).eqNullSafe(F.lit(other))
        out = merged.select((~c if negate else c).alias(self._name))
        return Series._from_spark(out, self._name)

    def equals(self, other: "Series", null_equal: bool = True) -> bool:
        return self.to_frame().equals(other.rename(self._name).to_frame())

    series_equal = equals

    def arg_true(self) -> "Series":
        from .operators.row_index import with_row_index
        from pyspark.sql import functions as F

        base = with_row_index(self._sdf, "__i__")
        out = (base.filter(F.col(self._sdf.columns[0])).orderBy("__i__")
               .select(F.col("__i__").alias(self._name)))
        return Series._from_spark(out, self._name)

    def is_empty(self) -> bool:
        return self._sdf.isEmpty()

    empty = is_empty

    def has_validity(self) -> bool:
        return self._scalar("null_count") > 0

    # dtype predicates (series.rb:4450-4520)
    def is_numeric(self) -> bool:
        from pyspark.sql import types as T

        return isinstance(self.dtype, (T.ByteType, T.ShortType, T.IntegerType,
                                       T.LongType, T.FloatType, T.DoubleType,
                                       T.DecimalType))

    def is_float(self) -> bool:
        from pyspark.sql import types as T

        return isinstance(self.dtype, (T.FloatType, T.DoubleType))

    def is_boolean(self) -> bool:
        from pyspark.sql import types as T

        return isinstance(self.dtype, T.BooleanType)

    is_bool = is_boolean

    def is_utf8(self) -> bool:
        from pyspark.sql import types as T

        return isinstance(self.dtype, T.StringType)

    def is_datelike(self) -> bool:
        from pyspark.sql import types as T

        return isinstance(self.dtype, (T.DateType, T.TimestampType))

    def time_unit(self) -> str:
        return "us"  # storage policy (COVERAGE.md dtype table)

    _sorted = None  # "asc" | "desc" | None — set by sort(in_place)/set_sorted

    @property
    def flags(self) -> dict:
        return {"SORTED_ASC": self._sorted == "asc",
                "SORTED_DESC": self._sorted == "desc"}

    def sort(self, reverse: bool = False, descending: bool = False,
             nulls_last: bool = False, in_place: bool = False) -> "Series":
        desc = reverse or descending
        out = self._dispatch(
            lambda e: e.sort(descending=desc, nulls_last=nulls_last))
        out._sorted = "desc" if desc else "asc"
        if in_place:
            self._sdf = out._sdf
            self._sorted = out._sorted
            return self
        return out

    def set_sorted(self, descending: bool = False) -> "Series":
        out = Series._from_spark(self._sdf, self._name)
        out._sorted = "desc" if descending else "asc"
        return out

    def each(self):
        for r in self._sdf.toLocalIterator():
            yield r[0]

    def clear(self, n: int = 0) -> "Series":
        sdf = self._sdf.limit(0)
        if n:
            from pyspark.sql import functions as F

            cn = self._sdf.columns[0]
            sdf = self._sdf.sparkSession.range(n).select(
                F.lit(None).cast(self._sdf.schema[cn].dataType).alias(cn))
        return Series._from_spark(sdf, self._name)

    cleared = clear

    def to_numpy(self):
        return self.to_pandas().to_numpy()

    def _binop(self, other, opname):
        if isinstance(other, Series):
            # elementwise zip by row position (series.rb arithmetic)
            merged = self.to_frame().hstack(other.rename("__rhs__").to_frame())
            e = getattr(col(self._name), opname)(col("__rhs__"))
            out = merged.lazy().select(e.alias(self._name))
            return Series._from_spark(out._sdf, self._name)
        return self._dispatch(lambda e: getattr(e, opname)(other))

    def __add__(self, o):
        return self._binop(o, "__add__")

    def __sub__(self, o):
        return self._binop(o, "__sub__")

    def __mul__(self, o):
        return self._binop(o, "__mul__")

    def __truediv__(self, o):
        from pyspark.sql import types as T

        if self.is_datelike() or isinstance(self.dtype, T.DayTimeIntervalType):
            # series_test.rb test_duration
            raise ValueError(
                "first cast to integer before dividing datelike dtypes")
        return self._binop(o, "__truediv__")

    def __floordiv__(self, o):
        return self._binop(o, "__floordiv__")

    def __mod__(self, o):
        return self._binop(o, "__mod__")

    def __pow__(self, o):
        return self._binop(o, "__pow__")

    def __xor__(self, o):
        return self._binop(o, "__xor__")

    # reflected scalar forms (series_test.rb test_arithmetic: 5 + a, 35 - a…)
    def __radd__(self, o):
        return self._dispatch(lambda e: e.__radd__(o))

    def __rsub__(self, o):
        return self._dispatch(lambda e: e.__rsub__(o))

    def __rmul__(self, o):
        return self._dispatch(lambda e: e.__rmul__(o))

    def __rtruediv__(self, o):
        return self._dispatch(lambda e: e.__rtruediv__(o))

    def __rfloordiv__(self, o):
        return self._dispatch(lambda e: e.__rfloordiv__(o))

    def __rmod__(self, o):
        return self._dispatch(lambda e: e.__rmod__(o))

    def __rpow__(self, o):
        return self._dispatch(lambda e: e.__rpow__(o))

    # elementwise comparisons (series.rb ==/!=/</>... return bool Series)
    def __eq__(self, o):  # type: ignore[override]
        return self._binop(o, "__eq__")

    def __ne__(self, o):  # type: ignore[override]
        return self._binop(o, "__ne__")

    __hash__ = object.__hash__  # __eq__ is elementwise; keep identity hash

    def __lt__(self, o):
        return self._binop(o, "__lt__")

    def __le__(self, o):
        return self._binop(o, "__le__")

    def __gt__(self, o):
        return self._binop(o, "__gt__")

    def __ge__(self, o):
        return self._binop(o, "__ge__")

    def __and__(self, o):
        return self._binop(o, "__and__")

    def __or__(self, o):
        return self._binop(o, "__or__")

    def __invert__(self):
        return self._dispatch(lambda e: e.not_())

    def __neg__(self):
        return self._dispatch(lambda e: -e)

    # -- positional element access (series.rb:440-520 []/[]=) ---------------
    def __getitem__(self, key):
        if isinstance(key, bool):
            raise TypeError("cannot index Series with a bool")
        if isinstance(key, int):
            i = key if key >= 0 else self.len() + key
            vals = self.slice(i, 1).to_a()
            if not vals:
                raise IndexError(
                    f"index {key} is out of bounds for sequence of length "
                    f"{self.len()}")
            return vals[0]
        if isinstance(key, Series):
            key = key.to_a()
        if isinstance(key, range):
            # Ruby Range subscripts (series.rb []) arrive as python ranges
            key = slice(key.start, key.stop, key.step)
        if isinstance(key, slice):
            start, stop, step = key.indices(self.len())
            if step == 1:
                return self.slice(start, max(0, stop - start))
            key = list(range(start, stop, step))
        if isinstance(key, (list, tuple)):
            return self.take(list(key))
        raise TypeError(f"cannot index Series with {key!r}")

    def __setitem__(self, key, value):
        from .operators.row_index import with_row_index

        n = self.len()
        if isinstance(key, Series):
            key = key.to_a()
        if isinstance(key, slice):
            idx = list(range(*key.indices(n)))
        elif isinstance(key, int):
            idx = [key if key >= 0 else n + key]
        else:
            idx = [k if k >= 0 else n + k for k in key]
        vals = (list(value) if isinstance(value, (list, tuple))
                else [value] * len(idx))
        if len(vals) != len(idx):
            raise ValueError(
                f"cannot set {len(idx)} positions with "
                f"{len(vals)} values")
        cn = self._sdf.columns[0]
        rix = "__set_rix__"
        sdf = with_row_index(self._sdf, rix)
        dtype = sdf.schema[cn].dataType
        expr = F.col(cn)
        for i, v in zip(idx, vals):
            expr = F.when(F.col(rix) == i,
                          F.lit(v).cast(dtype)).otherwise(expr)
        self._sdf = sdf.withColumn(cn, expr).orderBy(rix).drop(rix)

    def __iter__(self):
        return self.each()

    def __repr__(self) -> str:
        from .frame import _short_dtype

        vals = self._sdf.limit(10).collect()
        body = "\n".join("\t" + ("null" if r[0] is None else str(r[0]))
                         for r in vals)
        return (f"shape: ({self.len()},)\n"
                f"Series: '{self._name}' [{_short_dtype(self.dtype)}]\n"
                f"[\n{body}\n]")

    to_s = __repr__

    # -- container conveniences (series.rb surface tail) ----------------------
    @property
    def shape(self):
        return (self.len(),)

    def cut(self, breaks, labels=None, left_closed: bool = False,
            include_breaks: bool = False) -> "Series":
        # series.rb:919 renames the include_breaks struct fields to
        # break_point/category (the Expr variant keeps polars' breakpoint)
        out = self._dispatch_args(
            lambda e: e.cut, (breaks,),
            {"labels": labels, "left_closed": left_closed,
             "include_breaks": include_breaks})
        if include_breaks:
            out = out.struct.rename_fields(["break_point", "category"])
        return out

    def qcut(self, quantiles, labels=None, left_closed: bool = False,
             allow_duplicates: bool = False,
             include_breaks: bool = False) -> "Series":
        out = self._dispatch_args(
            lambda e: e.qcut, (quantiles,),
            {"labels": labels, "left_closed": left_closed,
             "allow_duplicates": allow_duplicates,
             "include_breaks": include_breaks})
        if include_breaks:
            out = out.struct.rename_fields(["break_point", "category"])
        return out

    def is_in(self, other) -> "Series":
        """Membership of each value in ``other``'s value SET (series.rb
        is_in doctest: s2.is_in(s)) — unlike Expr.is_in(col), where a
        column argument is an elementwise list-column probe.  The set is
        collected distinct to the driver (Series surface = bounded);
        frame-scale membership should use a semi join."""
        from pyspark.sql import types as T

        if isinstance(other, Series):
            if isinstance(other.dtype, T.ArrayType):
                # list-dtype series → ELEMENTWISE row-aligned membership
                # (series.rb is_in doctest 2: value ∈ that row's list)
                return self._dispatch_args(lambda e: e.is_in, (other,), {})
            other = other.unique().to_a()
        return self._dispatch(lambda e: e.is_in(list(other)))

    def describe(self):
        """Summary statistics (series.rb:651): a (statistic, value) frame —
        numeric: min/max/null_count/mean/std/count as f64; non-numeric:
        unique/null_count/count (the reference's own stat sets)."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        from .sources.io import from_hash

        cn = self._sdf.columns[0]
        dt = self.dtype
        numeric = isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType,
                                  T.LongType, T.FloatType, T.DoubleType,
                                  T.DecimalType))
        if numeric:
            row = self._sdf.agg(
                F.min(cn).cast("double"), F.max(cn).cast("double"),
                F.count(F.lit(1)) - F.count(cn), F.avg(cn),
                F.stddev_samp(cn), F.count(F.lit(1))).first()
            return from_hash({
                "statistic": ["min", "max", "null_count", "mean", "std",
                              "count"],
                "value": [row[0], row[1], float(row[2]), row[3], row[4],
                          float(row[5])]})
        row = self._sdf.agg(
            F.count_distinct(cn), F.count(F.lit(1)) - F.count(cn),
            F.count(F.lit(1))).first()
        # polars n_unique counts null as a distinct value (series.rb
        # describe doctest: ["a","a",nil,"b","c"] → unique 4)
        uniq = int(row[0]) + (1 if int(row[1]) > 0 else 0)
        return from_hash({
            "statistic": ["unique", "null_count", "count"],
            "value": [uniq, int(row[1]), int(row[2])]})

    def estimated_size(self, unit: str = "b"):
        sz = self._estimated_size_bytes()
        scale = {"b": 1, "kb": 2**10, "mb": 2**20, "gb": 2**30, "tb": 2**40}
        if unit not in scale:
            raise ValueError(
                f"unit must be one of {{'b', 'kb', 'mb', 'gb', 'tb'}}, "
                f"got {unit!r}")
        return sz if unit == "b" else sz / scale[unit]

    def _estimated_size_bytes(self) -> int:
        return self.to_frame().estimated_size()

    def to_dummies(self, separator: str = "_", drop_first: bool = False):
        return self.to_frame().to_dummies(separator=separator,
                                          drop_first=drop_first)

    def none(self) -> bool:
        """True when no element is truthy (series.rb none?)."""
        return not self.to_frame().lazy().select(
            col(self._name).cast("boolean").any()).collect().to_a()[0][self._name]

    def is_first(self):
        # deprecated alias (series.rb is_first → is_first_distinct)
        return self._dispatch(lambda e: e.is_first_distinct())

    def gather_every(self, n: int, offset: int = 0):
        # frame-level row filter, not the Expr agg-list form
        return Series._from_spark(
            self.to_frame().lazy().gather_every(n, offset)._sdf, self._name)

    def take_every(self, n: int, offset: int = 0):
        return self.gather_every(n, offset)

    def shrink_to_fit(self, in_place: bool = False):
        return self  # physical-memory detail the engine hides

    to_numo = to_numpy

    def to_s(self) -> str:
        return repr(self)


class _SeriesNS:
    """Namespace proxy: forward ``series.str.foo(...)`` through the Expr
    namespace and materialize back to a Series (series.rb delegates the
    same way via ExprDispatch)."""

    def __init__(self, series: "Series", ns: str):
        self._s = series
        self._ns = ns

    def __getattr__(self, item: str):
        if item.startswith("_"):
            raise AttributeError(item)

        def call(*args, **kwargs):
            agg_probe = []

            def method_of(e):
                m = getattr(getattr(e, self._ns), item)

                def wrapped(*a, **k):
                    ne = m(*a, **k)
                    agg_probe.append(getattr(ne, "_is_agg", False))
                    return ne

                return wrapped

            out = self._s._dispatch_args(method_of, args, kwargs)
            if agg_probe and agg_probe[0] and isinstance(out, Series):
                # namespace AGGREGATES return a SCALAR on Series like the
                # reference (date_time_name_space.rb mean/median doctests)
                vals = out.to_a()
                if len(vals) == 1:
                    return vals[0]
            return out

        return call


class _SeriesStructNS(_SeriesNS):
    """Series-level struct namespace (struct_name_space.rb): ``fields`` /
    ``schema`` are properties, ``unnest``/``to_frame`` yield a DataFrame."""

    @property
    def fields(self) -> list:
        from pyspark.sql import types as T

        dt = self._s.dtype
        return [f.name for f in dt.fields] if isinstance(dt, T.StructType) else []

    @property
    def schema(self) -> dict:
        from pyspark.sql import types as T

        dt = self._s.dtype
        if not isinstance(dt, T.StructType):
            return {}
        return {f.name: f.dataType for f in dt.fields}

    def unnest(self):
        # unnamed series ('' column) breaks Catalyst attribute naming —
        # ride a placeholder name; output columns are the field names
        s = self._s.rename("__unnest__") if not self._s.name else self._s
        return s.to_frame().unnest(s.name)

    to_frame = unnest

    def __getitem__(self, field: str) -> "Series":
        # series_test.rb test_new_struct: s.struct["f1"] → field Series
        return self._s._dispatch(
            lambda e: e.struct.field(field)).rename(field)


class _SeriesCatNS(_SeriesNS):
    """Series-level categorical namespace (cat_name_space.rb) — this engine
    has no global string cache, so every categorical is 'local'."""

    def is_local(self) -> bool:
        return True

    def to_local(self) -> "Series":
        return self._s
