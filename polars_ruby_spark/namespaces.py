"""Expression namespaces: ``.str`` ``.dt`` ``.list`` ``.struct`` ``.bin`` ``.cat`` ``.name``.

Parity targets: ``/root/reference/lib/polars/string_expr.rb`` (1,495 LoC),
``date_time_expr.rb`` (1,397), ``list_expr.rb`` (791), ``array_expr.rb``,
``struct_expr.rb``, ``binary_expr.rb``, ``cat_expr.rb``, ``name_expr.rb``.
Each method is a thin mapping onto ``pyspark.sql.functions`` (SURVEY §2.8
tables); everything stays JVM-side / whole-stage-codegen friendly.
"""

from __future__ import annotations

import re

from pyspark.sql import Window
from pyspark.sql import functions as F

from .datatypes import to_spark_type
from .exprs import Expr, _probe_type, wrap_expr
from .functions.chrono import chrono_to_java
from .functions.duration import parse_duration


class _NS:
    def __init__(self, expr: Expr):
        self._e = expr


class StringNameSpace(_NS):
    # string_expr.rb line refs per SURVEY §2.8
    def contains(self, pattern: str, literal: bool = False) -> Expr:
        if literal:
            return self._e._lift(lambda c: c.contains(pattern))
        return self._e._lift(lambda c: c.rlike(pattern))

    def starts_with(self, prefix) -> Expr:
        return self._e._lift2(wrap_expr(prefix), F.startswith)

    def ends_with(self, suffix) -> Expr:
        return self._e._lift2(wrap_expr(suffix), F.endswith)

    def extract(self, pattern: str, group_index: int = 1) -> Expr:
        # polars returns null on no-match; Spark returns "" → map to null
        return self._e._lift(
            lambda c: F.when(c.rlike(pattern), F.regexp_extract(c, pattern, group_index))
        )

    def extract_all(self, pattern: str) -> Expr:
        # group 0 = the full match — polars returns whole matches, and
        # Spark's default group index 1 errors on group-less patterns
        return self._e._lift(
            lambda c: F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))

    def extract_groups(self, pattern: str) -> Expr:
        """string_expr.rb:1032 — all capture groups as a struct (fields named
        by position, polars-style, or by name for named groups)."""
        import re as _re

        # group-name introspection rides python re, which spells named
        # groups (?P<n>); Rust/Java accept (?<n> — normalize for the probe
        # only (the JVM regexp_extract gets the original pattern)
        compiled = _re.compile(
            _re.sub(r"\(\?<([A-Za-z_][A-Za-z0-9_]*)>", r"(?P<\1>", pattern))
        names = {v: k for k, v in compiled.groupindex.items()}
        fields = [(names.get(i, str(i)), i) for i in range(1, compiled.groups + 1)]
        # unmatched rows carry NULL fields (polars), not Java's ""
        return self._e._lift(lambda c: F.struct(*[
            F.when(c.rlike(pattern),
                   F.regexp_extract(c, pattern, i)).alias(nm)
            for nm, i in fields]))

    def count_matches(self, pattern: str, literal: bool = False) -> Expr:
        pat = re.escape(pattern) if literal else pattern
        # i64 like the other counters (reference u32 → i64 cap)
        return self._e._lift(
            lambda c: F.regexp_count(c, F.lit(pat)).cast("long"))

    def replace(self, pattern: str, value: str, literal: bool = False, n: int = 1) -> Expr:
        """string_expr.rb:1199 — replaces the FIRST n matches (Spark's
        regexp_replace replaces all; emulate n=1 by anchoring on the first
        occurrence via regexp_instr + concat surgery)."""
        pat = re.escape(pattern) if literal else pattern

        def f(c):
            pos = F.regexp_instr(c, F.lit(pat))  # 1-based, 0 = no match
            head = F.substring(c, F.lit(1), pos - 1)
            tail = c.substr(pos, F.length(c))
            replaced = F.concat(head, F.regexp_replace(tail, "^(?s)(?:" + pat + ")", value))
            return F.when(pos == 0, c).otherwise(replaced)

        if n == 1:
            return self._e._lift(f)
        return self.replace_all(pattern, value, literal)

    def replace_all(self, pattern: str, value: str, literal: bool = False) -> Expr:
        pat = re.escape(pattern) if literal else pattern
        return self._e._lift(lambda c: F.regexp_replace(c, pat, value))

    def split(self, by: str, inclusive: bool = False) -> Expr:
        return self._e._lift(lambda c: F.split(c, re.escape(by)))

    def split_exact(self, by: str, n: int) -> Expr:
        def f(c):
            parts = F.split(c, re.escape(by))
            return F.struct(*[
                F.element_at(parts, i + 1).alias(f"field_{i}") for i in range(n + 1)
            ])

        return self._e._lift(f)

    def splitn(self, by: str, n: int) -> Expr:
        """string_expr.rb:1140 — struct[n] of fields, missing splits padded
        with null (was: a bare variable-length array)."""

        def f(c):
            parts = F.split(c, re.escape(by), n)
            return F.struct(*[F.element_at(parts, i + 1).alias(f"field_{i}")
                              for i in range(n)])

        return self._e._lift(f)

    def len_bytes(self) -> Expr:
        # i64: the reference returns u32 and the documented cap for
        # unsigned counters is i64 (SURVEY §1.3)
        return self._e._lift(lambda c: F.octet_length(c).cast("long"))

    def len_chars(self) -> Expr:
        return self._e._lift(lambda c: F.length(c).cast("long"))

    lengths = len_bytes
    n_chars = len_chars

    def to_lowercase(self) -> Expr:
        return self._e._lift(F.lower)

    def to_uppercase(self) -> Expr:
        return self._e._lift(F.upper)

    def to_titlecase(self) -> Expr:
        return self._e._lift(F.initcap)

    # deprecated reference aliases (string_expr_test.rb: strip/lstrip/
    # rstrip/ljust/rjust/count_match/lengths)
    def strip(self, characters: str | None = None) -> Expr:
        return self.strip_chars(characters)

    def lstrip(self, characters: str | None = None) -> Expr:
        return self.strip_chars_start(characters)

    def rstrip(self, characters: str | None = None) -> Expr:
        return self.strip_chars_end(characters)

    def ljust(self, length: int, fill_char: str = " ") -> Expr:
        return self.pad_end(length, fill_char)

    def rjust(self, length: int, fill_char: str = " ") -> Expr:
        return self.pad_start(length, fill_char)

    def count_match(self, pattern: str, literal: bool = False) -> Expr:
        return self.count_matches(pattern, literal)

    def strip_chars(self, characters: str | None = None) -> Expr:
        if characters is None:
            return self._e._lift(F.trim)
        cs = re.escape(characters)
        return self._e._lift(lambda c: F.regexp_replace(c, f"^[{cs}]+|[{cs}]+$", ""))

    def strip_chars_start(self, characters: str | None = None) -> Expr:
        if characters is None:
            return self._e._lift(F.ltrim)
        cs = re.escape(characters)
        return self._e._lift(lambda c: F.regexp_replace(c, f"^[{cs}]+", ""))

    def strip_chars_end(self, characters: str | None = None) -> Expr:
        if characters is None:
            return self._e._lift(F.rtrim)
        cs = re.escape(characters)
        return self._e._lift(lambda c: F.regexp_replace(c, f"[{cs}]+$", ""))

    def strip_prefix(self, prefix: str) -> Expr:
        p = re.escape(prefix)
        return self._e._lift(lambda c: F.regexp_replace(c, f"^(?:{p})", ""))

    def strip_suffix(self, suffix: str) -> Expr:
        s = re.escape(suffix)
        return self._e._lift(lambda c: F.regexp_replace(c, f"(?:{s})$", ""))

    def pad_start(self, length: int, fill_char: str = " ") -> Expr:
        # polars pad never TRUNCATES longer strings (pad_start doctest:
        # "hippopotamus" survives length 8); Spark lpad does
        return self._e._lift(lambda c: F.when(
            F.length(c) >= length, c).otherwise(F.lpad(c, length, fill_char)))

    def pad_end(self, length: int, fill_char: str = " ") -> Expr:
        return self._e._lift(lambda c: F.when(
            F.length(c) >= length, c).otherwise(F.rpad(c, length, fill_char)))

    def zfill(self, length: int) -> Expr:
        """string_expr.rb:630 — sign-aware zero fill; unlike bare lpad it
        never truncates (width <= len(s) returns s) and pads AFTER a
        leading +/- sign."""

        def f(c):
            sign = F.substring(c, 1, 1)
            signed = sign.isin("+", "-")
            padded = F.when(
                signed,
                F.concat(sign, F.lpad(F.substring(c, 2, 2147483646),
                                      max(length - 1, 0), "0"))
            ).otherwise(F.lpad(c, length, "0"))
            return F.when(F.length(c) >= length, c).otherwise(padded)

        return self._e._lift(f)

    def slice(self, offset: int, length: int | None = None) -> Expr:
        def f(c):
            if offset >= 0:
                start = F.lit(offset + 1)
            else:
                start = F.greatest(F.length(c) + offset + 1, F.lit(1))
            ln = F.lit(length) if length is not None else F.length(c)
            return F.substring(c, start, ln)

        return self._e._lift(f)

    def head(self, n: int) -> Expr:
        return self.slice(0, n)

    def tail(self, n: int) -> Expr:
        return self.slice(-n)

    def reverse(self) -> Expr:
        # grapheme-aware: code-point reverse breaks combining marks
        # ("mañana" with n+U+0303 would put the tilde on the wrong char).
        # Split into clusters (base char + following marks), reverse the
        # cluster array, re-join — all JVM-side regexp machinery.
        return self._e._lift(lambda c: F.array_join(
            F.reverse(F.regexp_extract_all(
                c, F.lit(r"(.\p{M}*)"), 1)), ""))

    # common date/datetime layouts tried IN ORDER when no format is given
    # (polars infers from the first value; a coalesce chain over the same
    # candidate set is the distributed equivalent)
    _DATE_FMTS = ("yyyy-MM-dd", "yyyy/MM/dd", "yyyy.MM.dd", "MM/dd/yyyy",
                  "dd-MM-yyyy", "dd.MM.yyyy", "yyyyMMdd")
    _TS_FMTS = ("yyyy-MM-dd HH:mm:ss.SSSSSS", "yyyy-MM-dd HH:mm:ss",
                "yyyy-MM-dd HH:mm", "yyyy/MM/dd HH:mm:ss",
                "yyyy-MM-dd'T'HH:mm:ss.SSSSSS", "yyyy-MM-dd'T'HH:mm:ss",
                "yyyy-MM-dd", "yyyy/MM/dd")

    def to_date(self, format: str | None = None) -> Expr:
        fmt = chrono_to_java(format) if format else None
        if fmt:
            return self._e._lift(
                lambda c: F.to_date(_ctime_norm(c, format), fmt))
        fmts = self._DATE_FMTS
        return self._e._lift(lambda c: F.coalesce(
            F.to_date(c), *[F.to_date(c, f) for f in fmts]))

    def to_datetime(self, format: str | None = None, time_unit=None, time_zone=None) -> Expr:
        fmt = chrono_to_java(format) if format else None
        if fmt:
            return self._e._lift(
                lambda c: F.to_timestamp(_ctime_norm(c, format), fmt))
        fmts = self._TS_FMTS
        return self._e._lift(lambda c: F.coalesce(
            F.to_timestamp(c), *[F.to_timestamp(c, f) for f in fmts]))

    def strptime(self, dtype=None, format: str | None = None,
                 strict: bool = True, exact: bool = True,
                 cache: bool = True) -> Expr:
        """string_expr.rb strptime(dtype, format:) — the first argument is
        the TARGET dtype (Date / Datetime / Time), class or instance."""
        from .datatypes import Date as _Date
        from .datatypes import Time as _Time

        base = dtype if isinstance(dtype, type) else type(dtype)
        if isinstance(dtype, str):
            base = {"date": _Date, "time": _Time}.get(dtype.lower(), None)
        if base is _Date:
            return self.to_date(format)
        if base is _Time:
            return self.to_datetime(format).dt.time()
        return self.to_datetime(format)

    def to_decimal(self, inference_length: int = 100) -> Expr:
        """Parse to Decimal, inferring the scale from the data like the
        reference (string_expr.rb:253 — "143.9" under a 2-dp column renders
        143.90).  The scale probe is a bounded one-row agg over the first
        ``inference_length`` rows."""

        def fn(c, df, part):
            probe = (df.limit(int(inference_length))
                     .select(F.max(F.length(F.regexp_extract(
                         c, r"\.(\d+)$", 1))).alias("s")).head())
            scale = int(probe["s"]) if probe and probe["s"] is not None else 0
            return c.cast(f"decimal(38,{scale})")

        return self._e._lift_ctx(fn)

    def to_time(self, format: str | None = None, strict: bool = True,
                cache: bool = True) -> Expr:
        """Parse "HH:MM:SS"-style strings to the Time dtype (ns since
        midnight; string_expr.rb:130)."""
        fmt = chrono_to_java(format) if format else "HH:mm:ss"
        return self._e._lift(lambda c: F.unix_micros(F.to_timestamp(
            F.concat(F.lit("1970-01-01 "), c),
            "yyyy-MM-dd " + fmt)) * F.lit(1000))

    def parse_int(self, radix: int = 2, strict: bool = True) -> Expr:
        # deprecated reference alias of to_integer (string_expr.rb)
        return self.to_integer(base=radix, strict=strict)

    def to_integer(self, base: int = 10, strict: bool = True) -> Expr:
        if base == 10:
            return self._e._lift(lambda c: c.cast("long"))
        # F.conv silently maps invalid digits to 0 ('ff' base 2 → 0);
        # polars yields null (strict=false) — gate on a per-base digit class
        digits = "0123456789abcdefghijklmnopqrstuvwxyz"[:base]
        pat = f"(?i)^[+-]?[{digits}]+$"
        return self._e._lift(
            lambda c: F.when(c.rlike(pat), F.conv(c, base, 10).cast("long")))

    def json_decode(self, dtype=None, infer_schema_length: int = 100) -> Expr:
        """Parse JSON strings into structs/lists (string_expr.rb:804).  With
        no dtype, the schema is inferred from the first
        ``infer_schema_length`` non-null rows (bounded driver probe, like
        the reference's own inference)."""
        if dtype is not None:
            t = to_spark_type(dtype)
            from pyspark.sql import types as T

            if isinstance(t, T.StructType):
                # null input decodes to a struct of nulls, not null
                # (string_expr.rb json_decode doctest row 2: {null,null})
                return self._e._lift(lambda c: F.when(
                    c.isNull(), F.from_json(F.lit("{}"), t)
                ).otherwise(F.from_json(c, t)))
            return self._e._lift(lambda c: F.from_json(c, t))

        def fn(c, df, part):
            rows = (df.select(c.alias("__j__")).filter(F.col("__j__").isNotNull())
                    .limit(int(infer_schema_length)).collect())
            if not rows:
                return F.lit(None)
            spark = df.sparkSession
            # merge the per-row inferred schemas by letting Spark infer over
            # the sample as a JSON dataset (handles heterogeneous keys)
            sample = spark.createDataFrame([(r["__j__"],) for r in rows],
                                           "j string")
            inferred = spark.read.json(
                sample.rdd.map(lambda r: r["j"])).schema
            return F.from_json(c, inferred)

        return self._e._lift_ctx(fn)

    def json_path_match(self, path: str) -> Expr:
        return self._e._lift(lambda c: F.get_json_object(c, path))

    def encode(self, encoding: str) -> Expr:
        if encoding == "hex":
            # polars hex encoding is lowercase; Spark's F.hex is uppercase
            return self._e._lift(lambda c: F.lower(F.hex(c)))
        if encoding == "base64":
            return self._e._lift(F.base64)
        raise ValueError(encoding)

    def decode(self, encoding: str) -> Expr:
        if encoding == "hex":
            return self._e._lift(F.unhex)
        if encoding == "base64":
            return self._e._lift(F.unbase64)
        raise ValueError(encoding)

    def join(self, delimiter: str = "", ignore_nulls: bool = True) -> Expr:
        # agg: concatenate group values IN ROW ORDER (string_expr.rb:357
        # str.join) — bare collect_list order is shuffle-fetch-dependent on
        # a cluster; nulls are skipped unless ignore_nulls=false, which
        # nulls the whole result when any value is null (polars semantics)
        def join(c):
            from .session import ROW_IDX

            pairs = F.array_sort(F.collect_list(
                F.struct(F.col(ROW_IDX).alias("i"), c.alias("v"))))
            vals = F.filter(F.transform(pairs, lambda p: p["v"]),
                            lambda x: x.isNotNull())
            out = F.array_join(vals, delimiter)
            if not ignore_nulls:
                had_null = F.exists(F.transform(pairs, lambda p: p["v"]),
                                    lambda x: x.isNull())
                out = F.when(~had_null, out)
            return out

        # order-transformed route (shift(1).str.join()): join the array
        def _arr_red(arr, df):
            out = F.array_join(
                F.filter(arr, lambda x: x.isNotNull()), delimiter)
            if not ignore_nulls:
                out = F.when(~F.exists(arr, lambda x: x.isNull()), out)
            return out

        join._arr_reduce_fn = _arr_red
        e = self._e._agg(join)
        e._needs_order = True
        return e

    concat = join

    def contains_any(self, patterns: list[str]) -> Expr:
        def f(c):
            out = F.lit(False)
            for p in patterns:
                out = out | c.contains(p)
            return out

        return self._e._lift(f)

    def replace_many(self, patterns: list[str], replace_with) -> Expr:
        # SIMULTANEOUS replacement like polars' aho-corasick (replace_many
        # doctest: swapping "you"<->"me" must not re-replace earlier
        # outputs).  Two passes: every pattern first rewrites to a unique
        # \x00<i>\x00 placeholder (placeholders cannot match any pattern),
        # then placeholders rewrite to their targets.
        if isinstance(patterns, dict):
            pats, reps = list(patterns.keys()), list(patterns.values())
        else:
            pats = list(patterns)
            reps = (list(replace_with) if isinstance(replace_with, list)
                    else [replace_with] * len(pats))

        def f(c):
            out = c
            for i, p in enumerate(pats):
                out = F.regexp_replace(out, re.escape(p), f"\x00{i}\x00")
            for i, r in enumerate(reps):
                # literal replacement: escape Java-replacement specials
                lit_r = str(r).replace("\\", "\\\\").replace("$", "\\$")
                out = F.regexp_replace(out, f"\x00{i}\x00", lit_r)
            return out

        return self._e._lift(f)


_SEC = 1_000_000  # µs


def _ctime_norm(c, chrono_fmt: str | None):
    """%c inputs carry chrono quirks Java can't parse: %e space-pads the
    day ("Jul  8") and leap-second :60 is legal — collapse runs of spaces
    and clamp :60 → :59 before the " yyyy" tail (date-identical)."""
    if chrono_fmt and "%c" in chrono_fmt:
        c = F.regexp_replace(c, "^[A-Za-z]{3} ", "")
        c = F.regexp_replace(c, "  +", " ")
        c = F.regexp_replace(c, ":60(?= \\d{4}$)", ":59")
    return c


def _ts(c):
    """Spark's unix_* functions require TIMESTAMP; naive datetimes read from
    parquet surface as TIMESTAMP_NTZ — cast (value-preserving: session tz is
    pinned UTC by session.configure; no-op on TIMESTAMP input)."""
    return c.cast("timestamp")


class DateTimeNameSpace(_NS):
    # date_time_expr.rb line refs per SURVEY §2.8

    # temporal aggregates (date_time_name_space.rb min/max/mean/median):
    # min/max are the plain aggregates; mean/median average in epoch-µs
    # and come back as timestamps (Spark's avg/percentile reject temporals)
    def min(self) -> Expr:
        return self._e.min()

    def max(self) -> Expr:
        return self._e.max()

    def mean(self) -> Expr:
        e = self._e

        def fn(df, part):
            c = F.avg(F.unix_micros(e._fn(df, part).cast("timestamp")))
            return F.timestamp_micros(c.cast("long"))

        out = Expr(fn, name=e._name, is_agg=True)
        return out._set_meta("mean", (e,))

    def median(self) -> Expr:
        e = self._e

        def fn(df, part):
            c = F.percentile(
                F.unix_micros(e._fn(df, part).cast("timestamp")), F.lit(0.5))
            return F.timestamp_micros(c.cast("long"))

        out = Expr(fn, name=e._name, is_agg=True)
        return out._set_meta("median", (e,))

    def truncate(self, every: str) -> Expr:
        dur = parse_duration(every)
        if dur.months:
            if dur.months % 12 == 0 and dur.months // 12 == 1:
                return self._e._lift(lambda c: F.date_trunc("year", c))
            if dur.months == 3:
                return self._e._lift(lambda c: F.date_trunc("quarter", c))
            if dur.months == 1:
                return self._e._lift(lambda c: F.date_trunc("month", c))
            raise ValueError(f"unsupported calendar truncate {every!r}")
        us = dur.microseconds
        simple = {86400 * _SEC: "day", 3600 * _SEC: "hour", 60 * _SEC: "minute",
                  _SEC: "second", 7 * 86400 * _SEC: "week"}
        if us in simple:
            unit = simple[us]
            return self._e._lift(lambda c: F.date_trunc(unit, c))
        # arbitrary span: floor(epoch_us / span) * span, epoch-aligned
        return self._e._lift(
            lambda c: F.timestamp_micros(
                (F.floor(F.unix_micros(_ts(c)) / us) * us).cast("long"))
        )

    def round(self, every: str) -> Expr:
        dur = parse_duration(every)
        us = dur.microseconds
        return self._e._lift(
            lambda c: F.timestamp_micros(
                (F.round(F.unix_micros(_ts(c)) / us) * us).cast("long"))
        )

    def strftime(self, fmt: str) -> Expr:
        return self._e._lift(lambda c: F.date_format(c, chrono_to_java(fmt)))

    to_string = strftime

    def year(self) -> Expr:
        return self._e._lift(lambda c: F.year(c).cast("int"))

    def iso_year(self) -> Expr:
        # ISO year = calendar year of that ISO week's Thursday ('YYYY'
        # week-year patterns are rejected by Spark 3+'s parser)
        def f(c):
            d = c.cast("date")
            isodow = (F.dayofweek(d) + 5) % 7 + 1  # Mon=1..Sun=7
            return F.year(F.date_add(d, 4 - isodow)).cast("int")

        return self._e._lift(f)

    def quarter(self) -> Expr:
        return self._e._lift(lambda c: F.quarter(c).cast("int"))

    def month(self) -> Expr:
        return self._e._lift(lambda c: F.month(c).cast("int"))

    def week(self) -> Expr:
        return self._e._lift(lambda c: F.weekofyear(c).cast("int"))

    def weekday(self) -> Expr:
        # polars: Mon=1..Sun=7 (date_time_expr.rb:487); Spark dayofweek: Sun=1
        return self._e._lift(lambda c: ((F.dayofweek(c) + 5) % 7 + 1).cast("int"))

    def day(self) -> Expr:
        return self._e._lift(lambda c: F.dayofmonth(c).cast("int"))

    def ordinal_day(self) -> Expr:
        return self._e._lift(lambda c: F.dayofyear(c).cast("int"))

    def datetime(self) -> Expr:
        # date_time_expr.rb:584 — the Datetime representation itself
        return self._e._lift(lambda c: c.cast("timestamp"))

    def combine(self, time, time_unit: str = "us") -> Expr:
        """Replace the time component with ``time`` (a Time-dtype expr of ns
        since midnight, or a datetime.time; date_time_expr.rb:217)."""
        import datetime as _dt

        if isinstance(time, _dt.time):
            ns = ((time.hour * 3600 + time.minute * 60 + time.second)
                  * 1_000_000 + time.microsecond) * 1000
            t_expr = Expr(lambda df, part: F.lit(ns))
        else:
            from .exprs import wrap_expr

            t_expr = wrap_expr(time)

        def fn(c, t):
            day_us = F.unix_micros(F.date_trunc("day", c.cast("timestamp")))
            return F.timestamp_micros(day_us + (t.cast("long") / F.lit(1000))
                                      .cast("long"))

        return self._e._lift2(t_expr, fn)

    def cast_time_unit(self, time_unit: str) -> Expr:
        # values are instants; storage is always µs here (COVERAGE.md dtype
        # policy) so a value-preserving unit cast is the identity
        return self._e._lift(lambda c: c.cast("timestamp"))

    def with_time_unit(self, time_unit: str) -> Expr:
        """REINTERPRET the stored µs count as ``time_unit`` (changes the
        instant — date_time_expr.rb:838)."""
        factor = {"ns": 0.001, "us": 1.0, "ms": 1000.0}[time_unit]
        return self._e._lift(lambda c: F.timestamp_micros(
            (F.unix_micros(_ts(c)) * F.lit(factor)).cast("long")))

    def base_utc_offset(self) -> Expr:
        # instants are stored UTC (session.configure pins UTC) → offset 0
        return self._e._lift(lambda c: F.expr("INTERVAL 0 SECONDS"))

    def dst_offset(self) -> Expr:
        return self._e._lift(lambda c: F.expr("INTERVAL 0 SECONDS"))

    def hour(self) -> Expr:
        return self._e._lift(lambda c: F.hour(c).cast("int"))

    def minute(self) -> Expr:
        return self._e._lift(lambda c: F.minute(c).cast("int"))

    def second(self, fractional: bool = False) -> Expr:
        if fractional:
            return self._e._lift(
                lambda c: (F.unix_micros(_ts(c)) % (60 * _SEC)).cast("double") / _SEC)
        return self._e._lift(lambda c: F.second(c).cast("int"))

    def millisecond(self) -> Expr:
        return self._e._lift(lambda c: ((F.unix_micros(_ts(c)) % _SEC) / 1000).cast("int"))

    def microsecond(self) -> Expr:
        return self._e._lift(lambda c: (F.unix_micros(_ts(c)) % _SEC).cast("int"))

    def nanosecond(self) -> Expr:
        return self._e._lift(lambda c: ((F.unix_micros(_ts(c)) % _SEC) * 1000).cast("long"))

    def epoch(self, time_unit: str = "us") -> Expr:
        if time_unit == "s":
            return self._e._lift(lambda c: F.unix_timestamp(_ts(c)))
        if time_unit == "ms":
            return self._e._lift(lambda c: F.unix_millis(_ts(c)))
        if time_unit == "us":
            return self._e._lift(lambda c: F.unix_micros(_ts(c)))
        if time_unit == "ns":
            return self._e._lift(lambda c: F.unix_micros(_ts(c)) * 1000)
        if time_unit == "d":
            return self._e._lift(lambda c: F.datediff(c.cast("date"), F.lit("1970-01-01")))
        raise ValueError(time_unit)

    def timestamp(self, time_unit: str = "us") -> Expr:
        return self.epoch(time_unit)

    def date(self) -> Expr:
        return self._e._lift(lambda c: c.cast("date"))

    def time(self) -> Expr:
        # nanoseconds since midnight (no Spark time type — SURVEY §1.3)
        return self._e._lift(lambda c: (F.unix_micros(_ts(c)) % (86400 * _SEC)) * 1000)

    def convert_time_zone(self, time_zone: str) -> Expr:
        return self._e._lift(lambda c: F.from_utc_timestamp(_ts(c), time_zone))

    def replace_time_zone(self, time_zone: str | None) -> Expr:
        if time_zone is None:
            return self._e._lift(lambda c: c)
        return self._e._lift(lambda c: F.to_utc_timestamp(_ts(c), time_zone))

    def offset_by(self, by: str) -> Expr:
        dur = parse_duration(by)

        def f(c):
            out = c
            if dur.months:
                # add_months returns a DATE — re-attach the time component
                # (polars calendar offsets keep time-of-day)
                out = (F.add_months(out, dur.months).cast("timestamp")
                       + self._time_of_day(out))
            if dur.microseconds:
                out = F.timestamp_micros(F.unix_micros(out.cast("timestamp")) + dur.microseconds)
            return out

        return self._e._lift(f)

    def _time_of_day(self, c):
        # polars month_start/month_end RETAIN the time component
        # (date_time_expr.rb:1317 doctest: 02:00:00 survives the roll)
        ts = c.cast("timestamp")
        return ts - F.date_trunc("day", ts)

    def month_start(self) -> Expr:
        return self._e._lift(
            lambda c: F.date_trunc("month", c) + self._time_of_day(c))

    def month_end(self) -> Expr:
        return self._e._lift(
            lambda c: F.to_timestamp(F.last_day(c)) + self._time_of_day(c))

    def is_leap_year(self) -> Expr:
        def f(c):
            y = F.year(c)
            return ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)

        return self._e._lift(f)

    # Duration accessors (date_time_expr.rb:970-1202).  Durations appear
    # either as a µs-valued Long (our Duration physical repr) or as Spark's
    # DayTimeIntervalType (the result of timestamp subtraction) — whose
    # bare long cast yields SECONDS, not µs.  Normalize to total µs first.
    def _dur_us(self) -> Expr:
        def fn(c, df, part):
            from pyspark.sql import types as T

            dt = _probe_type(df, c)
            if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType,
                               T.LongType, T.FloatType, T.DoubleType)):
                return c.cast("long")
            # any interval flavor (DayTimeInterval from timestamp
            # subtraction, CalendarInterval from make_interval): anchor at
            # epoch 0 and read back the µs offset
            return F.unix_micros(F.timestamp_micros(F.lit(0)) + c)

        return self._e._lift_ctx(fn)

    def total_days(self) -> Expr:
        return self._dur_us()._lift(lambda c: (c / (86400 * _SEC)).cast("long"))

    def total_hours(self) -> Expr:
        return self._dur_us()._lift(lambda c: (c / (3600 * _SEC)).cast("long"))

    def total_minutes(self) -> Expr:
        return self._dur_us()._lift(lambda c: (c / (60 * _SEC)).cast("long"))

    def total_seconds(self) -> Expr:
        return self._dur_us()._lift(lambda c: (c / _SEC).cast("long"))

    def total_milliseconds(self) -> Expr:
        return self._dur_us()._lift(lambda c: (c / 1000).cast("long"))

    def total_microseconds(self) -> Expr:
        return self._dur_us()._lift(lambda c: c)

    def total_nanoseconds(self) -> Expr:
        return self._dur_us()._lift(lambda c: c * 1000)

    # reference aliases (date_time_expr.rb:1163 alias_method :microseconds,
    # :total_microseconds etc.) — plural = duration total, singular = part
    days = total_days
    hours = total_hours
    minutes = total_minutes
    seconds = total_seconds
    milliseconds = total_milliseconds
    microseconds = total_microseconds
    nanoseconds = total_nanoseconds


class ListNameSpace(_NS):
    # list_expr.rb line refs per SURVEY §2.8
    def len(self) -> Expr:
        return self._e._lift(F.size)

    lengths = len

    def sum(self) -> Expr:
        # polars skips null ELEMENTS and keeps the element dtype (empty /
        # all-null list → 0) — the plain F.aggregate null-propagates
        from .exprs import _arr_reduce

        return self._e._lift_ctx(lambda c, df, part: _arr_reduce("sum", c, df))

    def max(self) -> Expr:
        return self._e._lift(F.array_max)

    def min(self) -> Expr:
        return self._e._lift(F.array_min)

    def mean(self) -> Expr:
        # null elements excluded from BOTH numerator and denominator;
        # empty / all-null list → null (0/0 under ANSI off)
        from .exprs import _arr_reduce

        return self._e._lift_ctx(lambda c, df, part: _arr_reduce("mean", c, df))

    def sort(self, descending: bool = False) -> Expr:
        if descending:
            return self._e._lift(lambda c: F.reverse(F.array_sort(c)))
        return self._e._lift(F.array_sort)

    def reverse(self) -> Expr:
        return self._e._lift(F.reverse)

    def unique(self, maintain_order: bool = False) -> Expr:
        # array_distinct keeps first-appearance order — satisfies both the
        # maintain_order=true contract and the unordered default
        return self._e._lift(F.array_distinct)

    def concat(self, other) -> Expr:
        # strings name list COLUMNS (list_expr.rb concat doctest); a list
        # of strings/exprs concatenates several
        from .exprs import col as _col

        others = other if isinstance(other, (list, tuple)) else [other]
        out = self._e
        for o in others:
            oe = _col(o) if isinstance(o, str) else wrap_expr(o)
            out = out._lift2(oe, F.concat)
        return out

    def get(self, index: int = 0, null_on_oob: bool = True) -> Expr:
        # null_on_oob accepted for signature parity (list_expr.rb:389);
        # element_at under ANSI-off already yields null out of bounds —
        # the strict (raising) mode is not expressible distributed-side.
        # index may be an expression / column name (list_expr.rb:397 uses
        # a per-row idx column); negative indices count from the end.
        if isinstance(index, int):
            if index >= 0:
                return self._e._lift(lambda c: F.element_at(c, index + 1))
            return self._e._lift(lambda c: F.element_at(c, index))
        from .exprs import as_expr

        idx = as_expr(index)
        return self._e._lift2(
            idx,
            lambda c, i: F.when(i.isNotNull(), F.element_at(
                c, F.when(i >= 0, i.cast("int") + 1).otherwise(i.cast("int")))))

    def __getitem__(self, index: int) -> Expr:
        # list_expr_test.rb: list_expr[0]
        return self.get(index)

    def gather(self, indices, null_on_oob: bool = True) -> Expr:
        # negative indices count from the end (list_expr.rb gather), like
        # get; null_on_oob accepted for parity — the strict (raising) mode
        # is not expressible distributed-side (same cap as get)
        idx = wrap_expr(indices)
        return self._e._lift2(
            idx, lambda c, ixs: F.transform(
                ixs, lambda i: F.element_at(
                    c, F.when(i >= 0, i.cast("int") + 1).otherwise(i.cast("int")))))

    def first(self) -> Expr:
        return self.get(0)

    def last(self) -> Expr:
        return self._e._lift(lambda c: F.element_at(c, -1))

    def contains(self, item) -> Expr:
        if item is None:
            # array_contains rejects NULL-typed needles; "does the list hold
            # a null" is an exists scan
            return self._e._lift(lambda c: F.exists(c, lambda x: x.isNull()))
        return self._e._lift2(wrap_expr(item), F.array_contains)

    def join(self, separator: str, ignore_nulls: bool = True) -> Expr:
        # separator may be a per-row expression (list_expr.rb join example);
        # a plain str stays a literal delimiter. array_join only takes a
        # literal delimiter, so the expression form goes through aggregate.
        if isinstance(separator, str):
            return self._e._lift(lambda c: F.array_join(c, separator))
        from .exprs import as_expr

        sep = as_expr(separator)

        def f(c, s):
            joined = F.aggregate(
                F.filter(c, lambda x: x.isNotNull()) if ignore_nulls else c,
                F.lit(""),
                lambda acc, x: F.concat(
                    acc, F.when(acc == "", x.cast("string")).otherwise(
                        F.concat(s.cast("string"), x.cast("string")))),
            )
            return F.when(c.isNotNull() & s.isNotNull(), joined)

        return self._e._lift2(sep, f)

    def arg_min(self) -> Expr:
        return self._e._lift(lambda c: F.array_position(c, F.array_min(c)).cast("long") - 1)

    def arg_max(self) -> Expr:
        return self._e._lift(lambda c: F.array_position(c, F.array_max(c)).cast("long") - 1)

    def diff(self, n: int = 1) -> Expr:
        def f(c):
            return F.transform(
                c, lambda x, i: F.when(i >= n, x - F.element_at(c, i - n + 1)))

        return self._e._lift(f)

    def shift(self, n: int = 1) -> Expr:
        def f(c):
            return F.transform(
                c, lambda x, i: F.when(i >= n, F.element_at(c, i - n + 1)))

        return self._e._lift(f)

    def slice(self, offset: int, length: int | None = None) -> Expr:
        def f(c):
            start = offset + 1 if offset >= 0 else offset
            ln = length if length is not None else (1 << 30)
            return F.slice(c, start, ln)

        return self._e._lift(f)

    def head(self, n: int = 5) -> Expr:
        return self.slice(0, n)

    def tail(self, n: int = 5) -> Expr:
        # negative start must clamp to the list head: slice([5], -2, 2)
        # starts before the list and returns [] — polars returns the whole
        # list when n >= len
        return self._e._lift(lambda c: F.slice(
            c, F.greatest(F.size(c) - F.lit(n) + 1, F.lit(1)), n))

    def count_matches(self, element) -> Expr:
        # long, not int: the reference returns u32 and our documented cap for
        # unsigned counters is i64 (SURVEY §1.3)
        v = wrap_expr(element)
        return self._e._lift2(
            v, lambda c, x: F.size(F.filter(c, lambda y: y == x)).cast("long"))

    def count_match(self, element) -> Expr:
        return self.count_matches(element)  # deprecated alias (list_expr.rb)

    def to_struct(self, n_field_strategy: str = "first_non_null", fields=None) -> Expr:
        """list_expr.rb:752 — fan a list column into positional struct fields.

        ``fields`` (list of names) fixes the width directly; otherwise the
        width comes from a ONE-ROW probe aggregate at bind time
        (``first_non_null`` → length of the first non-null list,
        ``max_width`` → max list length — the same plan-time-action trade as
        reshape's -1 inference).  Fields are ``field_N`` like polars.
        """

        def f(c, df, part):
            if fields is not None:
                names = list(fields)
            else:
                if n_field_strategy == "max_width":
                    probe = F.max(F.size(c))
                else:  # first_non_null
                    probe = F.first(F.size(c), ignorenulls=True)
                width = df.select(probe).first()[0] or 0
                names = [f"field_{i}" for i in range(width)]
            return F.struct(*[F.element_at(c, i + 1).alias(n)
                              for i, n in enumerate(names)])

        return self._e._lift_ctx(f)

    def eval(self, expr: Expr, parallel: bool = False) -> Expr:
        """list_expr.rb:787 — run an Expr over each element (Polars.element()).

        Compiles to ``F.transform`` (higher-order function, JVM-side — no
        Python UDF); ``element()`` leaves resolve to the lambda variable.

        The output list length follows polars' series semantics (round-5):
        a PURE AGGREGATE yields a one-element list ([sum]); an aggregate
        returning a series (unique/rle/mode) yields that series as the
        list; full-array order ops (shift/sort/arg_sort/diff) transform
        the list; anything touching ``element()`` per row broadcasts
        per element."""
        from .exprs import (_ELEMENT_IDX_STACK, _ELEMENT_STACK,
                            _EVAL_ARRAY_STACK, _eval_map, _probe_type)

        def f(c, df, part):
            from .exprs import _np_has_elem

            if expr._np_prog is not None and (
                    not expr._is_agg or _np_has_elem(expr._np_prog)):
                # numpy-expressible positional program (round-7): one
                # vectorized Arrow kernel call replaces the interpreted
                # per-element HOF (~10× on q150-class projections); type
                # gate falls back to the bit-identical HOF route
                from .exprs import _np_eval_column

                kern = _np_eval_column(c, expr._np_prog, df)
                if kern is not None:
                    return kern
            if expr._is_agg:
                # pure aggregate: one evaluation per list.  A MIXED
                # agg+element composition (rank/count normalizations)
                # raises on the bare element() and falls through to the
                # per-element broadcast.
                _EVAL_ARRAY_STACK.append(c)
                try:
                    r = expr._fn(df, part)
                    from pyspark.sql import types as T

                    try:
                        t = _probe_type(df, r)
                    except Exception:
                        t = None
                    return r if isinstance(t, T.ArrayType) else F.array(r)
                except RuntimeError:
                    pass  # element() outside an aggregate → broadcast
                finally:
                    _EVAL_ARRAY_STACK.pop()
            if expr._agg_list_fn is not None:
                # length-preserving full-array op: transform the list
                mapped = _eval_map(expr._agg_list_base, c, df)
                return expr._agg_list_fn(mapped)
            if expr._eval_arr_fn is not None:
                # prefix/positional ops (cum_*/diff/pct_change): list HOF
                from .exprs import _eval_vals

                mapped = _eval_vals(expr._eval_arr_base, c, df)
                return expr._eval_arr_fn(mapped, df)

            def lam(x, i):
                _ELEMENT_STACK.append(x)
                _ELEMENT_IDX_STACK.append(i)
                _EVAL_ARRAY_STACK.append(c)
                try:
                    return expr._fn(df, part)
                finally:
                    _ELEMENT_STACK.pop()
                    _ELEMENT_IDX_STACK.pop()
                    _EVAL_ARRAY_STACK.pop()

            return F.transform(c, lam)

        return self._e._lift_ctx(f)

    def all(self) -> Expr:
        # polars drops null elements (list_expr.rb all example: [nil, nil] ->
        # true), unlike Kleene forall which would yield null — "all" is "no
        # false present"
        return self._e._lift(lambda c: F.when(
            c.isNotNull(), F.size(F.filter(c, lambda x: ~x)) == 0))

    def any(self) -> Expr:
        # null elements dropped: [nil, nil] -> false (list_expr.rb any example)
        return self._e._lift(lambda c: F.when(
            c.isNotNull(), F.size(F.filter(c, lambda x: x)) > 0))

    def drop_nulls(self) -> Expr:
        return self._e._lift(lambda c: F.filter(c, lambda x: x.isNotNull()))

    def sample(self, n=1, seed: int | None = None,
               with_replacement: bool = False, fraction=None,
               shuffle: bool = False) -> Expr:
        """Sample n list elements (list_expr.rb sample): deterministic
        hash-order pick (seeded), so tasks agree under retries.  ``n`` may
        be a per-row expression / column name / Series."""
        s = 0 if seed is None else int(seed)

        def keyed_sorted(c):
            keyed = F.transform(c, lambda v, i: F.struct(
                F.xxhash64(v.cast("string"), i, F.lit(s)).alias("h"),
                v.alias("v")))
            return F.array_sort(keyed)

        if isinstance(n, int) and fraction is None:
            return self._e._lift(lambda c: F.transform(
                F.slice(keyed_sorted(c), 1, n), lambda st: st["v"]))
        from .exprs import as_expr

        if fraction is not None:
            ne = as_expr(fraction)
            return self._e._lift2(ne, lambda c, f: F.transform(
                F.slice(keyed_sorted(c), 1,
                        F.floor(F.size(c) * f).cast("int")),
                lambda st: st["v"]))
        ne = as_expr(n)
        return self._e._lift2(ne, lambda c, k: F.transform(
            F.slice(keyed_sorted(c), 1, k.cast("int")), lambda st: st["v"]))

    def explode(self) -> Expr:
        # array_expr.rb explode — one output row per element; OUTER so
        # empty/null lists keep a null row (polars semantics)
        return self._e._lift(lambda c: F.explode_outer(c))

    def to_list(self) -> Expr:
        # arr → list is a free cast (fixed width is a checked constraint)
        return self._e._lift(lambda c: c)


class StructNameSpace(_NS):
    def field(self, name: str) -> Expr:
        e = self._e._lift(lambda c: c.getField(name))
        e._name = name
        return e

    def __getitem__(self, key) -> Expr:
        # struct_expr_test.rb: integer position or field name; anything
        # else raises like the reference
        if isinstance(key, str):
            return self.field(key)
        if isinstance(key, int) and not isinstance(key, bool):
            base = self._e

            def fn(df, part):
                c = base._fn(df, part)
                st = _probe_type(df, c)
                return c.getField(st.fields[key].name)

            return Expr(fn, name=None, is_agg=base._is_agg,
                        needs_order=base._needs_order)
        raise ValueError(
            f"expected type Integer or String, got {type(key).__name__}")

    def rename_fields(self, names: list[str]) -> Expr:
        """struct_expr.rb:40 — positional re-pack with new field names; the
        current names come from the bound column's schema (driver-side
        analysis only, no action)."""

        def f(c, df, part):
            from pyspark.sql import types as T

            src = _probe_type(df, c)
            if not isinstance(src, T.StructType):
                raise ValueError("rename_fields: not a struct column")
            old = [fld.name for fld in src.fields]
            if len(names) < len(old):
                raise ValueError(
                    f"rename_fields: {len(old)} fields, got {len(names)} names")
            return F.struct(*[c.getField(o).alias(n)
                              for o, n in zip(old, names)])

        return self._e._lift_ctx(f)

    def json_encode(self) -> Expr:
        return self._e._lift(F.to_json)


class BinaryNameSpace(_NS):
    def contains(self, literal) -> Expr:
        return self._e._lift2(wrap_expr(literal), lambda c, v: c.contains(v))

    def starts_with(self, prefix) -> Expr:
        return self._e._lift2(wrap_expr(prefix), F.startswith)

    def ends_with(self, suffix) -> Expr:
        return self._e._lift2(wrap_expr(suffix), F.endswith)

    def encode(self, encoding: str) -> Expr:
        if encoding == "hex":
            # polars hex encoding is lowercase; Spark's F.hex is uppercase
            return self._e._lift(lambda c: F.lower(F.hex(c)))
        if encoding == "base64":
            return self._e._lift(F.base64)
        raise ValueError(encoding)

    def decode(self, encoding: str) -> Expr:
        if encoding == "hex":
            return self._e._lift(F.unhex)
        if encoding == "base64":
            return self._e._lift(F.unbase64)
        raise ValueError(encoding)

    def size(self) -> Expr:
        return self._e._lift(F.octet_length)


class CatNameSpace(_NS):
    def get_categories(self) -> Expr:
        """One row per category in order of first appearance
        (cat_expr.rb doctest) — row-count-changing sole-select, one hash
        groupBy carrying min(row_idx)."""
        inner = self._e

        def frame_fn(lf, out_name):
            from .frame import LazyFrame
            from .operators.row_index import with_row_index

            out_name = out_name or inner._name or "category"
            df = lf._sdf
            base = with_row_index(
                df.select(inner._fn(df, None).alias("__v__")), "__i__")
            cats = (base.filter(F.col("__v__").isNotNull())
                    .groupBy("__v__").agg(F.min("__i__").alias("__first__"))
                    .select(F.col("__v__").alias(out_name), "__first__"))
            return LazyFrame(cats).sort("__first__").drop("__first__")

        e = Expr(None, name=inner._name)
        e._frame_fn = frame_fn
        return e

    def set_ordering(self, ordering: str) -> Expr:
        return self._e._lift(lambda c: c)


class MetaNameSpace(_NS):
    """Expr introspection (meta_expr.rb) over the lightweight breadcrumb AST
    (``Expr._meta = (op, children, payload)``) attached by the central
    combinators.  Queries raise only when they hit a node built outside the
    tracked combinators (exotic construction sites)."""

    def output_name(self):
        return self._e._name

    def undo_aliases(self) -> Expr:
        # meta_expr.rb:166 — strip every rename layer; with breadcrumbs we
        # return the pre-alias child chain, else fall back to a
        # name-stripped clone.
        e = self._e
        while e._meta is not None and e._meta[0] == "alias":
            e = e._meta[1][0]
        if e is not self._e:
            return e
        out = Expr(self._e._fn, name=None, is_agg=self._e._is_agg,
                   needs_order=self._e._needs_order, multi_fn=self._e._multi_fn)
        out._meta = self._e._meta
        return out

    def has_multiple_outputs(self) -> bool:
        return self._e._multi_fn is not None

    def is_regex_projection(self) -> bool:
        # true when the ROOT projection is a ^…$ regex col (meta_expr.rb:96
        # doctest: col("^col.*$").sum() is one) — walk the breadcrumbs
        def walk(e, d=0):
            if d > 30:
                return False
            n = e._name or ""
            if n.startswith("^") and n.endswith("$"):
                return True
            m = getattr(e, "_meta", None)
            if m is None:
                return False
            op, children, payload = m
            if op == "col":
                return (isinstance(payload, str) and payload.startswith("^")
                        and payload.endswith("$"))
            return any(walk(c, d + 1) for c in children
                       if isinstance(c, Expr))

        return walk(self._e)

    def root_names(self):
        """meta_expr.rb:155 — leaf column names, first-appearance order."""
        out: list[str] = []

        def walk(e):
            m = e._meta
            if m is None:
                if getattr(e, "_is_column", False) and e._name:
                    if e._name not in out:
                        out.append(e._name)
                    return
                if e._multi_fn is not None:
                    return  # wildcard/selector leaf: no static roots
                raise NotImplementedError(
                    "meta.root_names: expression contains a node built "
                    "outside the tracked combinators")
            op, children, payload = m
            if op == "col":
                if payload not in out:
                    out.append(payload)
                return
            if op == "lit":
                return
            for c in children:
                walk(c)

        walk(self._e)
        return out

    def is_column(self) -> bool:
        # set only by a bare col("name"); any lift/combine builds a fresh
        # Expr without the flag (meta_expr.rb is_column)
        return getattr(self._e, "_is_column", False)

    def pop(self):
        """meta_expr.rb:126 — inputs of the top node (latest first)."""
        m = self._e._meta
        if m is None:
            raise NotImplementedError(
                "meta.pop: top node was built outside the tracked combinators")
        return list(reversed(m[1]))

    def tree_format(self, return_as_string: bool = False):
        """meta_expr.rb:212 — indented op tree from the breadcrumbs."""
        lines: list[str] = []

        def render(e, depth):
            pad = "  " * depth
            m = e._meta
            if m is None:
                if getattr(e, "_is_column", False):
                    label = f"col({e._name})"
                elif e._multi_fn is not None:
                    label = "all()"
                else:
                    label = f"<opaque {e._name or '?'}>"
                lines.append(pad + label)
                return
            op, children, payload = m
            if op == "col":
                lines.append(pad + f'col("{payload}")')
            elif op == "lit":
                lines.append(pad + f"lit({payload!r})")
            elif op == "alias":
                lines.append(pad + f'alias("{payload}")')
            else:
                lines.append(pad + op)
            for c in children:
                render(c, depth + 1)

        render(self._e, 0)
        s = "\n".join(lines)
        if return_as_string:
            return s
        print(s)
        return None

    def _structural_eq(self, a, b):
        """(equal?, ambiguous?) — ambiguous when an untagged function/binary
        label makes two different ops indistinguishable."""
        ma, mb = a._meta, b._meta
        if ma is None or mb is None:
            return (a is b or (a._fn is b._fn and a._name == b._name), False)
        if ma[0] != mb[0] or ma[2] != mb[2] or len(ma[1]) != len(mb[1]):
            return (False, False)
        if a._name != b._name:
            return (False, False)
        amb = ma[0] in ("function", "binary", "agg")
        for ca, cb in zip(ma[1], mb[1]):
            eq, sub_amb = self._structural_eq(ca, cb)
            if not eq:
                return (False, False)
            amb = amb or sub_amb
        return (True, amb)

    def eq(self, other) -> bool:
        oe = other._e if isinstance(other, MetaNameSpace) else other
        if self._e is oe:
            return True
        equal, ambiguous = self._structural_eq(self._e, oe)
        if not equal:
            return False
        if not ambiguous:
            return True
        # structurally identical but an untagged op could hide a difference:
        # only identity is safe
        return self._e._fn is getattr(oe, "_fn", None)

    def ne(self, other) -> bool:
        return not self.eq(other)


class NameNameSpace(_NS):
    def keep(self) -> Expr:
        # restore the ROOT column name, undoing any alias (name_expr.rb:keep
        # doctest: (col("a")+1).alias("x").name.keep → column "a") — walk the
        # breadcrumb AST to the first col leaf
        def root(m):
            if m is None:
                return None
            op, children, payload = m
            if op == "col":
                return payload
            for ch in children:
                r = root(ch._meta)
                if r is not None:
                    return r
            return None

        rn = root(self._e._meta)
        return self._e.alias(rn) if rn else self._e

    def _rename(self, f, label: str) -> Expr:
        # multi-output exprs (pl.all().reverse().name.prefix(...)) rename
        # EACH expanded column — name_expr.rb prefix/suffix doctests
        e = self._e
        if e._multi_fn is not None:
            mf = e._multi_fn
            return Expr(multi_fn=lambda df: [
                ee.alias(f(ee.output_name() or "")) for ee in mf(df)
            ])._set_meta("name." + label, (e,))
        return e.alias(f(e._name or ""))

    def map(self, function) -> Expr:
        return self._rename(function, "map")

    def prefix(self, p: str) -> Expr:
        return self._rename(lambda n: p + n, "prefix")

    def suffix(self, s: str) -> Expr:
        return self._rename(lambda n: n + s, "suffix")

    def to_lowercase(self) -> Expr:
        return self._rename(str.lower, "to_lowercase")

    def to_uppercase(self) -> Expr:
        return self._rename(str.upper, "to_uppercase")
