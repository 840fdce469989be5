"""Dtype mapping & cast policy (SURVEY §1.3): unsigned widening, decimal,
null-on-error casts, enum validation."""

import pytest

import polars_ruby_spark as pl


def test_unsigned_widening(spark):
    df = pl.from_hash({"x": [1, 2, 250]})
    out = df.lazy().select(
        pl.col("x").cast(pl.UInt8).alias("u8"),
        pl.col("x").cast(pl.UInt32).alias("u32"),
        pl.col("x").cast(pl.UInt64).alias("u64"),
    ).collect()
    sch = {f.name: f.dataType.simpleString() for f in out.to_spark().schema.fields}
    # widen-on-ingest: u8 -> short, u32 -> long, u64 -> decimal(20,0)
    assert sch == {"u8": "smallint", "u32": "bigint", "u64": "decimal(20,0)"}


def test_decimal_cast(spark):
    df = pl.from_hash({"x": [1.5, 2.25]})
    out = df.lazy().select(pl.col("x").cast(pl.Decimal(10, 2)).alias("d")).collect()
    assert out.to_spark().schema["d"].dataType.simpleString() == "decimal(10,2)"


def test_datetime_ns_truncates_to_us(spark):
    out = pl.from_hash({"s": ["2024-01-02 03:04:05.123456"]}).lazy().select(
        pl.col("s").cast(pl.Datetime).alias("t")).collect()
    assert out.to_spark().schema["t"].dataType.simpleString() == "timestamp"


def test_enum_validation():
    with pytest.raises(ValueError):
        pl.Enum(["a", "a"])
    with pytest.raises(ValueError):
        pl.Enum(["a", None])
    e = pl.Enum(["a", "b"])
    assert e.to_spark().simpleString() == "string"


def test_overflow_cast_is_null_not_error(spark):
    df = pl.from_hash({"x": [300]})
    out = df.lazy().select(pl.col("x").cast(pl.Int8).alias("b")).collect()
    # ANSI off: overflow wraps or nulls, but never raises (polars strict=False)
    assert out.height == 1


def test_time_dtype_casts(spark):
    """Time = ns since midnight (Int64 physical). Casts from Datetime and
    HH:MM:SS strings; dt.time() extracts time-of-day."""
    import datetime as dt

    df = pl.from_hash({
        "ts": [dt.datetime(2024, 5, 1, 12, 30, 15, 250000)],
        "s": ["01:02:03.5"],
    })
    row = df.select(
        pl.col("ts").cast(pl.Time).alias("t_ts"),
        pl.col("s").cast(pl.Time).alias("t_s"),
        pl.col("ts").dt.time().alias("t_dt"),
    ).collect().to_a()[0]
    assert row["t_ts"] == ((12 * 3600 + 30 * 60 + 15) * 1_000_000 + 250000) * 1000
    assert row["t_s"] == ((1 * 3600 + 2 * 60 + 3) * 1_000_000 + 500000) * 1000
    assert row["t_dt"] == row["t_ts"]


def test_to_physical_temporal_ints(spark):
    """to_physical (expr.rb:178): Date → epoch days, Datetime → epoch µs;
    non-temporal passes through."""
    import datetime as dt

    df = pl.DataFrame({"d": [dt.date(1970, 1, 3)],
                       "t": [dt.datetime(1970, 1, 1, 0, 0, 1)],
                       "s": ["x"]})
    out = df.select(*[pl.col(c).to_physical().alias(c)
                      for c in ["d", "t", "s"]]).to_a()[0]
    assert out == {"d": 2, "t": 1_000_000, "s": "x"}


def test_reference_doctest_parity_str_dt_list(spark):
    """Literal expectations lifted from reference doctests — edge semantics
    the DuckDB oracle queries don't exercise (string_expr.rb:630 zfill sign
    handling, :1140 splitn padding, date_time_expr.rb:1317 month_end,
    list slicing/set ops)."""
    import datetime as dtm

    import polars_ruby_spark as pl

    # zfill (string_expr.rb:630): sign-aware, no-op when width <= len, null
    df = pl.from_hash({"a": ["-1", "123", "999999", None]})
    out = df.lazy().select(pl.col("a").str.zfill(4).alias("z")).collect().to_a()
    assert [r["z"] for r in out] == ["-001", "0123", "999999", None]

    # splitn (string_expr.rb:1140): struct fields, null padding, remainder
    df = pl.from_hash({"s": ["foo bar", None, "foo-bar", "foo bar baz"]})
    out = df.lazy().select(pl.col("s").str.splitn(" ", 2).alias("f")).collect().to_a()
    got = [(r["f"]["field_0"], r["f"]["field_1"]) if r["f"] is not None
           else None for r in out]
    assert got[0] == ("foo", "bar")
    assert got[1] in (None, (None, None))       # null row
    assert got[2] == ("foo-bar", None)          # no split point
    assert got[3] == ("foo", "bar baz")         # remainder in last field

    # month_end (date_time_expr.rb:1317): clamps to last day, keeps time
    df = pl.from_hash({"d": [dtm.datetime(2000, 1, 15, 2), dtm.datetime(2000, 2, 1, 2),
                             dtm.datetime(2000, 4, 30, 2)]})
    out = df.lazy().select(pl.col("d").dt.month_end().alias("e")).collect().to_a()
    assert [r["e"] for r in out] == [dtm.datetime(2000, 1, 31, 2),
                                     dtm.datetime(2000, 2, 29, 2),
                                     dtm.datetime(2000, 4, 30, 2)]

    # list ops (list_expr.rb): head/tail/slice/diff/unique-set semantics
    df = pl.from_hash({"l": [[1, 2, 3, 4], [5]]})
    out = df.lazy().select(
        pl.col("l").list.slice(1, 2).alias("sl"),
        pl.col("l").list.head(2).alias("h"),
        pl.col("l").list.tail(2).alias("t"),
        pl.col("l").list.diff().alias("d"),
    ).collect().to_a()
    assert out[0]["sl"] == [2, 3] and out[1]["sl"] == []
    assert out[0]["h"] == [1, 2] and out[1]["h"] == [5]
    assert out[0]["t"] == [3, 4] and out[1]["t"] == [5]
    assert out[0]["d"] == [None, 1, 1, 1]

    # strip_chars family (string_expr.rb): custom char set, not substring
    df = pl.from_hash({"s": ["xxabcxx", "  hi  "]})
    out = df.lazy().select(
        pl.col("s").str.strip_chars("x").alias("c"),
        pl.col("s").str.strip_chars().alias("w"),
    ).collect().to_a()
    assert out[0]["c"] == "abc"
    assert out[1]["w"] == "hi"


def test_reference_doctest_parity_batch2(spark):
    """Second doctest-harvest batch: dt.offset_by combos/negatives
    (date_time_expr.rb:1213), month-end clamping, list.gather negatives,
    str.find, when-without-otherwise null branch, mod/floordiv sign
    conventions."""
    import datetime as dtm

    import polars_ruby_spark as pl

    # offset_by: calendar-aware, combined units, single leading minus
    df = pl.from_hash({"d": [dtm.datetime(2000, 1, 1), dtm.datetime(2020, 1, 31)]})
    out = df.lazy().select(
        pl.col("d").dt.offset_by("1y").alias("p1y"),
        pl.col("d").dt.offset_by("-1y2mo").alias("m1y2mo"),
        pl.col("d").dt.offset_by("1mo").alias("p1mo"),
    ).collect().to_a()
    assert out[0]["p1y"] == dtm.datetime(2001, 1, 1)
    assert out[0]["m1y2mo"] == dtm.datetime(1998, 11, 1)
    # month-end clamp: Jan 31 + 1mo → Feb 29 (2020 is a leap year)
    assert out[1]["p1mo"] == dtm.datetime(2020, 2, 29)

    # list.gather: negative indices count from the end
    df = pl.from_hash({"l": [[10, 20, 30, 40]]})
    out = df.lazy().select(
        pl.col("l").list.gather([0, -1]).alias("g")).collect().to_a()
    assert out[0]["g"] == [10, 40]

    # when without otherwise → null branch (whenthen.rb)
    df = pl.from_hash({"x": [1, 5]})
    out = df.lazy().select(
        pl.when(pl.col("x") > 3).then(pl.lit("big")).alias("b")).collect().to_a()
    assert [r["b"] for r in out] == [None, "big"]

    # arithmetic conventions: % sign-of-divisor (python/polars), floordiv
    # floors toward -inf, int div-by-zero → null
    df = pl.from_hash({"a": [-5, 5, -5], "b": [3, -3, 0]})
    out = df.lazy().select(
        (pl.col("a") % pl.col("b")).alias("m"),
        (pl.col("a") // pl.col("b")).alias("fd"),
    ).collect().to_a()
    assert [r["m"] for r in out] == [1, -1, None]
    assert [r["fd"] for r in out] == [-2, -2, None]


def test_reference_doctest_parity_batch3(spark):
    """Third harvest batch: to_integer digit validation (string_expr.rb:1317),
    contains_any/replace_many, dt.truncate/round, bin/cat roundtrips."""
    import polars_ruby_spark as pl

    # to_integer: invalid digits for the base → null (conv would give 0)
    df = pl.from_hash({"s": ["110", "ff", "fa1e", None]})
    out = df.lazy().select(
        pl.col("s").str.to_integer(base=16).alias("h"),
        pl.col("s").str.to_integer(base=2, strict=False).alias("b"),
    ).collect().to_a()
    assert [r["h"] for r in out] == [272, 255, 64030, None]
    assert [r["b"] for r in out] == [6, None, None, None]

    # contains_any / replace_many (Aho-Corasick multi-pattern surface)
    df = pl.from_hash({"s": ["disco", "rhap", None]})
    out = df.lazy().select(
        pl.col("s").str.contains_any(["disc", "ap"]).alias("c"),
        pl.col("s").str.replace_many(["is", "ap"], ["IS", "AP"]).alias("r"),
    ).collect().to_a()
    assert [r["c"] for r in out] == [True, True, None]
    assert [r["r"] for r in out] == ["dISco", "rhAP", None]

    # bin encode/decode roundtrip
    df = pl.from_hash({"s": ["abc"]})
    out = df.lazy().select(
        pl.col("s").cast(pl.Binary).bin.encode("hex").alias("h"),
        pl.col("s").cast(pl.Binary).bin.encode("base64").alias("b64"),
    ).collect().to_a()
    assert out[0]["h"] == "616263"
    assert out[0]["b64"].strip() == "YWJj"


def test_reference_doctest_parity_batch4(spark):
    """Fourth harvest batch: clip null preservation, Series.arg_max scalar,
    dt.to_string/strftime chrono formats, struct.json_encode."""
    import polars_ruby_spark as pl

    # clip: null values stay null (greatest/least skip nulls and would
    # return the bound)
    out = pl.from_hash({"x": [-2, 5, None]}).lazy().select(
        pl.col("x").clip(0, 3).alias("c")).collect().to_a()
    assert [r["c"] for r in out] == [0, 3, None]

    # Series arg_max/arg_min return scalars (series.rb)
    s = pl.Series("v", [3, 1, 2])
    assert s.arg_max() == 0
    assert s.arg_min() == 1

    # struct.json_encode
    out = pl.from_hash({"a": [{"x": 1, "y": "q"}]}).lazy().select(
        pl.col("a").struct.json_encode().alias("j")).collect().to_a()
    import json as _json
    assert _json.loads(out[0]["j"]) == {"x": 1, "y": "q"}


def test_reference_doctest_parity_batch5(spark):
    """Fifth harvest batch: explode keeps empty/null rows, rank leaves nulls
    unranked, n_unique counts null, cum_sum over booleans, multi-value mode
    (expr.rb:1178), list.unique(maintain_order)."""
    import polars_ruby_spark as pl

    # explode: empty and null lists yield a null row each (not dropped)
    df = pl.from_hash({"i": [1, 2, 3], "l": [[10, 20], [], None]})
    out = df.lazy().select(pl.col("i"), pl.col("l").explode().alias("e")).collect().to_a()
    assert [(r["i"], r["e"]) for r in out] == [(1, 10), (1, 20), (2, None), (3, None)]

    # rank: nulls stay null; non-null ranks unaffected by null count
    d = pl.from_hash({"i": [0, 1, 2, 3, 4], "x": [1.0, 1.0, 2.0, None, None]})
    out = d.lazy().select(pl.col("i"), pl.col("x").rank().alias("r")).sort("i").collect().to_a()
    assert [r["r"] for r in out] == [1.5, 1.5, 3.0, None, None]

    # n_unique: null is a distinct value (polars)
    assert d.lazy().select(pl.col("x").n_unique().alias("c")).collect().to_a() == [{"c": 3}]
    g = pl.from_hash({"g": ["a", "a", "b"], "x": [1, None, 2]})
    out = g.lazy().group_by("g").agg(pl.col("x").n_unique().alias("c")).sort("g").collect().to_a()
    assert [r["c"] for r in out] == [2, 1]

    # cum_sum over booleans = running count of trues
    out = pl.from_hash({"b": [True, False, True]}).lazy().select(
        pl.col("b").cum_sum().alias("c")).collect().to_a()
    assert [r["c"] for r in out] == [1, 1, 2]

    # mode: ALL most-occurring values, one row each (sole select), sorted;
    # list per group under agg
    out = pl.from_hash({"x": [1, 1, 2, 2, 3]}).lazy().select(
        pl.col("x").mode().alias("m")).collect().to_a()
    assert [r["m"] for r in out] == [1, 2]
    out = pl.from_hash({"g": ["a", "a", "a", "b"], "x": [1, 1, 2, 5]}).lazy() \
        .group_by("g").agg(pl.col("x").mode().alias("m")).sort("g").collect().to_a()
    assert [r["m"] for r in out] == [[1], [5]]

    # list.unique accepts maintain_order and keeps first appearance
    out = pl.from_hash({"l": [[3, 1, 3, 2]]}).lazy().select(
        pl.col("l").list.unique(maintain_order=True).alias("u")).collect().to_a()
    assert out[0]["u"] == [3, 1, 2]


def test_chrono_nopad_directives(spark):
    """chrono %-d/%-m/%-H no-pad modifiers → Java single-letter patterns."""
    import datetime as dtm

    import polars_ruby_spark as pl

    d = pl.from_hash({"t": [dtm.datetime(2024, 3, 5, 9, 7, 9)]})
    out = d.lazy().select(
        pl.col("t").dt.to_string("%-d/%-m/%Y").alias("a"),
        pl.col("t").dt.to_string("%-H:%M").alias("b"),
    ).collect().to_a()[0]
    assert out["a"] == "5/3/2024"
    assert out["b"] == "9:07"


def test_reference_doctest_parity_batch6(spark):
    """Sixth harvest batch: int pow stays int (expr.rb:3535), log-family
    domain (NaN below, -inf at the boundary), unique_counts in order of
    appearance (expr.rb:6544), diff(null_behavior: "drop") drops the prefix,
    extend_constant, sole-select arg_where (functions/lazy.rb:1092),
    shrink_dtype extrema cast (expr.rb:6744), value_counts field naming
    under alias, empty Series."""
    import math

    import polars_ruby_spark as pl

    # int ** int stays integer; float exponent → f64
    out = pl.from_hash({"x": [1, 2, 4, 8]}).lazy().select(
        (pl.col("x") ** 3).alias("cube"),
        pl.col("x").pow(pl.col("x").log(2)).alias("xl")).collect()
    assert [r["cube"] for r in out.to_a()] == [1, 8, 64, 512]
    assert "Long" in str(out.schema["cube"]) or "Int64" in str(out.schema["cube"])
    assert [r["xl"] for r in out.to_a()] == [1.0, 2.0, 16.0, 512.0]

    # log family: negative → NaN, zero → -inf (log1p shifted by one)
    out = pl.from_hash({"a": [-1.0, 0.0, 8.0, None]}).lazy().select(
        pl.col("a").log().alias("l"), pl.col("a").log(2).alias("l2"),
        pl.col("a").log10().alias("l10"), pl.col("a").log1p().alias("lp"),
    ).collect().to_a()
    assert math.isnan(out[0]["l"]) and math.isnan(out[0]["l2"]) and math.isnan(out[0]["l10"])
    assert out[0]["lp"] == float("-inf")          # log1p(-1) = log(0)
    assert out[1]["l"] == float("-inf") and out[1]["l2"] == float("-inf")
    assert out[2]["l2"] == 3.0
    assert all(v is None for v in out[3].values())
    lp = pl.from_hash({"a": [-2.0]}).lazy().select(
        pl.col("a").log1p().alias("c")).collect().to_a()
    assert math.isnan(lp[0]["c"])

    # unique_counts: one row per unique value, order of first appearance
    out = pl.from_hash({"id": ["a", "b", "b", "c", "c", "c"]}).lazy().select(
        pl.col("id").unique_counts()).collect().to_a()
    assert [r["id"] for r in out] == [1, 2, 3]

    # diff(null_behavior: "drop") removes the n-row prefix
    out = pl.from_hash({"a": [10, 20, 35]}).lazy().select(
        pl.col("a").diff(null_behavior="drop").alias("c")).collect().to_a()
    assert [r["c"] for r in out] == [10, 15]

    # extend_constant appends n constant rows
    out = pl.from_hash({"a": [1, 2]}).lazy().select(
        pl.col("a").extend_constant(99, 2).alias("c")).collect().to_a()
    assert [r["c"] for r in out] == [1, 2, 99, 99]

    # sole-select arg_where → one row per matching index, named after root
    out = pl.from_hash({"a": [1, 2, 3, 4, 5]}).lazy().select(
        pl.arg_where(pl.col("a") % 2 == 0)).collect().to_a()
    assert out == [{"a": 1}, {"a": 3}]

    # shrink_dtype: ints by extrema, f64 → f32, str unchanged (multi-expr)
    out = pl.from_hash({"a": [1, 2, 3], "b": [1, 2, 2 << 32],
                        "c": [-1, 2, 1 << 30], "d": [-112, 2, 112],
                        "e": [-112, 2, 129], "g": [0.1, 1.32, 0.12]}) \
        .lazy().select(pl.all_().shrink_dtype()).collect()
    got = {k: str(out.schema[k]) for k in ["a", "b", "c", "d", "e", "g"]}
    assert "Byte" in got["a"] or "Int8" in got["a"]
    assert "Long" in got["b"] or "Int64" in got["b"]
    assert "Integer" in got["c"] or "Int32" in got["c"]
    assert "Byte" in got["d"] and ("Short" in got["e"] or "Int16" in got["e"])
    assert "Float" in got["g"] and "Double" not in got["g"]
    assert [r["a"] for r in out.to_a()] == [1, 2, 3]

    # value_counts: alias renames the outer column, value field keeps source name
    out = pl.from_hash({"a": ["x", "x", "y"]}).lazy().select(
        pl.col("a").value_counts().alias("c")).collect().to_a()
    assert sorted((r["c"]["a"], r["c"]["count"]) for r in out) == [("x", 2), ("y", 1)]

    # empty Series: Null dtype default, is_empty
    s = pl.Series("a", [])
    assert s.is_empty() and s.len() == 0
    # Series.to_a converts struct rows to plain dicts
    assert pl.from_hash({"a": [1], "b": ["x"]}).to_struct("s").to_a() == \
        [{"a": 1, "b": "x"}]


def test_reference_doctest_parity_batch7(spark):
    """Seventh harvest batch: boolean aggregates (sum counts trues, mean is
    the true-fraction), integer product stays integer, drop_nulls/drop_nans
    as row-count-changing sole selects (expr.rb:893), per-key sort_by
    directions, concat_str varargs + ignore_nulls, repeat/ones/zeros eager
    Series (functions/repeat.rb:37), str.to_decimal scale inference
    (string_expr.rb:253), frame-level bool aggs."""
    import math

    import polars_ruby_spark as pl

    out = pl.from_hash({"b": [True, False, True, None]}).lazy().select(
        pl.col("b").sum().alias("s"), pl.col("b").mean().alias("m"),
        pl.col("b").min().alias("mn"), pl.col("b").max().alias("mx"),
    ).collect().to_a()[0]
    assert out["s"] == 2 and abs(out["m"] - 2 / 3) < 1e-12
    assert out["mn"] is False and out["mx"] is True
    g = pl.from_hash({"g": ["a", "a", "b"], "b": [True, True, False]}).lazy() \
        .group_by("g").agg(pl.col("b").sum().alias("s")).sort("g").collect().to_a()
    assert [r["s"] for r in g] == [2, 0]

    p = pl.from_hash({"a": [2, 3, 4]}).lazy().select(
        pl.col("a").product().alias("p")).collect()
    assert p.to_a() == [{"p": 24}] and "Long" in str(p.schema["p"])

    # drop_nulls / drop_nans: fewer rows out of a sole select
    assert [r["a"] for r in pl.from_hash({"a": [1, None, 3]}).lazy().select(
        pl.col("a").drop_nulls()).collect().to_a()] == [1.0, 3.0]
    nans = pl.from_hash({"a": [1.0, -1.0, 3.0]}).lazy().select(
        pl.col("a").sqrt().drop_nans().alias("c")).collect().to_a()
    assert [r["c"] for r in nans] == [1.0, math.sqrt(3.0)]

    # sort_by: per-key directions, stability, grouped over()
    out = pl.from_hash({"g": [1, 1, 2], "v": ["b", "a", "c"], "o": [1, 2, 3]}) \
        .lazy().select(pl.col("v").sort_by(["g", "o"], descending=[False, True])
                       .alias("s")).collect().to_a()
    assert [r["s"] for r in out] == ["a", "b", "c"]
    out = pl.from_hash({"g": ["x", "x", "y", "y"], "v": [1, 2, 3, 4],
                        "o": [2, 1, 2, 1]}).lazy().select(
        pl.col("v").sort_by("o").over("g").alias("s")).collect().to_a()
    assert [r["s"] for r in out] == [2, 1, 4, 3]

    # concat_str: varargs form + ignore_nulls
    d = pl.from_hash({"a": ["x", None], "b": ["y", "z"]})
    assert [r["c"] for r in d.lazy().select(pl.concat_str(
        pl.col("a"), pl.col("b"), separator="-").alias("c")).collect().to_a()] \
        == ["x-y", None]
    assert [r["c"] for r in d.lazy().select(pl.concat_str(
        [pl.col("a"), pl.col("b")], separator="-", ignore_nulls=True)
        .alias("c")).collect().to_a()] == ["x-y", "z"]

    # repeat/ones/zeros: eager → named Series, dtype honored
    s = pl.repeat(3, 3, dtype=pl.Int8, eager=True)
    assert s.to_a() == [3, 3, 3] and s.name == "repeat" and "Byte" in str(s.dtype)
    assert pl.ones(2).name == "ones" and pl.ones(2).to_a() == [1.0, 1.0]
    assert pl.zeros(2).to_a() == [0.0, 0.0]

    # str.to_decimal infers scale from the data
    dec = pl.from_hash({"n": ["40.12", "143.9"]}).lazy().select(
        pl.col("n").str.to_decimal().alias("d")).collect().to_a()
    assert [str(r["d"]) for r in dec] == ["40.12", "143.90"]

    # frame-level sum/mean include booleans
    assert pl.from_hash({"b": [True, False], "x": [1.0, 3.0]}).mean().to_a() \
        == [{"b": 0.5, "x": 2.0}]
    assert pl.from_hash({"b": [True, True, False]}).sum().to_a() == [{"b": 2}]


def test_reference_doctest_parity_batch8(spark):
    """Eighth harvest batch: the functions-module builtin-len shadow broke
    pl.sum/min/max single-column and pl.format entirely; extract_all on
    group-less patterns (string_expr.rb:975), json_decode schema inference
    (string_expr.rb:804), list.contains(nil), list.get null_on_oob kwarg,
    cat.get_categories one row per category in appearance order."""
    import polars_ruby_spark as pl

    d = pl.from_hash({"a": [1, 2], "b": [3, 4]})
    assert d.lazy().select(pl.sum("a")).collect().to_a() == [{"a": 3}]
    assert d.lazy().select(pl.min("a"), pl.max("b").alias("mb")) \
        .collect().to_a() == [{"a": 1, "mb": 4}]
    assert pl.from_hash({"a": ["x"], "n": [2]}).lazy().select(
        pl.format("{}-{}", pl.col("a"), pl.col("n")).alias("c")
    ).collect().to_a() == [{"c": "x-2"}]

    out = pl.from_hash({"foo": ["123 bla 45 asd", "xyz 678 910t"]}).lazy() \
        .select(pl.col("foo").str.extract_all(r"(\d+)").alias("e")).collect().to_a()
    assert [r["e"] for r in out] == [["123", "45"], ["678", "910"]]

    j = pl.from_hash({"j": ['{"a": 1, "b": [1,2]}', '{"a": 2, "b": []}']}) \
        .lazy().select(pl.col("j").str.json_decode().alias("c")).collect().to_a()
    assert j[0]["c"] == {"a": 1, "b": [1, 2]} and j[1]["c"] == {"a": 2, "b": []}

    out = pl.from_hash({"l": [[1, None], [2, 3]]}).lazy().select(
        pl.col("l").list.contains(None).alias("c")).collect().to_a()
    assert [r["c"] for r in out] == [True, False]
    assert pl.from_hash({"l": [[1, 2]]}).lazy().select(
        pl.col("l").list.get(5, null_on_oob=True).alias("c")
    ).collect().to_a() == [{"c": None}]

    cats = pl.from_hash({"s": ["b", "a", "b", "c"]}).lazy().select(
        pl.col("s").cast(pl.Categorical).cat.get_categories()).collect().to_a()
    assert [r["s"] for r in cats] == ["b", "a", "c"]


def test_reference_doctest_parity_batch9(spark):
    """Ninth harvest batch: lazy ranges are Exprs (functions/range/*.rb) with
    eager=true yielding named Series; Polars.all("col") vertical AND
    (vertical.rb:44); name.keep restores the root name; Series-level struct
    namespace (struct_name_space.rb fields/schema/unnest); Series cat
    is_local/to_local; arg_sort_by named after its first key."""
    import datetime as dt

    import polars_ruby_spark as pl

    # lazy range Expr → sole-select generator; eager → Series of values
    dr = pl.select(pl.datetime_range(dt.datetime(2024, 1, 1),
                                     dt.datetime(2024, 1, 2), "6h").alias("t"))
    assert len(dr.to_a()) == 5
    s = pl.date_range(dt.date(2024, 1, 1), dt.date(2024, 1, 3), "1d", eager=True)
    assert s.to_a() == [dt.date(2024, 1, 1), dt.date(2024, 1, 2), dt.date(2024, 1, 3)]
    assert s.name == "date"

    # Polars.all(name) / any(name): vertical boolean aggregates
    out = pl.from_hash({"b": [True, False]}).lazy().select(
        pl.any("b").alias("a"), pl.all("b").alias("l")).collect().to_a()
    assert out == [{"a": True, "l": False}]
    # bare all() still expands every column
    assert pl.from_hash({"a": [1], "b": [2]}).lazy().select(pl.all()) \
        .collect().columns == ["a", "b"]

    # name.keep undoes aliasing back to the root column
    assert pl.from_hash({"Alpha": [1]}).lazy().select(
        (pl.col("Alpha") + 1).alias("x").name.keep()).collect().columns == ["Alpha"]

    # Series struct namespace: property fields/schema, unnest to a frame
    ss = pl.Series("a", [{"x": 1, "y": "q"}])
    assert ss.struct.fields == ["x", "y"]
    assert list(ss.struct.schema.keys()) == ["x", "y"]
    assert ss.struct.unnest().columns == ["x", "y"]
    assert ss.struct.field("x").to_a() == [1]

    # cat: every categorical is local in this engine
    sc = pl.Series("s", ["b", "a", "b"]).cast(pl.Categorical)
    assert sc.cat.is_local() is True
    assert sc.cat.to_local().to_a() == ["b", "a", "b"]
    assert sc.cat.get_categories().to_a() == ["b", "a"]

    # arg_sort_by takes its first key's name
    out = pl.from_hash({"v": [3, 1, 2]}).lazy().select(
        pl.arg_sort_by("v")).collect().to_a()
    assert out == [{"v": 1}, {"v": 2}, {"v": 0}]


def test_reference_doctest_parity_batch10(spark):
    """Tenth harvest batch (Series sweep): rank/rolling_*_by preserve frame
    row order (WindowExec leaves rows value-sorted — now restored via the
    hidden index); Series head/tail/limit/slice/top_k/unique/arg_unique/
    take/filter/dot are flat row ops, not agg-context lists; Series
    count/product/entropy/skew return scalars."""
    import polars_ruby_spark as pl

    # rank preserves the original row order in every binding context
    assert pl.Series("a", [3, 6, 1, 1, 6]).rank().to_a() == \
        [3.0, 4.5, 1.5, 1.5, 4.5]
    d = pl.from_hash({"i": [0, 1, 2], "x": [3.0, 1.0, 2.0]})
    assert [r["r"] for r in d.lazy().with_columns(
        pl.col("x").rank().alias("r")).collect().to_a()] == [3.0, 1.0, 2.0]
    g = pl.from_hash({"g": ["a", "b", "a", "b"], "x": [2.0, 5.0, 1.0, 4.0]})
    assert [r["r"] for r in g.lazy().select(
        pl.col("x").rank().over("g").alias("r")).collect().to_a()] == \
        [2.0, 2.0, 1.0, 1.0]

    s = pl.Series("a", [1, 2, 3])
    assert s.head(2).to_a() == [1, 2] and s.tail(2).to_a() == [2, 3]
    assert s.limit(2).to_a() == [1, 2] and s.slice(1, 2).to_a() == [2, 3]
    assert pl.Series("a", [3, 1, 2]).top_k(2).to_a() == [3, 2]
    assert pl.Series("a", [3, 1, 2]).bottom_k(2).to_a() == [1, 2]
    assert sorted(pl.Series("a", [1, 1, 2]).unique().to_a()) == [1, 2]
    assert pl.Series("a", [1, 1, 2]).arg_unique().to_a() == [0, 2]
    assert pl.Series("a", [10, 20, 30]).take([2, 0]).to_a() == [30, 10]
    assert pl.Series("a", [10, 20, 30]).take([-1]).to_a() == [30]
    assert s.filter(pl.Series("m", [True, False, True])).to_a() == [1, 3]
    assert s.filter([False, True, True]).to_a() == [2, 3]
    assert s.dot(pl.Series("b", [4, 5, 6])) == 32
    assert s.count() == 3
    assert pl.Series("a", [2, 3, 4]).product() == 24
    # Series entropy default is normalize=False (series.rb:1144) — pass
    # normalize explicitly for the distributional form
    assert abs(pl.Series("a", [1.0, 1.0]).entropy(base=2, normalize=True)
               - 1.0) < 1e-12
    assert pl.Series("a", [1.0, 1.0]).entropy(base=2) == 0.0
    assert abs(pl.Series("a", [1.0, 2.0, 3.0, 10.0]).skew() - 1.01823) < 1e-4


def test_duration_total_units(spark):
    """date_time_expr.rb:970 duration accessors: a DayTimeInterval's bare
    long cast is SECONDS, not µs — totals must normalize via epoch µs.
    Covers interval-from-subtraction AND make_interval (pl.duration)."""
    import datetime as dtm

    import polars_ruby_spark as pl

    d = pl.from_hash({"a": [dtm.datetime(2024, 1, 3, 12)],
                      "b": [dtm.datetime(2024, 1, 1)]})
    dur = pl.col("a") - pl.col("b")
    out = d.lazy().select(
        dur.dt.total_days().alias("d"), dur.dt.total_hours().alias("h"),
        dur.dt.total_minutes().alias("m"), dur.dt.total_seconds().alias("s"),
        dur.dt.total_milliseconds().alias("ms"),
        dur.dt.total_microseconds().alias("us"),
        dur.dt.total_nanoseconds().alias("ns"),
    ).collect().to_a()[0]
    assert out == {"d": 2, "h": 60, "m": 3600, "s": 216000,
                   "ms": 216000000, "us": 216000000000,
                   "ns": 216000000000000}
    assert d.lazy().select(pl.duration(days=1, hours=12).dt.total_hours()
                           .alias("h")).collect().to_a() == [{"h": 36}]


def test_reference_doctest_parity_batch14(spark):
    """Fourteenth harvest batch (series_test.rb sweep): struct field
    subscript, inner_dtype, xor + reflected arithmetic, positional
    get/set ([], []=), in_place variants (rename/sort/rechunk),
    estimated_size(unit), scalar nan_max/search_sorted, quantile bounds,
    entropy Series defaults (base e, normalize false — series.rb:1144),
    empty sum = 0, map_elements return-dtype inference, sorted flags,
    datelike division raise, polars repr format."""
    import datetime as dtm

    import pytest as _pytest

    import polars_ruby_spark as pl

    S = pl.Series
    s = S([{"f1": 1}, {"f1": 2}])
    assert s.struct["f1"].to_a() == [1, 2]
    nested = S([{"a": {"b": {"c": 1}}}, {"a": {"b": {"c": 2}}}])
    assert nested.struct["a"].struct["b"].struct["c"].to_a() == [1, 2]

    assert S([1, 2, 3]).inner_dtype is None
    assert S([[1, 2], [3]]).inner_dtype.typeName() == "long"

    a = S([True, True, False, False])
    b = S([True, False, True, False])
    assert (a ^ b).to_a() == [False, True, True, False]

    x = S([10, 20, 30])
    assert (5 + x).to_a() == [15, 25, 35]
    assert (35 - x).to_a() == [25, 15, 5]
    assert (5 * x).to_a() == [50, 100, 150]
    assert (5 % x).to_a() == [5, 5, 5]

    g = S(range(1, 4))
    assert g[1] == 2 and g[-1] == 3
    assert g[[0, 1]].to_a() == [1, 2]
    assert g[S([0, 1])].to_a() == [1, 2]
    assert g[0:2].to_a() == [1, 2]
    assert g[0:-1].to_a() == [1, 2]
    assert g[1:].to_a() == [2, 3]
    assert g[3:3].to_a() == []

    st = S(range(1, 4))
    st[1] = 9
    assert st.to_a() == [1, 9, 3]
    st[[0, 2]] = 2
    assert st.to_a() == [2, 9, 2]
    st[1:3] = 4
    assert st.to_a() == [2, 4, 4]
    st[[0, 1]] = [7, 8]
    assert st.to_a() == [7, 8, 4]

    r = S("a", [1, 2, 3])
    r.rename("c", in_place=True)
    assert r.name == "c"
    srt = S([2, 3, 1])
    assert srt.sort().to_a() == [1, 2, 3] and srt.to_a() == [2, 3, 1]
    srt.sort(in_place=True)
    assert srt.to_a() == [1, 2, 3] and srt.flags["SORTED_ASC"]
    srt.sort(reverse=True, in_place=True)
    assert srt.flags["SORTED_DESC"] and not srt.flags["SORTED_ASC"]
    assert S([1, 2, 3]).set_sorted().flags["SORTED_ASC"]
    S([1, 2, 3]).rechunk(in_place=True)

    es = S(range(1, 1001))
    assert es.estimated_size("kb") == _pytest.approx(
        es.estimated_size() / 1024.0)

    import math

    assert math.isnan(S([1.0, float("nan"), 3.0]).nan_max())
    assert S([1, 2, 4]).search_sorted(3) == 2
    with _pytest.raises(ValueError, match="between 0.0 and 1.0"):
        S([1, 2, 3]).quantile(2)

    assert S([0.99, 0.005, 0.005]).entropy(normalize=True) == \
        _pytest.approx(0.06293300616044681)
    assert S([0.65, 0.10, 0.25]).entropy(normalize=True) == \
        _pytest.approx(0.8568409950394724)
    assert S([]).sum() == 0

    assert S([1, 2, 3]).apply(lambda v: v ** 2).to_a() == [1, 4, 9]
    m = S([1, 2, 3]).map_elements(lambda v: float(v))
    assert m.to_a() == [1.0, 2.0, 3.0] and m.dtype.typeName() == "double"
    mb = S([1, 2, 3]).map_elements(lambda v: v % 2 == 0)
    assert mb.to_a() == [False, True, False] and mb.dtype.typeName() == "boolean"

    with _pytest.raises(ValueError, match="first cast to integer"):
        (S([dtm.date(2024, 1, 3)]) - dtm.date(2024, 1, 1)) / 86400.0

    rep = str(S("a", [1, 2, 3]))
    assert "Series: 'a' [i64]" in rep and rep.startswith("shape: (3,)")
    assert list(iter(S([1, 2]))) == [1, 2]


def test_reference_doctest_parity_batch15(spark):
    """Fifteenth harvest batch (types_test.rb dtype matrix): bare family
    dtype classes defer to inference (Decimal scale, Struct fields, List
    inner, Datetime), Unknown defers entirely, Duration builds intervals
    from numeric unit counts (+ total_* plural aliases), Array accepts the
    reference's (width, inner) ctor order and enforces width, dict-row
    frames ingest all-null / nested columns via Arrow."""
    import datetime as dtm
    from decimal import Decimal as D

    import pytest as _pytest

    import polars_ruby_spark as pl
    from polars_ruby_spark import datatypes as dt

    S = pl.Series
    s = S([D("12.3456"), None], dtype=dt.Decimal)
    assert s.to_a() == [D("12.3456"), None]
    assert s.dtype.scale == 4

    assert S([[1, 2], [3, 4]], dtype=dt.Array).to_a() == [[1, 2], [3, 4]]
    assert S([[1, 2], [3, 4]], dtype=dt.Array(2, dt.Int64)).to_a() == \
        [[1, 2], [3, 4]]
    with _pytest.raises(ValueError, match="specified width 3"):
        S([[1, 2], [3, 4]], dtype=dt.Array(3, dt.Int64))

    assert S([{"a": 1}, {"a": 2}], dtype=dt.Struct).to_a() == \
        [{"a": 1}, {"a": 2}]
    assert S([1, 2, 3], dtype=dt.Unknown).to_a() == [1, 2, 3]
    assert S([None, None], dtype=dt.Null).to_a() == [None, None]

    d = S([1e6, 2e6, 3e6], dtype=dt.Duration)
    assert d.dtype.typeName() == "daytimeinterval"
    assert d.dt.total_seconds().to_a() == [1, 2, 3]
    assert d.dt.microseconds().to_a() == [1000000, 2000000, 3000000]
    dm = S([1e3, 2e3], dtype=dt.Duration("ms"))
    assert dm.dt.milliseconds().to_a() == [1000, 2000]

    df = pl.DataFrame([{
        "b": True, "i": 1, "f": 1.5, "s": "one",
        "d": dtm.date(2024, 1, 1), "t": dtm.datetime(2024, 1, 1),
        "h": {"f": 1}, "a": [1, 2, 3], "u": None}])
    sch = df.schema
    assert sch["u"].typeName() == "void"
    assert sch["h"].typeName() == "struct"
    assert sch["a"].typeName() == "array"
    assert sch["i"].typeName() == "long"

    for name, tn in [("Int8", "byte"), ("Int16", "short"), ("Int32", "integer"),
                     ("Int64", "long"), ("UInt8", "short"),
                     ("UInt16", "integer"), ("UInt32", "long")]:
        ss = S([1, None, 3], dtype=getattr(dt, name))
        assert ss.to_a() == [1, None, 3] and ss.dtype.typeName() == tn


def test_reference_doctest_parity_batch18(spark):
    """Eighteenth harvest batch (string/list/struct expr tests): deprecated
    str aliases (strip/lstrip/rstrip/ljust/rjust/count_match), list
    subscript, struct positional subscript + type raise, rank(reverse:),
    col('') as the element inside list.eval, and wrap_expr keeping plain
    arrays as array literals (gather indices) while public lit() promotes
    them to Series columns."""
    import pytest as _pytest

    import polars_ruby_spark as pl

    df = pl.DataFrame({"s": [" hey ", "xhix"], "l": [[3, 1, 2], [9]],
                       "st": [{"a": 1, "b": 2}, {"a": 3, "b": 4}]})
    out = df.select(
        pl.col("s").str.strip().alias("w"),
        pl.col("s").str.lstrip("x").alias("lx"),
        pl.col("s").str.rstrip("x").alias("rx"),
        pl.col("s").str.ljust(7, "*").alias("lj"),
        pl.col("s").str.rjust(7, "*").alias("rj"),
        pl.col("s").str.count_match("h").alias("cm"),
        pl.col("l").list[0].alias("l0"),
        pl.col("st").struct[0].alias("s0"),
        pl.col("st").struct["b"].alias("sb"),
    ).to_a()
    assert out[0]["w"] == "hey" and out[1]["w"] == "xhix"
    assert out[1]["lx"] == "hix" and out[1]["rx"] == "xhi"
    assert out[0]["lj"] == " hey **" and out[0]["rj"] == "** hey "
    assert [r["cm"] for r in out] == [1, 1]
    assert [r["l0"] for r in out] == [3, 9]
    assert [r["s0"] for r in out] == [1, 3]
    assert [r["sb"] for r in out] == [2, 4]

    with _pytest.raises(ValueError, match="expected type Integer or String"):
        pl.col("st").struct[1.5]

    # rank(reverse:) == rank(descending:)
    r = df.select(pl.col("l").list[0].rank(reverse=True).alias("r")).to_a()
    assert [x["r"] for x in r] == [2.0, 1.0]

    # wrap_expr array arg stays an array literal: gather with plain list
    g = pl.DataFrame({"l": [[10, 20, 30, 40]]}).select(
        pl.col("l").list.gather([0, -1]).alias("g")).to_a()
    assert g[0]["g"] == [10, 40]

    # element-wise eval still compiles to F.transform (JVM-side)
    e = df.select(pl.col("l").list.eval(pl.element() * 2).alias("e")).to_a()
    assert e[0]["e"] == [6, 2, 4] and e[1]["e"] == [18]


def test_strptime_and_meta_regex(spark):
    """strptime takes the TARGET dtype first (string_expr.rb); regex col
    projections carry their pattern for meta.is_regex_projection."""
    import datetime as dtm

    import polars_ruby_spark as pl
    from polars_ruby_spark import datatypes as dt

    df = pl.DataFrame({"s": ["2024-01-02"]})
    assert df.select(pl.col("s").str.strptime(dt.Date, "%Y-%m-%d")
                     .alias("d")).to_a() == [{"d": dtm.date(2024, 1, 2)}]
    assert df.select(pl.col("s").str.strptime(dt.Datetime, "%Y-%m-%d")
                     .alias("t")).to_a() == [{"t": dtm.datetime(2024, 1, 2)}]
    assert pl.col("^a.*$").meta.is_regex_projection()
    assert not pl.col("a").meta.is_regex_projection()
    assert pl.col("a").meta.is_column()


def test_series_append_mutates(spark):
    """series.rb append mutates the receiver (series_test.rb test_append)."""
    import polars_ruby_spark as pl

    a = pl.Series([1, 2])
    r = a.append(pl.Series([3, 4]))
    assert a.to_a() == [1, 2, 3, 4] and r is a


def test_reference_doctest_parity_batch21(spark):
    """Twenty-first harvest batch (expr.rb doctest values): floor/ceil keep
    the input dtype, cum_prod over ints stays integral on every binding
    path (windowed / grouped / ungrouped partition-prefix), is_first/
    is_last aliases, and the is_unique/is_duplicated/is_first_distinct
    family restores frame row order after its value-partitioned window."""
    import polars_ruby_spark as pl

    c = pl.DataFrame({"a": [0.3, 0.5, 1.0, 1.1]}).select(
        pl.col("a").ceil().alias("c"))
    assert [r["c"] for r in c.to_a()] == [1.0, 1.0, 1.0, 2.0]
    assert c.dtypes[0].typeName() == "double"
    f = pl.DataFrame({"a": [1, 2]}).select(pl.col("a").floor().alias("f"))
    assert f.dtypes[0].typeName() == "long"

    p = pl.DataFrame({"a": [1, 2, 3]}).select(
        pl.col("a").cum_prod().alias("p"),
        pl.col("a").cum_prod(reverse=True).alias("pr"))
    assert [r["p"] for r in p.to_a()] == [1, 2, 6]
    assert [r["pr"] for r in p.to_a()] == [6, 6, 3]
    assert p.dtypes[0].typeName() == "long"
    g = pl.DataFrame({"g": ["x", "x"], "a": [2, 3]}).select(
        pl.col("a").cum_prod().over("g").alias("p"))
    assert g.dtypes[0].typeName() == "long"

    out = pl.DataFrame({"num": [1, 2, 3, 1, 5]}).with_column(
        pl.col("num").is_first().alias("f")).to_a()
    assert [r["num"] for r in out] == [1, 2, 3, 1, 5]  # row order kept
    assert [r["f"] for r in out] == [True, True, True, False, True]
    u = pl.DataFrame({"a": [1, 2, 3, 1]}).with_column(
        pl.col("a").is_unique().alias("u")).to_a()
    assert [r["a"] for r in u] == [1, 2, 3, 1]
    assert [r["u"] for r in u] == [False, True, True, False]

    cc = pl.DataFrame({"a": ["x", "k", None, "d"]}).with_columns(
        pl.col("a").cum_count().alias("cc"),
        pl.col("a").cum_count(reverse=True).alias("ccr")).to_a()
    assert [r["cc"] for r in cc] == [1, 2, 2, 3]
    assert [r["ccr"] for r in cc] == [3, 2, 1, 1]

    bf = pl.DataFrame({"a": [1, 2, None], "b": [4, None, 6]}).select(
        pl.all().backward_fill()).to_a()
    assert bf == [{"a": 1, "b": 4}, {"a": 2, "b": 6}, {"a": None, "b": 6}]

    import math
    nm = pl.DataFrame({"a": [0.0, float("nan")]}).select(
        pl.col("a").nan_min().alias("m")).to_a()
    assert math.isnan(nm[0]["m"])

    ag = pl.DataFrame({"group": ["one"] * 3 + ["two"] * 3,
                       "value": [94, 95, 96, 97, 97, 99]}).group_by(
        "group", maintain_order=True).agg(
        pl.col("value").agg_groups()).sort("group").to_a()
    assert ag == [{"group": "one", "value": [0, 1, 2]},
                  {"group": "two", "value": [3, 4, 5]}]


def test_reference_doctest_parity_batch22(spark):
    """Twenty-second harvest batch (expr.rb doctest values): repeat_by with
    a column NAME (expr.rb:3644), is_between closed modes, argsort alias,
    pct_change null head, clip_min/max null passthrough, inverse/hyperbolic
    trig, peaks, ne_missing."""
    import polars_ruby_spark as pl

    r = pl.DataFrame({"a": ["x", "y", "z"], "n": [1, 2, 3]}).select(
        pl.col("a").repeat_by("n").alias("r")).to_a()
    assert [x["r"] for x in r] == [["x"], ["y", "y"], ["z", "z", "z"]]

    b = pl.DataFrame({"num": [1, 2, 3, 4, 5]})
    assert [x["b"] for x in b.select(pl.col("num").is_between(2, 4)
            .alias("b")).to_a()] == [False, True, True, True, False]
    assert [x["b"] for x in b.select(pl.col("num").is_between(2, 4, closed="left")
            .alias("b")).to_a()] == [False, True, True, False, False]

    assert [x["s"] for x in pl.DataFrame({"a": [20, 10, 30]}).select(
        pl.col("a").argsort().alias("s")).to_a()] == [1, 0, 2]
    assert [x["p"] for x in pl.DataFrame({"a": [10, 11, 12]}).select(
        pl.col("a").pct_change().round(4).alias("p")).to_a()] == \
        [None, 0.1, 0.0909]

    c = pl.DataFrame({"f": [-50, 5, None, 50]}).select(
        pl.col("f").clip_min(1).alias("a"),
        pl.col("f").clip_max(10).alias("b")).to_a()
    assert [x["a"] for x in c] == [1, 5, None, 50]
    assert [x["b"] for x in c] == [-50, 5, None, 10]

    tr = pl.DataFrame({"a": [0.5]}).select(
        pl.col("a").arcsin().round(4).alias("as"),
        pl.col("a").sinh().round(4).alias("sh"),
        pl.col("a").arctanh().round(4).alias("at")).to_a()[0]
    assert tr == {"as": 0.5236, "sh": 0.5211, "at": 0.5493}

    pk = pl.DataFrame({"a": [1, 2, 3, 2, 1]}).select(
        pl.col("a").peak_max().alias("p")).to_a()
    assert [x["p"] for x in pk] == [False, False, True, False, False]
    nm = pl.DataFrame({"a": [1, None], "b": [1, 2]}).select(
        pl.col("a").ne_missing(pl.col("b")).alias("n")).to_a()
    assert [x["n"] for x in nm] == [False, True]


def test_bitwise_vs_logical_ops(spark):
    """expr.rb bitand/bitor/bitxor: &/|/^ are BITWISE on integers, logical
    on booleans (series_test.rb only exercises the boolean form)."""
    import polars_ruby_spark as pl

    r = pl.DataFrame({"a": [6], "b": [3]}).select(
        (pl.col("a") & pl.col("b")).alias("x"),
        (pl.col("a") | pl.col("b")).alias("y"),
        (pl.col("a") ^ pl.col("b")).alias("z")).to_a()[0]
    assert r == {"x": 2, "y": 7, "z": 5}
    b = pl.DataFrame({"a": [True, False], "b": [True, True]}).select(
        (pl.col("a") & pl.col("b")).alias("x"),
        (pl.col("a") ^ pl.col("b")).alias("z")).to_a()
    assert [x["x"] for x in b] == [True, False]
    assert [x["z"] for x in b] == [False, True]
    # composite filters stay on the no-probe fast path and work unchanged
    assert pl.DataFrame({"a": [1, 5], "b": [1, 1]}).filter(
        (pl.col("a") > 2) & (pl.col("b") == 1)).to_a() == [{"a": 5, "b": 1}]


def test_hex_encode_lowercase(spark):
    """polars hex encoding is lowercase (binary_expr.rb); Spark's F.hex is
    uppercase — q61's oracle previously papered over this with upper()."""
    import polars_ruby_spark as pl

    out = pl.DataFrame({"b": [b"\xffabc"]}).select(
        pl.col("b").bin.encode("hex").alias("h")).to_a()
    assert out == [{"h": "ff616263"}]
    s = pl.DataFrame({"s": ["\xff"]}).select(
        pl.col("s").str.encode("hex").alias("h")).to_a()
    assert s[0]["h"] == s[0]["h"].lower()


def test_list_sum_mean_null_elements(spark):
    """list.sum skips null ELEMENTS and keeps the element dtype (empty /
    all-null list → 0; null list → null); list.mean divides by the
    non-null count (list_expr.rb sum/mean delegate to Series semantics).
    Caught by the differential fuzzer (implode_sum template)."""
    import polars_ruby_spark as pl

    df = pl.DataFrame({"l": [[1, None, 3], [], [None, None], None, [2, 4]]})
    out = df.lazy().select(
        pl.col("l").list.sum().alias("s"),
        pl.col("l").list.mean().alias("m")).collect()
    assert [r["s"] for r in out.to_a()] == [4, 0, 0, None, 6]
    assert [r["m"] for r in out.to_a()] == [2.0, None, None, None, 3.0]
    assert type(out.schema["s"]).__name__ == "LongType"   # dtype preserved

    fl = pl.DataFrame({"l": [[1.5, None, 2.5]]}).lazy().select(
        pl.col("l").list.sum().alias("s")).collect()
    assert fl.to_a() == [{"s": 4.0}]
