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
