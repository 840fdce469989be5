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
