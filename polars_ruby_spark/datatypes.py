"""Polars-shaped dtype classes → Spark SQL types.

Mirrors the reference's class hierarchy (``/root/reference/lib/polars/
data_types.rb:123-465``) with the Spark mapping decided in SURVEY §1.3:
unsigned ints widen (Spark has none), Categorical/Enum map to String,
Datetime is µs (ns truncates), fixed-width Array maps to ArrayType.
"""

from __future__ import annotations

from pyspark.sql import types as T


class DataType:
    """Base marker; subclasses carry a ``spark`` classmethod/attr."""

    spark: T.DataType

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)

    @classmethod
    def to_spark(cls) -> T.DataType:
        return cls.spark

    def __repr__(self) -> str:
        return type(self).__name__


class NumericType(DataType):
    pass


class IntegerType(NumericType):
    pass


class SignedIntegerType(IntegerType):
    pass


class UnsignedIntegerType(IntegerType):
    pass


class FloatType(NumericType):
    pass


class TemporalType(DataType):
    pass


class NestedType(DataType):
    pass


class Int8(SignedIntegerType):
    spark = T.ByteType()


class Int16(SignedIntegerType):
    spark = T.ShortType()


class Int32(SignedIntegerType):
    spark = T.IntegerType()


class Int64(SignedIntegerType):
    spark = T.LongType()


# Unsigned types widen on ingest (SURVEY §1.3); overflow semantics documented
# as "wraps like the wider signed type".
class UInt8(UnsignedIntegerType):
    spark = T.ShortType()


class UInt16(UnsignedIntegerType):
    spark = T.IntegerType()


class UInt32(UnsignedIntegerType):
    spark = T.LongType()


class UInt64(UnsignedIntegerType):
    spark = T.DecimalType(20, 0)


class Float32(FloatType):
    spark = T.FloatType()


class Float64(FloatType):
    spark = T.DoubleType()


class Boolean(DataType):
    spark = T.BooleanType()


class String(DataType):
    spark = T.StringType()


Utf8 = String


class Binary(DataType):
    spark = T.BinaryType()


class Date(TemporalType):
    spark = T.DateType()


class Time(TemporalType):
    # No Spark time-of-day type: nanoseconds since midnight (SURVEY §1.3).
    spark = T.LongType()


class Categorical(DataType):
    # Dictionary encoding is a physical detail; strings join directly in Spark.
    spark = T.StringType()


class Null(DataType):
    spark = T.NullType()


class Object(DataType):
    spark = T.BinaryType()


class Unknown(DataType):
    spark = T.NullType()


class Datetime(TemporalType):
    spark = T.TimestampType()

    def __init__(self, time_unit: str = "us", time_zone: str | None = None):
        self.time_unit = time_unit
        self.time_zone = time_zone

    @classmethod
    def to_spark(cls) -> T.DataType:
        return T.TimestampType()


class Duration(TemporalType):
    spark = T.DayTimeIntervalType()

    def __init__(self, time_unit: str = "us"):
        self.time_unit = time_unit


class Decimal(NumericType):
    def __init__(self, precision: int = 38, scale: int = 0):
        self.precision, self.scale = precision, scale
        self.spark = T.DecimalType(precision, scale)

    def to_spark(self) -> T.DataType:  # type: ignore[override]
        return self.spark


class List(NestedType):
    def __init__(self, inner):
        self.inner = inner
        self.spark = T.ArrayType(to_spark_type(inner))

    def to_spark(self) -> T.DataType:  # type: ignore[override]
        return self.spark


class Array(NestedType):
    """Fixed-width array → ArrayType; width enforced at cast (SURVEY §1.3)."""

    def __init__(self, inner, width: int):
        self.inner, self.width = inner, width
        self.spark = T.ArrayType(to_spark_type(inner))

    def to_spark(self) -> T.DataType:  # type: ignore[override]
        return self.spark


class Field:
    def __init__(self, name: str, dtype):
        self.name, self.dtype = name, dtype


class Struct(NestedType):
    def __init__(self, fields):
        if isinstance(fields, dict):
            fields = [Field(k, v) for k, v in fields.items()]
        self.fields = fields
        self.spark = T.StructType(
            [T.StructField(f.name, to_spark_type(f.dtype)) for f in fields]
        )

    def to_spark(self) -> T.DataType:  # type: ignore[override]
        return self.spark


class Enum(DataType):
    spark = T.StringType()

    def __init__(self, categories):
        cats = list(categories)
        if len(set(cats)) != len(cats) or any(c is None for c in cats) or not all(
            isinstance(c, str) for c in cats
        ):
            # Validation parity: data_types.rb:316-329 (unique, non-null, str).
            raise ValueError("Enum categories must be unique non-null strings")
        self.categories = cats


_STRING_ALIASES = {
    "i8": Int8, "i16": Int16, "i32": Int32, "i64": Int64,
    "u8": UInt8, "u16": UInt16, "u32": UInt32, "u64": UInt64,
    "f32": Float32, "f64": Float64,
    "bool": Boolean, "str": String, "utf8": String,
    "datetime": Datetime, "duration": Duration, "time": Time,
    "cat": Categorical,
    # bare "int"/"float"/"double"/"long"/... fall through to Spark DDL parsing
}


def to_spark_type(dtype) -> T.DataType:
    """Resolve a polars dtype class/instance/str/Spark type to a Spark type."""
    if isinstance(dtype, T.DataType):
        return dtype
    if isinstance(dtype, str):
        key = dtype.lower()
        if key in _STRING_ALIASES:
            return _STRING_ALIASES[key].to_spark()
        return dtype  # let Spark parse DDL strings like "decimal(10,2)"
    if isinstance(dtype, type) and issubclass(dtype, DataType):
        try:
            return dtype.to_spark()
        except TypeError:
            # parameterized dtype passed as a bare class (Polars::Decimal,
            # Polars::Datetime…): instantiate with defaults
            return dtype().to_spark()
    if isinstance(dtype, DataType):
        return dtype.to_spark()
    raise TypeError(f"cannot interpret {dtype!r} as a dtype")
