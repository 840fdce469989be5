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

    # -- dtype-object API (data_types.rb / data_types_test.rb) --------------
    @classmethod
    def base_type(cls) -> type:
        """The unparameterized class (List(Int64).base_type → List)."""
        return cls

    @classmethod
    def is_numeric(cls) -> bool:
        return issubclass(cls, NumericType)

    @classmethod
    def is_decimal(cls) -> bool:
        return issubclass(cls, Decimal)

    @classmethod
    def is_integer(cls) -> bool:
        return issubclass(cls, IntegerType)

    @classmethod
    def is_signed_integer(cls) -> bool:
        return issubclass(cls, SignedIntegerType)

    @classmethod
    def is_unsigned_integer(cls) -> bool:
        return issubclass(cls, UnsignedIntegerType)

    @classmethod
    def is_float(cls) -> bool:
        return issubclass(cls, FloatType)

    @classmethod
    def is_temporal(cls) -> bool:
        return issubclass(cls, TemporalType)

    @classmethod
    def is_nested(cls) -> bool:
        return issubclass(cls, NestedType)

    def __eq__(self, other):
        # Decimal(15,1) == Decimal (bare family class) is True; instances
        # compare by parameters (data_types_test.rb equality matrix)
        if isinstance(other, type) and issubclass(other, DataType):
            return isinstance(self, other)
        if isinstance(other, DataType):
            if type(self) is not type(other):
                return False
            a = {k: v for k, v in self.__dict__.items() if k != "spark"}
            b = {k: v for k, v in other.__dict__.items() if k != "spark"}
            return a == b
        return NotImplemented

    def __hash__(self):
        return hash(type(self))

    def __repr__(self) -> str:
        params = {k: v for k, v in self.__dict__.items() if k != "spark"}
        if not params:
            return type(self).__name__
        inner = ", ".join(f"{k}={v!r}" for k, v in params.items())
        return f"{type(self).__name__}({inner})"


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
    def __init__(self, inner=None):
        self.inner = inner
        self.spark = T.ArrayType(
            to_spark_type(inner) if inner is not None else T.NullType())

    def to_spark(self) -> T.DataType:  # type: ignore[override]
        return self.spark


class Array(NestedType):
    """Fixed-width array → ArrayType; width enforced at cast (SURVEY §1.3)."""

    def __init__(self, inner=None, width: int | None = None):
        # the reference's ctor order is (width, inner) — data_types_test.rb
        # Polars::Array.new(2, Polars::Int64); accept either order
        if isinstance(inner, int) and not isinstance(width, int):
            inner, width = width, inner
        self.inner, self.width = inner, width
        self.spark = T.ArrayType(
            to_spark_type(inner) if inner is not None else T.NullType())

    def to_spark(self) -> T.DataType:  # type: ignore[override]
        return self.spark


class Field:
    def __init__(self, name: str, dtype):
        self.name, self.dtype = name, dtype

    def __eq__(self, other):
        return (isinstance(other, Field) and self.name == other.name
                and self.dtype == other.dtype)

    def __hash__(self):
        return hash((self.name, self.dtype if isinstance(self.dtype, type)
                     else type(self.dtype)))

    def __repr__(self):
        return f"Field({self.name!r}, {self.dtype!r})"


class Struct(NestedType):
    def __init__(self, fields=None):
        fields = [] if fields is None else fields
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


# cast-family table: a BARE parameterized dtype class (or Unknown) names a
# family, not a concrete type — when ingest inference already produced a
# member of that family, casting would only destroy inferred parameters
# (decimal scale, struct fields, list element type)
_BARE_FAMILY = {}


def _init_bare_family():
    _BARE_FAMILY.update({
        Decimal: (T.DecimalType,),
        Datetime: (T.TimestampType, T.TimestampNTZType),
        Struct: (T.StructType,),
        List: (T.ArrayType,),
        Array: (T.ArrayType,),
        Duration: (T.DayTimeIntervalType,),
    })


_init_bare_family()


def cast_is_noop(dtype, inferred: T.DataType) -> bool:
    """True when casting `inferred` to `dtype` should be skipped: Unknown
    always defers to inference; a bare family class defers when the
    inferred type is already in-family (types_test.rb dtype matrix)."""
    if dtype is Unknown or isinstance(dtype, Unknown):
        return True
    if isinstance(dtype, type) and dtype in _BARE_FAMILY:
        return isinstance(inferred, _BARE_FAMILY[dtype])
    if isinstance(dtype, (List, Array)) and dtype.inner is None:
        return isinstance(inferred, T.ArrayType)
    if isinstance(dtype, Struct) and not dtype.fields:
        return isinstance(inferred, T.StructType)
    return False


def polars_dtype_name(t: T.DataType) -> str:
    """Spark type -> polars dtype class name ("Int64", "String", ...) for
    serialized surfaces (write_json column envelope, inline dtype repr)."""
    m = {
        T.ByteType: "Int8", T.ShortType: "Int16", T.IntegerType: "Int32",
        T.LongType: "Int64", T.FloatType: "Float32", T.DoubleType: "Float64",
        T.StringType: "String", T.BooleanType: "Boolean",
        T.DateType: "Date", T.BinaryType: "Binary", T.NullType: "Null",
    }
    for k, v in m.items():
        if isinstance(t, k):
            return v
    if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
        return "Datetime"
    if isinstance(t, T.DayTimeIntervalType):
        return "Duration"
    if isinstance(t, T.DecimalType):
        return "Decimal"
    if isinstance(t, T.ArrayType):
        return f"List({polars_dtype_name(t.elementType)})"
    if isinstance(t, T.StructType):
        return "Struct"
    return t.simpleString()
