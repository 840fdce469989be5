"""Pure-Python Apache Avro Object Container File codec (round-7).

The environment ships no ``spark-avro`` connector jar and has no network
access, so ``read_avro``/``write_avro`` (``io/avro.rb:14``) implement the
PUBLIC Avro 1.x container spec directly:

- container = magic ``Obj\\x01`` + file-metadata map (``avro.schema`` JSON,
  ``avro.codec``) + 16-byte sync marker, then blocks of
  ``(count, byte-size, serialized objects, sync)``;
- binary encoding: zigzag-varint ints/longs, little-endian float/double,
  length-prefixed bytes/strings, union = branch index + value, record =
  fields in declared order, array = counted blocks terminated by 0;
- codecs: ``null`` and ``deflate`` (raw zlib, no header — spec-mandated).

Scope matches what a Spark schema round-trips: primitives, nullable
unions ``["null", T]``, ``date``/``timestamp-micros`` logicals, arrays of
(nullable) primitives.  Python-side en/decoding is the compatibility
path — the read side distributes per FILE (one Arrow batch per container
via ``mapInPandas``), so a directory of containers scales with the file
count even though a single huge container is one task.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"


# -- primitive binary codec ---------------------------------------------------

def _write_long(buf: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def _read_long(data: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _write_bytes(buf: io.BytesIO, b: bytes) -> None:
    _write_long(buf, len(b))
    buf.write(b)


def _read_bytes(data: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(data, pos)
    return data[pos:pos + n], pos + n


# -- schema mapping -----------------------------------------------------------

def spark_schema_to_avro(schema) -> dict:
    """Spark StructType → Avro record schema (nullable fields become
    ``["null", T]`` unions, Spark's default nullability)."""
    from pyspark.sql import types as T

    def conv(dt):
        if isinstance(dt, T.BooleanType):
            return "boolean"
        if isinstance(dt, T.IntegerType):
            return "int"
        if isinstance(dt, (T.LongType,)):
            return "long"
        if isinstance(dt, T.FloatType):
            return "float"
        if isinstance(dt, T.DoubleType):
            return "double"
        if isinstance(dt, T.StringType):
            return "string"
        if isinstance(dt, T.BinaryType):
            return "bytes"
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        if isinstance(dt, T.TimestampType):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, T.ArrayType):
            item = conv(dt.elementType)
            if dt.containsNull:
                item = ["null", item]
            return {"type": "array", "items": item}
        raise NotImplementedError(
            f"write_avro: unsupported Spark type {dt.simpleString()} "
            "(supported: boolean/int/long/float/double/string/binary/"
            "date/timestamp/array-of-primitive)")

    fields = []
    for f in schema.fields:
        t = conv(f.dataType)
        fields.append({"name": f.name,
                       "type": ["null", t] if f.nullable else t})
    return {"type": "record", "name": "spark_frame", "fields": fields}


def avro_schema_to_spark(av) -> "object":
    """Avro record schema → Spark StructType (inverse of the above)."""
    from pyspark.sql import types as T

    def conv(t):
        # returns (sparkType, nullable)
        if isinstance(t, list):  # union
            branches = [b for b in t if b != "null"]
            if len(branches) != 1:
                raise NotImplementedError(
                    f"read_avro: unsupported union {t!r}")
            inner, _ = conv(branches[0])
            return inner, True
        if isinstance(t, dict):
            lt = t.get("logicalType")
            if lt == "date":
                return T.DateType(), False
            if lt in ("timestamp-micros", "timestamp-millis"):
                return T.TimestampType(), False
            if t.get("type") == "array":
                it, n = conv(t["items"])
                return T.ArrayType(it, containsNull=n), False
            if t.get("type") == "record":
                return conv_record(t), False
            return conv(t["type"])
        prim = {"boolean": T.BooleanType(), "int": T.IntegerType(),
                "long": T.LongType(), "float": T.FloatType(),
                "double": T.DoubleType(), "string": T.StringType(),
                "bytes": T.BinaryType()}.get(t)
        if prim is None:
            raise NotImplementedError(f"read_avro: unsupported type {t!r}")
        return prim, False

    def conv_record(rec):
        fields = []
        for f in rec["fields"]:
            dt, nullable = conv(f["type"])
            fields.append(T.StructField(f["name"], dt, nullable))
        return T.StructType(fields)

    return conv_record(av)


# -- value codec (driven by the avro schema) ----------------------------------

_EPOCH_DAYS = None


def _encoder(t):
    """Return fn(buf, value) for avro type ``t`` (value already a plain
    Python object from Row.asDict)."""
    import datetime as dt

    if isinstance(t, list):
        branches = [b for b in t if b != "null"]
        inner = _encoder(branches[0])
        null_idx = t.index("null")
        val_idx = 1 - null_idx if len(t) == 2 else t.index(branches[0])

        def enc(buf, v):
            if v is None:
                _write_long(buf, null_idx)
            else:
                _write_long(buf, val_idx)
                inner(buf, v)

        return enc
    if isinstance(t, dict):
        lt = t.get("logicalType")
        if lt == "date":
            epoch = dt.date(1970, 1, 1)
            return lambda buf, v: _write_long(buf, (v - epoch).days)
        if lt == "timestamp-micros":
            epoch = dt.datetime(1970, 1, 1)

            def enc_ts(buf, v):
                if v.tzinfo is not None:
                    v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
                _write_long(buf, round((v - epoch).total_seconds() * 1e6))

            return enc_ts
        if t.get("type") == "array":
            item = _encoder(t["items"])

            def enc_arr(buf, v):
                if len(v):
                    _write_long(buf, len(v))
                    for x in v:
                        item(buf, x)
                _write_long(buf, 0)

            return enc_arr
        return _encoder(t["type"])
    if t in ("int", "long"):
        return _write_long
    if t == "boolean":
        return lambda buf, v: buf.write(b"\x01" if v else b"\x00")
    if t == "float":
        return lambda buf, v: buf.write(struct.pack("<f", v))
    if t == "double":
        return lambda buf, v: buf.write(struct.pack("<d", v))
    if t == "string":
        return lambda buf, v: _write_bytes(buf, v.encode("utf-8"))
    if t == "bytes":
        return lambda buf, v: _write_bytes(buf, bytes(v))
    raise NotImplementedError(f"avro encode: {t!r}")


def _decoder(t):
    """Return fn(data, pos) -> (value, pos)."""
    import datetime as dt

    if isinstance(t, list):
        subs = [_decoder(b) if b != "null" else None for b in t]

        def dec(data, pos):
            i, pos = _read_long(data, pos)
            if subs[i] is None:
                return None, pos
            return subs[i](data, pos)

        return dec
    if isinstance(t, dict):
        lt = t.get("logicalType")
        if lt == "date":
            epoch = dt.date(1970, 1, 1)

            def dec_d(data, pos):
                n, pos = _read_long(data, pos)
                return epoch + dt.timedelta(days=n), pos

            return dec_d
        if lt in ("timestamp-micros", "timestamp-millis"):
            epoch = dt.datetime(1970, 1, 1)
            mult = 1 if lt == "timestamp-micros" else 1000

            def dec_t(data, pos):
                n, pos = _read_long(data, pos)
                return epoch + dt.timedelta(microseconds=n * mult), pos

            return dec_t
        if t.get("type") == "array":
            item = _decoder(t["items"])

            def dec_a(data, pos):
                out = []
                while True:
                    n, pos = _read_long(data, pos)
                    if n == 0:
                        return out, pos
                    if n < 0:  # block size follows (skippable form)
                        _, pos = _read_long(data, pos)
                        n = -n
                    for _ in range(n):
                        v, pos = item(data, pos)
                        out.append(v)

            return dec_a
        if t.get("type") == "record":
            fields = [(_decoder(f["type"])) for f in t["fields"]]

            def dec_r(data, pos):
                row = []
                for fd in fields:
                    v, pos = fd(data, pos)
                    row.append(v)
                return row, pos

            return dec_r
        return _decoder(t["type"])
    if t in ("int", "long"):
        return _read_long
    if t == "boolean":
        return lambda data, pos: (data[pos] == 1, pos + 1)
    if t == "float":
        return lambda data, pos: (struct.unpack_from("<f", data, pos)[0],
                                  pos + 4)
    if t == "double":
        return lambda data, pos: (struct.unpack_from("<d", data, pos)[0],
                                  pos + 8)
    if t == "string":
        def dec_s(data, pos):
            b, pos = _read_bytes(data, pos)
            return b.decode("utf-8"), pos

        return dec_s
    if t == "bytes":
        return _read_bytes
    raise NotImplementedError(f"avro decode: {t!r}")


# -- container ----------------------------------------------------------------

def write_container(path: str, avro_schema: dict, rows, codec: str = "deflate",
                    block_rows: int = 4096) -> None:
    """Write one OCF: ``rows`` iterates sequences ordered like the record
    fields."""
    sync = os.urandom(16)
    field_encs = [_encoder(f["type"]) for f in avro_schema["fields"]]
    with open(path, "wb") as fh:
        fh.write(MAGIC)
        meta = io.BytesIO()
        _write_long(meta, 2)
        _write_bytes(meta, b"avro.schema")
        _write_bytes(meta, json.dumps(avro_schema).encode())
        _write_bytes(meta, b"avro.codec")
        _write_bytes(meta, codec.encode())
        _write_long(meta, 0)
        fh.write(meta.getvalue())
        fh.write(sync)
        block, count = io.BytesIO(), 0

        def flush():
            nonlocal block, count
            if not count:
                return
            payload = block.getvalue()
            if codec == "deflate":
                payload = zlib.compress(payload)[2:-4]  # raw, per spec
            head = io.BytesIO()
            _write_long(head, count)
            _write_long(head, len(payload))
            fh.write(head.getvalue())
            fh.write(payload)
            fh.write(sync)
            block, count = io.BytesIO(), 0

        for row in rows:
            for enc, v in zip(field_encs, row):
                enc(block, v)
            count += 1
            if count >= block_rows:
                flush()
        flush()


def read_header(data: bytes):
    """Parse an OCF header → (avro_schema dict, codec, sync, pos)."""
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta = {}
    while True:
        n, pos = _read_long(data, pos)
        if n == 0:
            break
        if n < 0:
            _, pos = _read_long(data, pos)  # block byte size (skippable)
            n = -n
        for _ in range(n):
            k, pos = _read_bytes(data, pos)
            v, pos = _read_bytes(data, pos)
            meta[k.decode()] = v
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    sync = data[pos:pos + 16]
    return schema, codec, sync, pos + 16


def read_container(data: bytes):
    """Decode one OCF → (avro_schema dict, list of row lists)."""
    schema, codec, sync, pos = read_header(data)
    dec = _decoder(schema)
    rows = []
    n_total = len(data)
    while pos < n_total:
        count, pos = _read_long(data, pos)
        size, pos = _read_long(data, pos)
        payload = data[pos:pos + size]
        pos += size
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise NotImplementedError(f"avro codec {codec!r}")
        p = 0
        for _ in range(count):
            row, p = dec(payload, p)
            rows.append(row)
        if data[pos:pos + 16] != sync:
            raise ValueError("avro: sync marker mismatch")
        pos += 16
    return schema, rows
