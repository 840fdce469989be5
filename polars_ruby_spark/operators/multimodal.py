"""Multimodal column plumbing (beyond-reference; BASELINE.json north star).

Media (image/audio/video) travel as opaque ``binary`` columns with a typed
metadata struct — the Spark-side schema, partitioning, Arrow batch shape and
UDF signatures here are real and tested.  The codec layer is REAL where the
stdlib suffices: container-header parse for PNG/JPEG/GIF/BMP
(``parse_image_header``) and FULL pixel decode for PNG (zlib inflate +
scanline unfilter) and uncompressed BMP (``decode_image_pixels``), plus
nearest-neighbor resize (``resize_nearest``).  Entropy-coded formats
(JPEG DCT, GIF LZW, audio/video) stay behind a clearly-marked
``NotImplementedError`` boundary until PIL/ffmpeg are available; a
deterministic fake keeps those pipelines testable end-to-end.

Batch sizing note for 100 TB: media rows are large — repartition by size
(``target_partition_mb``) before ``mapInPandas`` so Arrow batches stay
within executor memory.
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

#: Canonical multimodal column layout: {uri, data, meta{mime, n_bytes, width, height}}
MEDIA_SCHEMA = T.StructType([
    T.StructField("uri", T.StringType()),
    T.StructField("data", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ])),
])


def pack_media(sdf: DataFrame, data_col: str, uri_col=None, mime: str = "application/octet-stream",
               out_col: str = "media") -> DataFrame:
    """Assemble the canonical media struct from a binary column."""
    data = F.col(data_col)
    uri = F.col(uri_col) if uri_col else F.lit(None).cast("string")
    meta = F.struct(
        F.lit(mime).alias("mime"),
        F.octet_length(data).cast("long").alias("n_bytes"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )
    return sdf.withColumn(out_col, F.struct(uri.alias("uri"), data.alias("data"),
                                            meta.alias("meta")))


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a codec: derives a fixed 4-dim feature from
    the bytes (length + first/last bytes) so tests have stable expectations."""
    n = len(payload)
    first = payload[0] if n else 0
    last = payload[-1] if n else 0
    return {"n_bytes": n, "feat": [float(n % 251), float(first), float(last),
                                   float((n * 31 + first) % 997)]}


def decode_features(sdf: DataFrame, media_col: str = "media", id_col: str = "doc_id",
                    real_decoder: Callable[[bytes], dict] | None = None,
                    target_partition_mb: int | None = 64) -> DataFrame:
    """Decode/feature-extract media via Arrow-batched ``mapInPandas``.

    ``real_decoder(bytes) -> {"n_bytes": int, "feat": list[float]}`` plugs in
    the actual codec (PIL/librosa/ffmpeg); without one the deterministic fake
    runs.  Raise if a caller explicitly demands a real codec:
    ``real_decoder=multimodal.require_real_decoder``.
    """
    import pandas as pd

    decoder = real_decoder or _fake_decode
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feat", T.ArrayType(T.DoubleType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                payload = row[media_col]["data"] or b""
                d = decoder(bytes(payload))
                recs.append((row[id_col], d["n_bytes"], d["feat"]))
            yield pd.DataFrame(recs, columns=[id_col, "n_bytes", "feat"])

    narrow = sdf.select(id_col, media_col)
    if target_partition_mb is not None:
        # media rows are large: size partitions by payload bytes (one small
        # agg pass) so each Arrow transfer stays within executor memory
        total = narrow.select(
            F.sum(F.col(f"{media_col}.meta.n_bytes"))).first()[0] or 0
        n_parts = max(1, int(total // (target_partition_mb * 1024 * 1024)) + 1)
        if n_parts > narrow.rdd.getNumPartitions():
            narrow = narrow.repartition(n_parts)
    return narrow.mapInPandas(run, out_schema)


def require_real_decoder(payload: bytes) -> dict:
    raise NotImplementedError(
        "media codecs (PIL/librosa/ffmpeg) are not available in this "
        "environment; pass real_decoder= when they are")


# -- real image header decode (round-3) ---------------------------------------
#
# Full pixel decode needs PIL/ffmpeg (absent here, still stubbed), but the
# container HEADERS are plain struct reads: PNG IHDR, JPEG SOFn, GIF logical
# screen, BMP info header.  This makes decode_features/decode_image_meta
# REAL for the metadata axis (dimensions/channels/bit depth) with no deps.

def parse_image_header(payload: bytes) -> dict | None:
    """Parse PNG/JPEG/GIF/BMP headers from raw bytes.

    Returns ``{mime, width, height, channels, bit_depth}`` or None when the
    container is not recognized.  Pure-Python struct reads — runs inside the
    existing Arrow-batched ``mapInPandas`` stage.
    """
    import struct

    b = bytes(payload or b"")
    if len(b) >= 26 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        bit_depth, color_type = b[24], b[25]
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
        return {"mime": "image/png", "width": w, "height": h,
                "channels": channels, "bit_depth": bit_depth}
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        # walk JPEG segments to the first SOFn frame header
        i = 2
        sof = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
               0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if i + 4 > len(b):
                break
            seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
            if marker in sof and i + 9 <= len(b):
                precision = b[i + 4]
                h, w = struct.unpack(">HH", b[i + 5:i + 9])
                channels = b[i + 9] if i + 10 <= len(b) else None
                return {"mime": "image/jpeg", "width": w, "height": h,
                        "channels": channels, "bit_depth": precision}
            i += 2 + seg_len
        return None
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return {"mime": "image/gif", "width": w, "height": h,
                "channels": 3, "bit_depth": 8}
    if len(b) >= 26 and b[:2] == b"BM":
        w, h = struct.unpack("<ii", b[18:26])
        return {"mime": "image/bmp", "width": w, "height": abs(h),
                "channels": 3, "bit_depth": 8}
    return None


def image_header_decoder(payload: bytes) -> dict:
    """``real_decoder``-compatible header decode: feat = [width, height,
    channels, bit_depth].  Raises (the documented capability boundary) only
    for genuinely unrecognized containers."""
    hdr = parse_image_header(payload)
    if hdr is None:
        raise NotImplementedError(
            "unrecognized image container (PNG/JPEG/GIF/BMP headers are "
            "decoded natively; other codecs need PIL/ffmpeg)")
    return {"n_bytes": len(payload or b""),
            "feat": [float(hdr["width"]), float(hdr["height"]),
                     float(hdr["channels"] or 0), float(hdr["bit_depth"])]}


# -- real pixel decode (round-3) ----------------------------------------------
#
# PNG and uncompressed BMP decode fully with the stdlib: zlib inflate +
# per-scanline unfilter (PNG filters 0-4) and padded-row BGR reads (BMP).
# These are REAL codecs — bytes in, pixel array out — running inside the
# same Arrow-batched ``mapInPandas`` stage.  JPEG (entropy-coded DCT) and
# GIF (LZW) stay behind the NotImplementedError boundary.

def decode_png_pixels(payload: bytes):
    """Decode a non-interlaced 8-bit PNG to an ``(h, w, channels)`` uint8
    numpy array.  Supports color types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA); raises NotImplementedError for Adam7
    interlace or 16-bit depth."""
    import struct
    import zlib

    import numpy as np

    b = bytes(payload or b"")
    if len(b) < 8 or b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, palette, trns = 8, [], None, None
    w = h = bit_depth = color_type = interlace = None
    while pos + 8 <= len(b):
        (ln,), typ = struct.unpack(">I", b[pos:pos + 4]), b[pos + 4:pos + 8]
        data = b[pos + 8:pos + 8 + ln]
        if typ == b"IHDR":
            w, h = struct.unpack(">II", data[:8])
            bit_depth, color_type, _, _, interlace = data[8:13]
        elif typ == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # len + type + crc
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNG")
    if bit_depth != 8:
        raise NotImplementedError(f"PNG bit depth {bit_depth} (only 8)")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG IDAT truncated")
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels
    for y in range(h):
        row = np.frombuffer(raw, dtype=np.uint8,
                            count=stride, offset=y * (stride + 1) + 1)
        ftype = raw[y * (stride + 1)]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            out[y] = row
        elif ftype == 2:  # Up — vectorized
            out[y] = row + prev
        elif ftype == 1:  # Sub — sequential along x
            cur = out[y]
            cur[:bpp] = row[:bpp]
            for x in range(bpp, stride):
                cur[x] = (int(row[x]) + int(cur[x - bpp])) & 0xFF
        elif ftype == 3:  # Average
            cur = out[y]
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = out[y]
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                cur[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
    px = out.reshape(h, w, channels)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        px = palette[px[:, :, 0]]
    return px


def decode_bmp_pixels(payload: bytes):
    """Decode an uncompressed (BI_RGB) 24/32-bit bottom-up BMP to an
    ``(h, w, 3|4)`` uint8 RGB(A) numpy array."""
    import struct

    import numpy as np

    b = bytes(payload or b"")
    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack("<I", b[10:14])
    w, h = struct.unpack("<ii", b[18:26])
    bpp, comp = struct.unpack("<HI", b[28:34])
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP compression={comp} bpp={bpp}")
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    rows = []
    for y in range(abs(h)):
        row = np.frombuffer(b, dtype=np.uint8, count=w * nch,
                            offset=off + y * stride).reshape(w, nch)
        rows.append(row)
    if h > 0:  # bottom-up storage
        rows.reverse()
    px = np.stack(rows)  # BGR(A) -> RGB(A)
    order = [2, 1, 0] + ([3] if nch == 4 else [])
    return px[:, :, order]


def decode_image_pixels(payload: bytes):
    """Dispatch on container magic; returns ``(h, w, c)`` uint8 array."""
    b = bytes(payload or b"")
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png_pixels(b)
    if b[:2] == b"BM":
        return decode_bmp_pixels(b)
    hdr = parse_image_header(b)
    kind = hdr["mime"] if hdr else "unrecognized container"
    raise NotImplementedError(
        f"pixel decode for {kind} needs an entropy/DCT codec (PIL/ffmpeg); "
        "PNG and uncompressed BMP decode natively")


def image_pixel_decoder(payload: bytes) -> dict:
    """``real_decoder``-compatible FULL decode: feat = [width, height,
    channels, mean pixel value] computed from actual decoded pixels."""
    px = decode_image_pixels(payload)
    h, w, c = px.shape
    return {"n_bytes": len(payload or b""),
            "feat": [float(w), float(h), float(c), float(px.mean())]}


def resize_nearest(px, out_h: int, out_w: int):
    """Nearest-neighbor resize of an ``(h, w, c)`` array — pure numpy
    index-gather, the standard cheap thumbnail path."""
    import numpy as np

    h, w = px.shape[:2]
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return px[ys][:, xs]


def thumbnail_decoder(out_h: int = 8, out_w: int = 8):
    """Build a ``real_decoder`` that fully decodes, resizes (nearest) and
    emits the grayscale thumbnail as the feature vector — the classic
    perceptual-hash front end, all real computation."""
    def dec(payload: bytes) -> dict:
        px = decode_image_pixels(payload)
        th = resize_nearest(px.astype("float64"), out_h, out_w)
        gray = th.mean(axis=2) if th.ndim == 3 else th
        return {"n_bytes": len(payload or b""),
                "feat": [float(v) for v in gray.ravel()]}
    return dec


def decode_image_meta(sdf: DataFrame, media_col: str = "media",
                      target_partition_mb: int | None = 64) -> DataFrame:
    """Fill the media struct's ``meta`` (mime/width/height) by parsing the
    REAL container headers — Arrow-batched ``mapInPandas``, size-aware
    partitioning, same plumbing as decode_features.  Unrecognized payloads
    keep their packed mime and null dimensions (no per-row raise: corpus
    scans must not die on one bad file)."""
    import pandas as pd

    cols = sdf.columns
    schema = T.StructType([sdf.schema[c] for c in cols])

    def run(batches):
        for pdf in batches:
            metas = []
            for m in pdf[media_col]:
                hdr = parse_image_header(m["data"])
                meta = dict(m["meta"]) if m["meta"] is not None else {
                    "mime": None, "n_bytes": None,
                    "width": None, "height": None}
                nb = len(m["data"] or b"")
                meta["n_bytes"] = nb
                if hdr is not None:
                    meta.update(mime=hdr["mime"], width=hdr["width"],
                                height=hdr["height"])
                metas.append({"uri": m["uri"], "data": m["data"],
                              "meta": meta})
            pdf = pdf.copy()
            pdf[media_col] = metas
            yield pdf

    narrow = sdf
    if target_partition_mb is not None:
        total = narrow.select(
            F.sum(F.octet_length(F.col(f"{media_col}.data")))).first()[0] or 0
        n_parts = max(1, int(total // (target_partition_mb * 1024 * 1024)) + 1)
        if n_parts > narrow.rdd.getNumPartitions():
            narrow = narrow.repartition(n_parts)
    return narrow.mapInPandas(run, schema)


def frame_sample(sdf: DataFrame, media_col: str = "media", every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing (STUB): emits (frame_no) rows per media
    item via posexplode over a planned frame grid; the actual frame decode is
    the stubbed codec step above."""
    n_frames = (F.col(f"{media_col}.meta.n_bytes") / 1000).cast("int")  # fake: 1 frame/KB
    grid = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return sdf.withColumn("frame_no", F.explode(grid))
