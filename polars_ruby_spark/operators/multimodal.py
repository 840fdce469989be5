"""Multimodal column plumbing (beyond-reference; BASELINE.json north star).

Media (image/audio/video) travel as opaque ``binary`` columns with a typed
metadata struct — the Spark-side schema, partitioning, Arrow batch shape and
UDF signatures here are real and tested.  The codec layer is REAL where the
stdlib + numpy suffice: container-header parse for PNG/JPEG/GIF/BMP
(``parse_image_header``) and FULL pixel decode for PNG (zlib inflate +
scanline unfilter), baseline-DCT JPEG (huffman entropy decode + vectorized
IDCT + chroma upsample, with a matching fixture encoder), GIF (variable-
width LZW + interlace + palette, with a fixture encoder) and uncompressed
BMP (``decode_image_pixels``), plus nearest-neighbor resize
(``resize_nearest``).  JPEG covers BOTH baseline (SOF0/1) and
progressive (SOF2, multi-scan successive approximation) streams; PNG
covers every legal bit depth (1/2/4/8/16) and Adam7 interlace.  AUDIO decodes RIFF/WAVE PCM
(8/16/24/32-bit + float32) and VIDEO decodes MJPEG-in-AVI frames through
the JPEG decoder.  Only lossless/arithmetic JPEG, compressed audio
(mp3/aac) and inter-frame video codecs (h264 &c) stay behind a
clearly-marked ``NotImplementedError`` boundary until PIL/ffmpeg are
available; a deterministic fake keeps those pipelines testable
end-to-end.

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
# Container HEADERS are plain struct reads: PNG IHDR, JPEG SOFn, GIF logical
# screen, BMP info header.  Cheap metadata-only scans (dimensions/channels/
# bit depth) never touch the entropy-coded payload; the FULL pixel decoders
# below handle PNG/JPEG/GIF/BMP when pixels are actually needed.

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
# per-scanline unfilter (PNG filters 0-4, byte-wise for 16-bit samples,
# Adam7 pass re-gridding) and padded-row BGR reads (BMP).  These are REAL
# codecs — bytes in, pixel array out — running inside the same
# Arrow-batched ``mapInPandas`` stage; JPEG/GIF decode in their own
# sections below.

#: Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec §8.2)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _png_unfilter(raw, offset, rows, stride, bpp):
    """Undo per-scanline filters 0-4 over a ``rows x stride`` byte block
    starting at ``raw[offset]`` (each row prefixed by its filter byte);
    returns (uint8 array (rows, stride), bytes consumed)."""
    import numpy as np

    out = np.zeros((rows, stride), dtype=np.uint8)
    for y in range(rows):
        base = offset + y * (stride + 1)
        ftype = raw[base]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride,
                            offset=base + 1)
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
    return out, rows * (stride + 1)


def decode_png_pixels(payload: bytes):
    """Decode a PNG (any bit depth, non-interlaced or Adam7) to an
    ``(h, w, channels)`` uint8 numpy array (16-bit samples take their high
    byte; 1/2/4-bit grays scale to 8-bit, palette indices resolve through
    PLTE).  Color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
    6 (RGBA) — every legal PNG bit depth decodes."""
    import struct
    import zlib

    import numpy as np

    b = bytes(payload or b"")
    if len(b) < 8 or b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, palette = 8, [], None
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
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    if bit_depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"invalid PNG bit depth {bit_depth}")
    sub_byte = bit_depth < 8  # gray/palette only per spec; channels == 1
    sb = max(bit_depth // 8, 1)  # bytes per sample; filtering is BYTE-wise
    bpp = channels * sb
    raw = zlib.decompress(b"".join(idat))

    def to_px(block, rows, cols):
        if sub_byte:
            # MSB-first packed samples -> one value per pixel; grayscale
            # scales to 8-bit (255/(2^d-1) is exact for d in 1/2/4),
            # palette keeps raw indices
            bits = np.unpackbits(block, axis=1)[:, :cols * bit_depth]
            weights = 1 << np.arange(bit_depth - 1, -1, -1)
            vals = (bits.reshape(rows, cols, bit_depth)
                    * weights[None, None, :]).sum(axis=2)
            if color_type == 0:
                vals = vals * (255 // ((1 << bit_depth) - 1))
            return vals.astype(np.uint8)[:, :, None]
        if sb == 2:
            # big-endian 16-bit samples -> high byte (8-bit downsample)
            return (block.reshape(rows, cols * channels, 2)[:, :, 0]
                    .reshape(rows, cols, channels))
        return block.reshape(rows, cols, channels)

    def row_stride(cols):
        if sub_byte:
            return (cols * bit_depth + 7) // 8
        return cols * bpp

    if not interlace:
        stride = row_stride(w)
        if len(raw) < h * (stride + 1):
            raise ValueError("PNG IDAT truncated")
        block, _ = _png_unfilter(raw, 0, h, stride, bpp)
        px = to_px(block, h, w)
    else:  # Adam7: 7 independently-filtered sub-images, re-gridded
        px = np.zeros((h, w, channels), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            stride = row_stride(pw)
            block, used = _png_unfilter(raw, off, ph, stride, bpp)
            off += used
            px[y0::dy, x0::dx] = to_px(block, ph, pw)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        px = palette[px[:, :, 0]]
    return px


def _bmp_rle_decode(data, w, h, four_bit):
    """BI_RLE8/BI_RLE4 -> (h, w) palette-index array (bottom-up rows).
    Escapes: 00 00 = end of line, 00 01 = end of bitmap, 00 02 dx dy =
    delta, 00 n>=3 = absolute run (word-aligned)."""
    import numpy as np

    out = np.zeros((h, w), dtype=np.uint8)
    x = y = i = 0
    n = len(data)
    while i + 1 < n and y < h:
        c, v = data[i], data[i + 1]
        i += 2
        if c > 0:  # encoded run
            if four_bit:
                pair = [(v >> 4) & 15, v & 15]
                for k in range(c):
                    if x < w:
                        out[y, x] = pair[k & 1]
                        x += 1
            else:
                end = min(x + c, w)
                out[y, x:end] = v
                x = end
        elif v == 0:  # end of line
            x, y = 0, y + 1
        elif v == 1:  # end of bitmap
            break
        elif v == 2:  # delta
            x += data[i]
            y += data[i + 1]
            i += 2
        else:  # absolute mode: v literal pixels, word-aligned
            if four_bit:
                nbytes = (v + 1) // 2
                for k in range(v):
                    byte = data[i + k // 2]
                    px = (byte >> 4) & 15 if k % 2 == 0 else byte & 15
                    if x < w:
                        out[y, x] = px
                        x += 1
                i += nbytes + (nbytes & 1)
            else:
                end = min(x + v, w)
                out[y, x:end] = np.frombuffer(
                    data, np.uint8, end - x, i)
                x = end
                i += v + (v & 1)
    return out


def decode_bmp_pixels(payload: bytes):
    """Decode a BMP to an ``(h, w, 3|4)`` uint8 RGB(A) array: uncompressed
    24/32-bit truecolor, palette 1/4/8-bit, and RLE4/RLE8 compression."""
    import struct

    import numpy as np

    b = bytes(payload or b"")
    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack("<I", b[10:14])
    (hdr_size,) = struct.unpack("<I", b[14:18])
    w, h = struct.unpack("<ii", b[18:26])
    bpp, comp = struct.unpack("<HI", b[28:34])
    (clr_used,) = struct.unpack("<I", b[46:50])
    hh = abs(h)
    if bpp in (24, 32) and comp == 0:
        nch = bpp // 8
        stride = (w * nch + 3) & ~3
        rows = []
        for y in range(hh):
            row = np.frombuffer(b, dtype=np.uint8, count=w * nch,
                                offset=off + y * stride).reshape(w, nch)
            rows.append(row)
        if h > 0:  # bottom-up storage
            rows.reverse()
        px = np.stack(rows)  # BGR(A) -> RGB(A)
        order = [2, 1, 0] + ([3] if nch == 4 else [])
        return px[:, :, order]
    if bpp not in (1, 4, 8) or comp not in (0, 1, 2):
        raise NotImplementedError(
            f"BMP compression={comp} bpp={bpp} (BI_RGB 1/4/8/24/32 and "
            "RLE4/RLE8 decode natively)")
    n_pal = clr_used or (1 << bpp)
    pal_off = 14 + hdr_size
    pal = np.frombuffer(b, np.uint8, n_pal * 4, pal_off).reshape(-1, 4)
    palette = pal[:, [2, 1, 0]]  # BGRX -> RGB
    if comp in (1, 2):  # RLE8 / RLE4 (bottom-up per spec)
        idx = _bmp_rle_decode(b[off:], w, hh, four_bit=(comp == 2))
        idx = idx[::-1] if h > 0 else idx
    else:  # uncompressed palette rows, bit-packed MSB-first, 4-byte padded
        stride = ((w * bpp + 31) // 32) * 4
        rows = []
        for y in range(hh):
            raw = np.frombuffer(b, np.uint8, stride, off + y * stride)
            if bpp == 8:
                rows.append(raw[:w])
            else:
                bits = np.unpackbits(raw)[:w * bpp]
                weights = 1 << np.arange(bpp - 1, -1, -1)
                rows.append((bits.reshape(w, bpp)
                             * weights[None, :]).sum(axis=1)
                            .astype(np.uint8))
        if h > 0:
            rows.reverse()
        idx = np.stack(rows)
    return palette[np.clip(idx, 0, n_pal - 1)]


# -- baseline JPEG codec (round-5) --------------------------------------------
#
# Full baseline-DCT JPEG decode with the stdlib + numpy: segment parse,
# canonical huffman entropy decode (byte-stuffing + restart markers), dequant
# + de-zigzag, vectorized 8x8 IDCT over all blocks at once, chroma upsample
# for arbitrary h/v sampling factors, YCbCr->RGB.  Progressive (SOF2)
# streams accumulate coefficients across DC/AC first + refinement scans
# (spectral selection, successive approximation, EOB runs) before the same
# reconstruct; lossless/arithmetic JPEG remains the documented boundary.
# A minimal baseline ENCODER (4:4:4 / 4:2:0, custom flat-length huffman
# tables, optional restart interval) exists so tests can build real JPEG
# fixtures and round-trip property checks without PIL.

#: zigzag scan order: zigzag index -> natural (row-major) index (ITU T.81
#: figure 5 — public spec data).
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _jpeg_build_huff(counts, symbols):
    """Canonical huffman assignment: {(length, code): symbol}."""
    table = {}
    code = k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data: un-stuffs 0xFF00,
    byte-aligns and consumes RSTn at restart boundaries."""

    def __init__(self, buf, pos):
        self.b = buf
        self.pos = pos
        self.cur = 0
        self.nbits = 0

    def read_bit(self):
        if self.nbits == 0:
            if self.pos >= len(self.b):
                raise ValueError("JPEG entropy data truncated")
            byte = self.b[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.b[self.pos] if self.pos < len(self.b) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    # marker mid-entropy (EOI short reads): pad with zeros,
                    # the spec-sanctioned behaviour for truncated final bits
                    self.pos -= 1
                    byte = 0
            self.cur = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def receive(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self):
        """Byte-align and consume an RSTn marker."""
        self.nbits = 0
        while self.pos + 1 < len(self.b) and self.b[self.pos] != 0xFF:
            self.pos += 1  # tolerate padding
        if self.pos + 1 < len(self.b) and 0xD0 <= self.b[self.pos + 1] <= 0xD7:
            self.pos += 2


def _jpeg_huff_decode(br, table):
    length = code = 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG huffman code")


def _jpeg_extend(v, t):
    return v - ((1 << t) - 1) if t and v < (1 << (t - 1)) else v


def _idct_8x8_basis():
    import numpy as np

    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16)
    c[0] *= 1 / np.sqrt(2)
    return c * 0.5


def decode_jpeg_pixels(payload: bytes):
    """Decode a baseline (SOF0/SOF1) or progressive (SOF2) JPEG to an
    ``(h, w, c)`` uint8 array (c = 1 grayscale, 3 RGB).  Raises
    NotImplementedError for lossless or arithmetic-coded streams."""
    import struct

    import numpy as np

    b = bytes(payload or b"")
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt, huff = {}, {}
    frame = None
    restart_interval = 0
    prog_scans: list = []
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
        seg = b[i + 4:i + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    qt[tq] = np.frombuffer(
                        seg[p:p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                else:
                    qt[tq] = np.frombuffer(
                        seg[p:p + 128], dtype=">u2").astype(np.int32)
                    p += 128
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext seq / progressive
            h, w = struct.unpack(">HH", seg[1:5])
            comps = []
            for ci in range(seg[5]):
                cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "lossless/arithmetic-coded JPEG; only huffman baseline "
                "(SOF0/SOF1) and progressive (SOF2) decode natively")
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1:p + 17])
                nsym = sum(counts)
                huff[(tc, th)] = _jpeg_build_huff(
                    counts, list(seg[p + 17:p + 17 + nsym]))
                p += 17 + nsym
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy-coded scan follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for ci in range(ns):
                cs, t = seg[1 + 2 * ci], seg[2 + 2 * ci]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, t >> 4, t & 15))
            if not frame["progressive"]:
                return _jpeg_decode_scan(b, i + 2 + seg_len, frame, qt,
                                         huff, scan, restart_interval)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            data_pos = i + 2 + seg_len
            prog_scans.append({
                "comps": scan, "ss": ss, "se": se,
                "ah": ahal >> 4, "al": ahal & 15,
                "pos": data_pos, "ri": restart_interval,
                # snapshot the tables: DHT segments may redefine them
                # between scans
                "huff": dict(huff),
            })
            i = _jpeg_skip_entropy(b, data_pos)
            continue
        i += 2 + seg_len
    if frame is not None and frame.get("progressive") and prog_scans:
        return _jpeg_decode_progressive(b, frame, qt, prog_scans)
    raise ValueError("JPEG missing SOS scan")


def _jpeg_decode_scan(b, pos, frame, qt, huff, scan, restart_interval):
    import numpy as np

    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component zigzag coefficient store: (blocks_y, blocks_x, 64)
    coefs = [np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
             for c, _, _ in scan]
    preds = [0] * len(scan)
    br = _JpegBitReader(b, pos)
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            br.restart()
            preds = [0] * len(scan)
        my, mx = divmod(m, mcux)
        for ci, (comp, td, ta) in enumerate(scan):
            dc_tbl, ac_tbl = huff[(0, td)], huff[(1, ta)]
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    blk = coefs[ci][my * comp["v"] + by,
                                    mx * comp["h"] + bx]
                    t = _jpeg_huff_decode(br, dc_tbl)
                    preds[ci] += _jpeg_extend(br.receive(t), t) if t else 0
                    blk[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = _jpeg_huff_decode(br, ac_tbl)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:  # ZRL: 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC index overflow")
                        blk[k] = _jpeg_extend(br.receive(s), s)
                        k += 1
    return _jpeg_reconstruct(frame, qt, [c for c, _, _ in scan], coefs)


def _jpeg_reconstruct(frame, qt, comps, coefs):
    """Shared tail: dequantize + de-zigzag + one vectorized IDCT per
    component, chroma upsample, YCbCr->RGB."""
    import numpy as np

    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    zz = np.array(_JPEG_ZIGZAG)
    inv = np.empty(64, dtype=np.int64)
    inv[zz] = np.arange(64)
    basis = _idct_8x8_basis()
    planes = []
    for ci, comp in enumerate(comps):
        by, bx, _ = coefs[ci].shape
        deq = coefs[ci] * qt[comp["tq"]][None, None, :]
        nat = deq[:, :, inv].reshape(by * bx, 8, 8).astype(np.float64)
        px = np.einsum("ux,nuv,vy->nxy", basis, nat, basis) + 128.0
        plane = (px.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(by * 8, bx * 8))
        # chroma upsample to full-resolution grid
        plane = np.repeat(np.repeat(plane, vmax // comp["v"], axis=0),
                          hmax // comp["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        out = planes[0][:, :, None]
    else:
        y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
        out = np.stack([y + 1.402 * cr,
                        y - 0.344136 * cb - 0.714136 * cr,
                        y + 1.772 * cb], axis=2)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _jpeg_skip_entropy(b, pos):
    """Advance past entropy-coded data to the next true marker (skips
    stuffed 0xFF00 and RSTn)."""
    while pos + 1 < len(b):
        if b[pos] != 0xFF:
            pos += 1
            continue
        nxt = b[pos + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            pos += 2
            continue
        return pos
    return len(b)


def _jpeg_decode_progressive(b, frame, qt, scans):
    """Progressive (SOF2) JPEG: accumulate coefficients across DC/AC
    first + refinement scans (spectral selection Ss..Se, successive
    approximation Ah/Al, EOB runs), then the shared reconstruct."""
    import numpy as np

    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coefs = [np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
             for c in comps]
    cidx = {c["id"]: i for i, c in enumerate(comps)}

    for sc in scans:
        br = _JpegBitReader(b, sc["pos"])
        ss, se, ah, al = sc["ss"], sc["se"], sc["ah"], sc["al"]
        huff = sc["huff"]
        ri = sc["ri"]
        scomps = sc["comps"]
        eobrun = 0
        preds = [0] * len(scomps)
        p1, m1 = 1 << al, -(1 << al)

        def refine_band(blk, k_from, k_to):
            # NB: the coefficient store is ZIGZAG-ordered (like baseline)
            for kk in range(k_from, k_to + 1):
                if blk[kk]:
                    if br.read_bit() and (blk[kk] & p1) == 0:
                        blk[kk] += p1 if blk[kk] > 0 else m1

        def do_block(blk, si):
            nonlocal eobrun
            if ss == 0:  # DC scan
                if ah == 0:
                    _, td, _ = scomps[si]
                    t = _jpeg_huff_decode(br, huff[(0, td)])
                    preds[si] += (_jpeg_extend(br.receive(t), t)
                                  if t else 0)
                    blk[0] = preds[si] * p1
                else:  # DC refinement: one bit
                    if br.read_bit():
                        blk[0] |= p1
                return
            _, _, ta = scomps[si]
            ac_tbl = huff[(1, ta)]
            if ah == 0:  # AC first pass
                if eobrun:
                    eobrun -= 1
                    return
                k = ss
                while k <= se:
                    rs = _jpeg_huff_decode(br, ac_tbl)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.receive(r)
                            return
                        k += 16
                        continue
                    k += r
                    if k > se:
                        raise ValueError("JPEG AC index overflow")
                    blk[k] = _jpeg_extend(br.receive(s), s) * p1
                    k += 1
                return
            # AC refinement pass
            if eobrun:
                eobrun -= 1
                refine_band(blk, ss, se)
                return
            k = ss
            while k <= se:
                rs = _jpeg_huff_decode(br, ac_tbl)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.receive(r)
                        refine_band(blk, k, se)
                        return
                    val = 0  # ZRL: pass 16 zero-history coeffs
                else:
                    val = p1 if br.read_bit() else m1
                while k <= se:
                    if blk[k]:
                        if br.read_bit() and (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] > 0 else m1
                    else:
                        if r == 0:
                            if val:
                                blk[k] = val
                            k += 1
                            break
                        r -= 1
                    k += 1

        if len(scomps) > 1:  # interleaved (DC scans only, per spec)
            for m in range(mcux * mcuy):
                if ri and m and m % ri == 0:
                    br.restart()
                    preds = [0] * len(scomps)
                    eobrun = 0
                my, mx = divmod(m, mcux)
                for si, (comp, _, _) in enumerate(scomps):
                    fi = cidx[comp["id"]]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            do_block(coefs[fi][my * comp["v"] + by,
                                               mx * comp["h"] + bx], si)
        else:  # non-interleaved: the component's own ceil-grid, row-major
            comp = scomps[0][0]
            fi = cidx[comp["id"]]
            cw = -(-(w * comp["h"]) // hmax)
            ch = -(-(h * comp["v"]) // vmax)
            cols, rows = -(-cw // 8), -(-ch // 8)
            for du in range(rows * cols):
                if ri and du and du % ri == 0:
                    br.restart()
                    preds = [0] * len(scomps)
                    eobrun = 0
                do_block(coefs[fi][du // cols, du % cols], 0)

    return _jpeg_reconstruct(frame, qt, comps, coefs)


def encode_jpeg_baseline(px, quant: int = 1, subsampling: str = "444",
                         restart_interval: int = 0) -> bytes:
    """Encode an ``(h, w, 3)`` RGB or ``(h, w)``/``(h, w, 1)`` grayscale
    uint8 array as a baseline JFIF JPEG.  Fixture/round-trip support (the
    environment has no PIL): flat quantization tables of value ``quant``
    (1 = near-lossless) and simple fixed-length huffman tables — any
    canonical table is valid JPEG; decoders read them from the DHT segment.
    """
    import struct

    import numpy as np

    px = np.asarray(px, dtype=np.float64)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nch = px.shape
    if nch == 3:
        r, g, bl = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * bl,
                  128.0 - 0.168736 * r - 0.331264 * g + 0.5 * bl,
                  128.0 + 0.5 * r - 0.418688 * g - 0.081312 * bl]
        sub = {"444": [(1, 1)] * 3, "420": [(2, 2), (1, 1), (1, 1)]}[
            subsampling]
    elif nch == 1:
        planes, sub = [px[:, :, 0]], [(1, 1)]
    else:
        raise ValueError("encode_jpeg_baseline: 1 or 3 channels")
    hmax = max(s[0] for s in sub)
    vmax = max(s[1] for s in sub)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    def block_split(plane, sh, sv):
        # downsample by box mean, pad to the MCU grid by edge replication
        if sh != hmax or sv != vmax:
            fy, fx = vmax // sv, hmax // sh
            py, pxw = -(-plane.shape[0] // fy) * fy, -(-plane.shape[1] // fx) * fx
            plane = np.pad(plane, ((0, py - plane.shape[0]),
                                   (0, pxw - plane.shape[1])), mode="edge")
            plane = plane.reshape(py // fy, fy, pxw // fx, fx).mean(axis=(1, 3))
        ty, tx = mcuy * sv * 8, mcux * sh * 8
        plane = np.pad(plane, ((0, ty - plane.shape[0]),
                               (0, tx - plane.shape[1])), mode="edge")
        return plane

    basis = _idct_8x8_basis()
    zz = np.array(_JPEG_ZIGZAG)
    qtab = np.full(64, max(1, int(quant)), dtype=np.int32)
    comp_blocks = []
    for plane, (sh, sv) in zip(planes, sub):
        p = block_split(plane, sh, sv) - 128.0
        by, bx = p.shape[0] // 8, p.shape[1] // 8
        blocks = (p.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
                  .reshape(by * bx, 8, 8))
        # forward DCT = basis @ f @ basis.T (orthonormal pair of the IDCT)
        coef = np.einsum("ux,nxy,vy->nuv", basis, blocks, basis)
        # natural -> zigzag, quantize
        qz = (coef.reshape(by * bx, 64)[:, zz]
              / qtab[None, :]).round().astype(np.int32)
        comp_blocks.append(qz.reshape(by, bx, 64))

    # fixed-length canonical huffman over the FULL symbol alphabet — any
    # canonical table is valid JPEG (the decoder reads DHT); fixed alphabets
    # keep the encoder restart-reset-proof and stateless
    def make_table(symbols):
        L = 1
        while (1 << L) < len(symbols) + 1:
            L += 1
        counts = [0] * 16
        counts[L - 1] = len(symbols)
        enc = {}
        code = k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                enc[symbols[k]] = (length, code)
                k += 1
                code += 1
            code <<= 1
        return counts, symbols, enc

    def csize(v):
        s = 0
        a = abs(int(v))
        while a:
            s += 1
            a >>= 1
        return s

    ncls = 1 if len(comp_blocks) == 1 else 2
    dc_alphabet = list(range(12))  # size classes 0..11
    ac_alphabet = ([0x00, 0xF0]
                   + [(r << 4) | s for r in range(16) for s in range(1, 11)])
    dc_tbls = [make_table(dc_alphabet) for _ in range(ncls)]
    ac_tbls = [make_table(ac_alphabet) for _ in range(ncls)]

    class _W:
        def __init__(self):
            self.out = bytearray()
            self.acc = 0
            self.n = 0

        def put(self, code, length):
            self.acc = (self.acc << length) | (code & ((1 << length) - 1))
            self.n += length
            while self.n >= 8:
                byte = (self.acc >> (self.n - 8)) & 0xFF
                self.out.append(byte)
                if byte == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.n -= 8

        def flush(self):
            if self.n:
                self.put(0x7F, 8 - self.n)  # pad with 1s per spec

    wtr = _W()

    def emit_block(blk, prev, enc_dc, enc_ac):
        diff = int(blk[0]) - prev
        s = csize(diff)
        ln, code = enc_dc[s]
        wtr.put(code, ln)
        if s:
            v = diff if diff >= 0 else diff + (1 << s) - 1
            wtr.put(v, s)
        run = 0
        for k in range(1, 64):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = enc_ac[0xF0]
                wtr.put(code, ln)
                run -= 16
            s = csize(v)
            ln, code = enc_ac[(run << 4) | s]
            wtr.put(code, ln)
            vv = v if v >= 0 else v + (1 << s) - 1
            wtr.put(vv, s)
            run = 0
        if run:
            ln, code = enc_ac[0x00]
            wtr.put(code, ln)
        return int(blk[0])

    preds = [0] * len(comp_blocks)
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            wtr.flush()
            wtr.out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            preds = [0] * len(comp_blocks)
        my, mx = divmod(m, mcux)
        for ci, ((sh, sv), blocks) in enumerate(zip(sub, comp_blocks)):
            cls = 0 if ci == 0 else 1
            for byy in range(sv):
                for bxx in range(sh):
                    preds[ci] = emit_block(
                        blocks[my * sv + byy, mx * sh + bxx], preds[ci],
                        dc_tbls[cls][2], ac_tbls[cls][2])
    wtr.flush()

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]))
        out.extend(struct.pack(">H", len(body) + 2))
        out.extend(body)

    for tq in range(ncls):
        seg(0xDB, bytes([tq]) + bytes(int(x) for x in qtab))
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([len(comp_blocks)])
    for ci, (sh, sv) in enumerate(sub):
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else ncls - 1])
    seg(0xC0, bytes(sof))
    for cls in range(ncls):
        for tc, (counts, symbols, _) in ((0, dc_tbls[cls]), (1, ac_tbls[cls])):
            seg(0xC4, bytes([(tc << 4) | cls]) + bytes(counts)
                + bytes(symbols))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([len(comp_blocks)])
    for ci in range(len(comp_blocks)):
        cls = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (cls << 4) | cls])
    sos += bytes([0, 63, 0])
    seg(0xDA, bytes(sos))
    out.extend(wtr.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


# -- GIF codec (round-5) -------------------------------------------------------
#
# Full GIF87a/89a first-frame decode with the stdlib + numpy: logical screen
# + color tables, extension skip (transparency noted), variable-width
# LSB-first LZW with clear/EOI and the deferred-first-add rule, Adam-style
# 4-pass interlace reorder, palette resolve to RGB.  A minimal fixture
# ENCODER writes valid GIF89a streams via the fixed-width literal-code +
# periodic-clear construction (every pixel its own code; a CLEAR resets the
# dictionary before any width growth) so tests round-trip without PIL.

def _gif_lzw_decode(data: bytes, min_code: int, npix: int):
    """Variable-width LSB-first GIF LZW -> list of palette indices."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out: list = []
    table: dict = {}
    width = min_code + 1
    next_code = eoi + 1
    prev = None

    def reset():
        nonlocal table, width, next_code, prev
        table = {i: [i] for i in range(clear)}
        width = min_code + 1
        next_code = eoi + 1
        prev = None

    reset()
    acc = nbits = 0
    i = 0
    while len(out) < npix:
        while nbits < width:
            if i >= len(data):
                return out  # truncated stream: return what decoded
            acc |= data[i] << nbits
            nbits += 8
            i += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + [prev[0]]
            else:
                raise ValueError("corrupt GIF LZW stream")
            table[next_code] = prev + [entry[0]]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        out.extend(entry)
        prev = entry
    return out


def decode_gif_pixels(payload: bytes):
    """Decode the FIRST frame of a GIF87a/89a to an ``(h, w, 3)`` uint8
    RGB array (frame placed on the logical screen; transparency index
    resolves to its palette color)."""
    import struct

    import numpy as np

    b = bytes(payload or b"")
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack("<HH", b[6:10])
    packed = b[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(b, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(b):
        blk = b[pos]
        if blk == 0x3B:
            break
        if blk == 0x21:  # extension: skip sub-blocks
            pos += 2
            while pos < len(b) and b[pos] != 0:
                pos += b[pos] + 1
            pos += 1
            continue
        if blk != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{blk:02x}")
        left, top, iw, ih = struct.unpack("<HHHH", b[pos + 1:pos + 9])
        ipacked = b[pos + 9]
        pos += 10
        lct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 7)
            lct = np.frombuffer(b, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if lct is None:
            raise ValueError("GIF image without a color table")
        min_code = b[pos]
        pos += 1
        data = bytearray()
        while pos < len(b) and b[pos] != 0:
            ln = b[pos]
            data += b[pos + 1:pos + 1 + ln]
            pos += ln + 1
        idx = _gif_lzw_decode(bytes(data), min_code, iw * ih)
        idx = (idx + [0] * (iw * ih - len(idx)))[:iw * ih]
        arr = np.array(idx, dtype=np.int32).reshape(ih, iw)
        if ipacked & 0x40:  # 4-pass interlace: rows were stored pass-major
            order = ([*range(0, ih, 8)] + [*range(4, ih, 8)]
                     + [*range(2, ih, 4)] + [*range(1, ih, 2)])
            de = np.empty_like(arr)
            de[order] = arr
            arr = de
        frame = lct[np.clip(arr, 0, len(lct) - 1)]
        out = np.zeros((h, w, 3), dtype=np.uint8)
        out[top:top + ih, left:left + iw] = frame[:h - top, :w - left]
        return out
    raise ValueError("GIF missing image data")


def encode_gif(px, interlace: bool = False) -> bytes:
    """Encode an ``(h, w, 3)`` RGB uint8 array (≤256 distinct colors) as a
    single-frame GIF89a.  Fixture/round-trip support (no PIL): 256-entry
    global palette, 8-bit literal codes with a periodic CLEAR before any
    code-width growth — a valid (if uncompressed) LZW stream every decoder
    accepts."""
    import struct

    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = np.stack([px] * 3, axis=2)
    h, w, _ = px.shape
    flat = px.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif: more than 256 distinct colors")
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[:len(palette)] = palette
    idx = indices.reshape(h, w)
    if interlace:
        order = ([*range(0, h, 8)] + [*range(4, h, 8)]
                 + [*range(2, h, 4)] + [*range(1, h, 2)])
        idx = idx[order]
    seq = idx.reshape(-1)

    min_code = 8
    clear, eoi = 256, 257
    width = 9
    # decoder adds one dict entry per literal after the first post-clear
    # code; clear again before next_code (258 + emitted-1) reaches 512
    max_run = (1 << width) - eoi - 3
    codes: list = [clear]
    run = 0
    for v in seq:
        if run >= max_run:
            codes.append(clear)
            run = 0
        codes.append(int(v))
        run += 1
    codes.append(eoi)
    acc = nbits = 0
    stream = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        stream.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0xF7, 0, 0])          # GCT present, 256 entries
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0x00])
    out += bytes([min_code])
    for i in range(0, len(stream), 255):
        chunk = stream[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_image_pixels(payload: bytes):
    """Dispatch on container magic; returns ``(h, w, c)`` uint8 array."""
    b = bytes(payload or b"")
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png_pixels(b)
    if b[:2] == b"BM":
        return decode_bmp_pixels(b)
    if b[:2] == b"\xff\xd8":
        return decode_jpeg_pixels(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_pixels(b)
    hdr = parse_image_header(b)
    kind = hdr["mime"] if hdr else "unrecognized container"
    raise NotImplementedError(
        f"pixel decode for {kind} needs PIL/ffmpeg; PNG, baseline JPEG, "
        "GIF and uncompressed BMP decode natively")


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


# -- real audio (WAV/PCM) + video (MJPEG-in-AVI) codecs (round-5) --------------
#
# Audio and video stop being pure stubs where the stdlib reaches: RIFF/WAVE
# PCM decodes to a sample array (8/16/24/32-bit int + float32), and AVI
# containers carrying MJPEG streams ('00dc' chunks = whole JPEG frames)
# decode real frames through the baseline/progressive JPEG decoder above.
# Compressed audio (mp3/aac/opus) and inter-frame video codecs (h264 &c)
# remain the PIL/ffmpeg boundary.

def decode_wav_samples(payload: bytes):
    """Decode a RIFF/WAVE file to ``(samples(n, ch) float64 in [-1, 1],
    sample_rate)``.  PCM 8/16/24/32-bit and IEEE float32 supported."""
    import struct

    import numpy as np

    b = bytes(payload or b"")
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        (ln,) = struct.unpack("<I", b[pos + 4:pos + 8])
        body = b[pos + 8:pos + 8 + ln]
        if cid == b"fmt ":
            tag, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH",
                                                          body[:16])
            fmt = {"tag": tag, "ch": ch, "rate": rate, "bits": bits}
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, ch, bits = fmt["tag"], fmt["ch"], fmt["bits"]
    if tag == 3 and bits == 32:  # IEEE float
        arr = np.frombuffer(data, dtype="<f4").astype(np.float64)
    elif tag == 1 and bits == 8:
        arr = (np.frombuffer(data, dtype=np.uint8).astype(np.float64)
               - 128.0) / 128.0
    elif tag == 1 and bits == 16:
        arr = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif tag == 1 and bits == 24:
        raw = np.frombuffer(data, dtype=np.uint8)
        raw = raw[:len(raw) - len(raw) % 3].reshape(-1, 3).astype(np.int64)
        v = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        arr = v.astype(np.float64) / float(1 << 23)
    elif tag == 1 and bits == 32:
        arr = np.frombuffer(data, dtype="<i4").astype(np.float64) / float(1 << 31)
    else:
        raise NotImplementedError(
            f"WAV format tag={tag} bits={bits} (PCM 8/16/24/32 + float32 "
            "decode natively; compressed audio needs ffmpeg)")
    n = len(arr) - len(arr) % ch
    return arr[:n].reshape(-1, ch), fmt["rate"]


def encode_wav(samples, sample_rate: int = 16000) -> bytes:
    """Encode ``(n, ch)`` or ``(n,)`` float64 samples in [-1, 1] as 16-bit
    PCM WAV (fixture/round-trip support)."""
    import struct

    import numpy as np

    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    ch = s.shape[1]
    pcm = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * ch * 2, ch * 2, 16)
    out = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
           + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(data)) + data)
    return out


def audio_feature_decoder(payload: bytes) -> dict:
    """``real_decoder``-compatible WAV decode: feat = [sample_rate,
    n_samples, channels, RMS] from actual decoded PCM."""
    import numpy as np

    samples, rate = decode_wav_samples(payload)
    rms = float(np.sqrt((samples ** 2).mean())) if samples.size else 0.0
    return {"n_bytes": len(payload or b""),
            "feat": [float(rate), float(samples.shape[0]),
                     float(samples.shape[1]), rms]}


def extract_avi_mjpeg_frames(payload: bytes):
    """Yield the raw JPEG bytes of each video frame in an AVI container
    whose stream is MJPEG ('00dc'/'00db' chunks hold complete JPEGs) —
    pure RIFF chunk walking; each frame then decodes through
    ``decode_jpeg_pixels``."""
    import struct

    b = bytes(payload or b"")
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI")

    def walk(pos, end):
        while pos + 8 <= end:
            cid = b[pos:pos + 4]
            (ln,) = struct.unpack("<I", b[pos + 4:pos + 8])
            if cid == b"LIST":
                yield from walk(pos + 12, pos + 8 + ln)
            elif cid[2:4] in (b"dc", b"db") and ln >= 2 \
                    and b[pos + 8:pos + 10] == b"\xff\xd8":
                yield b[pos + 8:pos + 8 + ln]
            pos += 8 + ln + (ln & 1)

    yield from walk(12, len(b))


def encode_avi_mjpeg(frames, fps: int = 10) -> bytes:
    """Pack pre-encoded JPEG frames into a minimal MJPEG AVI (fixture
    support; headers carry dimensions from the first frame)."""
    import struct

    frames = [bytes(f) for f in frames]
    hdr0 = parse_image_header(frames[0]) if frames else {"width": 0,
                                                         "height": 0}
    w, h = hdr0["width"], hdr0["height"]

    def chunk(cid, body):
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind, body):
        return chunk(b"LIST", kind + body)

    avih = struct.pack("<14I", 1_000_000 // fps, 0, 0, 0x10, len(frames),
                       0, 1, 0, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1,
                                            fps, 0, len(frames), 0, 0, 0, 0))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def video_frame_features(sdf: DataFrame, media_col: str = "media",
                         id_col: str = "doc_id", every_n: int = 1,
                         target_partition_mb: int | None = 64) -> DataFrame:
    """REAL video frame sampling: decode every ``every_n``-th MJPEG frame
    of each AVI payload through the JPEG decoder, emitting one row per
    sampled frame (frame_no, width, height, mean_px) — Arrow-batched
    ``mapInPandas``, size-aware partitioning, same plumbing as
    decode_features."""
    import pandas as pd

    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_px", T.DoubleType()),
    ])

    def run(batches):
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                payload = bytes(row[media_col]["data"] or b"")
                for fno, jpg in enumerate(extract_avi_mjpeg_frames(payload)):
                    if fno % every_n:
                        continue
                    px = decode_jpeg_pixels(jpg)
                    recs.append((row[id_col], fno, px.shape[1], px.shape[0],
                                 float(px.mean())))
            yield pd.DataFrame(
                recs, columns=[id_col, "frame_no", "width", "height",
                               "mean_px"])

    narrow = sdf.select(id_col, media_col)
    if target_partition_mb is not None:
        total = narrow.select(
            F.sum(F.col(f"{media_col}.meta.n_bytes"))).first()[0] or 0
        n_parts = max(1, int(total // (target_partition_mb * 1024 * 1024)) + 1)
        if n_parts > narrow.rdd.getNumPartitions():
            narrow = narrow.repartition(n_parts)
    return narrow.mapInPandas(run, out_schema)
