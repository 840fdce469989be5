"""Multimodal column plumbing (beyond-reference; BASELINE.json north star).

Media (image/audio/video) travel as opaque ``binary`` columns with a typed
metadata struct — the Spark-side schema, partitioning, Arrow batch shape and
UDF signatures here are real and tested; the actual codec step is STUBBED
(image/audio libraries are not in this container) behind
``decode_image``'s ``real_decoder`` hook, with a deterministic fake so
pipelines are testable end-to-end.

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


def frame_sample(sdf: DataFrame, media_col: str = "media", every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing (STUB): emits (frame_no) rows per media
    item via posexplode over a planned frame grid; the actual frame decode is
    the stubbed codec step above."""
    n_frames = (F.col(f"{media_col}.meta.n_bytes") / 1000).cast("int")  # fake: 1 frame/KB
    grid = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return sdf.withColumn("frame_no", F.explode(grid))
