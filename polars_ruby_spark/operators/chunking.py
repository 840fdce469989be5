"""Token-window document chunking for training pipelines (beyond-reference).

Splits each document into overlapping fixed-size token windows — the standard
pre-tokenization step before sequence packing (``operators.packing``).  Pure
JVM-side array kernels (``split``/``sequence``/``slice``/``array_join`` +
``posexplode``): no Python, no shuffle — the explode happens in the same stage
as the scan, so at 100 TB this is embarrassingly parallel map work whose
output feeds ``pack_greedy`` or a tokenizer directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_tokens(sdf: DataFrame, size: int = 64, stride: int = 48,
                 text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Explode each document into token windows of ``size`` tokens starting
    every ``stride`` tokens (overlap = size - stride); the final window may be
    shorter.  Returns (id, chunk_id, n_tokens, chunk_text), one row per
    window, ``chunk_id`` counting from 0 within each document.

    Scale shape: window starts come from ``F.sequence`` over the token count
    and ``F.slice`` re-reads the already-split token array, so each input row
    expands locally in its scan partition — no shuffle, no UDF, and column
    pruning still reaches the parquet scan.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    out = (sdf
           .withColumn("__toks", toks)
           .withColumn("__n", n)
           .select(id_col, "__toks", "__n",
                   F.posexplode(F.sequence(F.lit(0), F.col("__n") - 1,
                                           F.lit(stride))).alias("__cid", "__start"))
           .select(F.col(id_col),
                   F.col("__cid").cast("int").alias("chunk_id"),
                   F.least(F.lit(size), F.col("__n") - F.col("__start"))
                    .cast("int").alias("n_tokens"),
                   F.array_join(F.slice(F.col("__toks"), F.col("__start") + 1,
                                        F.lit(size)), " ").alias("chunk_text")))
    return out
