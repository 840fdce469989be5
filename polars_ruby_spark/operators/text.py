"""Text-analysis operators for training-data pipelines (beyond-reference).

Language-ID (stopword-ratio heuristic), quality scoring, token counting,
document fingerprinting — all pure Catalyst expressions (split/filter/
regexp), deterministic, and DuckDB-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "you", "that"],
    "de": ["der", "die", "das", "und", "ist", "ich", "nicht", "mit", "ein", "zu"],
    "fr": ["le", "les", "et", "est", "je", "ne", "pas", "une", "pour", "que"],
    "es": ["el", "los", "y", "es", "no", "por", "con", "para", "se", "del"],
}

#: BPE-ish token pattern: letter runs, digit runs, single punctuation.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _tokens(col):
    return F.split(F.lower(col), " ")


def _stop_count(tokens, lang: str):
    arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens, lambda x: F.array_contains(arr, x)))


def language_id(sdf: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword heuristic language id → adds ``lang_pred``.

    Ties break in fixed order en>de>fr>es (documented, oracle-matched).
    """
    t = _tokens(F.col(text_col))
    se, sd, sf_, ss = (_stop_count(t, lang) for lang in ("en", "de", "fr", "es"))
    pred = (F.when((se >= sd) & (se >= sf_) & (se >= ss), "en")
            .when((sd >= sf_) & (sd >= ss), "de")
            .when(sf_ >= ss, "fr")
            .otherwise("es"))
    return sdf.withColumn("lang_pred", pred)


def quality_score(sdf: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality score in [0,1]: length + stopword density −
    punctuation density (the classic cheap pre-filter for LLM corpora)."""
    t = _tokens(F.col(text_col))
    n_tok = F.size(t)
    stop_ratio = _stop_count(t, "en").cast("double") / n_tok.cast("double")
    punct = F.regexp_count(F.col(text_col), F.lit(r"[.,!?;:]"))
    punct_ratio = punct.cast("double") / F.length(text_col).cast("double")
    len_score = F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
    score = F.round(0.4 * len_score + 0.4 * stop_ratio + 0.2 * (1.0 - punct_ratio), 4)
    return (sdf.withColumn("n_tokens", n_tok)
            .withColumn("stop_ratio", F.round(stop_ratio, 4))
            .withColumn("quality", score))


def token_count(sdf: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens (both counts)."""
    ws = F.size(_tokens(F.col(text_col)))
    bpe = F.regexp_count(F.col(text_col), F.lit(TOKEN_RE))
    return sdf.withColumn("ws_tokens", ws).withColumn("re_tokens", bpe)


def fingerprint(sdf: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set (catches shuffled near-copies that exact hash misses)."""
    t = F.array_sort(F.array_distinct(_tokens(F.col(text_col))))
    return sdf.withColumn("fingerprint", F.md5(F.array_join(t, " ")))


def rolling_fingerprint(sdf: DataFrame, text_col: str = "text",
                        base: int = 31, mod: int = 10**15) -> DataFrame:
    """Order-SENSITIVE Rabin-Karp polynomial fingerprint over the token
    stream: h = Σ h(tok_i)·base^(n-i) mod 10^15, with per-token hashes from
    md5's first 8 hex chars — bit-identical across engines (DuckDB mirrors
    with list_reduce).  Complements :func:`fingerprint`: detects reordered
    content as DIFFERENT, same content as SAME."""
    t = _tokens(F.col(text_col))

    def tok_hash(x):
        return F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long")

    fp = F.aggregate(t, F.lit(0).cast("long"),
                     lambda acc, x: (acc * base + tok_hash(x)) % mod)
    return sdf.withColumn("roll_fp", fp)
