"""pandas-UDF factories.

Kept in a module WITHOUT ``from __future__ import annotations``: pandas_udf
resolves the ``pd.Series`` type hints at decoration time, and stringified
annotations (PEP 563) break that resolution.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


def make_scalar_pandas_udf(function, return_type, skip_nulls=True):
    """Vectorized scalar UDF over Arrow batches (SURVEY §2.9 map_elements)."""

    @pandas_udf(return_type)
    def _udf(s: pd.Series) -> pd.Series:
        if skip_nulls:
            return s.map(lambda v: None if v is None else function(v))
        return s.map(function)

    return _udf


_SPEARMAN_UDF = None


def spearman_arrays_udf():
    """Vectorized spearman-ρ over per-row value-array PAIRS (the rolling
    collect-window path, round-6).

    Each input row carries one window's aligned x/y arrays; the kernel is
    vectorized ACROSS rows: flatten all windows, rank per segment with
    average ties via one lexsort (O(W log W) for W total values — the same
    complexity polars' native per-window rank pays), then the pearson sums
    per segment via bincount.  An all-JVM HOF formulation of the same math
    ran 9s at sf0.1 (interpreted expression eval, no codegen for HOFs);
    this kernel runs the identical numbers in ~0.1s of numpy plus Arrow
    transfer.  Ranks per column are over that column's non-NaN values;
    pairs with a NaN on either side are excluded from the correlation
    (F.corr semantics).  Non-finite results (zero variance, empty window)
    return null — the shape the JVM formula's divide-by-zero produced."""
    global _SPEARMAN_UDF
    if _SPEARMAN_UDF is not None:
        return _SPEARMAN_UDF

    import numpy as np
    from pyspark.sql.types import DoubleType

    def _seg_ranks(vals, seg, n_vals):
        """Average-tie ranks within segments; NaN values keep NaN ranks."""
        mask = ~np.isnan(vals)
        v, s = vals[mask], seg[mask]
        order = np.lexsort((v, s))
        sv, ss = v[order], s[order]
        m = sv.size
        out = np.full(n_vals, np.nan)
        if m == 0:
            return out
        seg_change = np.r_[True, ss[1:] != ss[:-1]]
        seg_start_pos = np.flatnonzero(seg_change)
        start_of = np.repeat(
            seg_start_pos, np.diff(np.r_[seg_start_pos, m]))
        ordinal = np.arange(m) - start_of           # 0-based in segment
        newrun = np.r_[True, (sv[1:] != sv[:-1]) | seg_change[1:]]
        run_id = np.cumsum(newrun) - 1
        run_first = ordinal[newrun][run_id]
        run_sizes = np.bincount(run_id)
        avg = run_first + (run_sizes[run_id] - 1) / 2.0 + 1.0
        out[np.flatnonzero(mask)[order]] = avg
        return out

    @pandas_udf(DoubleType())
    def _udf(xa: pd.Series, xb: pd.Series) -> pd.Series:
        n = len(xa)
        lens = np.fromiter(
            (0 if v is None else len(v) for v in xa),
            dtype=np.int64, count=n)
        total = int(lens.sum())
        if total == 0:
            return pd.Series([None] * n, dtype="float64")
        seg = np.repeat(np.arange(n), lens)

        def flat(col):
            parts = [np.asarray(v, dtype=np.float64)
                     for v in col if v is not None and len(v)]
            return (np.concatenate(parts) if parts
                    else np.empty(0, dtype=np.float64))

        fa, fb = flat(xa), flat(xb)
        ra = _seg_ranks(fa, seg, total)
        rb = _seg_ranks(fb, seg, total)
        valid = ~np.isnan(ra) & ~np.isnan(rb)
        vs, va, vb = seg[valid], ra[valid], rb[valid]
        cnt = np.bincount(vs, minlength=n).astype(np.float64)
        sa = np.bincount(vs, weights=va, minlength=n)
        sb = np.bincount(vs, weights=vb, minlength=n)
        sab = np.bincount(vs, weights=va * vb, minlength=n)
        saa = np.bincount(vs, weights=va * va, minlength=n)
        sbb = np.bincount(vs, weights=vb * vb, minlength=n)
        with np.errstate(invalid="ignore", divide="ignore"):
            safe = np.where(cnt > 0, cnt, np.nan)
            cov = sab - sa * sb / safe
            den = np.sqrt((saa - sa * sa / safe) * (sbb - sb * sb / safe))
            rho = cov / den
        res = pd.Series(rho, dtype="float64")
        return res.where(np.isfinite(rho), None)

    _SPEARMAN_UDF = _udf
    return _udf


def make_grouped_agg_udf(function, return_type):
    """GROUPED_AGG pandas UDF (SURVEY §2.4 'UDAF available as extension'):
    pd.Series per group -> scalar, Arrow-batched, usable under group_by.agg
    and over() windows."""

    @pandas_udf(return_type)
    def _udf(s: pd.Series) -> float:
        return function(s)

    return _udf
