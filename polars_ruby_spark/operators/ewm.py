"""Scale-safe exponentially-weighted moving aggregates (ewm_mean/var/std).

Parity: ``/root/reference/lib/polars/expr.rb:6381-6482`` (ewm_mean/ewm_std/
ewm_var with ``adjust``, ``bias``, ``min_periods``, ``ignore_nulls``).

Every ewm quantity is a ratio of exponentially-decayed running sums

    S_t = sum_{i<=t} c_i * lam^{p*(j_t - j_i)}        (lam = 1 - alpha)

where ``j`` is the decay index (non-null count - 1 when ``ignore_nulls``,
row position otherwise), ``c_i`` a per-row coefficient and ``p`` the decay
power (1 for the weighted sums, 2 for the squared-weight sum used by the
``bias: false`` correction):

    mean = S1/S0            c0 = base,  c1 = base*x
    var  = S2/S0 - mean^2   c2 = base*x^2;  unbiased *= S0^2/(S0^2 - SQ)
    base = 1 (adjust) | alpha, except 1 at the first non-null (non-adjust)

The naive plan (collect the whole prefix per row) is O(n^2) per group —
round-2 VERDICT's one scale-killer.  This module computes S in O(n) with
only JVM window aggregates via a *block-segmented prescaled scan*:

1. split each group's decay index into blocks of ``B`` positions, with
   ``B`` chosen so ``lam^(-2B) <= 1e200`` never overflows a double;
2. within a block, ``S_local = lam^(p*r) * running_sum(c * lam^(-p*r))``
   — one ``sum().over(rowsBetween(unboundedPreceding, 0))`` per series,
   an O(1)-state running aggregate in WindowExec (NOT a per-row array);
3. across blocks, the carry from block b-1 (and b-2) is reached with a
   RANGE frame on the block id (``rangeBetween(-1, -1)``) over the group
   keys — contributions from >= 3 blocks back carry weight
   ``lam^(3B) <= 1e-300`` and are dropped (documented truncation: below
   any representable effect unless the data spans ~600 orders of
   magnitude; polars' own sequential f64 recurrence rounds far above it);
4. for the UNGROUPED frame, partitions are made contiguous index ranges
   (``repartitionByRange(ROW_IDX)``) and the per-partition boundary
   states — O(num_partitions) rows — are composed exactly on the driver
   (the affine maps ``v -> lam^len * v + total`` compose associatively),
   then broadcast back: the attach_global_cum two-pass pattern
   (operators/row_index.py:120).

All stages are multi-task; no Python UDF, no collected arrays, no
single-partition window over data-sized input.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..session import ROW_IDX

_PID = "__ewm_pid__"

#: columns are prescaled by lam^(-p*r) with r < B; cap the magnitude at
#: 1e200 for the squared-decay series (p=2) => lam^(-B) <= 1e100.
_MAX_PRESCALE_LOG10 = 100.0


def _block_size(lam: float) -> int:
    """Largest block size whose prescale factors stay finite in a double."""
    if lam <= 0.0:
        return 1
    neg_log10 = -math.log10(lam)
    if neg_log10 <= 1e-12:
        return 1 << 30
    return max(1, min(1 << 30, int(_MAX_PRESCALE_LOG10 / neg_log10)))


def _series_coefs(x, alpha: float, adjust: bool, first, need_var: bool):
    """Per-row coefficient columns for each decayed series.

    Returns ``[(suffix, coef_col, decay_power), ...]`` — s0/s1 always,
    s2/sq only for the variance path.
    """
    nn = x.isNotNull()
    if adjust:
        base = F.when(nn, F.lit(1.0)).otherwise(F.lit(0.0))
        base_sq = base
    else:
        base = F.when(~nn, F.lit(0.0)).when(first, F.lit(1.0)).otherwise(
            F.lit(float(alpha)))
        base_sq = base * base
    xd = x.cast("double")
    series = [("s0", base, 1), ("s1", base * F.coalesce(xd, F.lit(0.0)), 1)]
    if need_var:
        x2 = F.coalesce(xd * xd, F.lit(0.0))
        series.append(("s2", base * x2, 1))
        series.append(("sq", base_sq, 2))
    return series


def _decayed_sums(sdf: DataFrame, x_name: str, keys: list, lam: float,
                  alpha: float, adjust: bool, ignore_nulls: bool,
                  need_var: bool, prior_empty=None):
    """Attach per-row decayed sums ``__ewm_s0/s1[/s2/sq]__`` plus the
    non-null count ``__ewm_m__`` and decay index ``__ewm_j__``, scanning
    within ``keys`` groups in ROW_IDX order.  Pure window plan (two
    exchanges: keys, keys+block).

    ``prior_empty`` (global path): boolean column, true when no counted
    value precedes this scan segment — the non-adjust "first value keeps
    weight 1" rule must apply only to the GLOBAL first non-null, not each
    partition's local first."""
    B = _block_size(lam)
    x = F.col(x_name)
    wk = Window.partitionBy(*keys).orderBy(F.col(ROW_IDX).asc())
    upto = wk.rowsBetween(Window.unboundedPreceding, 0)
    m = F.count(x).over(upto)
    if ignore_nulls:
        j = m - F.lit(1)
    else:
        j = F.row_number().over(wk) - F.lit(1)
    sdf = sdf.withColumn("__ewm_m__", m).withColumn("__ewm_j__", j)
    j = F.col("__ewm_j__")
    first = x.isNotNull() & (F.col("__ewm_m__") == 1)
    if prior_empty is not None:
        first = first & prior_empty
    blk = F.floor(j.cast("double") / F.lit(float(B))).cast("long")
    r = (j - blk * F.lit(B)).cast("double")
    sdf = sdf.withColumn("__ewm_blk__", blk).withColumn("__ewm_r__", r)
    r = F.col("__ewm_r__")

    series = _series_coefs(x, alpha, adjust, first, need_var)
    pre_cols = {}
    for sfx, coef, p in series:
        pre_cols[f"__ewm_pre_{sfx}__"] = coef * F.pow(F.lit(lam), -(r * p))
    sdf = sdf.withColumns(pre_cols)

    wb = (Window.partitionBy(*keys, F.col("__ewm_blk__"))
          .orderBy(F.col(ROW_IDX).asc())
          .rowsBetween(Window.unboundedPreceding, 0))
    wblk = Window.partitionBy(*keys).orderBy(F.col("__ewm_blk__").asc())
    out_cols = {}
    for sfx, _coef, p in series:
        pre = F.col(f"__ewm_pre_{sfx}__")
        local = F.pow(F.lit(lam), r * p) * F.sum(pre).over(wb)
        # carry from the previous (complete, length-B) one/two blocks:
        # their totals measured at their own last position are
        # lam^(p*(B-1)) * sum(pre); weight into this row is lam^(p*(r+1))
        # per block crossed.  >=3 blocks back: weight <= lam^(3B) -> dropped.
        t1 = F.coalesce(
            F.sum(pre).over(wblk.rangeBetween(-1, -1)), F.lit(0.0))
        t2 = F.coalesce(
            F.sum(pre).over(wblk.rangeBetween(-2, -2)), F.lit(0.0))
        end_scale = F.pow(F.lit(lam), F.lit(float((B - 1) * p)))
        carry = end_scale * (t1 + F.pow(F.lit(lam), F.lit(float(B * p))) * t2)
        out_cols[f"__ewm_{sfx}__"] = (
            local + F.pow(F.lit(lam), (r + 1) * p) * carry)
    sdf = sdf.withColumns(out_cols)
    drops = ["__ewm_blk__", "__ewm_r__"] + list(pre_cols)
    return sdf.drop(*drops), [s[0] for s in series]


def _combine(kind: str, bias: bool, min_periods: int, sfx: str = ""):
    """Final expression over the attached ``__ewm_*__`` sum columns
    (``sfx`` names one binding's columns in the batched multi-attach)."""
    m = F.col(f"__ewm_m{sfx}__")
    s0, s1 = F.col(f"__ewm_s0{sfx}__"), F.col(f"__ewm_s1{sfx}__")
    if kind == "mean":
        return F.when(m >= max(min_periods, 1), s1 / s0)
    s2, sq = F.col(f"__ewm_s2{sfx}__"), F.col(f"__ewm_sq{sfx}__")
    mean = s1 / s0
    # a single observation's variance is exactly 0 (guard the catastrophic
    # cancellation in s2/s0 - mean^2, and polars' 0.0-at-first-row
    # convention for the unbiased form: expr.rb:6398 doctest)
    var = F.greatest(s2 / s0 - mean * mean, F.lit(0.0))
    if not bias:
        denom = s0 * s0 - sq
        var = F.when(denom > 0, var * s0 * s0 / denom).otherwise(F.lit(0.0))
    var = F.when(m == 1, F.lit(0.0)).otherwise(var)
    out = F.when(m >= max(min_periods, 1), var)
    if kind == "std":
        out = F.sqrt(out)
    return out


# -- varying-multiplier scan (adjust=false & ignore_nulls=false) -------------
#
# pandas/polars implement that combination with a RESET normalization
# (polars-arrow ewm kernels mirror pandas window_aggregations.pyx): at each
# observation separated by k periods from the previous one,
#
#     y_t = (lam^k * y_{t-1} + alpha * x_t) / (lam^k + alpha)
#
# i.e. an affine scan y -> m_t*y + a'_t*x_t with DATA-DEPENDENT multiplier
# m_t = lam^k/(lam^k + alpha) and a'_t = alpha/(lam^k + alpha); the
# normalized weights always sum to 1.  The same block-segmentation applies
# with the block id derived from the ACCUMULATED log-decay instead of the
# position: L_t = sum of -ln(m_i), blk = floor(L/T), so exp factors stay in
# [e^-T, 1] within a block and cross-block carries use e^-T / e^-2T range
# frames (>= 3 blocks back: < 1e-200, dropped).  exp/log round-trip costs
# ~1e-15 relative precision — far inside the 9dp oracle bar.

#: log-decay span per block: e^T = 1e100 never overflows prescaled doubles
_LOG_BLOCK = 230.0


def _varying_scan(sdf: DataFrame, series: list, lam_col_name: str,
                  keys: list):
    """Scan ``v -> m*v + b`` per series over keys in ROW_IDX order.

    ``series``: ``[(out_col, b_col_name, scale), ...]`` where scale doubles
    the log-decay for squared-weight series.  ``lam_col_name`` holds the
    per-row log-decrement d = -ln(m) (0 on null rows and the first obs).
    """
    d = F.col(lam_col_name)
    wk = Window.partitionBy(*keys).orderBy(F.col(ROW_IDX).asc())
    upto = wk.rowsBetween(Window.unboundedPreceding, 0)
    sdf = sdf.withColumn("__ewm_L__", F.sum(d).over(upto))
    for out_col, b_name, scale in series:
        L = F.col("__ewm_L__") * scale
        blk = F.floor(L / _LOG_BLOCK).cast("long")
        off = L - blk.cast("double") * F.lit(_LOG_BLOCK)
        bc, oc = f"__ewm_vb_{out_col}__", f"__ewm_vo_{out_col}__"
        pc = f"__ewm_vp_{out_col}__"
        sdf = (sdf.withColumn(bc, blk).withColumn(oc, off)
               .withColumn(pc, F.col(b_name) * F.exp(F.col(oc))))
        wb = (Window.partitionBy(*keys, F.col(bc))
              .orderBy(F.col(ROW_IDX).asc())
              .rowsBetween(Window.unboundedPreceding, 0))
        wblk = Window.partitionBy(*keys).orderBy(F.col(bc).asc())
        s = F.sum(pc).over(wb)
        p1 = F.coalesce(F.sum(pc).over(wblk.rangeBetween(-1, -1)), F.lit(0.0))
        p2 = F.coalesce(F.sum(pc).over(wblk.rangeBetween(-2, -2)), F.lit(0.0))
        v = F.exp(-F.col(oc)) * (
            s + F.lit(math.exp(-_LOG_BLOCK)) * p1
            + F.lit(math.exp(-2 * _LOG_BLOCK)) * p2)
        sdf = sdf.withColumn(out_col, v).drop(bc, oc, pc)
    return sdf


def _varying_inputs(sdf: DataFrame, x_name: str, keys: list, lam: float,
                    alpha: float, need_var: bool, prior_empty=None,
                    prev_idx_boundary: str | None = None):
    """Per-row multiplier log-decrement + scan inputs for the reset form.

    ``k`` (periods since previous observation) is the gap in within-group
    POSITIONS (grouped path) or the global ROW_IDX gap (global path, where
    ROW_IDX is itself the dense position; ``prev_idx_boundary`` then names
    a column carrying the previous partitions' last observation index so
    the first in-partition observation sees the true gap)."""
    x = F.col(x_name)
    nn = x.isNotNull()
    wk = Window.partitionBy(*keys).orderBy(F.col(ROW_IDX).asc())
    upto = wk.rowsBetween(Window.unboundedPreceding, 0)
    m_cnt = F.count(x).over(upto)
    if prev_idx_boundary is not None:
        pos = F.col(ROW_IDX)          # global: dense index IS the position
    else:
        sdf = sdf.withColumn("__ewm_pos__", F.row_number().over(wk))
        pos = F.col("__ewm_pos__")
    prev_idx = F.last(F.when(nn, pos), ignorenulls=True).over(
        wk.rowsBetween(Window.unboundedPreceding, -1))
    if prev_idx_boundary is not None:
        prev_idx = F.coalesce(prev_idx, F.col(prev_idx_boundary))
    first = nn & prev_idx.isNull()
    if prior_empty is not None:
        first = first & prior_empty
    k = (pos - prev_idx).cast("double")
    lamk = F.pow(F.lit(lam), k)           # underflows gracefully for huge k
    denom = lamk + F.lit(alpha)
    d = F.when(nn & ~first, -F.log(lamk / denom)).otherwise(F.lit(0.0))
    aprime = F.when(first, F.lit(1.0)).otherwise(F.lit(alpha) / denom)
    xd = x.cast("double")
    sdf = (sdf.withColumn("__ewm_m__", m_cnt)
           .withColumn("__ewm_d__", d)
           .withColumn("__ewm_b1__",
                       F.when(nn, aprime * xd).otherwise(F.lit(0.0))))
    series = [("__ewm_s1__", "__ewm_b1__", 1)]
    if need_var:
        sdf = (sdf.withColumn("__ewm_b2__",
                              F.when(nn, aprime * xd * xd).otherwise(
                                  F.lit(0.0)))
               .withColumn("__ewm_bq__",
                           F.when(nn, aprime * aprime).otherwise(F.lit(0.0))))
        series += [("__ewm_s2__", "__ewm_b2__", 1),
                   ("__ewm_sq__", "__ewm_bq__", 2)]
    return sdf, series


def _combine_varying(kind: str, bias: bool, min_periods: int,
                     sfx: str = ""):
    """Final expression for the reset-normalized scan: weights sum to 1,
    so the mean IS s1; the reliability correction uses sq = sum(u_i^2)."""
    m = F.col(f"__ewm_m{sfx}__")
    mean = F.col(f"__ewm_s1{sfx}__")
    if kind == "mean":
        return F.when(m >= max(min_periods, 1), mean)
    var = F.greatest(F.col(f"__ewm_s2{sfx}__") - mean * mean, F.lit(0.0))
    if not bias:
        denom = F.lit(1.0) - F.col(f"__ewm_sq{sfx}__")
        var = F.when(denom > 0, var / denom).otherwise(F.lit(0.0))
    var = F.when(m == 1, F.lit(0.0)).otherwise(var)
    out = F.when(m >= max(min_periods, 1), var)
    if kind == "std":
        out = F.sqrt(out)
    return out


_EWM_DROPS = ["__ewm_m__", "__ewm_j__", "__ewm_L__", "__ewm_d__",
              "__ewm_pos__", "__ewm_s0__", "__ewm_s1__", "__ewm_s2__",
              "__ewm_sq__", "__ewm_b1__", "__ewm_b2__", "__ewm_bq__"]


def _is_reset_form(spec: dict) -> bool:
    return not spec["adjust"] and not spec["ignore_nulls"]


# -- Arrow-kernel ungrouped path (round-8) -----------------------------------
#
# The JVM window formulation of the UNGROUPED scan partitions every window
# by ``spark_partition_id()`` — a column Catalyst knows nothing about, so
# each consuming branch paid one full-data hash EXCHANGE plus a stack of
# Window+Sort pairs (q132: 2 branches × ~6 sorts over data that is already
# partition-contiguous in ROW_IDX order).  Since the scan is strictly
# per-partition (the carry fold composes boundaries), the right shape is a
# per-partition Arrow kernel: ONE ``mapInArrow`` pass computes every
# binding's decayed sums with vectorized numpy — zero shuffles, zero sorts,
# O(n/P) per task — and a second tiny pass emits one summary row per
# partition for the existing lazy O(partitions) carry fold.  The numpy
# block scan mirrors ``_decayed_sums``'s arithmetic exactly (same prescale,
# same sequential accumulation order), so values agree to the ulp.
#
# The reset form (adjust=false & ignore_nulls=false) keeps the JVM window
# path: its DATA-DEPENDENT log-decay makes block widths variable, which
# defeats the equal-width reshape the kernel vectorizes with.


def _item_series(spec: dict) -> list:
    """Flattened (suffix, decay-power) list for one binding."""
    out = [("s0", 1), ("s1", 1)]
    if spec["kind"] in ("var", "std"):
        out += [("s2", 1), ("sq", 2)]
    return out


def _series_coefs_np(xs, vm, spec: dict, prior_empty: bool):
    """numpy mirror of ``_series_coefs`` on the dense scan axis."""
    import numpy as np

    alpha, adjust = spec["alpha"], spec["adjust"]
    if adjust:
        base = vm.astype("float64")
        base_sq = base
    else:
        base = np.where(vm, float(alpha), 0.0)
        if prior_empty:
            nzi = np.flatnonzero(vm)
            if len(nzi):
                base[nzi[0]] = 1.0  # global first non-null keeps weight 1
        base_sq = base * base
    x0 = np.where(vm, xs, 0.0)          # coalesce(xd, 0); NaN values stay
    series = [base, base * x0]
    if spec["kind"] in ("var", "std"):
        series += [base * x0 * x0, base_sq]
    return series


def _block_scan_np(c, p: int, lam: float, B: int, carry: float):
    """Dense block-segmented prescaled scan — numpy mirror of the JVM
    windows in ``_decayed_sums`` (same prescale bounds, same sequential
    accumulation order via ``np.cumsum``), merged with the incoming carry
    at decay ``lam^(p*(j+1))``."""
    import numpy as np

    n = len(c)
    if n == 0:
        return c
    j = np.arange(n, dtype="float64")
    if B >= n:                           # single block — no padding arrays
        pre = c * lam ** (-(j * p))
        s = lam ** (j * p) * np.cumsum(pre)
    else:
        nblk = (n + B - 1) // B
        r = j % B
        pre = c * lam ** (-(r * p))
        pad = nblk * B - n
        if pad:
            pre = np.concatenate([pre, np.zeros(pad)])
        lc = np.cumsum(pre.reshape(nblk, B), axis=1)
        t = lc[:, -1]
        cb = np.zeros(nblk)
        # carry from the previous one/two (complete) blocks — same
        # truncation as the JVM range frames (>=3 back: < lam^(3B))
        t2 = np.concatenate([[0.0], t[:-2]]) if nblk > 2 else \
            np.zeros(nblk - 1)
        cb[1:] = lam ** ((B - 1) * p) * (t[:-1] + (lam ** (B * p)) * t2)
        s = (lam ** (r * p) * lc.reshape(-1)[:n]
             + lam ** ((r + 1) * p) * np.repeat(cb, B)[:n])
    if carry:
        s = s + lam ** ((j + 1) * p) * carry
    return s


def _scan_item_np(x, valid, spec: dict, prior_nn: int, carries: list):
    """Per-row merged decayed sums for one binding over one partition.

    ``x``: float64 (nulls NaN-filled), ``valid``: null mask (NaN VALUES are
    valid, matching ``isNotNull``).  ``carries``: incoming per-series carry
    (same order as ``_item_series``).  Returns (m_rows, [s_rows...]).
    """
    import numpy as np

    mloc = np.cumsum(valid.astype("int64"))
    lam, B = spec["lam"], _block_size(spec["lam"])
    if spec["ignore_nulls"]:
        xs, vm = x[valid], np.ones(int(valid.sum()), dtype=bool)
    else:
        xs, vm = x, valid
    coefs = _series_coefs_np(xs, vm, spec, prior_nn == 0)
    out = []
    for (sfx, p), c, carry in zip(_item_series(spec), coefs, carries):
        s = _block_scan_np(c, p, lam, B, carry)
        if spec["ignore_nulls"]:
            # expand the non-null-axis scan back to rows: null rows share
            # the previous observation's value (same j, same block); rows
            # before any observation carry the incoming state undecayed
            # (j = -1 → lam^0) — both exactly the JVM per-row semantics
            idx = mloc - 1
            if len(s):
                sr = s[np.clip(idx, 0, None)]
                if idx[0] < 0:
                    sr = np.where(idx < 0, carry, sr)
            else:
                sr = np.full(len(x), float(carry))
            out.append(sr)
        else:
            out.append(s)
    return mloc + int(prior_nn), out


def _sorted_table(batches):
    """Concatenate a partition's Arrow batches and sort by ROW_IDX."""
    import numpy as np
    import pyarrow as pa

    bl = list(batches)
    if not bl:
        return None
    tbl = pa.Table.from_batches(bl).combine_chunks()
    ridx = tbl.column(ROW_IDX).to_numpy(zero_copy_only=False)
    order = np.argsort(ridx, kind="stable")
    if not np.array_equal(order, np.arange(len(order))):
        tbl = tbl.take(pa.array(order))
    return tbl


def _col_np(tbl, name):
    import pyarrow.compute as pc

    col = tbl.column(name)
    valid = ~pc.is_null(col).to_numpy(zero_copy_only=False)
    return col.to_numpy(zero_copy_only=False), valid


def _make_summary_kernel(specs: list, xs: list, schema):
    """One row per partition: counts + each series' decayed total at the
    partition's last row, under BOTH prior-empty variants (they differ only
    when adjust=false: the global first non-null keeps weight 1)."""
    def gen(batches):
        import pyarrow as pa

        tbl = _sorted_table(batches)
        if tbl is None or tbl.num_rows == 0:
            return
        row = {"pid": int(tbl.column(_PID)[0].as_py()),
               "nr": tbl.num_rows}
        jglob = 0
        for i, spec in enumerate(specs):
            x, valid = _col_np(tbl, xs[i])
            row[f"nn{i}"] = int(valid.sum())
            nseries = len(_item_series(spec))
            zero = [0.0] * nseries
            _m, s_rows = _scan_item_np(x, valid, spec, 0, zero)
            if spec["adjust"]:
                alts = s_rows
            else:
                _m, alts = _scan_item_np(x, valid, spec, 1, zero)
            for k in range(nseries):
                row[f"q{jglob + k}"] = float(s_rows[k][-1])
                row[f"qa{jglob + k}"] = float(alts[k][-1])
            jglob += nseries
        yield pa.RecordBatch.from_pylist([row], schema=schema)
    return gen


def _make_scan_kernel(specs: list, xs: list, out_names: list):
    """Full per-partition pass: appends per-binding ``__ewm_m_{i}__`` and
    merged ``__ewm_{sfx}_{i}__`` columns; emits rows ROW_IDX-sorted."""
    def gen(batches):
        import pyarrow as pa

        tbl = _sorted_table(batches)
        if tbl is None or tbl.num_rows == 0:
            return
        cols = {n: tbl.column(n) for n in tbl.schema.names}
        jglob = 0
        for i, spec in enumerate(specs):
            prior = cols[f"__p_{i}__"][0].as_py() or 0
            nseries = len(_item_series(spec))
            carries = [cols[f"__c_{jglob + k}__"][0].as_py() or 0.0
                       for k in range(nseries)]
            x, valid = _col_np(tbl, xs[i])
            m_rows, s_rows = _scan_item_np(x, valid, spec, prior, carries)
            cols[f"__ewm_m_{i}__"] = pa.array(m_rows, type=pa.int64())
            for k, (sfx, _p) in enumerate(_item_series(spec)):
                cols[f"__ewm_{sfx}_{i}__"] = pa.array(
                    s_rows[k], type=pa.float64())
            jglob += nseries
        yield from pa.table({n: cols[n] for n in out_names}).to_batches()
    return gen


def _attach_ewm_global_kernel(sdf: DataFrame, items: list) -> DataFrame:
    """Arrow-kernel ungrouped ewm (standard forms; see module note)."""
    from pyspark.sql import types as T

    from .._udf_helpers import ewm_kernel_fold_udf

    if getattr(sdf, "_plsq_idx_pinned", False):
        # fresh pinned with_row_index output: partitions are ALREADY
        # contiguous ROW_IDX ranges on a pinned layout — no extra shuffle,
        # no second checkpoint (round-8)
        base = sdf.withColumn(_PID, F.spark_partition_id())
    else:
        base = (sdf.repartitionByRange(F.col(ROW_IDX).asc())
                .localCheckpoint(eager=False)
                .withColumn(_PID, F.spark_partition_id()))
    xs = [f"__ewm_x_{i}__" for i in range(len(items))]
    specs = [spec for _vf, spec, _o in items]
    base = base.withColumns(
        {xn: vf(base).cast("double")
         for xn, (vf, _s, _o) in zip(xs, items)})

    series_flat = [(i, sfx, p, specs[i]["lam"], specs[i]["ignore_nulls"],
                    specs[i]["adjust"])
                   for i, spec in enumerate(specs)
                   for sfx, p in _item_series(spec)]
    ns = len(series_flat)

    sum_fields = ([T.StructField("pid", T.IntegerType()),
                   T.StructField("nr", T.LongType())]
                  + [T.StructField(f"nn{i}", T.LongType())
                     for i in range(len(items))]
                  + [T.StructField(f"q{j}", T.DoubleType())
                     for j in range(ns)]
                  + [T.StructField(f"qa{j}", T.DoubleType())
                     for j in range(ns)])
    sum_schema = T.StructType(sum_fields)
    import pyarrow as pa

    pa_sum_schema = pa.schema(
        [("pid", pa.int32()), ("nr", pa.int64())]
        + [(f"nn{i}", pa.int64()) for i in range(len(items))]
        + [(f"q{j}", pa.float64()) for j in range(ns)]
        + [(f"qa{j}", pa.float64()) for j in range(ns)])
    summary = base.select(_PID, ROW_IDX, *xs).mapInArrow(
        _make_summary_kernel(specs, xs, pa_sum_schema), sum_schema)
    onerow = summary.agg(F.array_sort(F.collect_list(F.struct(
        *[F.col(f.name) for f in sum_fields]))).alias("__arr__"))
    fold = ewm_kernel_fold_udf(
        len(items), tuple((i, p, lam, ign) for i, _s, p, lam, ign, _a
                          in series_flat))
    carry_tab = (onerow.select(F.explode(fold(F.col("__arr__"))).alias("r"))
                 .select(F.col("r.pid").alias(_PID),
                         *[F.col(f"r.c{j}").alias(f"__c_{j}__")
                           for j in range(ns)],
                         *[F.col(f"r.p{i}").alias(f"__p_{i}__")
                           for i in range(len(items))]))
    joined = base.join(F.broadcast(carry_tab), _PID, "left")

    out_fields = list(joined.schema.fields)
    for i, spec in enumerate(specs):
        out_fields.append(T.StructField(f"__ewm_m_{i}__", T.LongType()))
        for sfx, _p in _item_series(spec):
            out_fields.append(
                T.StructField(f"__ewm_{sfx}_{i}__", T.DoubleType()))
    out_schema = T.StructType(out_fields)
    scanned = joined.mapInArrow(
        _make_scan_kernel(specs, xs, [f.name for f in out_fields]),
        out_schema)

    out_frame = scanned
    drops = [_PID] + xs + [f"__c_{j}__" for j in range(ns)] \
        + [f"__p_{i}__" for i in range(len(items))]
    for i, (_vf, spec, out_name) in enumerate(items):
        comb = _combine(spec["kind"], spec["bias"], spec["min_periods"],
                        f"_{i}")
        out_frame = out_frame.withColumn(out_name, comb)
        drops.append(f"__ewm_m_{i}__")
        drops += [f"__ewm_{sfx}_{i}__" for sfx, _p in _item_series(spec)]
    return out_frame.drop(*drops)


def attach_ewm_grouped(sdf: DataFrame, value_fn, key_fns, spec: dict,
                       out_name: str) -> DataFrame:
    """ewm under ``over(keys)``: block-segmented scan within each group.

    Round-7: order left dirty (the keys/blk exchanges scatter it) — hook
    binds mark the frame scrambled and the deferred restore sorts at
    polars-semantics exports, same contract as attach_grouped_rank_zip.
    """
    assert ROW_IDX in sdf.columns
    keys = key_fns(sdf)
    kn = [f"__ewm_k{i}__" for i in range(len(keys))]
    base = sdf.select("*", *[k.alias(n) for k, n in zip(keys, kn)],
                      value_fn(sdf).alias("__ewm_x__"))
    need_var = spec["kind"] in ("var", "std")
    kcols = [F.col(n) for n in kn]
    if _is_reset_form(spec):
        prepped, series = _varying_inputs(
            base, "__ewm_x__", kcols, spec["lam"], spec["alpha"], need_var)
        scanned = _varying_scan(prepped, series, "__ewm_d__", kcols)
        comb = _combine_varying(spec["kind"], spec["bias"],
                                spec["min_periods"])
    else:
        scanned, _ = _decayed_sums(
            base, "__ewm_x__", kcols, spec["lam"],
            spec["alpha"], spec["adjust"], spec["ignore_nulls"], need_var)
        comb = _combine(spec["kind"], spec["bias"], spec["min_periods"])
    out = scanned.withColumn(out_name, comb)
    drops = kn + ["__ewm_x__"] + [c for c in _EWM_DROPS if c in out.columns]
    return out.drop(*drops)


def attach_ewm_global_multi(sdf: DataFrame, items: list) -> DataFrame:
    """Batched ungrouped ewm: ALL bindings share ONE range-partition pin,
    ONE lazy checkpoint, and TWO O(partitions) driver collects (round-6;
    the per-binding shape paid the partitioning pass and both collects N
    times — q132's two bindings halve their fixed cost here.  A round-5
    attempt that shared only the partitioning between separate attaches
    was SLOWER because the second attach's collects re-executed the first
    attach's plan past the checkpoint; batching inside one attach avoids
    that entirely).

    ``items``: ``[(value_fn, spec, out_name), ...]``.  Per-binding scan
    columns are suffixed ``_{i}`` after each scan so the fixed-name helper
    machinery (`_decayed_sums` / `_varying_scan`) stays untouched.
    """
    assert ROW_IDX in sdf.columns
    if all(not _is_reset_form(spec) for _vf, spec, _o in items):
        # round-8: every standard-form batch takes the Arrow kernel —
        # zero shuffles, zero window sorts (see module note)
        return _attach_ewm_global_kernel(sdf, items)
    from pyspark.sql import types as T

    # adjust=True scans don't consume the prior flags (base weight is 1
    # regardless of `first`), so the pass-1 collect can MERGE into the
    # bounds collect — ONE driver job per construction instead of two;
    # only the m-offset is applied post-join then.  (Reachable only with a
    # reset-form binding in the batch now, so one_pass is always False —
    # kept for the shape of the code below.)
    one_pass = all(spec["adjust"] and not _is_reset_form(spec)
                   for _vf, spec, _o in items)
    # the checkpoint stays here (round-7 note): a deterministic-chunk key
    # (row_index.chunked_by_index) was measured — it cut the ~0.5 s of
    # eager physical planning the lazy checkpoint pays at construction but
    # the ewm base (scan + row-index attach + value projections) is deep
    # enough that recomputing it in the totals/fold branch cost MORE
    # (q132 execute 2.9 s → 4.1 s); the checkpoint also pins the sampled
    # range layout the non-one-pass prior collects key on.
    # Round-8: when the input IS a fresh pinned with_row_index output
    # (``_plsq_idx_pinned`` — sorted input, checkpointed inside
    # with_row_index), its partitions are ALREADY contiguous ROW_IDX
    # ranges on a pinned layout, so the range repartition + second
    # checkpoint here were pure overhead: one sampling job, one full
    # shuffle, one materialization per execution and ~0.4 s of eager
    # physical planning per construction.
    if getattr(sdf, "_plsq_idx_pinned", False):
        base = sdf.withColumn(_PID, F.spark_partition_id())
    else:
        base = (sdf.repartitionByRange(F.col(ROW_IDX).asc())
                .localCheckpoint(eager=False)
                .withColumn(_PID, F.spark_partition_id()))
    xs = [f"__ewm_x_{i}__" for i in range(len(items))]
    base = base.withColumns(
        {xn: vf(base) for xn, (vf, _s, _o) in zip(xs, items)})
    spark = base.sparkSession
    if not one_pass:
        # pass 1 (one job, O(partitions) rows): per-pid per-binding counted
        # lengths -> exclusive prefix non-null counts + prev last-obs index
        aggs1 = []
        for i, xn in enumerate(xs):
            aggs1 += [F.count(xn).alias(f"__n_nn_{i}__"),
                      F.max(F.when(F.col(xn).isNotNull(),
                                   F.col(ROW_IDX))).alias(f"__lo_{i}__")]
        counts = sorted(base.groupBy(_PID).agg(*aggs1).collect(),
                        key=lambda row: row[_PID])
        run_nn = [0] * len(items)
        run_last: list = [None] * len(items)
        prior_rows = []
        for row in counts:
            vals = [row[_PID]]
            for i in range(len(items)):
                vals += [run_nn[i], run_last[i]]
            prior_rows.append(tuple(vals))
            for i in range(len(items)):
                run_nn[i] += row[f"__n_nn_{i}__"]
                if row[f"__lo_{i}__"] is not None:
                    run_last[i] = row[f"__lo_{i}__"]
        fields = [T.StructField(_PID, T.IntegerType())]
        for i in range(len(items)):
            fields += [T.StructField(f"__ewm_prior_{i}__", T.LongType()),
                       T.StructField(f"__ewm_prevbnd_{i}__", T.LongType())]
        base = base.join(
            F.broadcast(spark.createDataFrame(
                prior_rows, schema=T.StructType(fields))), _PID, "left")

    # per-binding scans, outputs renamed to _{i}-suffixed columns
    per_item = []  # (sfx, [(col, power)], reset_form, spec, out_name)
    scanned = base
    for i, (vf, spec, out_name) in enumerate(items):
        need_var = spec["kind"] in ("var", "std")
        lam, alpha = spec["lam"], spec["alpha"]
        reset_form = _is_reset_form(spec)
        prior_empty = (None if one_pass
                       else F.col(f"__ewm_prior_{i}__") == 0)
        if reset_form:
            prepped, series = _varying_inputs(
                scanned, xs[i], [F.col(_PID)], lam, alpha, need_var,
                prior_empty=prior_empty,
                prev_idx_boundary=f"__ewm_prevbnd_{i}__")
            out = _varying_scan(prepped, series, "__ewm_d__",
                                [F.col(_PID)])
            cols_p = [(s[0], s[2]) for s in series]
        else:
            out, sfxs = _decayed_sums(
                scanned, xs[i], [F.col(_PID)], lam, alpha,
                spec["adjust"], spec["ignore_nulls"], need_var,
                prior_empty=prior_empty)
            powers = {"s0": 1, "s1": 1, "s2": 1, "sq": 2}
            cols_p = [(f"__ewm_{s}__", powers[s]) for s in sfxs]
        if not one_pass:
            # min_periods / first-row masks need the GLOBAL non-null count
            out = out.withColumn(
                "__ewm_m__",
                F.col("__ewm_m__") + F.col(f"__ewm_prior_{i}__"))
        ren = {c: c[:-2] + f"_{i}__" for c in _EWM_DROPS
               if c in out.columns}
        out = out.withColumnsRenamed(ren)
        per_item.append((f"_{i}", [(ren.get(c, c), p) for c, p in cols_p],
                         reset_form, spec, out_name))
        scanned = out

    # bounds pass: every binding's per-pid last-row decayed totals
    # (+ the counts when the prior pass was merged away)
    aggs2 = [F.count(F.lit(1)).alias("__n_rows__")]
    for i, (sfx, cols_p, reset_form, spec, _o) in enumerate(per_item):
        aggs2.append(F.count(xs[i]).alias(f"__n_nn_{i}__"))
        if reset_form:
            aggs2.append(F.max(f"__ewm_L{sfx}__").alias(f"__dL_{i}__"))
        for c, _p in cols_p:
            aggs2.append(F.max_by(F.col(c), F.col(ROW_IDX)).alias(f"__q_{c}"))
    if one_pass:
        # LAZY carry composition (round-6), Arrow-folded (round-7): the
        # per-partition affine maps compose sequentially over the
        # pid-sorted O(partitions) totals array.  The round-6 JVM
        # `F.aggregate` fold ran no job at construction but its
        # struct-rebuilding lambda made Catalyst ANALYSIS the dominant
        # per-construction cost (~2.2 s of q132's bench median); a tiny
        # arrow_udf does the same python-pow arithmetic the non-one-pass
        # driver loop uses, with a flat plan.
        from .._udf_helpers import ewm_carry_arrays_udf

        all_cols = [(i, c, p, spec)
                    for i, (sfx, cols_p, _r, spec, _o) in enumerate(per_item)
                    for c, p in cols_p]
        sf_list = ([F.col(_PID).alias("pid"),
                    F.col("__n_rows__").alias("nr")]
                   + [F.col(f"__n_nn_{i}__").alias(f"nn{i}")
                      for i in range(len(items))]
                   + [F.col(f"__q_{c}").alias(f"q_{j}")
                      for j, (_i, c, _p, _s) in enumerate(all_cols)])
        onerow = (scanned.groupBy(_PID).agg(*aggs2)
                  .agg(F.array_sort(F.collect_list(F.struct(*sf_list)))
                       .alias("__arr__")))
        fold = ewm_carry_arrays_udf(
            len(items),
            tuple((i, p, spec["lam"], bool(spec["ignore_nulls"]))
                  for (i, _c, p, spec) in all_cols))
        carry_tab = (onerow.select(
            F.explode(fold(F.col("__arr__"))).alias("r"))
            .select(F.col("r.pid").alias(_PID),
                    *[F.col(f"r.c{j}").alias(f"__c_{c}")
                      for j, (_i, c, _p, _s) in enumerate(all_cols)],
                    *[F.col(f"r.p{i}").alias(f"__p_{i}__")
                      for i in range(len(items))]))
        joined = scanned.join(F.broadcast(carry_tab), _PID, "left")
        joined = joined.withColumns({
            f"__ewm_m_{i}__": F.col(f"__ewm_m_{i}__")
            + F.coalesce(F.col(f"__p_{i}__"), F.lit(0))
            for i in range(len(items))})
    else:
        bounds = sorted(scanned.groupBy(_PID).agg(*aggs2).collect(),
                        key=lambda row: row[_PID])
        carry_fields = [T.StructField(_PID, T.IntegerType())]
        for sfx, cols_p, _r, _s, _o in per_item:
            carry_fields += [T.StructField(f"__c_{c}", T.DoubleType())
                             for c, _p in cols_p]
        states = [{c: 0.0 for c, _p in cols_p}
                  for _sfx, cols_p, _r, _s, _o in per_item]
        carry_rows = []
        for row in bounds:
            vals = [row[_PID]]
            for i, (sfx, cols_p, reset_form, spec, _o) in enumerate(
                    per_item):
                vals += [states[i][c] for c, _p in cols_p]
                if reset_form:
                    d_l = row[f"__dL_{i}__"] or 0.0
                    decays = {c: math.exp(-p * d_l) for c, p in cols_p}
                else:
                    length = (row[f"__n_nn_{i}__"] if spec["ignore_nulls"]
                              else row["__n_rows__"])
                    decays = {c: spec["lam"] ** (p * length)
                              for c, p in cols_p}
                for c, _p in cols_p:
                    q = row[f"__q_{c}"]
                    states[i][c] = (decays[c] * states[i][c]
                                    + (q if q is not None else 0.0))
            carry_rows.append(tuple(vals))
        joined = scanned.join(
            F.broadcast(spark.createDataFrame(
                carry_rows, schema=T.StructType(carry_fields))),
            _PID, "left")

    out_frame = joined
    drops = [_PID] + xs + ([f"__p_{i}__" for i in range(len(items))]
                           if one_pass else [])
    for i, (sfx, cols_p, reset_form, spec, out_name) in enumerate(per_item):
        if reset_form:
            decay_of = {c: F.exp(-F.col(f"__ewm_L{sfx}__") * p)
                        for c, p in cols_p}
        else:
            j1 = (F.col(f"__ewm_j{sfx}__") + 1).cast("double")
            decay_of = {c: F.pow(F.lit(spec["lam"]), j1 * p)
                        for c, p in cols_p}
        out_frame = out_frame.withColumns({
            c: F.col(c) + decay_of[c] * F.coalesce(F.col(f"__c_{c}"),
                                                   F.lit(0.0))
            for c, _p in cols_p})
        comb = (_combine_varying if reset_form else _combine)(
            spec["kind"], spec["bias"], spec["min_periods"], sfx)
        out_frame = out_frame.withColumn(out_name, comb)
        drops += [f"__c_{c}" for c, _p in cols_p]
        drops += [c[:-2] + f"{sfx}__" for c in _EWM_DROPS]
        drops += [f"__ewm_prior_{i}__", f"__ewm_prevbnd_{i}__"]
    drops = [c for c in drops if c in out_frame.columns]
    return out_frame.drop(*drops).sortWithinPartitions(ROW_IDX)


def attach_ewm_global(sdf: DataFrame, value_fn, spec: dict,
                      out_name: str) -> DataFrame:
    """Ungrouped ewm over global row order, multi-task.

    Range-partition on ROW_IDX (contiguous index ranges, pinned with a lazy
    localCheckpoint — the sampled-boundary hazard attach_global_cum
    documents), scan within partitions, then compose the O(partitions)
    boundary affine maps ``v -> lam^(p*len) * v + total`` exactly on the
    driver and broadcast the incoming carry per partition back.
    """
    assert ROW_IDX in sdf.columns
    if not _is_reset_form(spec):
        # round-8: standard forms take the Arrow kernel via the batched
        # entry point (zero shuffles / window sorts; see module note)
        return attach_ewm_global_multi(sdf, [(value_fn, spec, out_name)])
    lam, alpha = spec["lam"], spec["alpha"]
    need_var = spec["kind"] in ("var", "std")
    reset_form = _is_reset_form(spec)
    if getattr(sdf, "_plsq_idx_pinned", False):
        # fresh pinned with_row_index output: already contiguous ROW_IDX
        # ranges on a pinned layout (see attach_ewm_global_multi, round-8)
        base = sdf.withColumn(_PID, F.spark_partition_id())
    else:
        base = (sdf.repartitionByRange(F.col(ROW_IDX).asc())
                .localCheckpoint(eager=False)
                .withColumn(_PID, F.spark_partition_id()))
    base = base.withColumn("__ewm_x__", value_fn(base))
    # pass 1 (O(partitions) rows): per-pid counted lengths -> exclusive
    # prefix counts (global non-null offset) and, for the reset form, the
    # previous partitions' last observation index (the cross-pid gap)
    counts = sorted(base.groupBy(_PID).agg(
        F.count(F.lit(1)).alias("__n_rows__"),
        F.count("__ewm_x__").alias("__n_nn__"),
        F.max(F.when(F.col("__ewm_x__").isNotNull(),
                     F.col(ROW_IDX))).alias("__last_obs__")).collect(),
        key=lambda row: row[_PID])
    prior_rows = []
    run_nn, run_last = 0, None
    for row in counts:
        prior_rows.append((row[_PID], run_nn, run_last))
        run_nn += row["__n_nn__"]
        if row["__last_obs__"] is not None:
            run_last = row["__last_obs__"]
    spark = base.sparkSession
    from pyspark.sql import types as T

    prior_schema = T.StructType([
        T.StructField(_PID, T.IntegerType()),
        T.StructField("__ewm_prior__", T.LongType()),
        T.StructField("__ewm_prevbnd__", T.LongType())])
    prior_sdf = spark.createDataFrame(prior_rows, schema=prior_schema)
    base = base.join(F.broadcast(prior_sdf), _PID, "left")
    prior_empty = F.col("__ewm_prior__") == 0
    if reset_form:
        prepped, series = _varying_inputs(
            base, "__ewm_x__", [F.col(_PID)], lam, alpha, need_var,
            prior_empty=prior_empty, prev_idx_boundary="__ewm_prevbnd__")
        scanned = _varying_scan(prepped, series, "__ewm_d__", [F.col(_PID)])
        sfx_cols = [(s[0], s[2]) for s in series]   # (col, log scale)
        comb = _combine_varying(spec["kind"], spec["bias"],
                                spec["min_periods"])
    else:
        scanned, sfxs = _decayed_sums(
            base, "__ewm_x__", [F.col(_PID)], lam, alpha,
            spec["adjust"], spec["ignore_nulls"], need_var,
            prior_empty=prior_empty)
        powers = {"s0": 1, "s1": 1, "s2": 1, "sq": 2}
        sfx_cols = [(f"__ewm_{s}__", powers[s]) for s in sfxs]
        comb = _combine(spec["kind"], spec["bias"], spec["min_periods"])
    # min_periods / first-row masks need the GLOBAL non-null count
    scanned = scanned.withColumn(
        "__ewm_m__", F.col("__ewm_m__") + F.col("__ewm_prior__"))
    # pass 2 (O(partitions) rows): each series' decayed total at the pid's
    # last row; compose the affine maps v -> decay(len)*v + total exactly
    # driver-side to get each pid's incoming carry
    aggs = [F.count(F.lit(1)).alias("__n_rows__"),
            F.count("__ewm_x__").alias("__n_nn__")]
    if reset_form:
        aggs.append(F.max("__ewm_L__").alias("__dL__"))
    for c, _p in sfx_cols:
        aggs.append(F.max_by(F.col(c), F.col(ROW_IDX)).alias(f"__q_{c}"))
    bounds = sorted(scanned.groupBy(_PID).agg(*aggs).collect(),
                    key=lambda row: row[_PID])
    state = {c: 0.0 for c, _p in sfx_cols}
    carry_rows = []
    for row in bounds:
        carry_rows.append((row[_PID],) + tuple(state[c] for c, _p in sfx_cols))
        if reset_form:
            dL = row["__dL__"] or 0.0
            decays = {c: math.exp(-p * dL) for c, p in sfx_cols}
        else:
            length = (row["__n_nn__"] if spec["ignore_nulls"]
                      else row["__n_rows__"])
            decays = {c: lam ** (p * length) for c, p in sfx_cols}
        for c, _p in sfx_cols:
            q = row[f"__q_{c}"]
            state[c] = decays[c] * state[c] + (q if q is not None else 0.0)
    carry_schema = T.StructType(
        [T.StructField(_PID, T.IntegerType())]
        + [T.StructField(f"__c_{c}", T.DoubleType()) for c, _p in sfx_cols])
    carry_sdf = spark.createDataFrame(carry_rows, schema=carry_schema)
    joined = scanned.join(F.broadcast(carry_sdf), _PID, "left")
    if reset_form:
        decay_of = {c: F.exp(-F.col("__ewm_L__") * p) for c, p in sfx_cols}
    else:
        j1 = (F.col("__ewm_j__") + 1).cast("double")
        decay_of = {c: F.pow(F.lit(lam), j1 * p) for c, p in sfx_cols}
    merged = joined.withColumns({
        c: F.col(c) + decay_of[c] * F.coalesce(F.col(f"__c_{c}"), F.lit(0.0))
        for c, _p in sfx_cols})
    out = merged.withColumn(out_name, comb)
    drops = ([_PID, "__ewm_x__", "__ewm_prior__", "__ewm_prevbnd__"]
             + [f"__c_{c}" for c, _p in sfx_cols]
             + [c for c in _EWM_DROPS if c in out.columns])
    return out.drop(*drops).sortWithinPartitions(ROW_IDX)
