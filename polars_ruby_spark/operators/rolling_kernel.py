"""Sliding-window rolling aggregates as a per-chunk Arrow kernel.

Parity: ``/root/reference/lib/polars/lazy_frame.rb:1161`` (rolling /
group_by_rolling with min/max/sum/mean/count/len aggregates).

Why not the JVM range-frame window: Spark's ``SlidingWindowFunctionFrame``
has no retractable aggregates — it RE-EVALUATES the whole frame buffer for
every output row, so a rolling min/max/sum over windows holding ``w`` rows
costs O(n·w).  At 10× data density that is 100× wall (the q143-class
density wall VERDICT r7 measured).  Min/max also have no prefix-difference
form, so the calendar prefix path can't host them either.

This kernel makes every simple rolling aggregate ≲ linear:

1. JVM side computes per row the anchor's EXACT integer window bounds
   ``(lo_excl, hi_incl]`` in µs (calendar month arithmetic stays in
   Catalyst — ``make_interval`` — so the kernel never does date math) and
   a time-chunk id ~8× the period's upper bound, duplicating each row
   whose timestamp falls within one period below the next chunk's start
   into that chunk (≤1/8 duplication; the same trick the direct and
   collect-window paths use), so every anchor's look-back is complete
   inside its task.
2. One shuffle on ``(by…, chunk)`` → ``applyInArrow``: the kernel sorts
   the chunk by timestamp once, binary-searches every anchor's window
   span (``np.searchsorted``), then answers
   - sum/mean/count/len with prefix-sum differences (the same algebra the
     calendar prefix path already uses), NaN-exact via a separate NaN
     prefix, and
   - min/max with an O(n log w) SPARSE TABLE of argmin/argmax indices —
     value-exact for any dtype (int/float/decimal-free/timestamp/date)
     because it only ever COMPARES and then gathers the original Arrow
     values; Spark's NaN-ordering (NaN greatest) and null-skipping are
     reproduced from explicit masks.

Per-task memory is O(rows · log₂(max window rows)) int32 indices; no
per-anchor membership arrays are materialized (unlike the collect-window
path, which stays for non-algebraic aggs like median/spearman).
"""

from __future__ import annotations


def _prefix(a):
    import numpy as np

    out = np.empty(len(a) + 1, dtype=a.dtype if a.dtype.kind in "fi"
                   else "int64")
    out[0] = 0
    np.cumsum(a, out=out[1:])
    return out


def _argbest_table(v, invalid, max_len: int, want_min: bool):
    """Sparse table of arg-min/max indices under null-skipping order.

    ``invalid`` rows never win unless the whole range is invalid (the
    query layer turns those into null).  Comparisons only — exact for any
    comparable dtype; NaN handling happens in the caller via masks.
    """
    import numpy as np

    n = len(v)
    idx = np.arange(n, dtype="int32")
    tables = [idx]
    span = 1
    while span * 2 <= n and span < max_len:
        # slice against the PREVIOUS level's length, not the original n —
        # level k has n - 2^k + 1 entries (round-9 fix: the n-based slice
        # misaligned every level ≥ 2, shapes (m-span-1,) vs (m-span,))
        m = len(tables[-1])
        a = tables[-1][:m - span]
        b = tables[-1][span:]
        av, bv = v[a], v[b]
        ainv, binv = invalid[a], invalid[b]
        with np.errstate(invalid="ignore"):
            if want_min:
                b_better = (ainv & ~binv) | (~ainv & ~binv & (bv < av))
            else:
                b_better = (ainv & ~binv) | (~ainv & ~binv & (bv > av))
        tables.append(np.where(b_better, b, a))
        span *= 2
    return tables


def _range_argbest(tables, v, invalid, starts, ends, want_min: bool):
    """Vectorized two-probe sparse-table range queries → best index per
    ``[start, end)`` range; -1 marks empty ranges.

    The builder always doubles spans until span ≥ max window length (or
    span·2 > n, in which case the top span exceeds n/2 ≥ L/2), so two
    probes at level min(⌊log₂L⌋, top) cover every queried range.
    """
    import numpy as np

    L = ends - starts
    nz = L > 0
    if not nz.any():
        return np.full(len(starts), -1, dtype="int64")
    lev = np.zeros(len(starts), dtype="int64")
    lev[nz] = np.floor(np.log2(L[nz])).astype("int64")
    lev = np.minimum(lev, len(tables) - 1)
    p1 = np.where(nz, starts, 0)
    p2 = np.where(nz, np.maximum(ends - (1 << lev), starts), 0)
    c1 = np.zeros(len(starts), dtype="int64")
    c2 = np.zeros(len(starts), dtype="int64")
    for lv in range(len(tables)):
        m = nz & (lev == lv)
        if m.any():
            c1[m] = tables[lv][p1[m]]
            c2[m] = tables[lv][p2[m]]
    with np.errstate(invalid="ignore"):
        v1, v2 = v[c1], v[c2]
        i1inv, i2inv = invalid[c1], invalid[c2]
        if want_min:
            pick2 = (i1inv & ~i2inv) | (~i1inv & ~i2inv & (v2 < v1))
        else:
            pick2 = (i1inv & ~i2inv) | (~i1inv & ~i2inv & (v2 > v1))
    return np.where(nz, np.where(pick2, c2, c1), -1)


def make_sliding_kernel(plan, key_names, out_names, out_types):
    """Builder for the applyInArrow function.

    ``plan``: ``[(kind, val_col, is_float), ...]`` with kind in
    {sum,mean,count,len,min,max}; val_col None for len.
    ``out_names``/``out_types``: full output column order — key columns,
    ``__rk_t__``, then one result column per plan entry.
    """
    def kern(tbl):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        schema = pa.schema(list(zip(out_names, out_types)))
        if tbl.num_rows == 0:
            return schema.empty_table()
        t_raw = tbl.column("__rk_t__").to_numpy(zero_copy_only=False)
        order = np.argsort(t_raw, kind="stable").astype("int64")
        tbl = tbl.take(pa.array(order))
        t = t_raw[order]
        own = tbl.column("__rk_own__").to_numpy(zero_copy_only=False)
        anchors = np.flatnonzero(own)
        if len(anchors) == 0:
            return schema.empty_table()
        lo = tbl.column("__rk_lo__").to_numpy(
            zero_copy_only=False)[anchors]
        hi = tbl.column("__rk_hi__").to_numpy(
            zero_copy_only=False)[anchors]
        starts = np.searchsorted(t, lo, side="right")
        ends = np.searchsorted(t, hi, side="right")
        L = ends - starts
        max_len = int(L.max()) if len(L) else 1

        cols = {}
        for kn in key_names:
            cols[kn] = tbl.column(kn).take(pa.array(anchors))
        cols["__rk_t__"] = pa.array(t[anchors], type=pa.int64())

        cache = {}
        for (kind, vc, is_float), name in zip(plan, out_names[
                len(key_names) + 1:]):
            if kind == "len":
                cols[name] = pa.array(L, type=pa.int64())
                continue
            if vc not in cache:
                col = tbl.column(vc)
                nullm = pc.is_null(col).to_numpy(zero_copy_only=False)
                vnp = col.to_numpy(zero_copy_only=False)
                nanm = (np.isnan(np.where(nullm, 0.0, vnp))
                        if is_float else np.zeros(len(nullm), dtype=bool))
                cache[vc] = (col, vnp, nullm, nanm)
            col, vnp, nullm, nanm = cache[vc]
            valid = ~nullm
            pv = _prefix(valid.astype("int64"))
            cnt = pv[ends] - pv[starts]
            if kind == "count":
                cols[name] = pa.array(cnt, type=pa.int64())
                continue
            if kind in ("sum", "mean"):
                if is_float:
                    filled = np.where(valid & ~nanm, vnp,
                                      0.0).astype("float64")
                else:
                    # accumulate in int64 — prefix sums in the source's
                    # narrow dtype (int8/16/32) silently wrap; Arrow-side
                    # fill_null keeps int64 sources exact (a numpy round
                    # trip through float64 would round above 2^53)
                    filled = pc.fill_null(col, 0).cast(
                        pa.int64()).to_numpy(zero_copy_only=False)
                ps = _prefix(filled)
                sv = ps[ends] - ps[starts]
                if is_float:
                    pn = _prefix(nanm.astype("int64"))
                    has_nan = (pn[ends] - pn[starts]) > 0
                    sv = np.where(has_nan, np.nan, sv)
                if kind == "mean":
                    with np.errstate(invalid="ignore"):
                        res = sv.astype("float64") / np.maximum(cnt, 1)
                    cols[name] = pa.array(res, type=pa.float64(),
                                          mask=cnt == 0)
                else:
                    # sum over zero observations is 0, not null (polars
                    # semantics; matches the collect-window/prefix routes);
                    # sv is already 0 there by prefix-difference identity
                    out_t = pa.float64() if is_float else pa.int64()
                    cols[name] = pa.array(
                        sv.astype("float64" if is_float else "int64"),
                        type=out_t)
                continue
            # min / max — Spark ordering: nulls skipped; NaN greatest
            want_min = kind == "min"
            invalid = nullm | nanm      # NaN never wins a comparison probe
            tkey = (vc, want_min)
            if tkey not in cache:
                cache[tkey] = _argbest_table(vnp, invalid, max_len,
                                             want_min)
            tables = cache[tkey]
            best = _range_argbest(tables, vnp, invalid, starts, ends,
                                  want_min)
            # windows whose every valid value is NaN (min) / with any NaN
            # (max) resolve to NaN, matching Spark's NaN-greatest order
            if is_float:
                pn = _prefix(nanm.astype("int64"))
                nan_cnt = pn[ends] - pn[starts]
                real_cnt = cnt - nan_cnt
                if want_min:
                    to_nan = (cnt > 0) & (real_cnt == 0)
                else:
                    to_nan = nan_cnt > 0
            else:
                to_nan = np.zeros(len(cnt), dtype=bool)
            empty = cnt == 0
            sel_invalid = empty | (best < 0) | invalid[np.clip(best, 0,
                                                               None)]
            if is_float:
                res = np.where(sel_invalid, np.nan,
                               vnp[np.clip(best, 0, None)])
                res = np.where(to_nan, np.nan, res)
                cols[name] = pa.array(
                    res.astype(vnp.dtype),
                    type=col.type, mask=empty & ~to_nan)
            else:
                idx_arr = pa.array(
                    np.where(sel_invalid, -1, best).astype("int64"),
                    mask=sel_invalid)
                cols[name] = pc.take(col, idx_arr)
        arrays = []
        for n_, t_ in zip(out_names, out_types):
            a = cols[n_]
            if isinstance(a, pa.ChunkedArray):
                a = a.combine_chunks()
            if a.type != t_:
                a = a.cast(t_)
            arrays.append(a)
        return pa.Table.from_arrays(arrays, schema=schema)
    return kern
