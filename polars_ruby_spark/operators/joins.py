"""Equi/semi/anti/cross joins with polars conformance.

Parity: ``/root/reference/lib/polars/lazy_frame.rb:1700-1748`` (``join``),
Rust entry ``ext/polars/src/lazyframe/mod.rs:587-616``.  Differences handled
here (SURVEY §2.3):

- collision suffixing (``_right``) — Spark errors on ambiguity instead;
- ``full`` keeps BOTH key columns, right one suffixed (doctest
  ``lazy_frame.rb:1648-1660``);
- ``join_nulls`` → ``eqNullSafe`` condition (Spark default drops null keys,
  which matches polars' default false);
- expression keys → precomputed join-key columns (pushdown-friendly).

Physical strategy is Catalyst/AQE's job (broadcast vs shuffle vs SMJ);
``broadcast=True`` force-hints small dims.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..exprs import Expr, wrap_expr
from ..session import ROW_IDX

_HOW_MAP = {
    "inner": "inner",
    "left": "left",
    "right": "right",
    "full": "full",
    "outer": "full",
    "semi": "left_semi",
    "anti": "left_anti",
    "cross": "cross",
}


def _as_list(v):
    if v is None:
        return None
    return list(v) if isinstance(v, (list, tuple)) else [v]


def _key_names(sdf, keys, side: str):
    """Materialize (possibly expression) join keys as named columns."""
    names, out = [], sdf
    for i, k in enumerate(keys):
        if isinstance(k, str):
            names.append(k)
        elif isinstance(k, Expr):
            kn = f"__jk_{side}_{i}__"
            out = out.withColumn(kn, k._fn(out, None))
            names.append(kn)
        else:
            raise TypeError(f"join key must be str or Expr, got {type(k)}")
    return out, names


def join(left, right, on=None, how: str = "inner", left_on=None, right_on=None,
         suffix: str = "_right", join_nulls: bool = False,
         coalesce: bool | None = None, broadcast: bool | None = None):
    from ..frame import LazyFrame

    how_l = _HOW_MAP.get(how)
    if how_l is None:
        raise ValueError(f"unknown join type {how!r}")

    lsdf = left._sdf.drop(ROW_IDX) if ROW_IDX in left._sdf.columns else left._sdf
    rsdf = right._sdf.drop(ROW_IDX) if ROW_IDX in right._sdf.columns else right._sdf

    if how_l == "cross":
        r = rsdf
        # suffix right-side collisions
        for c in r.columns:
            if c in lsdf.columns:
                r = r.withColumnRenamed(c, c + suffix)
        if broadcast:
            r = F.broadcast(r)
        return LazyFrame(lsdf.crossJoin(r))

    if on is not None:
        lkeys = rkeys = _as_list(on)
    else:
        lkeys, rkeys = _as_list(left_on), _as_list(right_on)
        if lkeys is None or rkeys is None:
            raise ValueError("join requires `on` or both `left_on`/`right_on`")

    lsdf, lnames = _key_names(lsdf, lkeys, "l")
    rsdf, rnames = _key_names(rsdf, rkeys, "r")

    # Rename right non-key collision columns up-front.
    rkeyset = set(rnames)
    renames = {}
    for c in rsdf.columns:
        if c in lsdf.columns and c not in rkeyset:
            renames[c] = c + suffix
    # Key columns: rename right keys to internal names to avoid ambiguity.
    rkey_internal = []
    for i, k in enumerate(rnames):
        nk = f"__rk_{i}__"
        renames[k] = nk
        rkey_internal.append(nk)
    for old, new in renames.items():
        rsdf = rsdf.withColumnRenamed(old, new)

    cond = None
    for lk, rk in zip(lnames, rkey_internal):
        c = (F.col(lk).eqNullSafe(F.col(rk)) if join_nulls
             else (F.col(lk) == F.col(rk)))
        cond = c if cond is None else cond & c

    rj = F.broadcast(rsdf) if broadcast else rsdf
    joined = lsdf.join(rj, cond, how_l)

    if how_l in ("left_semi", "left_anti"):
        drop = [k for k in lnames if k.startswith("__jk_")]
        return LazyFrame(joined.drop(*drop))

    if how_l == "full":
        # polars keeps both key columns; right side gets the suffix — but only
        # when names collide (same-named keys) (lazy_frame.rb:1648-1660).
        sel = []
        for c in joined.columns:
            if c in rkey_internal:
                i = rkey_internal.index(c)
                orig = rkeys[i] if isinstance(rkeys[i], str) else f"key_{i}"
                new = orig + suffix if orig in lnames else orig
                sel.append(F.col(c).alias(new))
            elif c.startswith("__jk_"):
                continue
            else:
                sel.append(F.col(c))
        return LazyFrame(joined.select(*sel))

    # inner/left/right: drop right key columns (coalesce=True semantics)
    out = joined.drop(*rkey_internal)
    out = out.drop(*[k for k in lnames if k.startswith("__jk_")])
    return LazyFrame(out)
