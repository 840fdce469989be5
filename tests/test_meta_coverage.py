"""meta.* must track every Expr the public API can build (VERDICT r10 #6).

A property-style sweep over a pool mirroring the fuzz templates' expression
shapes: for each expr, `meta.root_names()`, `meta.tree_format(...)`,
`meta.output_name()`, `meta.has_multiple_outputs()` and
`meta.is_regex_projection()` must not raise, and root_names must contain
exactly the source columns the expr reads (first-appearance order).
`meta.pop()` must not raise on any COMPOSED expr (leaves may refuse).
"""

import datetime as dt

import pytest

import polars_ruby_spark as pl


def _pool():
    c, d, g = pl.col("a"), pl.col("b"), pl.col("g")
    return {
        "col": (c, ["a"]),
        "lit": (pl.lit(3), []),
        "arith": ((c + 1) * d - c / 2, ["a", "b"]),
        "agg": (c.sum(), ["a"]),
        "agg_arith": (c.sum() / d.mean() + 1, ["a", "b"]),
        "alias_chain": (c.alias("x").alias("y"), ["a"]),
        "when": (pl.when(c > 2).then(d).otherwise(c * 2), ["a", "b"]),
        "str_ns": (c.cast("str").str.to_uppercase(), ["a"]),
        "dt_trunc": (pl.col("t").dt.truncate("1h"), ["t"]),
        "list_ns": (pl.col("l").list.max(), ["l"]),
        "window": (c.sum().over("g"), ["a", "g"]),
        "rank": (c.rank("average"), ["a"]),
        "shift": (c.shift(2), ["a"]),
        "fill": (c.forward_fill(), ["a"]),
        "pct": (c.pct_change(), ["a"]),
        "diff_round": (c.diff().round(2), ["a"]),
        "cum": (c.cum_sum(), ["a"]),
        "ewm": (c.ewm_mean(alpha=0.5), ["a"]),
        "rolling": (c.rolling_mean(3), ["a"]),
        "sortby": (c.sort_by(d), ["a", "b"]),
        "filter_agg": (c.filter(d > 0).sum(), ["a", "b"]),
        "struct_field": (pl.col("s").struct.field("f"), ["s"]),
        "concat_str": (pl.concat_str([c, d], separator="-"), ["a", "b"]),
        "horizontal": (pl.sum_horizontal(c, d), ["a", "b"]),
        "coalesce": (pl.coalesce(c, d, 0), ["a", "b"]),
        "multi_all": (pl.all(), []),
        "multi_agg": (pl.all().sum(), []),
        "multi_suffix": (pl.all().is_null().suffix("_n"), []),
        "regex": (pl.col("^co.*$").sum(), ["^co.*$"]),
        "cut": (c.cut([0, 1]), ["a"]),
        "clip": (c.clip(0, 9).abs(), ["a"]),
        "quantile": (c.quantile(0.5, "linear"), ["a"]),
        "is_in": (c.is_in([1, 2]), ["a"]),
        "replace": (c.replace({1: 2}), ["a"]),
        "implode": (c.implode(), ["a"]),
        "spearman": (pl.corr("a", "b", method="spearman"), ["a", "b"]),
        # round-11 additions: expr-valued slice (meta_expr.rb root_names
        # doctest), expr-valued replace, pnn-backed pct composition
        "slice_exprs": (pl.sum("a").slice(pl.len() - 10, pl.col("b")),
                        ["a", "b"]),
        "replace_exprs": (c.replace(c.max(), d.sum(), default=d), ["a"]),
        "pct_round": (c.pct_change().round(4), ["a"]),
        "rolling_q_by": (c.rolling_quantile_by("t", "2h", quantile=0.3),
                         ["a", "t"]),
    }


@pytest.mark.parametrize("name", sorted(_pool()))
def test_meta_surface_never_raises(name):
    e, want_roots = _pool()[name]
    roots = e.meta.root_names()
    assert roots == want_roots, (name, roots)
    s = e.meta.tree_format(return_as_string=True)
    assert isinstance(s, str) and s
    e.meta.output_name()
    e.meta.has_multiple_outputs()
    e.meta.is_regex_projection()
    if e._meta is not None and e._meta[1]:
        assert isinstance(e.meta.pop(), list)


def test_meta_eq_on_pool_members():
    pool = _pool()
    for name, (e, _r) in pool.items():
        # reflexive structural equality must not raise; ambiguous shapes
        # may return False but must stay exception-free
        e.meta.eq(e)
        e.meta.ne(pl.col("zz"))
