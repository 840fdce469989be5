"""Giant-group gate (round-6): composed full-array agg routes (the q147
shape — shift→is_unique→any etc.) are O(g²) per-group HOF time; a hot key
funnels that into one task.  The gate reroutes them to STAGED windowed
pre-stages (O(g log g), task-parallel) UNCONDITIONALLY whenever a staged
binding exists — the staged route won on uniform keys too, so the count
probe became moot (see _giant_group_gate's docstring); the
``SPARK_GRAFT_GIANT_GROUP_FORCE`` env var (0/1) forces either route for
testing.  These tests assert (a) the reroute is on by default, (b) results
are bit-identical on both routes, (c) the env override selects each route.
"""

from __future__ import annotations

import os

import pytest

import polars_ruby_spark as pl
from polars_ruby_spark.group_by import _giant_group_gate


@pytest.fixture
def frame(spark):
    data = {
        "k": ["a", "a", "b", "a", "b", "a", "a", "b", "a", "a"],
        "p": ["x", "y", "x", "x", "z", "y", "z", "x", "w", "x"],
        "v": [1.0, 2.0, 3.0, 2.0, 5.0, 2.0, 7.0, 3.0, 9.0, 1.0],
    }
    return pl.DataFrame(data)


def _flags_agg(df):
    g = df.group_by("k").agg(
        pl.col("p").shift(1).is_unique().any().alias("ian"),
        pl.col("p").shift(1).is_unique().alias("iu"),
        pl.col("v").shift(1).cum_sum().alias("scs"),
        pl.col("v").shift(1).n_unique().alias("snu"),
        pl.col("p").shift(1).is_first_distinct().alias("fd"),
        pl.col("p").shift(1).is_last_distinct().alias("ld"),
    )
    return sorted(map(str, g.sort("k").rows()))


def test_reroute_matches_array_route(frame, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_GIANT_GROUP_FORCE", "0")
    off = _flags_agg(frame)
    monkeypatch.setenv("SPARK_GRAFT_GIANT_GROUP_FORCE", "1")
    on = _flags_agg(frame)
    assert on == off


def test_reroute_triggers_staged_windows(frame, monkeypatch):
    """Forced gate → the plan carries the staged helper windows (lag +
    value-partitioned flag windows) instead of bare collect_list HOFs."""
    monkeypatch.setenv("SPARK_GRAFT_GIANT_GROUP_FORCE", "1")
    g = frame.lazy().group_by("k").agg(
        pl.col("p").shift(1).is_unique().any().alias("ian"))
    plan = g._sdf._jdf.queryExecution().analyzed().toString()
    assert "lag(" in plan  # staged shift helper window materialized
    monkeypatch.setenv("SPARK_GRAFT_GIANT_GROUP_FORCE", "0")
    g2 = frame.lazy().group_by("k").agg(
        pl.col("p").shift(1).is_unique().any().alias("ian"))
    plan2 = g2._sdf._jdf.queryExecution().analyzed().toString()
    assert "lag(" not in plan2  # array route: no window at all


def test_gate_default_on(frame, monkeypatch):
    """The staged reroute is the DEFAULT (measured 5× faster than the
    array route at sf0.1 even on uniform keys); FORCE=0 opts back into
    the array route; plain aggregates never reroute."""
    monkeypatch.delenv("SPARK_GRAFT_GIANT_GROUP_FORCE", raising=False)
    sdf = frame.lazy()._sdf
    keys = [(None, pl.col("k"))]
    exprs = [pl.col("p").shift(1).is_unique().any().alias("ian")]
    assert _giant_group_gate(sdf, keys, exprs, {}) is True
    monkeypatch.setenv("SPARK_GRAFT_GIANT_GROUP_FORCE", "0")
    assert _giant_group_gate(sdf, keys, exprs, {}) is False
    # plain aggregates (no array route) never reroute
    monkeypatch.delenv("SPARK_GRAFT_GIANT_GROUP_FORCE", raising=False)
    assert _giant_group_gate(
        sdf, keys, [pl.col("v").sum()], {}) is False
