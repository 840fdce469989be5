"""Regression pins for the engine's DOCUMENTED deviations from the
reference (VERDICT r10 #4; SURVEY §1.3).

Each test asserts the CURRENT, intentional behavior so a future refactor
cannot silently change a deviation the docs promise.  If one of these
fails, either restore the documented behavior or update SURVEY §1.3, the
docstring, and this file TOGETHER.

Reference points: data_types.rb:171-298 (dtype table), expr.rb:5649
(rank random), lazy_frame.rb fetch, series.rb n_chunks.
"""

import datetime as dt
import math

import pytest
from pyspark.sql import types as T

import polars_ruby_spark as pl


@pytest.fixture(scope="module")
def spark():
    from polars_ruby_spark.session import get_spark

    return get_spark()


def test_uint64_caps_to_decimal_20_0(spark):
    # UInt64 has no Spark analogue: cast("u64") lands on Decimal(20,0)
    df = pl.DataFrame({"a": [1, 2]})
    out = df.select(pl.col("a").cast("u64").alias("x"))
    assert isinstance(out.schema["x"], T.DecimalType)
    assert (out.schema["x"].precision, out.schema["x"].scale) == (20, 0)


def test_unsigned_counters_cap_to_i64(spark):
    # reference u32 counters → i64 (len/str length/count families)
    df = pl.DataFrame({"s": ["ab", "abc"], "l": [[1, 2], [2, 2]]})
    out = df.select(
        pl.col("s").str.len_chars().alias("lc"),
        pl.col("s").str.len_bytes().alias("lb"),
        pl.col("s").str.count_matches("a").alias("cm"),
        pl.col("l").list.count_matches(2).alias("lcm"),
    )
    for c in ("lc", "lb", "cm", "lcm"):
        assert isinstance(out.schema[c], T.LongType), c


def test_datetime_ns_truncates_to_us(spark):
    # Datetime("ns") → TimestampType (µs); sub-µs digits are dropped
    df = pl.DataFrame({"t": [dt.datetime(2021, 1, 1, 0, 0, 0, 123456)]})
    out = df.select(pl.col("t").cast(pl.Datetime("ns")).alias("x"))
    assert isinstance(out.schema["x"], (T.TimestampType, T.TimestampNTZType))


def test_time_caps_to_int64_nanos(spark):
    # Time → Int64 nanoseconds since midnight
    s = pl.Series(["01:02:03"]).str.strptime(pl.Time)
    assert isinstance(s.dtype, T.LongType)
    assert s.to_list() == [(1 * 3600 + 2 * 60 + 3) * 1_000_000_000]


def test_categorical_caps_to_string(spark):
    # Categorical → String: no dictionary codes, to_physical is identity
    df = pl.DataFrame({"v": ["a", "x", "a"]})
    out = df.select(pl.col("v").cast("cat").alias("c"))
    assert isinstance(out.schema["c"], T.StringType)
    phys = df.select(pl.col("v").cast("cat").to_physical().alias("p"))
    assert [r[0] for r in phys.rows()] == ["a", "x", "a"]


def test_rank_random_defaults_to_seed_zero(spark):
    # the reference re-seeds per call; a distributed engine cannot (task
    # retries / dual consumers would rank one column two ways inside one
    # query), so rank("random") is DETERMINISTIC with default seed 0
    df = pl.DataFrame({"v": [5, 5, 5, 1, 1, 9]})
    a = df.select(pl.col("v").rank("random").alias("r")).rows()
    b = df.select(pl.col("v").rank("random").alias("r")).rows()
    assert a == b  # same seed → same permutation, run to run


def test_rolling_nearest_differs_from_agg_nearest(spark):
    # NOT a deviation anymore (r11 closed it) but pin the subtlety: polars
    # has TWO "nearest" quantiles — rolling kernels truncate n*q
    # (rolling/no_nulls/quantile.rs) while agg/series quantile rounds
    # (n-1)*q — and the engine matches both.
    ts = [dt.datetime(2024, 1, 1) + dt.timedelta(hours=i) for i in range(4)]
    df = pl.DataFrame({"ts": ts, "v": [1.0, 2.0, 4.0, 8.0]})
    out = df.with_columns(
        q=pl.col("v").rolling_quantile_by("ts", "10h", quantile=0.5),
        ql=pl.col("v").rolling_quantile_by("ts", "10h", quantile=0.5,
                                           interpolation="linear"))
    # window at t3 holds [1,2,4,8]: rolling nearest = trunc(4*0.5)=idx 2
    # → 4.0; linear median = 3.0; agg nearest = round(3*0.5)=idx 2 → 4.0
    assert out.rows()[-1][-2] == pytest.approx(4.0)
    assert out.rows()[-1][-1] == pytest.approx(3.0)
    agg = df.select(pl.col("v").quantile(0.33).alias("q")).rows()[0][0]
    # agg nearest: round((4-1)*0.33)=round(0.99)=1 → 2.0 (rolling would
    # give trunc(4*0.33)=1 → 2.0 too; use a case where they differ)
    assert agg == pytest.approx(2.0)
    roll = df.select(
        pl.col("v").rolling_quantile(0.33, 3).alias("r")).rows()
    # last window [2,4,8]: rolling trunc(3*0.33)=0 → 2.0;
    # agg nearest would round(2*0.33)=round(0.66)=1 → 4.0
    assert roll[-1][0] == pytest.approx(2.0)


def test_n_chunks_is_logically_one(spark):
    # chunks are a physical polars detail with no Spark analogue
    df = pl.DataFrame({"a": [1, 2, 3]})
    assert df.n_chunks() == 1
    assert pl.Series("a", [1, 2]).n_chunks() == 1


def test_fetch_is_head(spark):
    # LazyFrame.fetch(n) limits the OUTPUT (head), not the source scan
    # like the reference (re-running the whole plan over an n-row source
    # is not expressible once the plan is bound) — documented deviation
    lf = pl.DataFrame({"a": [1, 2, 3, 4]}).lazy()
    assert [r[0] for r in lf.fetch(2).rows()] == [1, 2]


def test_div_by_zero_matches_polars_inf(spark):
    # NOT a deviation anymore (r11 closed it): x/0 → ±inf, 0/0 → NaN like
    # polars (truediv doctest); null operands stay null.  Both the
    # Catalyst route (_div_polars) and the np kernel's "/" agree.
    out = pl.DataFrame({"a": [1.0, 0.0, -2.0, None],
                        "b": [0.0, 0.0, 0.0, 0.0]}).select(
        (pl.col("a") / pl.col("b")).alias("q"))
    vals = [r[0] for r in out.rows()]
    assert vals[0] == float("inf")
    assert math.isnan(vals[1])
    assert vals[2] == float("-inf")
    assert vals[3] is None


def test_min_max_ignore_nan_like_polars(spark):
    # NOT a deviation — pinned because three kernels share it (round-11):
    # plain agg, sliding kernel, cumulative prefix all skip NaN; all-NaN
    # reduces to null
    df = pl.DataFrame({"a": [-1.0, float("nan"), 1.0]})
    assert df.select(pl.col("a").max()).rows() == [(1.0,)]
    assert df.select(pl.col("a").min()).rows() == [(-1.0,)]
    allnan = pl.DataFrame({"a": [float("nan")] * 2})
    assert allnan.select(pl.col("a").max()).rows() == [(None,)]
