"""Frame/series equality assertions for tests.

Parity: the reference ports ``polars.testing``
(``/root/reference/lib/polars/testing.rb`` — ``assert_frame_equal`` with
``check_row_order``/``check_dtype``/``rtol``/``atol``; value walk at
``:342-409`` handles NaN/null/nested).
"""

from __future__ import annotations

import math
from typing import Any


def _values(frame) -> list[tuple]:
    if hasattr(frame, "to_spark"):
        rows = frame.to_spark().collect()
        return [tuple(r) for r in rows]
    if hasattr(frame, "collect"):
        return [tuple(r) for r in frame.collect()]
    raise TypeError(f"not a frame: {frame!r}")


def _columns(frame) -> list[str]:
    return list(frame.columns)


def _val_eq(a: Any, b: Any, rtol: float, atol: float) -> bool:
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=rtol, abs_tol=atol)
    if isinstance(a, (int, float)) and isinstance(b, (int, float)) and not isinstance(a, bool):
        return math.isclose(float(a), float(b), rel_tol=rtol, abs_tol=atol)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_val_eq(x, y, rtol, atol) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_val_eq(a[k], b[k], rtol, atol) for k in a)
    return a == b


def assert_frame_equal(left, right, check_row_order: bool = True,
                       check_column_order: bool = True, check_dtype: bool = True,
                       rtol: float = 1e-5, atol: float = 1e-8) -> None:
    lcols, rcols = _columns(left), _columns(right)
    only_left = [c for c in lcols if c not in rcols]
    if only_left:
        raise AssertionError(
            f"columns {only_left!r} in left DataFrames, but not in right")
    if check_column_order:
        assert lcols == rcols, f"columns differ: {lcols} vs {rcols}"
    else:
        assert sorted(lcols) == sorted(rcols), f"columns differ: {lcols} vs {rcols}"
    if check_dtype and hasattr(left, "dtypes") and hasattr(right, "dtypes"):
        ld = dict(zip(lcols, left.dtypes))
        rd = dict(zip(rcols, right.dtypes))
        if any(ld[c] != rd[c] for c in lcols):
            raise AssertionError(
                "DataFrames are different (dtypes do not match): "
                f"{ld} vs {rd}")
    lv, rv = _values(left), _values(right)
    if not check_column_order:
        lorder = [lcols.index(c) for c in sorted(lcols)]
        rorder = [rcols.index(c) for c in sorted(rcols)]
        lv = [tuple(row[i] for i in lorder) for row in lv]
        rv = [tuple(row[i] for i in rorder) for row in rv]
    if not check_row_order:
        key = lambda row: tuple(str(v) for v in row)  # noqa: E731
        lv, rv = sorted(lv, key=key), sorted(rv, key=key)
    assert len(lv) == len(rv), f"row counts differ: {len(lv)} vs {len(rv)}"
    for i, (lr, rr) in enumerate(zip(lv, rv)):
        for j, (a, b) in enumerate(zip(lr, rr)):
            assert _val_eq(a, b, rtol, atol), (
                f"value mismatch at row {i}, col {lcols[j]!r}: {a!r} != {b!r}")


def assert_series_equal(left, right, check_dtype: bool = False,
                        rtol: float = 1e-5, atol: float = 1e-8) -> None:
    if check_dtype and hasattr(left, "dtype") and hasattr(right, "dtype"):
        if left.dtype != right.dtype:
            raise AssertionError(
                "Series are different (dtypes do not match): "
                f"{left.dtype} vs {right.dtype}")
    lv = left.to_list() if hasattr(left, "to_list") else list(left)
    rv = right.to_list() if hasattr(right, "to_list") else list(right)
    assert len(lv) == len(rv), f"lengths differ: {len(lv)} vs {len(rv)}"
    for i, (a, b) in enumerate(zip(lv, rv)):
        assert _val_eq(a, b, rtol, atol), f"value mismatch at {i}: {a!r} != {b!r}"


def assert_frame_not_equal(left, right, **kwargs):
    """testing.rb assert_frame_not_equal — passes iff assert_frame_equal fails."""
    try:
        assert_frame_equal(left, right, **kwargs)
    except AssertionError:
        return
    raise AssertionError("frames are equal")


def assert_series_not_equal(left, right, **kwargs):
    try:
        assert_series_equal(left, right, **kwargs)
    except AssertionError:
        return
    raise AssertionError("Series are equal")
