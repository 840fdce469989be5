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


def make_grouped_agg_udf(function, return_type):
    """GROUPED_AGG pandas UDF (SURVEY §2.4 'UDAF available as extension'):
    pd.Series per group -> scalar, Arrow-batched, usable under group_by.agg
    and over() windows."""

    @pandas_udf(return_type)
    def _udf(s: pd.Series) -> float:
        return function(s)

    return _udf
