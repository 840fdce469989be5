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
