"""Arrow-vectorized Python UDFs (q35).

Kept in a module WITHOUT ``from __future__ import annotations``:
pandas_udf infers the UDF kind (scalar vs grouped-agg) from real type
hints, and the future import would turn them into strings it cannot
interpret.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def adjusted_price(price: pd.Series, custkey: pd.Series) -> pd.Series:
    """Scalar pandas_udf: whole-batch vectorized numpy arithmetic."""
    return price * (1.0 - 0.01 * (custkey % 5))


@pandas_udf("double")
def mean_price(price: pd.Series) -> float:
    """Grouped-aggregate pandas_udf (Series -> scalar)."""
    return float(price.mean())


@pandas_udf("double")
def sum_price(price: pd.Series) -> float:
    """Grouped-aggregate pandas_udf (Series -> scalar)."""
    return float(price.sum())
