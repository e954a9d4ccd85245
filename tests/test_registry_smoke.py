"""Every registered query must plan and execute at sf0.001.

The DuckDB oracle gate (tools/check_oracle.py, driver t2) checks value
correctness at sf0.01; this smoke keeps the whole registry executable
from pytest — schema stays resolvable and each query returns rows
without error at the smallest scale factor.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _registry():
    from dask_deltalake_spark.operators import REGISTRY

    return sorted(REGISTRY)


@pytest.mark.parametrize("name", _registry())
def test_query_runs(spark, name):
    from dask_deltalake_spark.operators import REGISTRY

    fn, oracle = REGISTRY[name]
    df = fn(spark, SF_DIR)
    assert df.columns, f"{name} returned no columns"
    rows = df.limit(5).collect()
    assert rows is not None
    if oracle is not None:
        assert oracle.strip().upper().startswith(("SELECT", "WITH")), name
