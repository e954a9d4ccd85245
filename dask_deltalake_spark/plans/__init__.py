from dask_deltalake_spark.plans.inspect import (
    executed_plan,
    exchanges_below_first_join,
    join_strategies,
    scan_info,
)

__all__ = [
    "executed_plan",
    "scan_info",
    "join_strategies",
    "exchanges_below_first_join",
]
