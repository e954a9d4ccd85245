from dask_deltalake_spark.sources.delta_source import (
    DeltaPyDataSource,
    register_python_datasource,
)

__all__ = ["DeltaPyDataSource", "register_python_datasource"]
