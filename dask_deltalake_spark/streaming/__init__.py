from dask_deltalake_spark.streaming.ops import REGISTRY

__all__ = ["REGISTRY"]
