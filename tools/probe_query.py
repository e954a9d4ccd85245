"""Fresh-JVM single-query timing probe for interleaved A/B runs.

Usage: python tools/probe_query.py <query> [n_timed]

Starts a session exactly like bench.py (local[$SPARK_GRAFT_CPUS],
noop sink, region warmup), runs the named query once untimed (warm)
then n_timed (default 3) timed repeats, prints one JSON line with the
times. Machine-state noise is handled by the CALLER alternating A/B
invocations in the same minutes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    name = sys.argv[1]
    n_timed = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from dask_deltalake_spark.operators import REGISTRY
    from dask_deltalake_spark.session import get_spark
    from dask_deltalake_spark.tables import load_table

    spark = get_spark(
        app_name="probe", extra_conf={"spark.ui.enabled": "false"}
    )
    load_table(spark, SF_DIR, "region").write.format("noop").mode(
        "overwrite"
    ).save()
    fn, _ = REGISTRY[name]
    times = []
    for i in range(n_timed + 1):
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        if i > 0:  # first run is the untimed warm pass
            times.append(round(dt, 3))
        spark.catalog.clearCache()
    print(json.dumps({
        "query": name,
        "times": times,
        "min": min(times),
        "env": {k: v for k, v in os.environ.items()
                if k.startswith("SPARK_GRAFT_")},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
