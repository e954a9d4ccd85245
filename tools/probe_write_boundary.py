"""Microbench: decompose the DML/OPTIMIZE write boundary cost
(mapInPandas factory) and compare against a mapInArrow prototype.

Measures, on one warm session, per pass over a lineitem-scale frame:
  A. mapInPandas passthrough (boundary only)
  B. mapInArrow passthrough (boundary only)
  C. current _write_partition_factory via mapInPandas (full write+stats)
  D. arrow prototype: write incoming batches directly + pandas-fed stats

Usage: python tools/probe_write_boundary.py [n_repeats]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from dask_deltalake_spark.session import get_spark
    from dask_deltalake_spark.tables import load_table
    from dask_deltalake_spark.delta.writer import (
        _ADD_ROW_SCHEMA,
        _spark_to_arrow_schema,
        _write_partition_factory,
    )

    spark = get_spark(app_name="probe-wb", extra_conf={"spark.ui.enabled": "false"})
    df = load_table(spark, SF_DIR, "lineitem")
    df.write.format("noop").mode("overwrite").save()  # warm
    out: dict = {}

    def timeit(label, fn):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(round(time.perf_counter() - t0, 3))
        out[label] = ts

    # A/B: pure boundary passthrough
    def pand_pass(it):
        tot = 0
        for pdf in it:
            tot += len(pdf)
        import pandas as pd

        yield pd.DataFrame({"n": [tot]})

    def arrow_pass(it):
        import pyarrow as pa

        tot = 0
        for b in it:
            tot += b.num_rows
        yield pa.RecordBatch.from_pydict({"n": [tot]})

    timeit("A_mapInPandas_passthrough", lambda: df.mapInPandas(
        pand_pass, schema="n long").write.format("noop").mode("overwrite").save())
    timeit("B_mapInArrow_passthrough", lambda: df.mapInArrow(
        arrow_pass, schema="n long").write.format("noop").mode("overwrite").save())

    # C: the real factory (write + stats)
    base = f"/tmp/probe_wb/{uuid.uuid4().hex[:8]}"
    os.makedirs(base, exist_ok=True)
    schema_bytes = _spark_to_arrow_schema(df.schema).serialize().to_pybytes()

    def run_c():
        root = os.path.join(base, uuid.uuid4().hex[:8])
        os.makedirs(root, exist_ok=True)
        fn = _write_partition_factory(root, [], schema_bytes)
        df.mapInPandas(fn, schema=_ADD_ROW_SCHEMA).collect()
        shutil.rmtree(root, ignore_errors=True)

    timeit("C_pandas_factory_full", run_c)

    # D: arrow prototype — direct batch write + pandas-fed stats
    from dask_deltalake_spark.delta.protocol import StatsAccumulator

    def arrow_proto_factory(root):
        def write_partition(batches):
            import pandas as pd
            import pyarrow as pa
            import pyarrow.parquet as pq

            arrow_schema = pa.ipc.read_schema(pa.BufferReader(schema_bytes))
            w = None
            acc = StatsAccumulator()
            rows = 0
            rel = f"part-{uuid.uuid4().hex}.snappy.parquet"
            for b in batches:
                if not b.num_rows:
                    continue
                if w is None:
                    w = pq.ParquetWriter(
                        os.path.join(root, rel), arrow_schema,
                        compression="snappy",
                    )
                tbl = pa.Table.from_batches([b]).cast(arrow_schema)
                w.write_table(tbl)
                acc.update(b.to_pandas())
                rows += b.num_rows
            out_rows = []
            if w is not None:
                w.close()
                out_rows.append({
                    "path": rel,
                    "size": os.path.getsize(os.path.join(root, rel)),
                    "partition_json": "{}",
                    "num_records": rows,
                    "stats": acc.to_json(),
                })
                yield pa.RecordBatch.from_pylist(
                    out_rows, schema=pa.schema([
                        pa.field("path", pa.string()),
                        pa.field("size", pa.int64()),
                        pa.field("partition_json", pa.string()),
                        pa.field("num_records", pa.int64()),
                        pa.field("stats", pa.string()),
                    ])
                )

        return write_partition

    def run_d():
        root = os.path.join(base, uuid.uuid4().hex[:8])
        os.makedirs(root, exist_ok=True)
        df.mapInArrow(
            arrow_proto_factory(root), schema=_ADD_ROW_SCHEMA
        ).collect()
        shutil.rmtree(root, ignore_errors=True)

    timeit("D_arrow_proto_full", run_d)

    # D2: arrow write WITHOUT stats (isolates the stats-pandas cost)
    def arrow_proto_nostats_factory(root):
        def write_partition(batches):
            import pyarrow as pa
            import pyarrow.parquet as pq

            arrow_schema = pa.ipc.read_schema(pa.BufferReader(schema_bytes))
            w = None
            rows = 0
            rel = f"part-{uuid.uuid4().hex}.snappy.parquet"
            for b in batches:
                if not b.num_rows:
                    continue
                if w is None:
                    w = pq.ParquetWriter(
                        os.path.join(root, rel), arrow_schema,
                        compression="snappy",
                    )
                w.write_table(pa.Table.from_batches([b]).cast(arrow_schema))
                rows += b.num_rows
            if w is not None:
                w.close()
                yield pa.RecordBatch.from_pylist(
                    [{"path": rel, "size": 0, "partition_json": "{}",
                      "num_records": rows, "stats": None}],
                    schema=pa.schema([
                        pa.field("path", pa.string()),
                        pa.field("size", pa.int64()),
                        pa.field("partition_json", pa.string()),
                        pa.field("num_records", pa.int64()),
                        pa.field("stats", pa.string()),
                    ])
                )

        return write_partition

    def run_d2():
        root = os.path.join(base, uuid.uuid4().hex[:8])
        os.makedirs(root, exist_ok=True)
        df.mapInArrow(
            arrow_proto_nostats_factory(root), schema=_ADD_ROW_SCHEMA
        ).collect()
        shutil.rmtree(root, ignore_errors=True)

    timeit("D2_arrow_write_nostats", run_d2)
    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
