"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 on Spark and
its ``oracle_sql()`` on DuckDB over the same parquet, then compares:
row count, sorted column names, and cell values (columns sorted by
name, rows sorted by all columns) — flagging any exact mismatch plus
the max float delta so near-misses are visible before the driver's
hash compare catches them.

Usage: python tools/check_oracle.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df):
    """pandas frame → (ncols sorted by name, rows sorted) canonical list."""
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        rows.append(tuple(_cell(v) for v in tup))
    rows.sort(key=lambda r: tuple(str(x) for x in r))
    return list(df.columns), rows


def _cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    try:
        import pandas as pd

        if v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
            return None
    except Exception:
        pass
    if hasattr(v, "item"):
        v = v.item()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def compare(name, spark_pdf, duck_pdf):
    issues = []
    if len(spark_pdf) != len(duck_pdf):
        issues.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, srows = canon(spark_pdf)
    dc, drows = canon(duck_pdf)
    if sc != dc:
        issues.append(f"columns spark={sc} duck={dc}")
        return issues, None
    max_delta = 0.0
    n_mismatch = 0
    examples = []
    for i, (a, b) in enumerate(zip(srows, drows)):
        row_bad = False
        for x, y in zip(a, b):
            # Type-strict: the driver's value hash is type-sensitive, so
            # int 300 vs float 300.0 must FAIL here even though == passes
            # (this exact loophole masked d35's BIGINT-vs-DOUBLE bug in r6).
            if x is not None and y is not None and type(x) is not type(y):
                row_bad = True
                continue
            if x == y:
                continue
            if isinstance(x, float) and isinstance(y, float):
                d = abs(x - y)
                max_delta = max(max_delta, d)
                if d > 0:
                    row_bad = True
            else:
                row_bad = True
        if row_bad:
            n_mismatch += 1
            if len(examples) < 3:
                examples.append((i, a, b))
    if n_mismatch:
        issues.append(f"{n_mismatch} mismatched rows; max_float_delta={max_delta:g}")
        for i, a, b in examples:
            issues.append(f"  row{i} spark={a}")
            issues.append(f"  row{i}  duck={b}")
    return issues, max_delta


def main():
    only = set(sys.argv[1:])
    import duckdb

    import __spark_entry__ as entrymod
    from dask_deltalake_spark.session import get_spark

    spark = get_spark(
        app_name="oracle-check",
        extra_conf={"spark.ui.enabled": "false"},
    )

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"✗ {name}: SPARK ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"○ {name}: rows-only ({len(spark_pdf)} rows, {el:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"✗ {name}: DUCKDB ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        issues, max_delta = compare(name, spark_pdf, duck_pdf)
        if issues:
            print(f"✗ {name} ({len(spark_pdf)} rows, {el:.1f}s)")
            for line in issues:
                print(f"    {line}")
            n_fail += 1
        else:
            print(f"✓ {name} ({len(spark_pdf)} rows, {el:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
