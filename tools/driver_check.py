"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where an ``oracle_sql()``
entry exists, the oracle on DuckDB over the same parquet tables;
compares row count + order-insensitive values (columns sorted by name,
rows sorted). Use before committing new entries:

    python tools/driver_check.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import math
import os
import sys
import time
from datetime import datetime
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rows(rows):
    return sorted(tuple(_norm(v) for v in r) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""
    # the data-dependent ANN oracles are generated for this sf (the
    # grading driver leaves the default = sf0.01); set BEFORE importing
    # the entry module, which reads it at import time
    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_dir

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        # session tz intentionally NOT pinned (grader may run non-UTC;
        # a pinned UTC session would mask tz-dependent bucketing bugs)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    import __spark_entry__ as e

    print("== entry() smoke ==")
    t0 = time.time()
    df = e.entry(spark)
    rows = df.collect()
    print(f"entry: {len(rows)} rows in {time.time()-t0:.1f}s schema={df.schema.simpleString()}")
    assert len(rows) >= 0

    qs, os_ = e.queries(), e.oracle_sql()
    unknown = set(os_) - set(qs)
    assert not unknown, f"oracle_sql keys without queries: {unknown}"
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if name_filter and name_filter not in name:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            # driver compares columns sorted by name
            scols = sorted(sdf.columns)
            srows = _rows((tuple(r[c] for c in scols) for r in sdf.collect()))
        except Exception as ex:
            print(f"FAIL  {name}: spark side raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if name not in os_:
            print(f"rows  {name}: {len(srows)} rows ({time.time()-t0:.1f}s) [rows-only]")
            n_rowsonly += 1
            continue
        try:
            cur = con.execute(os_[name])
            ocols_raw = [d[0] for d in cur.description]
            orows_raw = cur.fetchall()
            order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
            ocols = [ocols_raw[i] for i in order]
            orows = _rows((tuple(r[i] for i in order) for r in orows_raw))
        except Exception as ex:
            print(f"FAIL  {name}: duckdb side raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        ok_cols = [c.lower() for c in scols] == [c.lower() for c in ocols]
        ok_count = len(srows) == len(orows)
        ok_vals = srows == orows
        if ok_cols and ok_count and ok_vals:
            print(f"PASS  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: cols={ok_cols} ({scols} vs {ocols}) "
                  f"count={ok_count} ({len(srows)} vs {len(orows)}) vals={ok_vals}")
            if ok_cols and ok_count:
                for a, b in zip(srows, orows):
                    if a != b:
                        print(f"      first diff:\n      spark={a}\n      duck ={b}")
                        break
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
