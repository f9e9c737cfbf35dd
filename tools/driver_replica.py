"""Preflight the driver's correctness run under DRIVER-LIKE conditions.

The local gate (tests/test_correctness_gate.py) runs on the tuned session
from conftest; the actual driver builds its OWN vanilla SparkSession and
checks the first 50 registered queries at sf0.01. Subtle failures can hide
in that gap (session defaults, warehouse dir, conf-sensitive plans), so
this tool replicates the driver exactly: a plain local[32] session with no
pypeln_spark session tuning, the front-WINDOW queries plus any names given
on the command line, value-compared against their DuckDB oracles at sf0.01.

Usage: python tools/driver_replica.py [extra_query ...]
Prints one line per non-OK query and a final summary; exit 1 on failure.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50
SF_DIR = os.environ.get("SPARK_GRAFT_REPLICA_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        return ("nan",) if math.isnan(v) else ("f", repr(v))
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat().replace("+00:00", ""))
    return ("s", str(v))


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("driver_replica")
        .getOrCreate()
    )
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    names = list(qs)[:WINDOW] + [a for a in sys.argv[1:] if a in qs]
    bad = []
    for i, n in enumerate(names):
        try:
            sdf = qs[n](spark, SF_DIR).toPandas()
            if n not in osql:
                status = "rows-only"
            else:
                odf = con.sql(osql[n]).df()
                cols = sorted(sdf.columns)
                a = sorted(
                    tuple(_canon(v) for v in row)
                    for row in sdf[cols].itertuples(index=False, name=None)
                )
                b = sorted(
                    tuple(_canon(v) for v in row)
                    for row in odf[sorted(odf.columns)].itertuples(
                        index=False, name=None
                    )
                )
                status = (
                    "OK"
                    if a == b and sorted(sdf.columns) == sorted(odf.columns)
                    else "MISMATCH"
                )
                if status == "MISMATCH":
                    bad.append(n)
        except Exception as ex:  # noqa: BLE001 - report, keep sweeping
            status = f"ERR {type(ex).__name__}: {str(ex)[:100]}"
            bad.append(n)
        if status != "OK":
            print(f"{i:3d} {n}: {status}")
    print(f"checked {len(names)}; failures: {bad}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
