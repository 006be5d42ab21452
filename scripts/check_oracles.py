#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run each queries()
entry on Spark AND its oracle_sql() on DuckDB over the same parquet tables,
compare row count / schema / values (columns sorted by name, rows sorted by
all columns — the driver hashes after the same normalization).

Usage:
  python scripts/check_oracles.py [query ...]     # default: all with oracles
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/check_oracles.py
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(df):
    import pandas as pd  # noqa: F401

    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _values_equal(a, b) -> bool:
    if a.shape != b.shape:
        return False
    for col in a.columns:
        for x, y in zip(a[col], b[col]):
            if x is None and y is None:
                continue
            fx = isinstance(x, float) and math.isnan(x)
            fy = isinstance(y, float) and math.isnan(y)
            if (x is None and fy) or (fx and y is None) or (fx and fy):
                continue
            if isinstance(x, float) or isinstance(y, float):
                if x is None or y is None:
                    return False
                if not math.isclose(float(x), float(y), rel_tol=0, abs_tol=1e-9):
                    return False
            elif str(x) != str(y):
                return False
    return True


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])

    import duckdb

    import __spark_entry__ as E
    from ditto_spark.session import get_spark

    spark = get_spark("oracle_check", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = E.queries()
    oracles = E.oracle_sql()
    results: dict[str, dict] = {}
    names = [n for n in queries if n in oracles and (not only or n in only)]
    for name in names:
        try:
            sdf = queries[name](spark, sf_dir).toPandas()
            odf = con.execute(oracles[name]).df()
            s, o = _norm(sdf), _norm(odf)
            res = {
                "rows_match": len(s) == len(o),
                "schema_match": list(s.columns) == list(o.columns),
                "values_match": _values_equal(s, o),
                "spark_rows": len(s),
                "oracle_rows": len(o),
                "err": None,
            }
        except Exception as exc:  # noqa: BLE001
            res = {
                "rows_match": False, "schema_match": False,
                "values_match": False, "spark_rows": -1, "oracle_rows": -1,
                "err": f"{type(exc).__name__}: {exc}"[:400],
            }
        results[name] = res
        flag = "OK " if res["values_match"] else "FAIL"
        print(f"{flag} {name}: {json.dumps(res)}", flush=True)

    bad = [n for n, r in results.items() if not r["values_match"]]
    print(f"\n{len(results) - len(bad)}/{len(results)} matched; failing: {bad}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
