"""Mimics the driver's correctness gate: every oracle-backed query in
__spark_entry__.py runs on Spark AND DuckDB at sf0.01; row count, column
names, and exact sorted values must agree. Rows-only queries must run and
return a stable non-empty result."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con.execute(sql).fetchdf()


def _norm(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append("nan")
                else:
                    row.append(f"{v!r}")
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return cols, sorted(rows)


ORACLES = sorted(entrymod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entrymod.queries()) - set(ORACLES))


@pytest.mark.parametrize("name", ORACLES)
def test_oracle_parity(spark, name):
    qdf = entrymod.queries()[name](spark, SF_DIR).toPandas()
    odf = _duck(entrymod.oracle_sql()[name])
    qc, qr = _norm(qdf)
    oc, orr = _norm(odf)
    assert qc == oc, f"{name}: columns {qc} vs {oc}"
    assert len(qr) == len(orr), f"{name}: rows {len(qr)} vs {len(orr)}"
    mismatches = [i for i, (a, b) in enumerate(zip(qr, orr)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"{qr[mismatches[0]]} vs {orr[mismatches[0]]}"
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.count() > 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
