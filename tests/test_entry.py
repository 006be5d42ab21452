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


def test_chunk_windows_no_aliasing_past_100(spark):
    """Round-4 verdict finding #1: the old doc_id*100+idx composite key
    aliased documents with >100 windows. The widened stride must keep
    every window id distinct for a 150-window document."""
    docs = spark.createDataFrame(
        [(7, " ".join(f"t{i}" for i in range(150 * 20))),
         (8, " ".join(f"u{i}" for i in range(5 * 20)))],
        "doc_id long, text string",
    )
    out = entrymod._chunk_windows(docs, w=20).toPandas()
    assert len(out) == 155
    assert out["doc_id"].is_unique
    # doc 7's windows all live in doc 7's id space, none leak into doc 8's
    s = entrymod._CHUNK_ID_STRIDE
    d7 = out[(out.doc_id >= 7 * s) & (out.doc_id < 8 * s)]
    assert len(d7) == 150


def test_chunk_windows_stride_guard_raises(spark):
    """A document whose window count reaches the stride must raise instead
    of silently aliasing (tested at a tiny stride)."""
    from pyspark.errors import PySparkException

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10 * 4)))],
        "doc_id long, text string",
    )
    with pytest.raises(PySparkException, match="chunk index overflow"):
        entrymod._chunk_windows(docs, w=4, stride=8).count()
