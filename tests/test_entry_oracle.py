"""Driver-style correctness check: every queries() entry vs its DuckDB
oracle at sf0.001 (row count + column names + order-insensitive values)."""
from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _rowset(rows):
    # Multiset compare: rows may mix None with values, which sorted() can't
    # order — Counter needs only hashability.
    from collections import Counter
    return Counter(tuple(_norm(v) for v in r) for r in rows)


# Spark simpleString type -> equivalent DuckDB type names.
_TYPE_EQUIV = {
    "bigint": {"BIGINT", "HUGEINT"},
    "int": {"INTEGER"},
    "double": {"DOUBLE", "DECIMAL"},
    "boolean": {"BOOLEAN"},
    "string": {"VARCHAR"},
    "timestamp_ntz": {"TIMESTAMP"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
}


@pytest.mark.parametrize("name", sorted(E.oracle_sql()))
def test_query_matches_oracle(spark, ddb, name):
    q = E.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_types = [f.dataType.simpleString() for f in sdf.schema.fields]
    spark_rows = [tuple(r) for r in sdf.collect()]

    sql = E.oracle_sql()[name]
    desc = ddb.execute(f"DESCRIBE {sql}").fetchall()
    duck_types = [row[1].upper() for row in desc]
    res = ddb.execute(sql)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert spark_cols == duck_cols, f"{name}: column mismatch"
    for col, st, dt in zip(spark_cols, spark_types, duck_types):
        allowed = _TYPE_EQUIV.get(st)
        if allowed is not None:
            base = dt.split("(")[0].strip()
            assert base in allowed, (
                f"{name}.{col}: type mismatch spark={st} duckdb={dt}")
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rows spark={len(spark_rows)} duck={len(duck_rows)}")
    sset, dset = _rowset(spark_rows), _rowset(duck_rows)
    if sset != dset:
        diff_s = [r for r in sset if sset[r] != dset.get(r, 0)][:3]
        diff_d = [r for r in dset if dset[r] != sset.get(r, 0)][:3]
        raise AssertionError(
            f"{name}: value mismatch\n spark-only={diff_s}\n duck-only={diff_d}")


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert "dealer_name" in df.columns
