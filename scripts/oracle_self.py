"""Self-published correctness matrix: run EVERY queries() entry against
its DuckDB oracle (driver-style compare: row count + column names +
types + order-insensitive value multiset) and dump one JSON file.

The driver's CORRECTNESS artifact grades a fixed historical list of 50
query names; the registry has grown past it. This publishes the full
matrix each round so the gap needs no judge re-run.

Usage:  python scripts/oracle_self.py [sf_dir] [out_json]
        defaults: /root/testdata/sf0.01  ORACLE_SELF_r04.json
"""
from __future__ import annotations

import json
import math
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb                                            # noqa: E402

import __spark_entry__ as E                              # noqa: E402
from document_ai_spark.session import get_spark          # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

_TYPE_EQUIV = {
    "bigint": {"BIGINT", "HUGEINT"},
    "int": {"INTEGER"},
    "double": {"DOUBLE", "DECIMAL"},
    "boolean": {"BOOLEAN"},
    "string": {"VARCHAR"},
    "timestamp_ntz": {"TIMESTAMP"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
}


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 6)
    return v


def _rowset(rows):
    return Counter(tuple(_norm(v) for v in r) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "ORACLE_SELF_r04.json"
    spark = get_spark("oracle-self", master="local[8]",
                      shuffle_partitions=8)
    ddb = duckdb.connect()
    for t in TABLES:
        ddb.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM '{sf_dir}/{t}.parquet'")

    results, n_pass = {}, 0
    for name in sorted(E.queries()):
        row = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None}
        try:
            sdf = E.queries()[name](spark, sf_dir)
            s_cols = [c.lower() for c in sdf.columns]
            s_types = [f.dataType.simpleString() for f in sdf.schema.fields]
            s_rows = [tuple(r) for r in sdf.collect()]
            sql = E.oracle_sql()[name]
            d_types = [r[1].upper()
                       for r in ddb.execute(f"DESCRIBE {sql}").fetchall()]
            res = ddb.execute(sql)
            d_cols = [d[0].lower() for d in res.description]
            d_rows = res.fetchall()
            row["spark_rows"], row["oracle_rows"] = len(s_rows), len(d_rows)
            row["rows_match"] = len(s_rows) == len(d_rows)
            type_ok = all(
                dt.split("(")[0].strip() in _TYPE_EQUIV.get(st, {dt})
                for st, dt in zip(s_types, d_types))
            row["schema_match"] = s_cols == d_cols and type_ok
            row["hash_match"] = _rowset(s_rows) == _rowset(d_rows)
        except Exception as e:                    # noqa: BLE001
            row["err"] = f"{type(e).__name__}: {e}"[:300]
        results[name] = row
        ok = row["rows_match"] and row["schema_match"] and row["hash_match"]
        n_pass += ok
        print(f"{'PASS' if ok else 'FAIL'} {name}")

    artifact = {
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "n_pass": n_pass,
        "queries": results,
    }
    Path(out_path).write_text(json.dumps(artifact, indent=1) + "\n")
    print(f"\n{n_pass}/{len(results)} pass -> {out_path}")
    spark.stop()
    if n_pass != len(results):
        sys.exit(1)


if __name__ == "__main__":
    main()
