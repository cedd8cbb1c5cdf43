"""Regenerate the PLANS.md physical-plan audit table.

For every side-effect-free registry query: executedPlan() node counts at
sf0.001 (local[8], 16 shuffle partitions, AQE on) — hash/range/broadcast
exchanges, parquet scans, Python (Arrow) stages, sorts. The table
witnesses the audit invariants documented at the top of PLANS.md (no
Python in the query surface, small-dim joins broadcast, dedup shuffles
once, ...).

Usage:  python scripts/audit_plans.py   (prints the markdown table;
        paste/refresh into PLANS.md)
"""
from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as E                              # noqa: E402
from document_ai_spark.session import get_spark          # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
# Queries with write side effects (persisted index roots) are excluded
# from the static plan audit — their scale shape is documented in their
# operator modules and covered by dedicated tests.
SIDE_EFFECT = {"incremental_near_dup", "incremental_embed_near_dup",
               "embed_ivf_persisted", "incremental_dup_span",
               "incremental_semdedup", "incremental_containment"}


def counts(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "hash": len(re.findall(r"Exchange hashpartitioning", plan)),
        "range": len(re.findall(r"Exchange rangepartitioning", plan)),
        "bcast": len(re.findall(r"BroadcastExchange", plan)),
        "scans": len(re.findall(r"Scan parquet|FileScan parquet", plan)),
        "python": len(re.findall(
            r"ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas"
            r"|MapInPandas|MapInArrow", plan)),
        "sorts": len(re.findall(r"(?<!_)Sort ", plan)),
    }


def main():
    spark = get_spark("audit-plans", master="local[8]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("OFF")
    qs = E.queries()
    rows, python_total = [], 0
    for name in qs:
        if name in SIDE_EFFECT:
            continue
        c = counts(qs[name](spark, SF_DIR))
        python_total += c["python"]
        rows.append((name, c))
    print("| query | hash ex | range ex | bcast | scans | python | sorts |")
    print("|---|---|---|---|---|---|---|")
    for name, c in rows:
        print(f"| {name} | {c['hash']} | {c['range']} | {c['bcast']} | "
              f"{c['scans']} | {c['python']} | {c['sorts']} |")
    print(f"\naudited: {len(rows)} queries; python stages total: "
          f"{python_total}; excluded (write side effects): "
          f"{sorted(SIDE_EFFECT)}")
    spark.stop()


if __name__ == "__main__":
    main()
