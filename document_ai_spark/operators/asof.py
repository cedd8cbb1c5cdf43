"""As-of join: for each left row, the latest right row with ts <= left.ts
per key. Spark has no native ASOF JOIN; this is the standard shuffle-once
composition:

    union both sides tagged (right=0, left=1)
    -> single sort within key by (ts, side)       [one shuffle on key]
    -> last(right_row_struct, ignorenulls) over an unbounded-preceding window
    -> keep left rows, project the struct's fields

Compared to the naive range-join (left x right with ts filter + argmax),
this never expands pairs: each row is touched once, so it survives
key-heavy 100 TB inputs where a range join would explode. Right-side ties
on (key, ts) must be pre-aggregated by the caller (the oracle's native
ASOF JOIN has the same requirement for determinism).

The fill is ONE struct carrying the entire right payload row, not
per-column fills: per-column `last(c, ignorenulls)` would silently stitch
values from *different* right rows whenever the latest right row holds a
NULL in one payload column (and would resurrect a stale non-NULL over a
legitimately-NULL latest value). Carrying the whole row as a struct
matches true ASOF semantics — DuckDB's native ASOF JOIN carries the
latest row's NULLs — and the struct itself is never NULL for a real right
row, so `ignorenulls` only skips the left-side placeholder rows.
"""
from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window, functions as F, types as T


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              right_cols: List[str]) -> DataFrame:
    """Left as-of join. `right_cols` are the payload columns carried from
    the right side (all-NULL when no right row precedes)."""
    payload_type = T.StructType([right.schema[c] for c in right_cols])
    l_tag = (left.withColumn("_side", F.lit(1))
             .withColumn("_r", F.lit(None).cast(payload_type)))
    r_tag = (right.select(key, ts, *right_cols)
             .withColumn("_side", F.lit(0))
             .withColumn("_r", F.struct(*[F.col(c) for c in right_cols])))
    left_cols = [c for c in left.columns]
    u = l_tag.select(*left_cols, "_side", "_r").unionByName(
        r_tag.select(
            *[F.lit(None).cast(left.schema[c].dataType.simpleString())
              .alias(c) if c not in (key, ts) else F.col(c)
              for c in left_cols],
            "_side", "_r"))
    w = (Window.partitionBy(key).orderBy(ts, "_side")
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = u.withColumn("_rf", F.last("_r", ignorenulls=True).over(w))
    return (filled.where(F.col("_side") == 1)
            .select(*left_cols,
                    *[F.col("_rf").getField(c).alias(c) for c in right_cols]))
