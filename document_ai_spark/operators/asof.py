"""As-of join: for each left row, the latest right row with ts <= left.ts
per key. Spark has no native ASOF JOIN; this is the standard shuffle-once
composition:

    union both sides tagged (right=0, left=1)
    -> single sort within key by (ts, side)       [one shuffle on key]
    -> last(right_payload, ignorenulls) over an unbounded-preceding window
    -> keep left rows

Compared to the naive range-join (left x right with ts filter + argmax),
this never expands pairs: each row is touched once, so it survives
key-heavy 100 TB inputs where a range join would explode. Right-side ties
on (key, ts) must be pre-aggregated by the caller (the oracle's native
ASOF JOIN has the same requirement for determinism).
"""
from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              right_cols: List[str]) -> DataFrame:
    """Left as-of join. `right_cols` are the payload columns carried from
    the right side (null when no right row precedes)."""
    l_tag = left.withColumn("_side", F.lit(1)).withColumns(
        {f"_r_{c}": F.lit(None).cast(right.schema[c].dataType.simpleString())
         for c in right_cols})
    r_tag = (right.select(key, ts, *right_cols)
             .withColumn("_side", F.lit(0))
             .withColumns({f"_r_{c}": F.col(c) for c in right_cols}))
    left_cols = [c for c in left.columns]
    u = l_tag.select(*left_cols, "_side",
                     *[f"_r_{c}" for c in right_cols]) \
        .unionByName(
            r_tag.select(
                *[F.lit(None).cast(left.schema[c].dataType.simpleString())
                  .alias(c) if c not in (key, ts) else F.col(c)
                  for c in left_cols],
                "_side", *[f"_r_{c}" for c in right_cols]))
    w = (Window.partitionBy(key).orderBy(ts, "_side")
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = u.withColumns({
        c: F.last(f"_r_{c}", ignorenulls=True).over(w) for c in right_cols})
    return (filled.where(F.col("_side") == 1)
            .select(*left_cols, *right_cols))
