"""Range (interval) join: left rows whose ts falls inside right-side
[start, end] intervals per key. Spark has no native range join — the
naive form is an inequality theta-join that Catalyst plans as a
broadcast-nested-loop or cartesian product: O(n*m) per key and a
guaranteed scale-killer.

Chunked equi-join rendering instead:

    right: explode each interval into the fixed-width time chunks it
           covers  (sequence(floor(s/c), floor(e/c)))
    left : chunk_id = floor(ts/c)
    join : equi on (key, chunk_id)    [hash join, one shuffle each side]
    post : filter s <= ts <= e        [exact semantics restored]

Each (left, matching interval) pair meets in EXACTLY the left row's
chunk, so no dedup pass is needed. Fan-out on the right side is
(interval_len / chunk + 1) rows — pick `chunk` near the typical interval
length so the blow-up is ~2x and the join stays an equi hash join at
10^12 rows. The same rendering is what dedicated engines' range-join
optimizations (e.g. binned interval joins) do under the hood.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join(left: DataFrame, right: DataFrame, key: str,
               left_ts: str, right_start: str, right_end: str,
               chunk: int = 3600) -> DataFrame:
    """Inner range join; returns left columns + right columns for every
    (left row, interval) pair with right_start <= left_ts <= right_end.
    Timestamps/bounds are numeric (epoch seconds or any ordered long)."""
    r_chunked = right.withColumn("_chunk", F.explode(F.sequence(
        F.floor(F.col(right_start) / chunk),
        F.floor(F.col(right_end) / chunk))))
    l_chunked = left.withColumn(
        "_chunk", F.floor(F.col(left_ts) / chunk))
    return (
        l_chunked.join(r_chunked, [key, "_chunk"])
        .where((F.col(left_ts) >= F.col(right_start))
               & (F.col(left_ts) <= F.col(right_end)))
        .drop("_chunk")
    )
