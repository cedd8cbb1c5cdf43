"""Custom stateful streaming operator: per-user running totals.

The reference's only cross-request state is the in-memory batch-job
progress dict (reference backend/main.py:522-562) — counters keyed by
job that survive across requests. Distributed re-expression: an
``applyInPandasWithState`` operator keeping per-key GroupState across
micro-batches, emitting the updated totals on every batch. The final
emission per key must equal a plain batch aggregation over the same data
(stream/batch parity — tested).
"""
from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("user_id long, n_events long, total_value double, "
                 "max_value double, batch_seen long")
STATE_SCHEMA = "n long, total double, mx double, batches long"


def _update_totals(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, mx, batches = state.get
    else:
        n, total, mx, batches = 0, 0.0, float("-inf"), 0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    batches += 1
    state.update((n, total, mx, batches))
    yield pd.DataFrame([{
        "user_id": user_id, "n_events": n,
        "total_value": round(total, 6), "max_value": mx,
        "batch_seen": batches,
    }])


def stateful_user_totals(events_stream: DataFrame) -> DataFrame:
    """Streaming DataFrame of per-user running totals (update mode)."""
    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            _update_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_totals_stream(spark: SparkSession, in_dir: str, out_dir: str,
                      checkpoint_dir: str, schema: str):
    """File-source stream -> stateful totals -> parquet append of every
    update (the latest row per user is the final total)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)   # force multi-batch state carry
        .parquet(in_dir)
    )
    totals = stateful_user_totals(stream)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)) \
            .write.mode("append").parquet(out_dir)

    return (
        totals.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
