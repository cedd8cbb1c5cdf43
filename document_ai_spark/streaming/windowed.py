"""Event-time windowed aggregation with watermarks (Structured Streaming).

The reference's stats endpoint re-aggregates everything per request
(backend/main.py:614-667); the streaming analog keeps running windowed
aggregates over the event stream and DROPS late data past the watermark
instead of recomputing history — the only stance that works when the
stream is 10^12 events: state is bounded by (watermark horizon / window)
windows per key, not by history.

Used with file sources + Trigger.availableNow in tests (one micro-batch
per input file via maxFilesPerTrigger=1, so the watermark actually
advances between batches and late rows are observably dropped).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(events: DataFrame,
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time window counts per event_type.

    Works on a stream (withWatermark bounds state; append mode emits a
    window once the watermark passes its end) and, identically, on a
    batch DataFrame (watermark is a no-op there) — the stream/batch
    parity contract the engine uses everywhere.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n", "total_value")
    )


def run_windowed_stream(spark, in_dir: str, schema: str,
                        checkpoint_dir: str, out_dir: str,
                        window: str = "1 hour",
                        watermark: str = "2 hours"):
    """File-source stream -> windowed agg -> parquet sink (append mode:
    a window is written exactly once, when the watermark finalizes it).
    Restartable from the checkpoint — each availableNow run drains the
    new files and emits newly-finalized windows. maxFilesPerTrigger=1
    forces one micro-batch per file so event-time progress is observable.
    Returns the cumulative emitted windows."""
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(in_dir))
    agg = windowed_event_counts(src, window=window, watermark=watermark)
    q = (agg.writeStream.format("parquet")
         .option("path", out_dir)
         .outputMode("append")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    # No window finalized yet (all events within the watermark horizon):
    # the sink dir has no data files and a bare read would raise
    # AnalysisException — return an EMPTY frame with the aggregate schema
    # so callers can distinguish 'nothing finalized' from failure.
    import os
    has_parts = os.path.isdir(out_dir) and any(
        n.startswith("part-") for n in os.listdir(out_dir))
    if not has_parts:
        return spark.createDataFrame([], agg.schema)
    return spark.read.parquet(out_dir)
