"""Watermarked windowed aggregation: finalized windows match batch; late
events past the watermark are dropped (bounded state at stream scale)."""
from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from document_ai_spark.streaming.windowed import (
    run_windowed_stream,
    windowed_event_counts,
)

SCHEMA = "ts timestamp, event_type string, value double"


def _rows(spec):
    return [(datetime(2024, 1, 1, h, m), et, v) for h, m, et, v in spec]


def test_late_event_dropped_finalized_windows_match_batch(spark, tmp_path):
    """Two stream RUNS against one checkpoint = deterministic batch
    boundaries (a single run's file->batch order is not guaranteed)."""
    in_dir, ck = str(tmp_path / "in"), str(tmp_path / "ck")
    # Run 1: events in hours 10 and 11, plus hour 14 (watermark advances
    # to 14:30 - 2h = 12:30 > end of both early windows -> they finalize
    # and are emitted by the NEXT run's first batch).
    f1 = _rows([(10, 5, "view", 1.0), (10, 40, "view", 2.0),
                (11, 10, "purchase", 5.0), (14, 30, "view", 9.0)])
    out_dir = str(tmp_path / "out")
    spark.createDataFrame(f1, SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(in_dir)
    run_windowed_stream(spark, in_dir, SCHEMA, ck, out_dir)

    # Run 2: a LATE event for hour 10 — checkpointed watermark is 12:30,
    # so it must be dropped, never re-opening the hour-10 window.
    f2 = _rows([(10, 50, "view", 100.0), (15, 0, "purchase", 7.0)])
    spark.createDataFrame(f2, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(in_dir)
    out2 = run_windowed_stream(spark, in_dir, SCHEMA, ck,
                               out_dir).collect()

    keys = [(r["window_start"].hour, r["event_type"]) for r in out2]
    assert len(keys) == len(set(keys)), "a window was emitted twice"
    got = {(r["window_start"].hour, r["event_type"]):
           (r["n"], r["total_value"]) for r in out2}
    # Finalized early windows carry ONLY the on-time events: the late
    # 100.0 view for hour 10 was dropped at the watermark.
    assert got.get((10, "view")) == (2, 3.0)
    assert got.get((11, "purchase")) == (1, 5.0)
    # Tail windows (14, 15) are beyond the final watermark: not emitted.
    assert (14, "view") not in got and (15, "purchase") not in got


def test_stream_batch_parity_on_final_windows(spark, tmp_path):
    """Every window the stream emits must equal the batch computation of
    the same aggregate over the on-time rows."""
    in_dir, ck = str(tmp_path / "in2"), str(tmp_path / "ck2")
    f1 = _rows([(8, 0, "view", 1.5), (8, 30, "view", 2.5),
                (9, 15, "purchase", 4.0), (13, 0, "view", 1.0)])
    spark.createDataFrame(f1, SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(in_dir)
    out = {(r["window_start"], r["event_type"]): (r["n"], r["total_value"])
           for r in run_windowed_stream(spark, in_dir, SCHEMA, ck,
                                        str(tmp_path / "out2")).collect()}
    batch = {(r["window_start"], r["event_type"]): (r["n"], r["total_value"])
             for r in windowed_event_counts(
                 spark.read.schema(SCHEMA).parquet(in_dir)).collect()}
    for k, v in out.items():
        assert batch[k] == v, k
