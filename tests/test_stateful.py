"""Stateful streaming parity: per-user totals accumulated across
micro-batches must equal a plain batch aggregation over the same data."""
from __future__ import annotations

from pyspark.sql import Window, functions as F

from document_ai_spark.streaming.stateful import run_totals_stream

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def test_stateful_totals_match_batch(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .limit(600).cache()
    in_dir, out_dir, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    # three separate file drops -> three micro-batches -> state carry-over
    for i in range(3):
        events.where(F.col("event_id") % 3 == i) \
            .write.mode("append").parquet(in_dir)

    q = run_totals_stream(spark, in_dir, out_dir, ck, EVENTS_SCHEMA)
    q.awaitTermination(180)

    updates = spark.read.parquet(out_dir)
    # state must actually have carried: some users saw multiple batches
    assert updates.agg(F.max("batch_seen")).collect()[0][0] >= 2

    w = Window.partitionBy("user_id").orderBy(F.desc("batch_id"),
                                              F.desc("batch_seen"))
    final = (updates.withColumn("rn", F.row_number().over(w))
             .where("rn = 1")
             .select("user_id", "n_events", "total_value", "max_value"))

    expected = events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
        F.max("value").alias("max_value"))

    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 4),
                          r["max_value"]) for r in final.collect()}
    exp = {r["user_id"]: (r["n_events"], round(r["total_value"], 4),
                          r["max_value"]) for r in expected.collect()}
    assert got == exp
    events.unpersist()
