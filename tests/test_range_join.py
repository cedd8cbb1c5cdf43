"""Chunked range join: exact interval semantics, equi-join plan."""
from __future__ import annotations

from pyspark.sql import functions as F

from document_ai_spark.operators.rangejoin import range_join


def test_range_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 250, "b"), (1, 999, "c"), (2, 100, "d")],
        schema="k int, ts long, tag string")
    right = spark.createDataFrame(
        # [90,110] catches ts=100; [240,260] catches 250; [95,255] catches
        # both (multi-chunk interval); key 2 has no interval.
        [(1, 90, 110, "w1"), (1, 240, 260, "w2"), (1, 95, 255, "w3")],
        schema="k int, s long, e long, win string")
    got = sorted((r["tag"], r["win"]) for r in
                 range_join(left, right, key="k", left_ts="ts",
                            right_start="s", right_end="e",
                            chunk=50).collect())
    assert got == [("a", "w1"), ("a", "w3"), ("b", "w2"), ("b", "w3")]


def test_range_join_boundary_and_chunk_invariance(spark):
    left = spark.createDataFrame([(1, 100)], "k int, ts long")
    right = spark.createDataFrame(
        [(1, 100, 100, "exact"), (1, 101, 200, "miss")],
        schema="k int, s long, e long, win string")
    for chunk in (1, 7, 100, 10000):
        got = [r["win"] for r in
               range_join(left, right, "k", "ts", "s", "e",
                          chunk=chunk).collect()]
        assert got == ["exact"], f"chunk={chunk}"


def test_range_join_plans_as_hash_join(spark):
    """The point of the chunked rendering: a hash equi-join, never a
    broadcast-nested-loop / cartesian over the inequality."""
    left = spark.range(100).select(
        F.lit(1).alias("k"), F.col("id").alias("ts"))
    right = spark.range(10).select(
        F.lit(1).alias("k"), (F.col("id") * 10).alias("s"),
        (F.col("id") * 10 + 5).alias("e"))
    plan = range_join(left, right, "k", "ts", "s", "e", chunk=10) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
