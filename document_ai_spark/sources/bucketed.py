"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact join is shuffling both sides.
Writing both tables bucketed by the join key with the same bucket count
pre-co-locates matching keys, so the join plans with ZERO exchanges —
each task zips bucket i of both tables. This module wraps the write and
exposes a plan check used by tests; the extraction engine's analog is
bucketing `documents_interleaved` and `media_payloads` by doc_id /
media_ref hash so the payload-resolve join never shuffles.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str,
                   buckets: int = 16) -> None:
    """Persist as a bucketed managed table (parquet, sorted in-bucket)."""
    (df.write.mode("overwrite")
       .bucketBy(buckets, key)
       .sortBy(key)
       .format("parquet")
       .saveAsTable(table))  # managed: lives in the warehouse dir


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    return spark.table(left_table).join(spark.table(right_table), key)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the executed plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")
