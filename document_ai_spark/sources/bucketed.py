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

from pyspark.sql import DataFrame, SparkSession, functions as F


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
    """Number of shuffle exchanges (hash, range, AND single-partition)
    in the executed plan — a substring match on 'Exchange hash' alone
    under-counted, letting a zero-exchange assertion pass while the
    plan still shuffled every row through a range or single-partition
    exchange (review finding)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return (plan.count("Exchange hashpartitioning")
            + plan.count("Exchange rangepartitioning")
            + plan.count("Exchange SinglePartition"))


def ingest_extraction_tables(docs_df: DataFrame,
                             payloads_df: DataFrame, prefix: str,
                             buckets: int = 16) -> tuple:
    """Persist the extraction inputs in the exchange-free storage layout:
    span_prep output and the payload table both bucketed by the payload
    join key `_jk` with the same bucket count.

    This is the documented at-scale layout (SCALE.md exchange budget rows
    1+2): the payload join is an equi-join on a unique key, so storing
    both sides pre-hashed by that key removes both of its exchanges — at
    100 TB the join's shuffle IS those two exchanges' network bill, and
    the boilerplate-strip UDF cost lands once at ingest instead of once
    per downstream run. Returns (spans_table, payloads_table)."""
    from ..plans.pipeline import span_prep

    spans_t, pays_t = f"{prefix}_spans", f"{prefix}_payloads"
    write_bucketed(span_prep(docs_df), spans_t, "_jk", buckets)
    write_bucketed(payloads_df.withColumnRenamed("media_ref", "_jk"),
                   pays_t, "_jk", buckets)
    return spans_t, pays_t


def extract_bucketed(spark: SparkSession, prefix: str) -> DataFrame:
    """Extraction pipeline over an ingest_extraction_tables layout: the
    payload join plans with zero exchanges (plan-asserted in tests)."""
    from ..plans.pipeline import extract_from_spans

    return extract_from_spans(spark.table(f"{prefix}_spans"),
                              spark.table(f"{prefix}_payloads"))


def write_range_layout(df: DataFrame, path: str, partitions: int = 32,
                       key: str = "doc_id") -> None:
    """Range-partitioned, key-sorted parquet layout for result tables.

    ``repartitionByRange(key)`` + ``sortWithinPartitions(key)`` gives
    every output file a DISJOINT key range, so parquet min/max footer
    stats prune a point lookup (SURVEY §2 S6) or key-range scan to ONE
    file instead of a full-table scan — the read-side complement of the
    hash-bucketed join layout above. Range boundaries come from Spark's
    reservoir sampling of the key distribution, so skewed key spaces
    still split into ~equal files (north_rule: repartitionByRange on
    doc_id)."""
    (df.repartitionByRange(partitions, F.col(key))
       .sortWithinPartitions(key)
       .write.mode("overwrite").parquet(path))


def file_key_ranges(spark: SparkSession, path: str, key: str = "doc_id"):
    """(file, min_key, max_key) per parquet file — the layout audit the
    range-layout test asserts disjointness on."""
    return (spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("file"))
            .agg(F.min(key).alias("min_key"), F.max(key).alias("max_key"))
            .collect())
