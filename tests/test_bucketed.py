"""Bucketed co-located join: zero shuffle exchanges, same results."""
from __future__ import annotations

from pyspark.sql import functions as F

from document_ai_spark.sources.bucketed import (
    bucketed_join,
    exchange_count,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity",
        "l_extendedprice")
    write_bucketed(orders, "t_orders_b", "o_orderkey", buckets=8)
    write_bucketed(lineitem, "t_lineitem_b", "o_orderkey", buckets=8)
    try:
        joined = bucketed_join(spark, "t_orders_b", "t_lineitem_b",
                               "o_orderkey")
        agg = joined.groupBy("o_orderpriority").agg(
            F.count("*").alias("n"))
        rows_b = {r["o_orderpriority"]: r["n"] for r in agg.collect()}

        # The join itself must not shuffle either side.
        assert exchange_count(joined) == 0, "bucketed join shuffled"

        # And results equal the plain (shuffling) join.
        plain = orders.join(lineitem, "o_orderkey").groupBy(
            "o_orderpriority").agg(F.count("*").alias("n"))
        rows_p = {r["o_orderpriority"]: r["n"] for r in plain.collect()}
        assert rows_b == rows_p

        # Control: with broadcast disabled, the un-bucketed join must
        # shuffle while the bucketed one still doesn't.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            assert exchange_count(orders.join(lineitem, "o_orderkey")) >= 1
            assert exchange_count(
                bucketed_join(spark, "t_orders_b", "t_lineitem_b",
                              "o_orderkey")) == 0
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_bucketed_extraction_drops_two_exchanges(spark, corpus_dfs):
    """Extraction on the bucketed storage layout: the payload join's two
    exchanges disappear from the plan and the output stays identical."""
    from document_ai_spark.plans.pipeline import extract
    from document_ai_spark.sources.bucketed import (
        extract_bucketed,
        ingest_extraction_tables,
    )

    docs_df, payloads_df = corpus_dfs
    ingest_extraction_tables(docs_df, payloads_df,
                             "t_extract_b", buckets=8)
    try:
        plain = extract(docs_df, payloads_df)
        bucketed = extract_bucketed(spark, "t_extract_b")
        n_plain, n_bucketed = exchange_count(plain), exchange_count(bucketed)
        assert n_bucketed == n_plain - 2, (
            f"expected 2 fewer exchanges, got {n_plain} -> {n_bucketed}")

        cols = ["doc_id", "dealer_name", "model_name", "horse_power",
                "asset_cost", "overall_confidence", "combined_text"]
        rows_p = sorted(map(tuple, plain.select(cols).collect()))
        rows_b = sorted(map(tuple, bucketed.select(cols).collect()))
        assert rows_p == rows_b
    finally:
        spark.sql("DROP TABLE IF EXISTS t_extract_b_spans")
        spark.sql("DROP TABLE IF EXISTS t_extract_b_payloads")


def test_range_layout_disjoint_and_pruned(spark, tmp_path):
    from document_ai_spark.sources.bucketed import (
        file_key_ranges, write_range_layout)

    df = spark.range(2000).select(
        F.concat(F.lit("doc-"), F.format_string("%06d", "id"))
        .alias("doc_id"),
        (F.col("id") * 2).alias("v"))
    out = str(tmp_path / "range_layout")
    write_range_layout(df, out, partitions=8)

    ranges = sorted((r["min_key"], r["max_key"])
                    for r in file_key_ranges(spark, out))
    assert len(ranges) == 8
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, "file key ranges overlap"

    # point lookup pushes the predicate to the scan (footer pruning)
    plan = (spark.read.parquet(out).where(F.col("doc_id") == "doc-000042")
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,doc-000042)]" \
        in plan
