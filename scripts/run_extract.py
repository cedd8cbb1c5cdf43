"""spark-submit entrypoint for the extraction pipeline.

Cluster usage (north_rule packaging):

    cd /root/repo && zip -r /tmp/document_ai_spark.zip document_ai_spark
    spark-submit --py-files /tmp/document_ai_spark.zip \
        scripts/run_extract.py \
        --input  <dir with documents_interleaved.parquet + media_payloads.parquet> \
        --output <checkpoint-store root> \
        --buckets 256 --run-id prod-1

The job is checkpointed bucket-at-a-time (streaming/checkpoint.py): kill it
at any point and re-submit with the same --output to resume at the last
committed snapshot. Lineage/metrics land in <output>/_manifests/.

Local smoke (generates a corpus first):

    python scripts/run_extract.py --generate 5000 --input /tmp/corpus \
        --output /tmp/extract_out --buckets 8
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--generate", type=int, default=0,
                    help="generate an N-doc corpus into --input first")
    ap.add_argument("--bucketed-layout", action="store_true",
                    help="ingest both join sides bucketed by the payload "
                         "join key first (exchange-free payload join; the "
                         "documented at-scale storage layout) and run a "
                         "single-shot extraction from those tables")
    ap.add_argument("--range-layout", action="store_true",
                    help="additionally publish the extractions "
                         "range-partitioned + sorted by doc_id "
                         "(<output>/by_doc_id): every file covers a "
                         "disjoint doc_id range so point lookups / "
                         "range scans footer-prune to one file")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from document_ai_spark.session import get_spark
    from document_ai_spark.sources.docgen import write_corpus
    from document_ai_spark.streaming.checkpoint import run_checkpointed

    spark = get_spark("document_ai_spark.extract", master=args.master)
    if args.generate:
        write_corpus(spark, args.input, n_docs=args.generate, seed=42)

    docs = spark.read.parquet(f"{args.input}/documents_interleaved.parquet")
    payloads = spark.read.parquet(f"{args.input}/media_payloads.parquet")

    if args.bucketed_layout:
        # Exchange-free payload join: both sides persisted bucketed by the
        # join key (sources/bucketed.py). Orthogonal to the checkpointed
        # path below — this mode demonstrates the at-scale IO layout where
        # span prep (incl. boilerplate strip) is paid once at ingest.
        from document_ai_spark.sources.bucketed import (
            extract_bucketed,
            ingest_extraction_tables,
        )

        ingest_extraction_tables(docs, payloads, "extract_run",
                                 buckets=args.buckets)
        out = extract_bucketed(spark, "extract_run")
        from pyspark.sql import functions as F
        out.withColumn("out_spans", F.to_json("out_spans")) \
            .write.mode("overwrite").parquet(f"{args.output}/data")
        n = spark.read.parquet(f"{args.output}/data").count()
        print(f"bucketed-layout run: {n} documents extracted -> "
              f"{args.output}/data")
        spark.stop()
        return

    store = run_checkpointed(
        spark, docs, payloads, args.output,
        run_id=args.run_id, buckets=args.buckets)

    lineage = store.lineage_df(spark)
    lineage.orderBy("partition_id").show(100, truncate=False)
    total = lineage.agg({"rows_out": "sum"}).collect()[0][0]
    print(f"committed {len(store.committed_buckets())} buckets, "
          f"{total} documents extracted -> {args.output}/data")

    if args.range_layout:
        from document_ai_spark.sources.bucketed import write_range_layout
        write_range_layout(spark.read.parquet(f"{args.output}/data"),
                           f"{args.output}/by_doc_id",
                           partitions=args.buckets)
        print(f"range layout published -> {args.output}/by_doc_id")
    spark.stop()


if __name__ == "__main__":
    main()
