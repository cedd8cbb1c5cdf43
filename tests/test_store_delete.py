"""SnapshotStore surface: bucket-pruned resume scans, row-level delete,
and the ManifestStore/IcebergStore interface split (Iceberg skipped when
the runtime jars are absent, as in this sandbox)."""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from document_ai_spark.streaming.checkpoint import (
    IcebergStore,
    IcebergUnavailable,
    ManifestStore,
    bucket_slice,
    delete_docs,
    iceberg_available,
    ingest_bucketed,
    run_checkpointed,
)

BUCKETS = 8


def _stores(spark, tmp_path):
    yield ManifestStore(str(tmp_path / "manifest_store"))
    if iceberg_available(spark):
        yield IcebergStore(spark, "ckpt_iceberg_test")
    # else: skipped — jars absent in this sandbox; the probe is the test.


def test_bucket_slice_reads_only_its_partition(spark, corpus_dfs, tmp_path):
    docs_df, _ = corpus_dfs
    path = str(tmp_path / "bucketed_input")
    ingest_bucketed(docs_df, path, BUCKETS)

    all_files = {
        r[0] for r in spark.read.parquet(path)
        .select(F.input_file_name()).distinct().collect()}
    b0_files = {
        r[0] for r in bucket_slice(spark, path, 0)
        .select(F.input_file_name()).distinct().collect()}
    assert b0_files and b0_files < all_files
    assert all(f"bucket={0}" in f for f in b0_files)
    # Partition pruning must appear in the physical plan, not just happen
    # to touch fewer files.
    plan = bucket_slice(spark, path, 0)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan

    # The union of slices is exactly the input (no doc lost to bucketing).
    n = sum(bucket_slice(spark, path, b).count() for b in range(BUCKETS))
    assert n == docs_df.count()


def test_lineage_from_observe_matches_input(spark, corpus_dfs, tmp_path):
    docs_df, payloads_df = corpus_dfs
    root = str(tmp_path / "ckpt_obs")
    store = run_checkpointed(spark, docs_df, payloads_df, root,
                             buckets=4, run_id="obs-run")
    lin = store.lineage_df(spark).collect()
    assert sum(r["rows_in"] for r in lin) == docs_df.count()
    assert sum(r["rows_out"] for r in lin) == docs_df.count()


def test_delete_docs_excludes_and_resume_stays_exact(
        spark, corpus_dfs, tmp_path):
    docs_df, payloads_df = corpus_dfs
    root = str(tmp_path / "ckpt_del")
    store = run_checkpointed(spark, docs_df, payloads_df, root,
                             buckets=BUCKETS)
    victims = [r["doc_id"] for r in docs_df.select("doc_id").limit(3)
               .collect()]
    before = store.read_committed(spark).count()
    snap_before = store.snapshot_id()

    n_rewritten = delete_docs(spark, store, victims, root)
    assert 1 <= n_rewritten <= 3

    remaining = store.read_committed(spark)
    assert remaining.count() == before - 3
    assert remaining.where(F.col("doc_id").isin(victims)).count() == 0
    # Delete advanced the snapshot counter (new commits, not mutation).
    assert store.snapshot_id() > snap_before

    # Resume after delete: every bucket is committed, nothing reruns,
    # the deleted docs stay gone.
    store2 = run_checkpointed(spark, docs_df, payloads_df, root,
                              buckets=BUCKETS)
    again = store2.read_committed(spark)
    assert again.count() == before - 3
    assert again.where(F.col("doc_id").isin(victims)).count() == 0
    # Lineage records the delete rewrites.
    assert any(r["run_id"].startswith("delete:")
               for r in store2.lineage_df(spark).collect())


def test_store_interface_parametrized(spark, corpus_dfs, tmp_path):
    """Same contract for every available store implementation."""
    docs_df, payloads_df = corpus_dfs
    ran = 0
    for store in _stores(spark, tmp_path):
        root = str(tmp_path / f"root_{type(store).__name__}")
        st = run_checkpointed(spark, docs_df, payloads_df, root,
                              buckets=4, store=store)
        assert len(st.committed_buckets()) == 4
        assert st.read_committed(spark).count() == docs_df.count()
        ran += 1
    assert ran >= 1


def test_iceberg_probe_raises_cleanly(spark):
    if iceberg_available(spark):
        pytest.skip("iceberg jars present; unavailability path not testable")
    with pytest.raises(IcebergUnavailable):
        IcebergStore(spark, "nope")
