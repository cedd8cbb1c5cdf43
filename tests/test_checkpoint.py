"""Resume-idempotence: a killed run resumes at the last committed snapshot
and produces byte-identical output (north_rule requirement)."""
from __future__ import annotations

import os

import pytest

from document_ai_spark.plans.pipeline import extract
from document_ai_spark.streaming.checkpoint import (
    JobKilled,
    ManifestStore,
    run_checkpointed,
)


def _span_map(rows):
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"])
                      for s in r["out_spans"]]
        for r in rows
    }


def test_kill_resume_byte_identical(spark, corpus_dfs, tmp_path):
    docs_df, payloads_df = corpus_dfs
    root = str(tmp_path / "ckpt")

    # Direct (non-checkpointed) reference output.
    direct = _span_map(extract(docs_df, payloads_df)
                       .select("doc_id", "out_spans").collect())

    # Run 1: crash after 2 of 6 buckets committed.
    with pytest.raises(JobKilled):
        run_checkpointed(spark, docs_df, payloads_df, root,
                         buckets=6, fail_after=2)
    store = ManifestStore(root)
    done_after_crash = set(store.committed_buckets())
    assert len(done_after_crash) == 2

    # Committed data must not be touched by the resume run.
    mtimes_before = {
        b: os.path.getmtime(store.committed_path(b))
        for b in done_after_crash
    }

    # Run 2: resume completes the remaining buckets.
    store = run_checkpointed(spark, docs_df, payloads_df, root, buckets=6)
    assert len(store.committed_buckets()) == 6
    for b, t in mtimes_before.items():
        assert os.path.getmtime(store.committed_path(b)) == t, \
            f"bucket {b} was rewritten on resume"

    resumed = _span_map(store.read_committed(spark)
                        .select("doc_id", "out_spans").collect())
    assert resumed == direct


def test_lineage_metrics_recorded(spark, corpus_dfs, tmp_path):
    docs_df, payloads_df = corpus_dfs
    root = str(tmp_path / "ckpt2")
    store = run_checkpointed(spark, docs_df, payloads_df, root,
                             run_id="run-x", buckets=4)
    lin = store.lineage_df(spark).collect()
    assert len(lin) == 4
    assert sum(r["rows_in"] for r in lin) == docs_df.count()
    assert sum(r["rows_out"] for r in lin) == docs_df.count()
    assert all(r["latency_ms"] > 0 for r in lin)
    assert all(r["run_id"] == "run-x" for r in lin)
    # Snapshot ids are monotone commit counters recording the snapshot
    # that CONTAINS each commit (post-commit counter value, mirroring
    # the Iceberg path's post-write table snapshot).
    snaps = sorted(r["snapshot_id"] for r in lin)
    assert snaps == [f"snap-{i:06d}" for i in range(1, 5)]


def test_observe_metrics_persisted_in_lineage(spark, corpus_dfs, tmp_path):
    """Bucket-cap drops and missing-payload counts ride the write job as
    observe() metrics and land in the committed lineage rows — surviving
    a kill/resume (committed rows keep their metrics; resumed buckets
    record their own)."""
    import json

    from pyspark.sql import functions as F

    from document_ai_spark.operators.dedup import banded_near_dup_pairs

    docs_df, payloads_df = corpus_dfs

    # --- extraction run with PLANTED missing payloads (drop half the
    # payload rows) across a crash + resume ------------------------------
    starved = payloads_df.where(F.xxhash64("media_ref") % 2 == 0)
    root = str(tmp_path / "ckpt_metrics")
    with pytest.raises(JobKilled):
        run_checkpointed(spark, docs_df, starved, root, buckets=4,
                         fail_after=2)
    store = run_checkpointed(spark, docs_df, starved, root, buckets=4)
    lin = store.lineage_df(spark).collect()
    assert len(lin) == 4
    got_missing = sum(json.loads(r["metrics"]).get("missing_payloads", 0)
                      for r in lin)
    expected_missing = (extract(docs_df, starved)
                        .agg(F.sum("n_missing_payloads")).first()[0])
    assert expected_missing > 0, "test corpus must starve some payloads"
    assert got_missing == expected_missing

    # --- dedup run with a HOT bucket forced over a tiny cap -------------
    texts = spark.createDataFrame(
        [(f"d{i:03d}", "alpha beta gamma delta epsilon zeta")
         for i in range(12)] +
        [(f"u{i:03d}", f"unique words {i} " + " ".join(
            f"w{i}x{j}" for j in range(8))) for i in range(8)],
        "doc_id string, text string")

    def dedup_fn(sub, _payloads):
        return banded_near_dup_pairs(sub, jaccard_min=0.0, max_bucket=2)

    root2 = str(tmp_path / "ckpt_dedup")
    store2 = run_checkpointed(spark, texts, payloads_df, root2, buckets=2,
                              extract_fn=dedup_fn)
    lin2 = [json.loads(r["metrics"])
            for r in store2.lineage_df(spark).collect()]
    assert any(m.get("lsh_cap_dropped", 0) > 0 for m in lin2), lin2
    assert max(m.get("lsh_max_bucket", 0) for m in lin2) > 2


def test_runtime_empty_bucket_commits(spark, corpus_dfs, tmp_path):
    """An extract_fn that filters EVERY row at runtime must still
    commit its buckets: AQE's PropagateEmptyRelation can collapse the
    observed subtree and leave Observation.get with no metrics row —
    telemetry degrades to a recount instead of killing the run."""
    import pyspark.sql.functions as F

    docs_df, payloads_df = corpus_dfs
    root = str(tmp_path / "ckpt_empty")

    def drop_all(sub, _payloads):
        return (sub.where(F.lit(False))
                .select("doc_id", F.lit("x").alias("text")))

    store = run_checkpointed(spark, docs_df, payloads_df, root,
                             run_id="run-empty", buckets=3,
                             extract_fn=drop_all)
    lin = store.lineage_df(spark).collect()
    assert len(lin) == 3
    assert sum(r["rows_in"] for r in lin) == docs_df.count()
    assert all(r["rows_out"] == 0 for r in lin)


def test_leftover_tmp_manifest_is_ignored(spark, tmp_path):
    """Review regression: a crash mid-commit leaves a partial
    .tmp-<b>.json in _manifests; committed_buckets must skip it (it
    previously either raised on the partial JSON — bricking every
    resume — or fabricated a commit record)."""
    from document_ai_spark.streaming.store import ManifestStore

    store = ManifestStore(str(tmp_path / "st_tmp"))
    with open(f"{store.manifest_dir}/.tmp-3.json", "w") as f:
        f.write('{"partition_id": 3, "run_id"')      # truncated write
    assert store.committed_buckets() == {}


def test_recommit_sweeps_aside_and_serves_new_data(spark, tmp_path):
    """Re-committing a bucket swaps via a rename-aside (never a window
    where the manifest points at a missing directory); the aside dir is
    swept and reads serve the new data."""
    import os

    from document_ai_spark.streaming.store import Lineage, ManifestStore

    store = ManifestStore(str(tmp_path / "st_re"))

    def commit_rows(vals, snap):
        df = spark.createDataFrame([(v,) for v in vals], "doc_id string")
        rows = store.write_bucket(0, df)
        store.commit(Lineage(
            run_id="r", partition_id=0, snapshot_id=snap,
            rows_in=len(vals), rows_out=rows, latency_ms=1.0,
            committed_at="t"))

    commit_rows(["a", "b"], "x")
    commit_rows(["c"], "y")
    assert not os.path.exists(store.committed_path(0) + ".old")
    got = {r["doc_id"] for r in store.read_committed(spark).collect()}
    assert got == {"c"}
    # post-commit snapshot ids: second commit is snap-000002
    assert store.committed_buckets()[0]["snapshot_id"] == "snap-000002"
    assert store.snapshot_id() == "snap-000002"


def test_write_bucket_empty_output_returns_zero(spark, tmp_path):
    """Telemetry must not kill the run when AQE elides the observed
    subtree of a runtime-empty bucket: rows_out falls back to counting
    the staged files."""
    from pyspark.sql import functions as F

    from document_ai_spark.streaming.store import ManifestStore

    store = ManifestStore(str(tmp_path / "st_empty"))
    df = (spark.range(100).select(F.col("id").cast("string")
                                  .alias("doc_id"))
          .where(F.length("doc_id") > 10))           # runtime-empty
    assert store.write_bucket(1, df) == 0
