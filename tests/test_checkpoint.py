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
    # Snapshot ids are monotone commit counters.
    snaps = sorted(r["snapshot_id"] for r in lin)
    assert snaps == [f"snap-{i:06d}" for i in range(4)]
