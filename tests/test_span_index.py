"""Incremental hot-span index (operators/span_index.py): first-seen-wins
streaming semantics, replay idempotence, param pinning, last-batch
parity with the batch operator."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_ai_spark.operators.curation import dup_span_stats
from document_ai_spark.operators.span_index import SpanIndex

R1 = "q w e r t y"          # planted cross-BATCH run (docs 2 and 12)
R2 = "h j k l m n"          # planted within-batch run (docs 6 and 7)


def _corpus(spark):
    rows = []
    for i in range(1, 16):
        body = f"u{i} v{i} x{i} y{i} z{i} p{i} o{i} t{i}"
        if i == 2 or i == 12:
            body = f"a{i} b{i} {R1} c{i} d{i}"
        if i in (6, 7):
            body = f"a{i} b{i} {R2} c{i} d{i}"
        rows.append((i, body))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batches(df, k=3):
    return [df.where((F.col("doc_id") > i * 5)
                     & (F.col("doc_id") <= (i + 1) * 5))
            for i in range(k)]


def _bymap(df):
    return {r["doc_id"]: tuple(r)[1:] for r in df.collect()}


def test_first_seen_wins_and_within_batch(spark, tmp_path):
    docs = _corpus(spark)
    idx = SpanIndex(str(tmp_path / "span_idx"), w=4)
    outs = [_bymap(idx.append_and_score(spark, b, f"b{i}"))
            for i, b in enumerate(_batches(docs))]
    got = {k: v for o in outs for k, v in o.items()}
    # first copy of the cross-batch run scored BEFORE its dup arrived:
    # survives with frac 0 (the streaming keep rule)
    assert got[2][3] == 0.0
    # the later copy sees the accreted count: 3 hot windows cover the
    # 6 shared tokens of its 10
    assert got[12] == (10, 7, 3, 0.6)
    # a within-batch pair behaves exactly like the batch operator
    assert got[6][3] == 0.6 and got[7][3] == 0.6
    # untouched docs score 0
    assert all(got[d][3] == 0.0 for d in (1, 3, 4, 5, 8, 9, 10, 11))


def test_last_batch_parity_with_batch_operator(spark, tmp_path):
    docs = _corpus(spark)
    idx = SpanIndex(str(tmp_path / "span_idx2"), w=4)
    last = None
    for i, b in enumerate(_batches(docs)):
        last = _bymap(idx.append_and_score(spark, b, f"b{i}"))
    # a doc in the FINAL batch sees counts from every batch <= its own,
    # i.e. the full corpus: its score must equal the batch operator's
    want = _bymap(dup_span_stats(docs, w=4).where(F.col("doc_id") > 10))
    assert last == want


def test_replay_is_idempotent(spark, tmp_path):
    docs = _corpus(spark)
    batches = _batches(docs)
    idx = SpanIndex(str(tmp_path / "span_idx3"), w=4)
    outs = [_bymap(idx.append_and_score(spark, b, f"b{i}"))
            for i, b in enumerate(batches)]
    # replay the FIRST batch after later commits: must score against
    # the index it originally saw (empty), not today's
    again = _bymap(idx.append_and_score(spark, batches[0], "b0"))
    assert again == outs[0]
    assert again[2][3] == 0.0


def test_param_pinning(spark, tmp_path):
    root = str(tmp_path / "span_idx4")
    SpanIndex(root, w=4)
    with pytest.raises(ValueError, match="w="):
        SpanIndex(root, w=8)


def test_stream_span_filter(spark, tmp_path):
    """Streamed micro-batches: first copy survives, later cross-wave
    copies filtered; scored output matches per-batch index scoring."""
    import glob
    import time

    from document_ai_spark.streaming.feedback import stream_span_filter

    docs = _corpus(spark)
    in_dir = str(tmp_path / "stream_in")
    lo = docs.where(F.col("doc_id") <= 5)
    hi = docs.where(F.col("doc_id") > 5)
    # 4 files per wave == maxFilesPerTrigger, so each wave is its own
    # micro-batch (2 files each would fuse both waves into one batch,
    # making doc 2 a WITHIN-batch dup that scores 0.6 and is filtered)
    lo.repartition(4).write.mode("append").parquet(in_dir)
    time.sleep(1.1)   # distinct mtimes: FileStreamSource batches oldest-first
    hi.repartition(4).write.mode("append").parquet(in_dir)
    q = stream_span_filter(spark, in_dir, str(tmp_path / "stream_idx"),
                           str(tmp_path / "stream_out"),
                           str(tmp_path / "stream_ckpt"),
                           w=4, max_frac=0.5)
    q.awaitTermination()
    got = {}
    for d in glob.glob(str(tmp_path / "stream_out" / "batch=*")):
        got.update(_bymap(spark.read.parquet(d)))
    # doc 2 (first copy, wave 1) emitted with frac 0; doc 12's copy and
    # the within-wave pair 6/7 scored 0.6 > max_frac and were dropped
    assert got[2][3] == 0.0
    assert 12 not in got and 6 not in got and 7 not in got
    assert set(got) == {1, 2, 3, 4, 5, 8, 9, 10, 11, 13, 14, 15}
