"""Streaming ingest parity + multimodal plumbing tests."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_ai_spark.operators import multimodal as MM
from document_ai_spark.streaming import feedback as FB


def test_strategy_accuracy_and_best(spark):
    rows = [
        ("pattern", True), ("pattern", True), ("pattern", False),
        ("fuzzy", True), ("fuzzy", True),
        ("kv", False),
    ]
    df = spark.createDataFrame(
        [{"extraction_method": m, "was_correct": c,
          "ts": None, "doc_id": "d", "field_name": "f",
          "predicted_value": "", "correct_value": "",
          "doc_type": "invoice", "languages": ["en"]}
         for m, c in rows],
        schema=FB.FEEDBACK_SCHEMA)
    acc = {r["extraction_method"]: r["accuracy"]
           for r in FB.strategy_accuracy(df).collect()}
    assert acc == {"pattern": pytest.approx(0.666667),
                   "fuzzy": 1.0, "kv": 0.0}
    best = FB.best_strategy(df).collect()[0]
    assert best["extraction_method"] == "fuzzy"


def test_similar_feedback_filters_and_limits(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(20):
        rows.append({
            "ts": base + dt.timedelta(minutes=i), "doc_id": f"d{i:02d}",
            "field_name": "hp", "predicted_value": "", "correct_value": "",
            "extraction_method": "pattern", "was_correct": True,
            "doc_type": "invoice" if i % 2 == 0 else "receipt",
            "languages": ["en"] if i % 4 else ["hi"],
        })
    df = spark.createDataFrame(rows)
    got = FB.similar_feedback(df, "invoice", ["en"], limit=3).collect()
    assert len(got) == 3
    assert all(r["doc_type"] == "invoice" for r in got)
    # newest first
    ids = [r["doc_id"] for r in got]
    assert ids == sorted(ids, reverse=True)


def test_stream_extract_matches_batch(spark, tmp_path, corpus_dfs):
    from document_ai_spark.plans.pipeline import extract

    docs_df, payloads_df = corpus_dfs
    subset = docs_df.limit(40).cache()
    in_dir, out_dir, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    # two "arriving" file drops
    subset.limit(20).write.mode("append").parquet(in_dir)
    subset.subtract(subset.limit(20)).write.mode("append").parquet(in_dir)

    q = FB.stream_extract(spark, in_dir, out_dir, ck, payloads_df)
    q.awaitTermination(120)

    streamed = spark.read.parquet(out_dir)
    batch = extract(subset, payloads_df).withColumn(
        "out_spans", F.to_json("out_spans"))
    s = {(r["doc_id"], r["out_spans"]) for r in
         streamed.select("doc_id", "out_spans").collect()}
    b = {(r["doc_id"], r["out_spans"]) for r in
         batch.select("doc_id", "out_spans").collect()}
    assert s == b
    subset.unpersist()


def test_multimodal_feature_plumbing(spark):
    rows = [
        {"media_ref": "a", "mime": "image/png", "payload": b"\x00\x01\x02\x03"},
        {"media_ref": "b", "mime": "audio/wav", "payload": b"\xff" * 100},
        {"media_ref": "c", "mime": "image/png", "payload": b""},
    ]
    df = spark.createDataFrame(rows)
    feats = {r["media_ref"]: r for r in MM.extract_features(df).collect()}
    assert feats["a"]["feat_mean"] == 1.5
    assert feats["b"]["feat_mean"] == 255.0 and feats["b"]["feat_std"] == 0.0
    assert feats["c"]["feat_mean"] == 0.0
    # determinism across partitionings
    feats2 = {r["media_ref"]: r for r in
              MM.extract_features(df.repartition(3)).collect()}
    assert {k: (v["feat_mean"], v["feat_hash"]) for k, v in feats.items()} \
        == {k: (v["feat_mean"], v["feat_hash"]) for k, v in feats2.items()}


def test_decode_stub_raises(spark):
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"xx")


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([{"media_ref": "v1", "n_frames": 25}])
    got = sorted(r["frame_idx"] for r in
                 MM.frame_sample_plan(df, every_n=10).collect())
    assert got == [0, 10, 20]


def test_pluggable_kernel_injection(spark):
    """A custom 'real' kernel passed explicitly must drive the features;
    the default resolver falls back to the fake when codecs are absent."""
    from document_ai_spark.operators import multimodal as MM

    df = spark.createDataFrame(
        [("m1", "image/png", bytearray(b"\x01\x02\x03"))],
        schema="media_ref string, mime string, payload binary")

    def loud_kernel(data: bytes) -> tuple:
        return float(len(data)), 42.0

    got = MM.extract_features(df, kernel=loud_kernel).collect()[0]
    assert (got["feat_mean"], got["feat_std"]) == (3.0, 42.0)

    # Default resolution in this sandbox = the deterministic fake.
    assert MM.resolve_feature_kernel() is MM.fake_features
    base = MM.extract_features(df).collect()[0]
    assert base["feat_mean"] == MM.fake_features(b"\x01\x02\x03")[0]
