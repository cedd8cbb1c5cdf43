"""Hot-bucket caps: an adversarial degenerate bucket (many docs sharing a
min-shingle / sign pattern) must yield BOUNDED pair expansion, never an
O(n^2) blowup in one reducer — with the truncation observable, not silent."""
from __future__ import annotations

import math

from pyspark.sql import functions as F

from document_ai_spark.operators import dedup as D
from document_ai_spark.operators import similarity as S


def test_near_dup_hot_bucket_is_capped(spark):
    # 40 identical docs: one bucket, C(40,2)=780 pairs uncapped.
    docs = spark.createDataFrame(
        [(f"d{i:03d}", "spam spam spam spam") for i in range(40)],
        schema="doc_id string, text string")
    capped = D.near_dup_pairs(docs, jaccard_min=0.0, max_bucket=10).collect()
    assert len(capped) == math.comb(10, 2)
    # Deterministic prefix: items are sorted before the slice.
    ids = {r["doc_a"] for r in capped} | {r["doc_b"] for r in capped}
    assert ids == {f"d{i:03d}" for i in range(10)}


def test_banded_near_dup_hot_bucket_is_capped(spark):
    docs = spark.createDataFrame(
        [(f"d{i:03d}", "spam spam spam spam") for i in range(40)],
        schema="doc_id string, text string")
    capped = D.banded_near_dup_pairs(
        docs, jaccard_min=0.0, max_bucket=8).collect()
    # Identical docs agree on every band; pairs de-duped across bands.
    assert len(capped) == math.comb(8, 2)


def test_embedding_near_dup_hot_bucket_is_capped(spark):
    # All-positive vectors share every band bucket.
    emb = spark.createDataFrame(
        [(i, [float(1 + (i % 3))] * 64, 0) for i in range(30)],
        schema="vec_id long, embedding array<float>, label int")
    capped = S.embedding_near_dups(emb, cos_min=0.0, max_bucket=6).collect()
    assert len(capped) == math.comb(6, 2)
    assert all(r["id_a"] < r["id_b"] for r in capped)


def test_cap_above_bucket_size_is_identity(spark):
    docs = spark.createDataFrame(
        [(f"d{i}", f"alpha beta gamma delta {i % 2}") for i in range(8)],
        schema="doc_id string, text string")
    a = sorted(map(tuple, D.near_dup_pairs(docs, 0.0, max_bucket=1000)
                   .collect()))
    b = sorted(map(tuple, D.near_dup_pairs(docs, 0.0, max_bucket=8)
                   .collect()))
    assert a == b and len(a) > 0


def test_kmeans_codebook_shape_and_determinism(spark):
    import numpy as np
    rng = np.random.RandomState(7)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.randn(64)], i % 3) for i in range(60)],
        schema="vec_id long, embedding array<float>, label int")
    c1 = {r["centroid_id"]: r["cent"]
          for r in S.kmeans_codebook(emb, k=4, iters=2).collect()}
    c2 = {r["centroid_id"]: r["cent"]
          for r in S.kmeans_codebook(emb, k=4, iters=2).collect()}
    assert sorted(c1) == [0, 1, 2, 3]
    assert c1 == c2                       # bit-stable across runs
    assert all(len(v) == 64 for v in c1.values())
    # Trained codebook differs from the raw first-k init.
    init = {r["vec_id"]: list(r["embedding"])
            for r in emb.where(F.col("vec_id") < 4).collect()}
    assert any(c1[k] != [float(x) for x in init[k]] for k in c1)


def test_cap_summary_bounded_on_unexecuted_plan(spark):
    """ADVICE fix: a capped plan built inside collect_cap_metrics whose
    action never runs must not deadlock summary() — it returns within
    the timeout and reports the unfired observation."""
    import time

    import pytest

    docs = spark.createDataFrame(
        [(f"d{i}", "spam spam spam spam") for i in range(12)],
        schema="doc_id string, text string")
    with D.collect_cap_metrics() as caps:
        executed = D.near_dup_pairs(docs, jaccard_min=0.0, max_bucket=4)
        executed.collect()
        D.near_dup_pairs(docs, jaccard_min=0.0, max_bucket=4)  # never runs
    t0 = time.monotonic()
    with pytest.warns(UserWarning, match="never executed"):
        s = caps.summary(timeout_sec=1.0)
    assert time.monotonic() - t0 < 5.0, "summary must not block"
    assert s["lsh_cap_unobserved"] == 1
    assert s["lsh_cap_dropped"] > 0  # the executed plan's drops counted


def test_cap_collectors_are_thread_local(spark):
    """A collector opened on one thread must not receive observations
    from plans built on another thread."""
    import threading

    docs = spark.createDataFrame(
        [(f"d{i}", "spam spam spam spam") for i in range(12)],
        schema="doc_id string, text string")
    with D.collect_cap_metrics() as caps:
        def other():
            D.near_dup_pairs(docs, jaccard_min=0.0, max_bucket=4).collect()
        t = threading.Thread(target=other)
        t.start(); t.join()
    assert caps.observations == []


def test_band_bucket_stats_counts_exactly(spark):
    # 12 identical docs + 5 unique ones: the identical family shares
    # every band bucket; uniques land alone (w.h.p. for these texts).
    docs = spark.createDataFrame(
        [(f"s{i:02d}", "spam spam spam spam") for i in range(12)]
        + [(f"u{i}", f"unique text number {i} entirely different {i}")
           for i in range(5)],
        schema="doc_id string, text string")
    stats = {r["band"]: r.asDict()
             for r in D.band_bucket_stats(docs, bands=4, rows=2).collect()}
    assert set(stats) == {0, 1, 2, 3}
    for b, s in stats.items():
        assert s["n_docs"] == 17
        assert s["max_bucket"] == 12
        # the spam family contributes C(12,2)=66 pairs in every band
        assert s["candidate_pairs"] >= 66
        assert s["n_colliding_buckets"] >= 1
        assert s["n_buckets"] <= 17 - 12 + 1 + 0 + 5  # family + uniques


def test_suggest_bucket_cap_bounds(spark):
    docs = spark.createDataFrame(
        [(f"s{i:02d}", "spam spam spam spam") for i in range(12)]
        + [(f"u{i}", f"unique text number {i} entirely different {i}")
           for i in range(5)],
        schema="doc_id string, text string")
    cap = D.suggest_bucket_cap(docs, bands=4, rows=2, margin=8, floor=64)
    # margin * organic max = 96 -> next pow2 = 128; power of two, >= floor
    assert cap == 128
    assert D.suggest_bucket_cap(docs.limit(3), margin=2, floor=64) == 64
