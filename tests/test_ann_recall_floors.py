"""Recall floors for the approximate-NN paths (round-4 verdict task 7):
lsh_topk's measured 0.90 recall@5 and ivf_topk's nprobe behavior were
documented in BENCH.md but not pinned — a (bands, rows) or nprobe
change that silently craters recall must fail here, making the dial a
CONSCIOUS trade.

Measured against brute_force_topk (exact) on the sf0.01 embeddings
table, same probes BENCH.md used. Floors sit under the measured values
(0.90 lsh, 0.64 ivf@nprobe2) with slack for tie-ordering noise, not at
them — this is a regression tripwire, not a benchmark."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_ai_spark.operators.similarity import (
    IVF_NPROBE,
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)

SF_DIR = "/root/testdata/sf0.01"
K = 5


@pytest.fixture(scope="module")
def emb(spark):
    return (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            .select("vec_id", "embedding").cache())


@pytest.fixture(scope="module")
def probes(emb):
    return [r["vec_id"] for r in
            emb.select("vec_id").orderBy("vec_id").limit(8).collect()]


@pytest.fixture(scope="module")
def exact(emb, probes):
    return {(r["probe_id"], r["vec_id"])
            for r in brute_force_topk(emb, probes, k=K).collect()}


def _recall(approx_rows, exact_set):
    got = {(r["probe_id"], r["vec_id"]) for r in approx_rows}
    return len(got & exact_set) / len(exact_set)


def test_lsh_topk_recall_floor(emb, probes, exact):
    rec = _recall(lsh_topk(emb, probes, k=K).collect(), exact)
    assert rec >= 0.80, (
        f"lsh_topk recall@{K} {rec:.3f} < 0.80 floor (BENCH.md measured "
        "0.90 at 16x4) — a (bands, rows) change dropped recall; "
        "re-measure and update BENCH.md before moving the floor")


def test_ivf_topk_recall_floor_and_nprobe_monotonic(emb, probes, exact):
    rec2 = _recall(ivf_topk(emb, probes, k=K, nprobe=IVF_NPROBE).collect(),
                   exact)
    assert rec2 >= 0.55, (
        f"ivf_topk recall@{K} {rec2:.3f} < 0.55 floor (BENCH.md measured "
        "0.64 at nprobe=2)")
    # nprobe is the recall dial: probing every cluster must reach
    # exact-equivalent recall (same candidates as brute force).
    rec_all = _recall(ivf_topk(emb, probes, k=K, nprobe=8).collect(), exact)
    assert rec_all >= 0.99
    assert rec_all >= rec2


def test_embedding_near_dup_banding_full_recall_on_planted(spark):
    """The near-dup banding config (4x8) must keep 100% recall on
    planted high-cosine pairs — its job is dedup, not top-k."""
    from document_ai_spark.operators.similarity import embedding_near_dups

    import random
    rng = random.Random(5)
    rows = []
    planted = set()
    for i in range(60):
        v = [rng.gauss(0, 1) for _ in range(64)]
        rows.append((f"v{i:03d}", v))
        if i % 6 == 0:   # plant a near-identical copy
            w = [x + rng.gauss(0, 0.01) for x in v]
            rows.append((f"v{i:03d}dup", w))
            planted.add((f"v{i:03d}", f"v{i:03d}dup"))
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    got = {(r["id_a"], r["id_b"])
           for r in embedding_near_dups(df, cos_min=0.98).collect()}
    assert planted <= got, planted - got
