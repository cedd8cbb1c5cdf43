"""SemDeDup (operators/similarity.py semdedup): greedy intra-cluster
semantic dedup — keep-order semantics, exact-duplicate resolution, and
row-completeness when the cluster cap truncates the comparison set."""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from document_ai_spark.operators.similarity import semdedup

DIM = 8


def _vec(*head):
    v = list(head) + [0.0] * (DIM - len(head))
    return [float(x) for x in v]


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, v, "l") for i, v in rows],
        "vec_id bigint, embedding array<float>, label string")


def _codebook(spark, cents):
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "centroid_id bigint, cent array<double>")


def test_scaled_copy_dropped_original_kept(spark):
    """cos(v, 2v) = 1: identical rounded cos-to-centroid, so the tie
    breaks to the lower vec_id — the original wins."""
    rows = [(0, _vec(1, 0.2)), (1, _vec(0.1, 1)),
            (10, [2 * x for x in _vec(1, 0.2)])]
    out = {r["vec_id"]: r for r in
           semdedup(_emb(spark, rows), cos_min=0.95, k=2, iters=1)
           .collect()}
    assert out[0]["sem_keep"] is True
    assert out[10]["sem_keep"] is False
    assert out[1]["sem_keep"] is True
    assert out[0]["centroid_id"] == out[10]["centroid_id"]


def test_keep_order_prefers_far_from_centroid(spark):
    """The paper's rule: within a duplicate group, the member with the
    LOWEST cosine to the centroid is kept — even when it has the
    higher vec_id. Fixed codebook so the geometry is exact."""
    cents = [_vec(1), _vec(0, 1)]
    # Both vectors sit in cluster 0; b is a slightly rotated copy of a
    # (cos(a, b) > 0.99) but FARTHER from the centroid.
    a = _vec(math.cos(0.10), math.sin(0.10))
    b = _vec(math.cos(0.22), math.sin(0.22))
    out = {r["vec_id"]: r for r in
           semdedup(_emb(spark, [(1, a), (2, b)]), cos_min=0.95,
                    codebook=_codebook(spark, cents)).collect()}
    assert out[2]["cos_c"] < out[1]["cos_c"]
    assert out[2]["sem_keep"] is True       # farther from centroid
    assert out[1]["sem_keep"] is False      # similar to an earlier keep


def test_distinct_vectors_all_kept(spark):
    """Orthogonal-ish vectors never cross cos_min: everything keeps."""
    rows = [(i, _vec(*([0.0] * i + [1.0]))) for i in range(4)]
    out = semdedup(_emb(spark, rows), cos_min=0.95, k=2, iters=1)
    assert all(r["sem_keep"] for r in out.collect())


def test_cap_keeps_row_completeness(spark):
    """max_cluster=2 truncates the comparison set of a 4-member
    cluster: every vector still gets a verdict row; beyond-cap items
    default to kept (observed, never silently absent)."""
    base = _vec(1, 0.1)
    rows = [(i, [x * (1 + 0.001 * i) for x in base]) for i in range(4)]
    out = semdedup(_emb(spark, rows), cos_min=0.95, k=1, iters=1,
                   codebook=_codebook(spark, [_vec(1)]),
                   max_cluster=2)
    got = {r["vec_id"]: r["sem_keep"] for r in out.collect()}
    assert set(got) == {0, 1, 2, 3}          # no row vanished
    assert sum(1 for v in got.values() if v) >= 3  # 2 judged: 1 drop


def test_greedy_earlier_wins_even_if_itself_dropped(spark):
    """The public-code rule: item j is dropped if ANY earlier item is
    similar — even an earlier item that was itself dropped. Chain
    a ~ b ~ c with a-c also similar: only the first keeps."""
    angles = [0.30, 0.20, 0.10]              # descending distance
    rows = [(i, _vec(math.cos(t), math.sin(t)))
            for i, t in enumerate(angles)]
    out = {r["vec_id"]: r["sem_keep"] for r in
           semdedup(_emb(spark, rows), cos_min=0.97,
                    codebook=_codebook(spark, [_vec(1)])).collect()}
    assert out == {0: True, 1: False, 2: False}
