"""SemanticIndex: incremental SemDeDup over the persisted codebook —
batch parity on arrival-respecting plantings, first-seen-wins across
batches, loser-indexed chains, replay idempotence."""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from document_ai_spark.operators.similarity import semdedup
from document_ai_spark.operators.vector_index import SemanticIndex

DIM = 8


def _vec(*head):
    v = list(head) + [0.0] * (DIM - len(head))
    return [float(x) for x in v]


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, v, "l") for i, v in rows],
        "vec_id bigint, embedding array<float>, label string")


def _scaled(rows, offset=1000000):
    return [(i + offset, [2.0 * x for x in v]) for i, v in rows]


def test_incremental_matches_batch_on_ordered_arrival(spark, tmp_path):
    """Originals in batch 1, cos-1 copies in batch 2: the union of
    incremental verdicts equals the batch semdedup recompute."""
    base = [(i, _vec(math.cos(i), math.sin(i))) for i in range(12)]
    copies = _scaled(base)
    idx = SemanticIndex(str(tmp_path / "idx"), cos_min=0.95, k=2,
                        iters=1)
    # The documented production path: ONE codebook shared by every
    # consumer (train once, pass in) — batch vs incremental parity is
    # defined against the same geometry.
    cb = idx.codebook.ensure(spark, _emb(spark, base + copies))
    v1 = idx.append_and_find(spark, _emb(spark, base), "b1")
    v2 = idx.append_and_find(spark, _emb(spark, copies), "b2")
    inc = {r["vec_id"]: r["sem_keep"]
           for r in v1.collect() + v2.collect()}
    full = {r["vec_id"]: r["sem_keep"]
            for r in semdedup(_emb(spark, base + copies), cos_min=0.95,
                              codebook=cb).collect()}
    assert inc == full
    # every cos-1 copy is dropped; each original i also pairs with
    # i+6 (|i - (i+6) mod 2pi| = 0.283 rad -> cos 0.96 >= 0.95), so
    # exactly one of each natural pair survives — the same verdicts in
    # both computations (covered by inc == full).
    assert not any(inc[i] for i, _ in copies)
    assert sum(1 for i, _ in base if inc[i]) == 6


def test_first_seen_wins_across_batches(spark, tmp_path):
    """A later-batch vector similar to an indexed one is dropped even
    when the batch keep-order (cos-to-centroid) would prefer it."""
    a = _vec(1)                                  # IS the centroid
    b = _vec(math.cos(0.22), math.sin(0.22))     # farther (batch rule
    idx = SemanticIndex(str(tmp_path / "idx"), cos_min=0.95, k=1,
                        iters=1)                  # would keep b)
    v1 = idx.append_and_find(spark, _emb(spark, [(0, a)]), "b1")
    v2 = idx.append_and_find(spark, _emb(spark, [(1, b)]), "b2")
    assert v1.collect()[0]["sem_keep"] is True
    assert v2.collect()[0]["sem_keep"] is False   # earlier batch won


def test_losers_are_indexed_chains_collapse(spark, tmp_path):
    """Batch 2's vector similar ONLY to batch 1's dropped vector is
    still dropped — losers enter the index, the stream_curate rule."""
    # centroid trains to ~a (k=1, init = vec 0). Keep order is
    # farthest-from-centroid FIRST, so within batch 1 b (farther)
    # wins and a is the dropped one. c is similar ONLY to the dropped
    # a (angle -0.18 from it; 0.36 from b, below the 0.98 gate).
    t_a, t_b, t_c = 0.0, 0.18, -0.18
    cos_min = round(math.cos(0.20), 2)           # 0.98
    a, b, c = (_vec(math.cos(t), math.sin(t)) for t in (t_a, t_b, t_c))
    idx = SemanticIndex(str(tmp_path / "idx"), cos_min=cos_min, k=1,
                        iters=1)
    v1 = {r["vec_id"]: r["sem_keep"] for r in
          idx.append_and_find(spark, _emb(spark, [(0, a), (1, b)]),
                              "b1").collect()}
    assert v1 == {0: False, 1: True}             # a dropped by b
    v2 = idx.append_and_find(spark, _emb(spark, [(2, c)]),
                             "b2").collect()[0]
    assert v2["sem_keep"] is False               # dropped by the LOSER a


def test_replay_is_idempotent(spark, tmp_path):
    base = [(i, _vec(math.cos(i), math.sin(i))) for i in range(6)]
    idx = SemanticIndex(str(tmp_path / "idx"), cos_min=0.95, k=2,
                        iters=1)
    first = {(r["vec_id"], r["sem_keep"]) for r in
             idx.append_and_find(spark, _emb(spark, base),
                                 "b1").collect()}
    idx.append_and_find(spark, _emb(spark, _scaled(base)), "b2")
    again = {(r["vec_id"], r["sem_keep"]) for r in
             idx.append_and_find(spark, _emb(spark, base),
                                 "b1").collect()}
    assert first == again                        # probes pre-b2 state
    n_rows = idx.index_df(spark).count()
    assert n_rows == 12                          # no double-append
