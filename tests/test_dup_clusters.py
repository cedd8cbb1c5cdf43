"""Transitive duplicate clustering (connected components over pairs)."""
from __future__ import annotations

from document_ai_spark.operators.dedup import (
    banded_near_dup_pairs,
    duplicate_clusters,
)


def test_transitive_closure_chain(spark):
    # a-b, b-c, plus an isolated pair (x, y): two components.
    pairs = spark.createDataFrame(
        [(2, 5), (5, 9), (20, 30)], schema="doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster"]
           for r in duplicate_clusters(pairs).collect()}
    assert got == {2: 2, 5: 2, 9: 2, 20: 20, 30: 20}


def test_longer_chain_within_iterations(spark):
    # Path 1-2-3-4-5 (diameter 4) must fully collapse.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], schema="doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster"]
           for r in duplicate_clusters(pairs).collect()}
    assert set(got.values()) == {1}


def test_deep_chain_converges(spark):
    # Diameter-9 path: the round-2 fixed-4-round version silently split
    # this into multiple clusters; the convergence-checked loop must
    # collapse it into one.
    n = 10
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], schema="doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster"]
           for r in duplicate_clusters(pairs).collect()}
    assert got == {i: 1 for i in range(1, n + 1)}


def test_nonconvergence_raises(spark):
    import pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], schema="doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(pairs, max_iter=2)


def test_clusters_from_real_pairs(spark):
    # Three mutated copies of one text -> one cluster of 4.
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(0, base),
         (1, base + " extra"),
         (2, "prefix " + base),
         (3, base.replace("eta", "XX")),
         (9, "totally different words entirely unrelated content here")],
        schema="doc_id long, text string")
    pairs = banded_near_dup_pairs(docs, jaccard_min=0.3)
    got = {r["doc_id"]: r["cluster"]
           for r in duplicate_clusters(pairs).collect()}
    assert 9 not in got
    assert len({got[i] for i in got}) == 1 and got.get(0) == 0


def test_star_algorithm_matches_label_propagation(spark):
    """duplicate_clusters_star == duplicate_clusters on random pair sets
    (same (doc_id, component-min) contract)."""
    import random

    from document_ai_spark.operators.dedup import (
        duplicate_clusters,
        duplicate_clusters_star,
    )

    rng = random.Random(7)
    for trial in range(2):
        n = 40
        pairs = {(f"d{min(a, b):03d}", f"d{max(a, b):03d}")
                 for a, b in (sorted(rng.sample(range(n), 2))
                              for _ in range(30))}
        df = spark.createDataFrame(
            [(a, b) for a, b in pairs], "doc_a string, doc_b string")
        lab = {(r["doc_id"], r["cluster"])
               for r in duplicate_clusters(df).collect()}
        star = {(r["doc_id"], r["cluster"])
                for r in duplicate_clusters_star(df).collect()}
        assert star == lab, f"trial {trial}"


def test_star_algorithm_handles_long_chains(spark):
    """A 120-link chain (diameter 120) needs diameter rounds under
    label propagation (raises past its bound); the alternating star
    algorithm contracts paths exponentially and labels every node with
    the chain minimum in ~7 rounds."""
    import pytest

    from document_ai_spark.operators.dedup import (
        duplicate_clusters,
        duplicate_clusters_star,
    )

    chain = spark.createDataFrame(
        [(f"n{i:04d}", f"n{i + 1:04d}") for i in range(120)],
        "doc_a string, doc_b string")
    # label propagation needs diameter rounds: raises past its bound
    # (max_iter=8 keeps the negative check fast; 120 > 8 either way)
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(chain, max_iter=8)
    out = {r["doc_id"]: r["cluster"]
           for r in duplicate_clusters_star(chain).collect()}
    assert len(out) == 121
    assert set(out.values()) == {"n0000"}
