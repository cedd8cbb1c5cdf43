"""The first-collision-band pair dedup (dedup.banded_near_dup_pairs,
similarity.embedding_near_dups, sketch_index) must emit every multi-band
candidate pair EXACTLY once — the invariant that replaced the
groupBy(doc_a, doc_b) dedup exchange."""
from __future__ import annotations

from pyspark.sql import functions as F

from document_ai_spark.operators.dedup import banded_near_dup_pairs
from document_ai_spark.operators.similarity import embedding_near_dups


def test_text_pairs_unique_for_identical_docs(spark):
    # Identical docs collide in ALL 4 bands; near-identical in several.
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(f"d{i}", text) for i in range(4)] + [
        ("e0", "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
        ("f0", "totally different words here nothing shared at all yes"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    pairs = banded_near_dup_pairs(df, jaccard_min=0.1).collect()
    keys = [(r["doc_a"], r["doc_b"]) for r in pairs]
    assert len(keys) == len(set(keys)), "pair emitted more than once"
    # all 6 identical-doc pairs present despite colliding in every band
    ident = {(a, b) for a, b in keys if a.startswith("d") and b.startswith("d")}
    assert len(ident) == 6


def test_embedding_pairs_unique_for_identical_vectors(spark):
    v = [1.0] * 32
    rows = [(f"v{i}", v) for i in range(3)] + [
        ("w0", [-1.0] * 32),
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    pairs = embedding_near_dups(df, cos_min=0.9).collect()
    keys = [(r["id_a"], r["id_b"]) for r in pairs]
    assert len(keys) == len(set(keys)), "pair emitted more than once"
    assert len(keys) == 3  # the 3 identical-vector pairs, each once


def test_pairs_match_bruteforce_dedup(spark):
    # Property: the emitted pair SET equals what an explicit distinct over
    # all-band expansion would produce (first-band filter only changes
    # WHICH band emits, never the set).
    import itertools
    base = "one two three four five six seven eight nine ten".split()
    rows = []
    for i in range(12):
        words = list(base)
        words[i % len(words)] = f"mut{i % 3}"
        rows.append((f"g{i}", " ".join(words)))
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {(r["doc_a"], r["doc_b"])
           for r in banded_near_dup_pairs(df, jaccard_min=0.3).collect()}
    # brute force: exact sketch-jaccard over all pairs that share any band
    from document_ai_spark.operators.dedup import (
        LSH_BANDS, LSH_ROWS, with_minhash_sketch)
    sk = {r["doc_id"]: r["minhash_sketch"]
          for r in with_minhash_sketch(df).collect()}
    expect = set()
    for a, b in itertools.combinations(sorted(sk), 2):
        sa, sb = sk[a], sk[b]
        bands_agree = any(
            sa[band * LSH_ROWS:(band + 1) * LSH_ROWS]
            == sb[band * LSH_ROWS:(band + 1) * LSH_ROWS]
            for band in range(LSH_BANDS))
        if not bands_agree:
            continue
        inter = len(set(sa) & set(sb))
        union = len(set(sa) | set(sb))
        if union and inter / union >= 0.3:
            expect.add((a, b))
    assert got == expect
