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
    # brute force: band agreement on the k-permutation SIGNATURE, verify
    # by exact jaccard over the bottom-k sketch — both recomputed in
    # plain python from the raw text
    import hashlib

    from document_ai_spark.operators.dedup import (
        LSH_BANDS, LSH_ROWS, MINHASH_A, MINHASH_B, MINHASH_P, SHINGLE_K,
        SKETCH_SIZE)

    def shingles(text):
        toks = text.strip().split()
        n = max(len(toks) - (SHINGLE_K - 1), 1)
        return [" ".join(toks[i:i + SHINGLE_K]) for i in range(n)]

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    def sketch(text):
        return sorted({md5(s) for s in shingles(text)})[:SKETCH_SIZE]

    def signature(text):
        hs = [int(md5(s)[:7], 16) for s in shingles(text)]
        return [min((MINHASH_A[i] * h + MINHASH_B[i]) % MINHASH_P
                    for h in hs)
                for i in range(SKETCH_SIZE)]

    texts = dict(rows)
    sk = {d: sketch(t) for d, t in texts.items()}
    sig = {d: signature(t) for d, t in texts.items()}
    expect = set()
    for a, b in itertools.combinations(sorted(texts), 2):
        bands_agree = any(
            sig[a][band * LSH_ROWS:(band + 1) * LSH_ROWS]
            == sig[b][band * LSH_ROWS:(band + 1) * LSH_ROWS]
            for band in range(LSH_BANDS))
        if not bands_agree:
            continue
        inter = len(set(sk[a]) & set(sk[b]))
        union = len(set(sk[a]) | set(sk[b]))
        if union and inter / union >= 0.3:
            expect.add((a, b))
    assert got == expect


def test_banding_survives_single_word_insertion(spark):
    """Regression: bottom-k POSITIONAL banding missed this pair entirely
    (an inserted small hash shifts every band); k-permutation signature
    banding must catch it."""
    text = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away to find a quiet place for a long afternoon nap")
    df = spark.createDataFrame(
        [("a", text), ("b", text + " extra")], "doc_id string, text string")
    pairs = banded_near_dup_pairs(df, jaccard_min=0.4).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [("a", "b")]
