"""Production-resolution MinHash: arbitrary permutation count k with
deterministically derived LCG constants, parity-pinned on both engines.

Round-4 verdict task 1: the 8-permutation hardcoded family quantized the
sketch-jaccard estimator to 1/8 steps and capped banding at 4x2. k is
now unbounded (dedup.minhash_constants); these tests pin
  * the derivation: legacy prefix intact, ranges that preserve the
    64-bit overflow proof, determinism;
  * Spark signature values at k=64 against an independent pure-Python
    recompute;
  * DuckDB parity for the derived constants (the oracle embeds the SAME
    literals, so this guards the embedding, not just the math);
  * the banded pair set at 16x4 against a brute-force recompute.
"""
from __future__ import annotations

import hashlib
import itertools

import duckdb
import pytest

from document_ai_spark.operators.dedup import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
    SHINGLE_K,
    SKETCH_SIZE,
    banded_near_dup_pairs,
    minhash_constants,
    with_minhash_signature,
)


def test_constants_legacy_prefix_and_ranges():
    A, B = minhash_constants(128)
    assert A[:8] == MINHASH_A and B[:8] == MINHASH_B
    # Overflow proof ranges: A*h < (P-1) * 2^28 < 2^59.
    assert all(1 <= a <= MINHASH_P - 1 for a in A)
    assert all(0 <= b <= MINHASH_P - 1 for b in B)
    # Deterministic and prefix-stable: k=64 is a prefix of k=128.
    A2, B2 = minhash_constants(64)
    assert A2 == A[:64] and B2 == B[:64]
    # No accidental collisions across the family (distinct permutations).
    assert len(set(zip(A, B))) == 128


def _shingles(text):
    toks = text.strip().split()
    n = max(len(toks) - (SHINGLE_K - 1), 1)
    return [" ".join(toks[i:i + SHINGLE_K]) for i in range(n)]


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def _signature(text, k):
    A, B = minhash_constants(k)
    hs = [int(_md5(s)[:7], 16) for s in _shingles(text)]
    return [min((A[i] * h + B[i]) % MINHASH_P for h in hs)
            for i in range(k)]


TEXTS = [
    ("a", "the quick brown fox jumps over the lazy dog near the river"),
    ("b", "pack my box with five dozen liquor jugs before noon today"),
    ("c", "sphinx of black quartz judge my vow in the ancient temple"),
]


def test_signature_k64_matches_python(spark):
    df = spark.createDataFrame(TEXTS, "doc_id string, text string")
    got = {r["doc_id"]: list(r["minhash_sig"])
           for r in with_minhash_signature(df, n_hashes=64).collect()}
    for doc_id, text in TEXTS:
        assert got[doc_id] == _signature(text, 64), doc_id


def test_signature_k64_duckdb_parity():
    """The derived constants embed into DuckDB SQL via the same literal
    arrays the oracle uses (__spark_entry__._sig_sql); values must equal
    the Python recompute bit-for-bit."""
    k = 64
    A, B = minhash_constants(k)
    a_sql = "[" + ", ".join(map(str, A)) + "]"
    b_sql = "[" + ", ".join(map(str, B)) + "]"
    text = TEXTS[0][1]
    sh = _shingles(text)
    sh_sql = "[" + ", ".join(f"'{s}'" for s in sh) + "]"
    sig = duckdb.sql(
        f"SELECT [list_min(list_transform("
        f"  list_transform({sh_sql}, s -> ('0x' || substr(md5(s), 1, 7))::BIGINT), "
        f"  h -> ({a_sql}[i + 1] * h + {b_sql}[i + 1]) % {MINHASH_P})) "
        f"for i in range(0, {k})] AS sig").fetchone()[0]
    assert list(sig) == _signature(text, k)


def test_banded_k64_pairs_match_bruteforce(spark):
    """16 bands x 4 rows (k=64): emitted pair set == brute-force banding
    + sketch-jaccard verify recomputed in plain Python."""
    bands, rows = 16, 4
    base = "one two three four five six seven eight nine ten".split()
    rowset = []
    for i in range(12):
        words = list(base)
        words[i % len(words)] = f"mut{i % 3}"
        rowset.append((f"g{i}", " ".join(words)))
    df = spark.createDataFrame(rowset, "doc_id string, text string")
    got = {(r["doc_a"], r["doc_b"])
           for r in banded_near_dup_pairs(
               df, jaccard_min=0.3, bands=bands, rows=rows).collect()}

    def sketch(text):
        return sorted({_md5(s) for s in _shingles(text)})[:SKETCH_SIZE]

    texts = dict(rowset)
    sk = {d: sketch(t) for d, t in texts.items()}
    sig = {d: _signature(t, bands * rows) for d, t in texts.items()}
    expect = set()
    for a, b in itertools.combinations(sorted(texts), 2):
        agree = any(sig[a][w * rows:(w + 1) * rows]
                    == sig[b][w * rows:(w + 1) * rows]
                    for w in range(bands))
        if not agree:
            continue
        inter = len(set(sk[a]) & set(sk[b]))
        union = len(set(sk[a]) | set(sk[b]))
        if union and inter / union >= 0.3:
            expect.add((a, b))
    assert got == expect and expect, "k64 banding must find the mutated family"


def test_banded_default_unchanged(spark):
    """The 4x2 default still uses the legacy 8 constants — round-1..4
    artifacts and the driver's banded_near_dup row stay pinned."""
    text = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away to find a quiet place for a long afternoon nap")
    df = spark.createDataFrame(
        [("a", text), ("b", text + " extra")], "doc_id string, text string")
    pairs = banded_near_dup_pairs(df, jaccard_min=0.4).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [("a", "b")]
