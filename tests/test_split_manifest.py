"""Unit tests for hash_split (deterministic train/val/test carve) and
chunk_manifest (the pack_sequences inverse a training reader consumes)."""
from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from document_ai_spark.operators.curation import (
    chunk_manifest,
    hash_split,
    pack_sequences,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# -- hash_split -------------------------------------------------------------

def test_hash_split_matches_pure_python(spark):
    """The label is a pure function of (seed, key): pin it against an
    independent Python evaluation of the same md5 arithmetic."""
    docs = _docs(spark, [(i, f"doc {i}") for i in range(200)])
    got = {r["doc_id"]: r["split"]
           for r in hash_split(docs, seed=7).collect()}
    cut1, cut2 = int(0.90 * 2 ** 32), int(0.95 * 2 ** 32)
    for i in range(200):
        u = int(hashlib.md5(f"7:{i}".encode()).hexdigest()[:8], 16)
        want = "train" if u < cut1 else "val" if u < cut2 else "test"
        assert got[i] == want, f"doc {i}: {got[i]} != {want} (u={u})"


def test_hash_split_disjoint_exhaustive_and_sized(spark):
    n = 2000
    docs = _docs(spark, [(i, "x") for i in range(n)])
    out = hash_split(docs, seed=1).groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in out}
    assert sum(counts.values()) == n            # exhaustive, one label each
    assert set(counts) <= {"train", "val", "test"}
    # realized fractions near the weights (md5 is uniform; 3 sigma at
    # n=2000 for p=0.9 is ~2%, for p=0.05 ~1.5%)
    assert abs(counts["train"] / n - 0.90) < 0.03
    assert abs(counts.get("val", 0) / n - 0.05) < 0.025
    assert abs(counts.get("test", 0) / n - 0.05) < 0.025


def test_hash_split_stable_under_growth(spark):
    """Appending a crawl batch never moves an existing doc between
    splits — the property randomSplit/ntile carves lack."""
    small = _docs(spark, [(i, "x") for i in range(100)])
    large = _docs(spark, [(i, "x") for i in range(1000)])
    s = {r["doc_id"]: r["split"] for r in hash_split(small, seed=3).collect()}
    l = {r["doc_id"]: r["split"] for r in hash_split(large, seed=3).collect()}
    assert all(l[i] == s[i] for i in s)


def test_hash_split_seed_redeals(spark):
    docs = _docs(spark, [(i, "x") for i in range(500)])
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, seed=0).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs, seed=1).collect()}
    assert any(a[i] != b[i] for i in a)


def test_hash_split_custom_weights_and_validation(spark):
    docs = _docs(spark, [(i, "x") for i in range(300)])
    out = hash_split(docs, weights={"a": 3, "b": 1}, seed=0)
    counts = {r["split"]: r["count"]
              for r in out.groupBy("split").count().collect()}
    assert set(counts) <= {"a", "b"} and sum(counts.values()) == 300
    assert abs(counts["a"] / 300 - 0.75) < 0.08
    with pytest.raises(ValueError):
        hash_split(docs, weights={"only": 1.0})
    with pytest.raises(ValueError):
        hash_split(docs, weights={"a": 1.0, "b": -0.1})


def test_hash_split_is_map_side_only(spark):
    docs = _docs(spark, [(i, "x") for i in range(10)])
    plan = hash_split(docs, seed=0)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange" not in plan


# -- chunk_manifest ----------------------------------------------------------

def test_chunk_manifest_known_values(spark):
    # stream: [a b c | d e | f g h i j] at seq_len 4 (doc 2 empty)
    rows = [(0, "a b c"), (1, "d e"), (2, ""), (3, "f g h i j")]
    out = [tuple(r) for r in
           chunk_manifest(_docs(spark, rows), seq_len=4)
           .orderBy("chunk_id", "chunk_pos").collect()]
    assert out == [
        (0, 0, 0, 0, 3),   # chunk 0: doc0[0:3] at pos 0
        (0, 1, 3, 0, 1),   # chunk 0: doc1[0:1] at pos 3
        (1, 1, 0, 1, 1),   # chunk 1: doc1[1:2] at pos 0
        (1, 3, 1, 0, 3),   # chunk 1: doc3[0:3] at pos 1
        (2, 3, 0, 3, 2),   # chunk 2 (short tail): doc3[3:5]
    ]


def test_chunk_manifest_tiles_exactly(spark):
    """Segments tile every chunk with no gaps/overlaps, cover each doc's
    tokens exactly once, and only the final stream chunk is short."""
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(1 + (i * 7) % 23)))
            for i in range(40)] + [(99, "")]
    docs = _docs(spark, rows)
    L = 16
    man = chunk_manifest(docs, seq_len=L).collect()
    packed = {r["doc_id"]: r for r in
              pack_sequences(docs, seq_len=L).collect()}

    by_doc, by_chunk = {}, {}
    for r in man:
        by_doc.setdefault(r["doc_id"], []).append(r)
        by_chunk.setdefault(r["chunk_id"], []).append(r)

    # per doc: segments cover [0, n_tokens) contiguously
    for d, segs in by_doc.items():
        segs.sort(key=lambda r: r["doc_offset"])
        assert segs[0]["doc_offset"] == 0
        pos = 0
        for s in segs:
            assert s["doc_offset"] == pos and s["seg_len"] > 0
            pos += s["seg_len"]
        assert pos == packed[d]["n_tokens"]
    assert 99 not in by_doc            # zero-token docs emit no rows

    # per chunk: segments tile [0, L) (last chunk may stop short)
    total = sum(p["n_tokens"] for p in packed.values())
    last_chunk = (total - 1) // L
    for c, segs in by_chunk.items():
        segs.sort(key=lambda r: r["chunk_pos"])
        pos = 0
        for s in segs:
            assert s["chunk_pos"] == pos
            pos += s["seg_len"]
        assert pos == (total - last_chunk * L if c == last_chunk else L)
    assert set(by_chunk) == set(range(last_chunk + 1))


def test_chunk_manifest_agrees_with_pack_sequences(spark):
    rows = [(i, " ".join("t" * ((i + j) % 3 + 1) for j in range(i % 9)))
            for i in range(60)]
    docs = _docs(spark, rows)
    man = chunk_manifest(docs, seq_len=8).collect()
    packed = {r["doc_id"]: r for r in
              pack_sequences(docs, seq_len=8).collect()}
    for d, segs in _group(man).items():
        first = min(segs, key=lambda r: r["doc_offset"])
        p = packed[d]
        assert first["chunk_id"] == p["chunk_id"]
        assert first["chunk_pos"] == p["chunk_pos"]
        assert len(segs) == p["n_chunks"]


def _group(rows):
    out = {}
    for r in rows:
        out.setdefault(r["doc_id"], []).append(r)
    return out
