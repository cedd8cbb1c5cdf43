"""Unit tests for pack_sequences (operators/curation.py): GPT-style
concatenate-and-split training-sequence packing via a distributed
two-pass prefix sum (per-bucket totals + tiny carry table + bounded
within-bucket windows)."""
from __future__ import annotations

from pyspark.sql import functions as F

from document_ai_spark.operators.curation import pack_sequences


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_sequences_known_values(spark):
    # token counts: doc 0 -> 3, doc 1 -> 2, doc 2 -> 0, doc 3 -> 5
    rows = [(0, "a b c"), (1, "d e"), (2, ""), (3, "f g h i j")]
    out = {r["doc_id"]: r.asDict()
           for r in pack_sequences(_docs(spark, rows), seq_len=4).collect()}
    # stream layout: [a b c | d e | f g h i j], seq_len 4
    assert out[0] == {"doc_id": 0, "n_tokens": 3, "start_offset": 0,
                      "chunk_id": 0, "chunk_pos": 0, "n_chunks": 1}
    # doc 1 starts at 3, spans tokens 3-4 -> crosses into chunk 1
    assert out[1] == {"doc_id": 1, "n_tokens": 2, "start_offset": 3,
                      "chunk_id": 0, "chunk_pos": 3, "n_chunks": 2}
    # zero-token doc occupies no stream space
    assert out[2] == {"doc_id": 2, "n_tokens": 0, "start_offset": 5,
                      "chunk_id": 1, "chunk_pos": 1, "n_chunks": 0}
    # doc 3: offset 5, 5 tokens -> positions 5..9 -> chunks 1 and 2
    assert out[3] == {"doc_id": 3, "n_tokens": 5, "start_offset": 5,
                      "chunk_id": 1, "chunk_pos": 1, "n_chunks": 2}


def test_pack_sequences_bucket_width_invariance(spark):
    # the two-pass prefix sum must give the identical global layout
    # regardless of how doc_ids are bucketed (incl. sparse/nonuniform
    # ids and a null text)
    rows = [(i * 7, "w " * (i % 5)) for i in range(40)]
    rows[11] = (rows[11][0], None)
    docs = _docs(spark, rows)
    wide = pack_sequences(docs, seq_len=8, bucket_width=10**9).collect()
    narrow = pack_sequences(docs, seq_len=8, bucket_width=3).collect()
    assert sorted(map(tuple, wide)) == sorted(map(tuple, narrow))


def test_pack_sequences_stream_is_contiguous(spark):
    rows = [(i, "t " * (i % 7)) for i in range(50)]
    out = (pack_sequences(_docs(spark, rows), seq_len=16, bucket_width=8)
           .orderBy("doc_id").collect())
    pos = 0
    for r in out:
        assert r["start_offset"] == pos
        pos += r["n_tokens"]
    total = sum(i % 7 for i in range(50))
    assert pos == total


def test_pack_sequences_plan_has_no_global_window(spark):
    # the whole point: no window-without-partition (single-task funnel);
    # the only unpartitioned window runs over the tiny per-bucket totals
    rows = [(i, "a b") for i in range(20)]
    plan = (pack_sequences(_docs(spark, rows), seq_len=4, bucket_width=4)
            ._jdf.queryExecution().executedPlan().toString())
    assert "SinglePartition" not in plan.replace(
        "Exchange SinglePartition", "", 1)  # allow exactly the carry step


# ---- epoch_shuffle: the seeded global permutation on the same two-pass
# shape ------------------------------------------------------------------

from document_ai_spark.operators.curation import epoch_shuffle  # noqa: E402


def test_epoch_shuffle_is_a_permutation(spark):
    docs = _docs(spark, [(i * 13, "x") for i in range(100)])
    out = epoch_shuffle(docs, seed=7).collect()
    assert sorted(r["shuffle_pos"] for r in out) == list(range(100))
    # every doc appears exactly once
    assert len({r["doc_id"] for r in out}) == 100


def test_epoch_shuffle_seed_and_determinism(spark):
    docs = _docs(spark, [(i, "x") for i in range(200)])
    a = {r["doc_id"]: r["shuffle_pos"]
         for r in epoch_shuffle(docs, seed=1).collect()}
    b = {r["doc_id"]: r["shuffle_pos"]
         for r in epoch_shuffle(docs, seed=1).collect()}
    c = {r["doc_id"]: r["shuffle_pos"]
         for r in epoch_shuffle(docs, seed=2).collect()}
    assert a == b                       # bit-stable under a fixed seed
    assert a != c                       # seeds give distinct permutations
    # not the identity: the hash order actually shuffles
    assert any(a[i] != i for i in range(200))


def test_epoch_shuffle_prefix_len_invariance(spark):
    docs = _docs(spark, [(i, "x") for i in range(150)])
    wide = {r["doc_id"]: r["shuffle_pos"]
            for r in epoch_shuffle(docs, seed=3, prefix_len=1).collect()}
    narrow = {r["doc_id"]: r["shuffle_pos"]
              for r in epoch_shuffle(docs, seed=3, prefix_len=4).collect()}
    assert wide == narrow


def test_pack_in_shuffled_epoch_order(spark):
    # the composition the two ops exist for: join epoch_shuffle's
    # permutation onto the corpus, pack along shuffle_pos — the stream
    # is contiguous in SHUFFLED order and covers every token exactly once
    docs = _docs(spark, [(i, "w " * (i % 6)) for i in range(60)])
    shuffled = docs.join(epoch_shuffle(docs, seed=9), "doc_id")
    out = (pack_sequences(shuffled, seq_len=16, bucket_width=10,
                          order_col="shuffle_pos")
           .join(epoch_shuffle(docs, seed=9), "doc_id")
           .orderBy("shuffle_pos").collect())
    pos = 0
    for r in out:
        assert r["start_offset"] == pos
        pos += r["n_tokens"]
    assert pos == sum(i % 6 for i in range(60))


# --- pack_interleaved: the multimodal variant over span tables --------------

_SPAN_SCHEMA = ("doc_id long, spans array<struct<kind:string,text:string,"
                "media_ref:string,offset:int>>")


def _span_docs(spark, rows):
    return spark.createDataFrame(rows, _SPAN_SCHEMA)


def test_pack_interleaved_known_values(spark):
    from document_ai_spark.operators.curation import pack_interleaved
    rows = [
        # 3 text tokens + 1 media @4 -> 7 total
        (0, [("text", "a b c", "", 0), ("media", "", "m0", 1)]),
        # media-only: 0 text, 2 media -> 8 total
        (1, [("media", None, "m1", 0), ("media", "", "m2", 1)]),
        # two text spans tokenize INDEPENDENTLY: 2 + 1 = 3
        (2, [("text", "d e", "", 0), ("text", "f", "", 1)]),
        # zero-span / NULL-span docs occupy no stream space
        (3, []),
        (4, None),
    ]
    out = {r["doc_id"]: r.asDict()
           for r in pack_interleaved(_span_docs(spark, rows), seq_len=8,
                                     media_tokens=4).collect()}
    assert out[0] == {"doc_id": 0, "n_text_tokens": 3, "n_media": 1,
                      "n_tokens": 7, "start_offset": 0, "chunk_id": 0,
                      "chunk_pos": 0, "n_chunks": 1}
    assert out[1] == {"doc_id": 1, "n_text_tokens": 0, "n_media": 2,
                      "n_tokens": 8, "start_offset": 7, "chunk_id": 0,
                      "chunk_pos": 7, "n_chunks": 2}
    assert out[2] == {"doc_id": 2, "n_text_tokens": 3, "n_media": 0,
                      "n_tokens": 3, "start_offset": 15, "chunk_id": 1,
                      "chunk_pos": 7, "n_chunks": 2}
    for d in (3, 4):
        assert out[d]["n_tokens"] == 0 and out[d]["n_chunks"] == 0
        assert out[d]["start_offset"] == 18


def test_pack_interleaved_matches_pack_sequences_on_text_only(spark):
    """With no media spans and one text span per doc, the multimodal
    packer must reduce exactly to pack_sequences."""
    from document_ai_spark.operators.curation import pack_interleaved
    texts = [(i, f"{'tok ' * (i % 6)}") for i in range(30)]
    flat = pack_sequences(_docs(spark, texts), seq_len=8, bucket_width=7)
    spans = _span_docs(
        spark, [(i, [("text", t, "", 0)]) for i, t in texts])
    multi = (pack_interleaved(spans, seq_len=8, bucket_width=7)
             .drop("n_text_tokens", "n_media"))
    assert (sorted(map(tuple, flat.collect()))
            == sorted(map(tuple, multi.collect())))


def test_pack_interleaved_bucket_width_invariance(spark):
    from document_ai_spark.operators.curation import pack_interleaved
    rows = [(i * 3, [("text", "w " * (i % 4), "", 0)]
             + ([("media", "", f"m{i}", 1)] if i % 2 else []))
            for i in range(30)]
    docs = _span_docs(spark, rows)
    wide = pack_interleaved(docs, seq_len=8, media_tokens=5,
                            bucket_width=10**9).collect()
    narrow = pack_interleaved(docs, seq_len=8, media_tokens=5,
                              bucket_width=4).collect()
    assert sorted(map(tuple, wide)) == sorted(map(tuple, narrow))
