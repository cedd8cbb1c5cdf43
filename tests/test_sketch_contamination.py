"""Unit tests for sketch_contamination / decontaminate_fuzzy
(operators/curation.py): MinHash-LSH fuzzy benchmark decontamination —
the paraphrase-robust complement of the exact n-gram blocklist."""
from __future__ import annotations

from pyspark.sql import functions as F

from document_ai_spark.operators.curation import (
    contamination,
    decontaminate_fuzzy,
    eval_ngrams,
    sketch_contamination,
)

_EVAL = ("which planet in the solar system has the most moons "
         "and how many of them were discovered after the year "
         "two thousand by ground based telescopes")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_verbatim_and_near_verbatim_hit(spark):
    # doc 2 = eval text with ONE word changed; doc 3 unrelated
    docs = _docs(spark, [
        (1, _EVAL),
        (2, _EVAL.replace("telescopes", "observatories")),
        (3, "the quarterly revenue of the company rose by twelve "
            "percent compared to the previous fiscal year overall"),
    ])
    evals = _docs(spark, [(100, _EVAL)])
    out = {r["doc_id"]: r.asDict()
           for r in sketch_contamination(docs, evals).collect()}
    assert out[1]["max_jaccard"] == 1.0       # verbatim copy
    assert out[1]["n_evals_hit"] == 1
    assert 2 in out and out[2]["max_jaccard"] >= 0.5   # paraphrase hit
    assert 3 not in out                        # unrelated doc clean


def test_catches_what_exact_ngrams_can_rule_out(spark):
    # every 5th word changed: the longest unchanged run is 4 words, so
    # NO word-5-gram survives and the exact blocklist is blind — but
    # ~40% of 3-gram shingles survive, and 8x1 banding at a low
    # threshold still flags the doc. The case that motivates the fuzzy
    # pass existing next to the exact one.
    words = _EVAL.split()
    mutated = " ".join(
        w.upper() + "x" if i % 5 == 0 else w for i, w in enumerate(words))
    docs = _docs(spark, [(1, mutated)])
    evals = _docs(spark, [(100, _EVAL)])
    exact = contamination(docs, eval_ngrams(evals, n=5), n=5).collect()
    assert exact == []                         # 5-gram blocklist blind
    fuzzy = sketch_contamination(docs, evals, jaccard_min=0.1,
                                 bands=8, rows=1).collect()
    assert [r["doc_id"] for r in fuzzy] == [1]


def test_decontaminate_fuzzy_drops_hits_only(spark):
    docs = _docs(spark, [
        (1, _EVAL),
        (2, "completely unrelated content about cooking pasta with "
            "fresh basil and ripe tomatoes from the garden today"),
        (3, None),
        (4, ""),
    ])
    evals = _docs(spark, [(100, _EVAL)])
    kept = sorted(r["doc_id"]
                  for r in decontaminate_fuzzy(docs, evals).collect())
    assert kept == [2, 3, 4]   # null/empty docs can't be contaminated


def test_corpus_side_never_shuffles(spark):
    # the design claim: eval side broadcasts; the corpus reaches the
    # band join without an exchange (only the final per-doc aggregate
    # shuffles, and it shuffles candidates, not the corpus)
    docs = _docs(spark, [(i, f"some words here number {i}")
                         for i in range(50)])
    evals = _docs(spark, [(100, _EVAL)])
    plan = (sketch_contamination(docs, evals)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


# -- corpus_overlap / novel_docs (big-vs-big member of the family) -----------

def test_corpus_overlap_finds_planted_mutations(spark):
    from document_ai_spark.operators.dedup import corpus_overlap, novel_docs
    a = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta"),
         (1, "totally different content about other things entirely"),
         (2, "third document with its own unique words here")],
        "doc_id long, text string")
    # b0 near-dups a0 (one word dropped); b1 is unrelated
    b = spark.createDataFrame(
        [(100, "beta gamma delta epsilon zeta eta theta"),
         (101, "nothing in common with anything above at all")],
        "doc_id long, text string")
    hits = {r["doc_id"]: r for r in
            corpus_overlap(a, b, jaccard_min=0.5).collect()}
    assert set(hits) == {0}
    assert hits[0]["n_b_matches"] == 1
    assert hits[0]["max_jaccard"] >= 0.5
    novel = {r["doc_id"] for r in novel_docs(a, b).collect()}
    assert novel == {1, 2}


def test_corpus_overlap_multi_match_counts_distinct(spark):
    from document_ai_spark.operators.dedup import corpus_overlap
    text = "one two three four five six seven eight nine ten"
    a = spark.createDataFrame([(0, text)], "doc_id long, text string")
    # three near-identical B copies -> n_b_matches counts each ONCE even
    # though every (band, copy) collision reaches the aggregate
    b = spark.createDataFrame(
        [(100, text), (101, text), (102, text + " eleven")],
        "doc_id long, text string")
    r = corpus_overlap(a, b, jaccard_min=0.5).collect()
    assert len(r) == 1 and r[0]["n_b_matches"] == 3
    assert r[0]["max_jaccard"] == 1.0


def test_corpus_overlap_b_bucket_cap_bounds_matches(spark):
    from document_ai_spark.operators.dedup import corpus_overlap
    text = "spam spam spam spam spam spam"
    a = spark.createDataFrame([(0, text)], "doc_id long, text string")
    b = spark.createDataFrame(
        [(100 + i, text) for i in range(40)], "doc_id long, text string")
    r = corpus_overlap(a, b, jaccard_min=0.0, max_bucket=5).collect()
    # deterministic min-id prefix of each bucket survives the cap
    assert len(r) == 1 and r[0]["n_b_matches"] == 5
