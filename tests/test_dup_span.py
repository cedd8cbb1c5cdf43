"""dup_span_stats (operators/curation.py) — the Lee et al. 2022
ExactSubstr doc-level signal: token coverage by cross-doc duplicated
w-token windows, exact under window overlap."""
import pytest
from pyspark.sql import functions as F

from document_ai_spark.operators.curation import dup_span_stats


def _stats(spark, rows, w=4, min_docs=2):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dup_span_stats(df, w=w, min_docs=min_docs).orderBy("doc_id")
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_planted_shared_run_exact_coverage(spark):
    # docs 1/2 share the 6-token run "q w e r t y" at different offsets;
    # the rest of each doc is unique. w=4 -> 3 hot windows per doc
    # (starts inside the run), covering exactly the 6 shared tokens.
    rows = [
        (1, "a1 b1 c1 q w e r t y d1 e1"),
        (2, "x2 q w e r t y y2 z2 w2 v2"),
        (3, "m3 n3 o3 p3 r3 s3 t3 u3 v3 w3 x3"),
    ]
    s = _stats(spark, rows, w=4)
    for d in (1, 2):
        assert s[d]["n_tokens"] == 11
        assert s[d]["n_windows"] == 8
        assert s[d]["n_dup_windows"] == 3
        # overlap counted once: 3 windows x 4 tokens cover 6 distinct
        assert s[d]["dup_span_frac"] == round(6 / 11, 6)
    assert s[3]["n_dup_windows"] == 0 and s[3]["dup_span_frac"] == 0.0


def test_short_doc_full_dup_and_zero_token(spark):
    # short docs (< w tokens) form ONE whole-doc window; an exact pair
    # of them is fully covered. Zero-token docs survive with zeros.
    rows = [(1, "tiny pair"), (2, "tiny pair"), (3, "   "), (4, "")]
    s = _stats(spark, rows, w=4)
    for d in (1, 2):
        assert (s[d]["n_tokens"], s[d]["n_windows"],
                s[d]["n_dup_windows"], s[d]["dup_span_frac"]) == (2, 1, 1, 1.0)
    for d in (3, 4):
        assert (s[d]["n_tokens"], s[d]["n_windows"],
                s[d]["n_dup_windows"], s[d]["dup_span_frac"]) == (0, 0, 0, 0.0)


def test_within_doc_repeat_not_hot(spark):
    # the same window repeated inside ONE doc is repetition_stats'
    # business, not cross-doc duplication: min_docs counts distinct docs.
    rows = [
        (1, "u v w x u v w x"),  # window "u v w x" occurs twice, one doc
        (2, "k2 l2 m2 n2 o2 p2"),
    ]
    s = _stats(spark, rows, w=4)
    assert s[1]["n_dup_windows"] == 0 and s[1]["dup_span_frac"] == 0.0


def test_every_input_doc_has_a_row(spark):
    rows = [(i, f"only doc {i} words here") for i in range(20)] + [(99, "")]
    s = _stats(spark, rows, w=4)
    assert set(s) == set(range(20)) | {99}


def test_null_text_is_zero_tokens(spark):
    rows = [(1, None), (2, "pair of words"), (3, "pair of words")]
    s = _stats(spark, rows, w=4)
    assert (s[1]["n_tokens"], s[1]["n_windows"],
            s[1]["n_dup_windows"], s[1]["dup_span_frac"]) == (0, 0, 0, 0.0)
    assert s[2]["dup_span_frac"] == 1.0
