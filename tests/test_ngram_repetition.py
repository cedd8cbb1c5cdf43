"""Semantic tests for ngram_repetition (operators/textquality.py):
Gopher Table A1 top-n-gram / duplicate-n-gram character fractions.
Engine parity is pinned by tests/test_entry_oracle.py."""
from __future__ import annotations

import pytest

from document_ai_spark.operators.textquality import (
    GOPHER_DUP_NGRAM_MAX,
    GOPHER_TOP_NGRAM_MAX,
    ngram_repetition,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def out(spark):
    rows = [
        (0, "the cat sat on the mat and then the cat sat on the mat"),
        (1, "spam ham " * 20),                    # total repetition
        (2, "all words here are unique tokens without any repeats"),
        (3, "ab cd " * 3 + "unique tail words go here now"),
        (4, "solo"),                              # 1 token: no n>=2 gram
        (5, "   "),                               # 0 tokens: no row
    ]
    o = ngram_repetition(_df(spark, rows))
    return {r["doc_id"]: r.asDict() for r in o.collect()}


def test_short_and_empty_docs_have_no_row(out):
    assert 4 not in out and 5 not in out


def test_unique_doc_scores_zero_everywhere(out):
    d = out[2]
    for n in (2, 3, 4):
        assert d[f"top{n}_char_frac"] == 0.0
    for n in (5, 6, 7, 8, 9, 10):
        assert d[f"dup{n}_char_frac"] == 0.0
    assert d["rep_keep"] is True


def test_total_repetition_rejected(out):
    d = out[1]
    # "spam ham" repeated: every 5-gram occurrence is a duplicate.
    assert d["dup5_char_frac"] == 1.0
    assert d["top2_char_frac"] >= 1.0  # overlap pushes past 1 (Gopher)
    assert d["rep_keep"] is False


def test_top_bigram_char_math_exact(out):
    # doc 3: "ab cd" x3 then 6 unique words. top bigram "ab cd"
    # (count 3, 4 chars); also "cd ab" occurs twice (4 chars).
    # tc = 3*4 + len("unique tail words go here now" tokens) = 12 + 24.
    d = out[3]
    assert d["top2_char_frac"] == round(3 * 4 / 36.0, 6)


def test_partial_repetition_measured_not_total(out):
    d = out[0]
    # "the cat sat on the mat" repeats -> 5-gram dups present but the
    # middle "and then" break keeps the frac strictly inside (0, 1).
    assert 0.0 < d["dup5_char_frac"] < 1.0
    # top bigram "the cat"/"cat sat"/... all count 2; frac well under 1
    assert 0.0 < d["top2_char_frac"] < 0.5


def test_published_thresholds_are_the_gate(spark):
    # A doc whose ONLY violation is dup10: 11-token sentence repeated
    # twice with unique padding sized so every other rule stays under
    # its threshold.
    sent = "alpha bravo charlie delta echo foxtrot golf hotel india " \
           "juliet kilo"
    pad = " ".join(f"pad{i}word{i}" for i in range(160))
    rows = [(0, f"{sent} {pad} {sent}")]
    d = ngram_repetition(_df(spark, rows)).collect()[0].asDict()
    assert d["dup10_char_frac"] > 0.0
    viol = [n for n in (2, 3, 4)
            if d[f"top{n}_char_frac"] > GOPHER_TOP_NGRAM_MAX[n]]
    viol += [n for n in (5, 6, 7, 8, 9, 10)
             if d[f"dup{n}_char_frac"] > GOPHER_DUP_NGRAM_MAX[n]]
    assert d["rep_keep"] is (len(viol) == 0)


def test_custom_n_subsets(spark):
    rows = [(0, "x y x y x y x y some other words to vary the text")]
    o = ngram_repetition(_df(spark, rows), ns_top=(2,), ns_dup=(5,))
    cols = o.columns
    assert cols == ["doc_id", "top2_char_frac", "dup5_char_frac",
                    "rep_keep"]


def test_plan_single_scan_no_python(spark):
    rows = [(0, "a b c d e f g h i j k l m n o p")]
    plan = ngram_repetition(_df(spark, rows))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
