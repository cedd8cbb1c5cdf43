"""strip_dup_spans (ExactSubstr removal form): keeper keeps all
occurrences, non-keepers lose exactly the covered token positions,
coverage is exact under window overlap."""
from __future__ import annotations

import pytest

from document_ai_spark.operators.curation import strip_dup_spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_keeper_keeps_nonkeeper_stripped(spark):
    shared = "alpha beta gamma delta epsilon"          # one w=5 window
    rows = [(0, shared + " zeta eta theta iota kappa"),
            (1, "one two three " + shared),
            (2, "solo words only here now")]
    out = {r["doc_id"]: r for r in
           strip_dup_spans(_docs(spark, rows), w=5).collect()}
    # doc 0 is the keeper (min doc_id): untouched
    assert out[0]["n_removed_tokens"] == 0
    assert out[0]["text_dedup"] == rows[0][1]
    # doc 1 loses exactly the five shared tokens
    assert out[1]["n_removed_tokens"] == 5
    assert out[1]["text_dedup"] == "one two three"
    assert out[1]["removed_frac"] == round(5 / 8, 6)
    # doc 2 has no hot window
    assert out[2]["n_removed_tokens"] == 0


def test_overlapping_windows_do_not_double_count(spark):
    # Six shared tokens = two overlapping 5-token hot windows in the
    # non-keeper; covered positions union to 6, not 10.
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [(0, shared), (1, "prefix " + shared)]
    out = {r["doc_id"]: r for r in
           strip_dup_spans(_docs(spark, rows), w=5).collect()}
    assert out[1]["n_removed_tokens"] == 6
    assert out[1]["text_dedup"] == "prefix"


def test_short_docs_whole_doc_window(spark):
    # Docs under w tokens fingerprint as ONE whole-doc window: exact
    # duplicates collapse, near-misses (different first word) do not.
    rows = [(0, "tiny shared doc"), (1, "tiny shared doc"),
            (2, "other shared doc")]
    out = {r["doc_id"]: r for r in
           strip_dup_spans(_docs(spark, rows), w=5).collect()}
    assert out[0]["text_dedup"] == "tiny shared doc"    # keeper
    assert out[1]["text_dedup"] == ""                   # exact dup gone
    assert out[1]["removed_frac"] == 1.0
    assert out[2]["n_removed_tokens"] == 0


def test_every_doc_keeps_a_row(spark):
    rows = [(0, ""), (1, None), (2, "a b c d e f g")]
    out = strip_dup_spans(_docs(spark, rows), w=5).collect()
    assert {r["doc_id"] for r in out} == {0, 1, 2}
    assert all(r["n_removed_tokens"] == 0 for r in out)
