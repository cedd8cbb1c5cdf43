"""PartialRatioScorer must be bit-identical to the plain partial_ratio
(it's an indexing optimization, not a semantics change)."""
from __future__ import annotations

from hypothesis import given, settings, strategies as st

from document_ai_spark import constants as C
from document_ai_spark.functions.fuzzy import (
    PartialRatioScorer,
    best_partial_match,
    partial_ratio,
)

WORDS = ["tractor", "swaraj", "mahindra", "kubota", "total", "744", "fe",
         "ltd", "sales", "xyz", "एचपी"]


@st.composite
def texts(draw):
    words = draw(st.lists(st.sampled_from(WORDS), min_size=0, max_size=60))
    return " ".join(words).upper()


@settings(max_examples=200, deadline=None)
@given(texts())
def test_scorer_equals_partial_ratio(text):
    scorer = PartialRatioScorer(text)
    for master in C.DEALER_MASTER + C.MODEL_MASTER:
        assert scorer.score(master.upper()) == \
            partial_ratio(master.upper(), text), (master, text)


@settings(max_examples=100, deadline=None)
@given(texts())
def test_best_match_with_and_without_scorer(text):
    scorer = PartialRatioScorer(text)
    for masters, thr in ((C.DEALER_MASTER, 70), (C.MODEL_MASTER, 75)):
        with_s = best_partial_match(text, masters, thr, scorer=scorer)
        without = best_partial_match_reference(text, masters, thr)
        assert with_s == without


def best_partial_match_reference(text_upper, masters, min_score):
    """The unoptimized reference loop (no early break, no shared index)."""
    best_match, best_score = None, 0
    for master in masters:
        score = partial_ratio(master.upper(), text_upper)
        if score > best_score and score >= min_score:
            best_score = score
            best_match = master
    return best_match, best_score


def test_needle_longer_than_text_falls_back():
    assert PartialRatioScorer("AB").score("ABCDEFGH") == \
        partial_ratio("ABCDEFGH", "AB")
