"""Fuzzy string scoring with fuzzywuzzy-compatible semantics.

The reference scores dealer/model candidates with ``fuzz.ratio`` and
``fuzz.partial_ratio`` (reference backend/services/field_extractor.py:245,259,
431,444; backend/services/document_processor.py:484-489). fuzzywuzzy's
pure-python mode is a thin wrapper over ``difflib.SequenceMatcher``; we
re-implement that contract directly on difflib (stdlib, deterministic):

    ratio(a, b)          = int(round(100 * SequenceMatcher(None,a,b).ratio()))
    partial_ratio(a, b)  = best ratio of the shorter string against
                           len(shorter)-sized windows of the longer string,
                           windows anchored at difflib matching blocks.

Both the oracle and the Spark pandas-UDF stage import these functions, so
golden-test parity does not depend on any third-party fuzz library.
"""
from __future__ import annotations

from difflib import SequenceMatcher
from typing import Optional, Sequence, Tuple


def ratio(s1: str, s2: str) -> int:
    """fuzz.ratio-compatible similarity in [0, 100]."""
    if not s1 and not s2:
        return 100
    m = SequenceMatcher(None, s1, s2)
    return int(round(100 * m.ratio()))


def partial_ratio(s1: str, s2: str) -> int:
    """fuzz.partial_ratio-compatible best-window similarity in [0, 100]."""
    if s1 == s2:
        return 100
    if not s1 or not s2:
        return 0
    shorter, longer = (s1, s2) if len(s1) <= len(s2) else (s2, s1)
    # Fast path: verbatim containment is a perfect block match -> 100.
    if shorter in longer:
        return 100

    m = SequenceMatcher(None, shorter, longer)
    blocks = m.get_matching_blocks()
    best = 0.0
    for block in blocks:
        long_start = max(block.b - block.a, 0)
        long_end = long_start + len(shorter)
        long_substr = longer[long_start:long_end]
        m2 = SequenceMatcher(None, shorter, long_substr)
        r = m2.ratio()
        if r > 0.995:
            return 100
        if r > best:
            best = r
    return int(round(100 * best))


def best_partial_match(
    text_upper: str, masters: Sequence[str], min_score: int
) -> Tuple[Optional[str], int]:
    """Argmax of partial_ratio(master, text) over a master list.

    Mirrors the reference loop (field_extractor.py:244-266): strictly-greater
    comparison keeps the FIRST list entry on ties; scores below ``min_score``
    never win. Returns (master or None, score).
    """
    best_match: Optional[str] = None
    best_score = 0
    for master in masters:
        score = partial_ratio(master.upper(), text_upper)
        if score > best_score and score >= min_score:
            best_score = score
            best_match = master
    return best_match, best_score


def best_full_match(
    value_upper: str, masters: Sequence[str], min_score: int
) -> Tuple[Optional[str], int]:
    """First master with fuzz.ratio >= min_score (validation semantics,
    field_extractor.py:429-452: the reference breaks on the FIRST master
    clearing the threshold, not the argmax)."""
    for master in masters:
        score = ratio(value_upper, master.upper())
        if score >= min_score:
            return master, score
    return None, 0
