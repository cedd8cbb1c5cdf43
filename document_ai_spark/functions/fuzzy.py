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


class PartialRatioScorer:
    """Scores many needles against ONE haystack with shared difflib state.

    Two exactness-preserving accelerations over calling
    :func:`partial_ratio` in a loop (identical results, verified by
    property tests):

    1. ``SequenceMatcher`` computes and caches the b-side index (b2j) —
       the expensive O(len) pass over the long text — so scoring 24
       masters against a 50 KB document builds it once, not 24 times.
    2. ``score_upper_bound``: a numpy sliding-window character-bag bound.
       difflib's matched-char count M over any window w can't exceed the
       multiset character overlap, so ratio <= 2*bag(w)/(len_m+len_w);
       when even the best window's bound rounds below the needed score,
       difflib is provably unnecessary.
    """

    # Bound pass only pays off when difflib's O(len) work dominates the
    # numpy setup — i.e. on long-tail (media-heavy) documents.
    BOUND_MIN_TEXT = 4096

    def __init__(self, text_upper: str) -> None:
        self.text = text_upper
        self._sm = SequenceMatcher(None, "", text_upper)
        self._codes = None        # lazy numpy view of the text
        self._cs_cache: dict = {}  # per-char prefix sums (shared by needles)
        self._win_cache: dict = {}  # per-needle-length window geometry

    def _text_codes(self):
        if self._codes is None:
            import numpy as np
            self._codes = np.frombuffer(
                self.text.encode("utf-32-le"), dtype=np.uint32)
        return self._codes

    def _char_cumsum(self, ch: str):
        cs = self._cs_cache.get(ch)
        if cs is None:
            import numpy as np
            ind = (self._text_codes() == ord(ch))
            cs = np.concatenate(
                ([0], np.cumsum(ind, dtype=np.int32)))
            self._cs_cache[ch] = cs
        return cs

    def _window_geometry(self, n_len: int):
        geo = self._win_cache.get(n_len)
        if geo is None:
            import numpy as np
            t_len = len(self.text)
            starts = np.arange(t_len, dtype=np.int32)
            hi = np.minimum(starts + n_len, t_len)
            win_len = hi - starts
            geo = (hi, n_len + win_len)  # (window ends, denominators)
            self._win_cache[n_len] = geo
        return geo

    def score_upper_bound(self, needle_upper: str) -> float:
        """Max over all windows of 2*bag_overlap/(len_n + len_w), in
        [0, 1]. Valid whenever len(needle) <= len(text): difflib's matched
        chars over a window can't exceed the multiset char overlap."""
        import numpy as np
        from collections import Counter

        n_len, t_len = len(needle_upper), len(self.text)
        if n_len == 0 or t_len == 0:
            return 0.0
        hi, denom = self._window_geometry(n_len)
        overlap = np.zeros(t_len, dtype=np.int32)
        for ch, c_n in Counter(needle_upper).items():
            cs = self._char_cumsum(ch)
            win = cs[hi] - cs[:t_len]
            overlap += np.minimum(win, c_n)
        return float((2.0 * overlap / denom).max(initial=0.0))

    def score(self, needle_upper: str,
              needed: Optional[int] = None) -> int:
        """partial_ratio(needle, text). If ``needed`` is given and even a
        perfect-window bound can't reach it, returns 0 without running
        difflib (exact: the true score provably couldn't have won)."""
        text = self.text
        if needle_upper == text:
            return 100
        if not needle_upper or not text:
            return 0
        if len(needle_upper) > len(text):
            # Roles swap; rare (tiny docs) — fall back to the plain form.
            return partial_ratio(needle_upper, text)
        if needle_upper in text:
            return 100
        if needed is not None and len(text) >= self.BOUND_MIN_TEXT:
            if 100.0 * self.score_upper_bound(needle_upper) + 0.5 < needed:
                return 0
        self._sm.set_seq1(needle_upper)
        best = 0.0
        for block in self._sm.get_matching_blocks():
            long_start = max(block.b - block.a, 0)
            long_substr = text[long_start:long_start + len(needle_upper)]
            r = SequenceMatcher(None, needle_upper, long_substr).ratio()
            if r > 0.995:
                return 100
            if r > best:
                best = r
        return int(round(100 * best))


def best_partial_match(
    text_upper: str, masters: Sequence[str], min_score: int,
    scorer: Optional[PartialRatioScorer] = None,
) -> Tuple[Optional[str], int]:
    """Argmax of partial_ratio(master, text) over a master list.

    Mirrors the reference loop (field_extractor.py:244-266): strictly-greater
    comparison keeps the FIRST list entry on ties; scores below ``min_score``
    never win. Returns (master or None, score).

    Early break once a master scores 100: no later master can STRICTLY
    exceed it, so the result is provably identical — this halves the
    difflib work on corpora where the entity appears verbatim. Pass a
    shared ``scorer`` to amortize the text index across several master
    lists.
    """
    scorer = scorer or PartialRatioScorer(text_upper)
    best_match: Optional[str] = None
    best_score = 0
    for master in masters:
        # A score only matters if strictly above best AND >= min_score.
        needed = max(min_score, best_score + 1)
        score = scorer.score(master.upper(), needed=needed)
        if score > best_score and score >= min_score:
            best_score = score
            best_match = master
            if best_score == 100:
                break
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
