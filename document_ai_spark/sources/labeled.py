"""Labeled micro-corpus for calibrating the quality gates.

Four deterministic document classes, mirroring the failure modes a
pretraining-quality pipeline filters (and the one class it keeps):

  * ``natural``     — sentence-like lines: stopwords interleaved with a
                      shared content vocabulary; distinct lines, low
                      repetition, common words (high unigram logprob).
  * ``salad``       — word salad: globally-unique gibberish tokens, no
                      stopwords; every token is corpus-rare, so the
                      unigram LM scores it far below natural text.
  * ``boilerplate`` — nav/footer chrome: 1-2 distinct lines repeated
                      many times (high dup_line_frac).
  * ``repetition``  — bigram bombs ("price trade price trade ...",
                      high top_bigram_frac) — the Gopher repetition
                      filter's target.

Everything derives from (doc index, seed) so both the calibration
script and the precision-floor tests see the identical corpus.
"""
from __future__ import annotations

import random
from typing import List, Tuple

LABELS = ["natural", "salad", "boilerplate", "repetition"]

_CONTENT = ["market", "harvest", "tractor", "village", "river", "field",
            "engine", "credit", "season", "farmer", "road", "water",
            "crop", "price", "trade", "grain", "storage", "loan"]
_STOPS = ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"]
_NAV = ["home", "about", "contact", "privacy", "terms", "login",
        "search", "cart", "help", "sitemap"]


def _rng(i: int, seed: int) -> random.Random:
    return random.Random((seed << 32) ^ (i * 2654435761 % (1 << 61)))


def _natural(rng: random.Random) -> str:
    lines = []
    for _ in range(rng.randint(3, 6)):
        words = []
        for _ in range(rng.randint(12, 25)):
            pool = _STOPS if rng.random() < 0.4 else _CONTENT
            words.append(rng.choice(pool))
        lines.append(" ".join(words))
    return "\n".join(lines)


def _salad(rng: random.Random, i: int) -> str:
    # token suffix x<i> makes every token globally unique -> wc == 1
    n = rng.randint(30, 80)
    return " ".join(
        f"{''.join(rng.choices('bcdfghjklmnpqrstvwxz', k=6))}x{i}"
        for _ in range(n))


def _boilerplate(rng: random.Random) -> str:
    line = " ".join(rng.sample(_NAV, k=rng.randint(3, 5)))
    reps = rng.randint(6, 12)
    return "\n".join([line] * reps + ["copyright all rights reserved"])


def _repetition(rng: random.Random) -> str:
    a, b = rng.sample(_CONTENT, 2)
    return (f"{a} {b} " * rng.randint(20, 40)).strip()


def gen_labeled_local(n_per_class: int = 100, seed: int = 42
                      ) -> List[Tuple[str, str, str, str, str]]:
    """[(doc_id, text, lang, source, label)] — source doubles as label
    so the corpus drops into the documents(doc_id, text, lang, source)
    shape unchanged."""
    rows = []
    i = 0
    for label in LABELS:
        for _ in range(n_per_class):
            rng = _rng(i, seed)
            if label == "natural":
                text = _natural(rng)
            elif label == "salad":
                text = _salad(rng, i)
            elif label == "boilerplate":
                text = _boilerplate(rng)
            else:
                text = _repetition(rng)
            rows.append((f"doc{i:05d}", text, "en", label, label))
            i += 1
    return rows


LABELED_SCHEMA = ("doc_id string, text string, lang string, "
                  "source string, label string")


# Common-char pool for zh natural text: the first few act as high-
# frequency "stopword" chars, the rest as content chars — giving the
# char-token slice a skewed frequency profile like real text.
_ZH_COMMON = list("的一是在不了有和人这中大为上个国我以要他时来用们"
                  "生到作地于出就分对成会可主发年动同工也能下过子说")


def _zh_natural(rng: random.Random) -> str:
    chars = []
    for _ in range(rng.randint(40, 90)):
        # 40% from the frequent head, 60% from the whole pool.
        pool = _ZH_COMMON[:8] if rng.random() < 0.4 else _ZH_COMMON
        chars.append(rng.choice(pool))
    return "".join(chars)


def _zh_salad(rng: random.Random) -> str:
    # Random draws across the full unified-ideograph block: with a few
    # thousand draws over ~21k chars nearly every char is corpus-unique,
    # so the unigram LM scores these docs far below zh natural text.
    return "".join(chr(rng.randint(0x4E00, 0x9FFF))
                   for _ in range(rng.randint(40, 90)))


def gen_labeled_mixed_local(n_natural: int = 80, n_salad: int = 16,
                            seed: int = 7) -> List[Tuple[str, str, str,
                                                         str, str]]:
    """Mixed-LANGUAGE labeled corpus for per-slice logprob calibration:
    two (lang, source) slices — ('en','web') word tokens, ('zh','web')
    char tokens — each with natural majority and a salad minority
    (n_salad/n_natural contamination; the slice floor rule assumes
    salad is a minority outlier mass). Labels ride in column 5; both
    slices share source='web' so the slice key is genuinely (lang,
    source), unlike gen_labeled_local where source doubles as label."""
    rows = []
    i = 0
    for lang in ("en", "zh"):
        for label, n in (("natural", n_natural), ("salad", n_salad)):
            for _ in range(n):
                rng = _rng(i + 10_000, seed)
                if lang == "en":
                    text = _natural(rng) if label == "natural" \
                        else _salad(rng, i)
                else:
                    text = _zh_natural(rng) if label == "natural" \
                        else _zh_salad(rng)
                rows.append((f"mx{i:05d}", text, lang, "web", label))
                i += 1
    return rows
