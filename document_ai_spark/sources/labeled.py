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
