"""Unit tests for the curation-side ops: Gopher-style repetition stats
and benchmark decontamination (operators/textquality.py,
operators/curation.py)."""
from __future__ import annotations

from pyspark.sql import functions as F

from document_ai_spark.operators.curation import (
    contamination,
    decontaminate,
    eval_ngrams,
)
from document_ai_spark.operators.textquality import repetition_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_known_values(spark):
    rows = [
        # 3 lines, "dup" line twice -> dup_line_frac = 2/3;
        # tokens: dup(x2) one two -> top bigram any count 1 over 4 tokens
        (1, "dup\ndup\none two"),
        # "a b a b a" -> bigrams: [a b, b a, a b, b a] -> top count 2 of
        # 5 tokens -> 0.8; single line, no dups
        (2, "a b a b a"),
        # symbols: 6 non-alnum chars over 2 tokens -> ratio 3.0
        (3, "$$ @@!!"),
    ]
    out = {r["doc_id"]: r.asDict()
           for r in repetition_stats(_docs(spark, rows)).collect()}
    assert abs(out[1]["dup_line_frac"] - 2 / 3) < 1e-6
    assert out[1]["top_bigram_frac"] == 0.5  # count 1 * 2 / 4 tokens
    assert out[2]["dup_line_frac"] == 0.0
    assert abs(out[2]["top_bigram_frac"] - 0.8) < 1e-6
    assert out[3]["symbol_word_ratio"] == 3.0  # 6 symbols / 2 tokens


def test_repetition_stats_degenerate_docs(spark):
    rows = [(1, ""), (2, "word"), (3, "   ")]
    out = {r["doc_id"]: r.asDict()
           for r in repetition_stats(_docs(spark, rows)).collect()}
    for d in (1, 2, 3):
        assert out[d]["dup_line_frac"] == 0.0
        assert out[d]["top_bigram_frac"] == 0.0  # < 2 tokens


def test_contamination_and_decontaminate(spark):
    evals = _docs(spark, [(100, "alpha beta gamma delta")])
    corpus = _docs(spark, [
        (1, "x alpha beta gamma y"),      # shares 3-gram "alpha beta gamma"
        (2, "beta gamma delta tail one"),  # shares "beta gamma delta"
        (3, "clean text with no overlap at all"),
        (4, "alpha beta x gamma"),         # bigram overlap only -> clean
    ])
    hits = {r["doc_id"]: r["n_hits"]
            for r in contamination(corpus, eval_ngrams(evals, 3), 3).collect()}
    assert hits == {1: 1, 2: 1}
    kept = {r["doc_id"]
            for r in decontaminate(corpus, evals, 3).collect()}
    assert kept == {3, 4}


def test_decontaminate_blocklist_is_broadcast(spark):
    evals = _docs(spark, [(100, "alpha beta gamma delta")])
    corpus = _docs(spark, [(1, "x alpha beta gamma y")])
    plan = contamination(
        corpus, eval_ngrams(evals, 3), 3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_deterministic_sample_full_fraction_and_bounds(spark):
    """fraction >= 1.0 keeps everything (the naive 2-hex-char compare
    would silently keep ~1/16); non-positive fractions raise."""
    import pytest

    from document_ai_spark.operators.curation import deterministic_sample

    docs = _docs(spark, [(i, f"doc {i}") for i in range(64)])
    assert deterministic_sample(docs, fraction=1.0).count() == 64
    assert deterministic_sample(docs, fraction=1.5).count() == 64
    with pytest.raises(ValueError):
        deterministic_sample(docs, fraction=0.0)
    # Sub-1.0 fractions stay a strict, deterministic subset.
    half = deterministic_sample(docs, fraction=0.5)
    n = half.count()
    assert 0 < n < 64
    assert half.exceptAll(docs).count() == 0


def test_line_dedup_planted(spark):
    """Canonical (min doc_id) source keeps its hot lines; later docs
    lose them; blank lines never count as hot; unique lines survive;
    a doc whose every line is hot elsewhere ends up empty."""
    from document_ai_spark.operators.curation import line_dedup

    rows = [
        (1, "cookie banner\nunique one\n\nunique two"),
        (2, "cookie banner\nits own text"),
        (3, "cookie banner"),
        (4, "\n\n"),                       # blank-only doc: untouched
        (5, "its own text\nfresh line"),   # "its own text" hot via 2/5
    ]
    out = {r["doc_id"]: r.asDict()
           for r in line_dedup(_docs(spark, rows)).collect()}
    assert len(out) == 5
    # doc 1 is the canonical source of "cookie banner": keeps everything
    assert out[1]["text_dedup"] == "cookie banner\nunique one\n\nunique two"
    assert out[1]["n_removed"] == 0 and out[1]["n_lines"] == 4
    # doc 2: banner removed (canon=1); "its own text" kept (canon=2)
    assert out[2]["text_dedup"] == "its own text"
    assert out[2]["n_removed"] == 1
    # doc 3: its only line is hot elsewhere -> empty survivor row
    assert out[3]["text_dedup"] == "" and out[3]["n_removed"] == 1
    # doc 4: blank lines are never hot
    assert out[4]["text_dedup"] == "\n\n" and out[4]["n_removed"] == 0
    assert out[4]["n_lines"] == 3
    # doc 5: loses "its own text" to doc 2, keeps its unique line
    assert out[5]["text_dedup"] == "fresh line"
    assert out[5]["n_removed"] == 1


def test_line_dedup_min_docs_threshold(spark):
    """min_docs=3: a line in only two docs is not hot."""
    from document_ai_spark.operators.curation import line_dedup

    rows = [(1, "shared"), (2, "shared"), (3, "solo")]
    out = {r["doc_id"]: r.asDict()
           for r in line_dedup(_docs(spark, rows), min_docs=3).collect()}
    assert all(out[d]["n_removed"] == 0 for d in (1, 2, 3))
    out2 = {r["doc_id"]: r.asDict()
            for r in line_dedup(_docs(spark, rows), min_docs=2).collect()}
    assert out2[1]["text_dedup"] == "shared"      # canonical keeps
    assert out2[2]["text_dedup"] == ""            # later copy dropped
    assert out2[3]["text_dedup"] == "solo"


def test_line_dedup_repeated_within_canonical_doc(spark):
    """All occurrences inside the canonical doc survive (it is the one
    source the corpus keeps); repeats inside a later doc all go."""
    from document_ai_spark.operators.curation import line_dedup

    rows = [(1, "x\nx\nbody"), (2, "x\nx\nother")]
    out = {r["doc_id"]: r.asDict()
           for r in line_dedup(_docs(spark, rows)).collect()}
    assert out[1]["text_dedup"] == "x\nx\nbody"
    assert out[2]["text_dedup"] == "other" and out[2]["n_removed"] == 2


def test_hot_lines_bucket_strip_parity(spark):
    """Per-bucket strip against the corpus-wide hot table (the
    checkpointed CLI's shape) == global line_dedup restricted to the
    bucket — the hot aggregate is computed once, never per bucket."""
    from document_ai_spark.operators.curation import (
        hot_lines,
        line_dedup,
        strip_hot_lines,
    )

    rows = [(i, f"boiler\nbody {i}" if i % 2 else f"body {i}\nboiler")
            for i in range(1, 41)]
    docs = _docs(spark, rows)
    hot = hot_lines(docs)
    bucket = docs.where(F.col("doc_id") % 3 == 1)
    got = sorted(tuple(r) for r in strip_hot_lines(bucket, hot).collect())
    want = sorted(
        tuple(r) for r in
        line_dedup(docs).join(bucket.select("doc_id"), "doc_id").collect())
    assert got == want
    # and the canonical source (doc 1) kept its copy
    full = {r["doc_id"]: r["text_dedup"] for r in line_dedup(docs).collect()}
    assert full[1] == "boiler\nbody 1"
    assert full[2] == "body 2"


def test_strip_repeated_lines_basic(spark):
    """First occurrence stays, later exact copies drop, blanks always
    stay (even repeated), order preserved."""
    from document_ai_spark.operators.curation import strip_repeated_lines

    rows = [
        (1, "alpha\nbeta\nalpha\n\ngamma\n\nbeta\nalpha"),
        (2, "single line doc"),
        (3, ""),
        (4, None),
        (5, "x\nx\nx\nx"),
    ]
    out = {r["doc_id"]: r for r in strip_repeated_lines(
        _docs(spark, rows)).collect()}
    assert out[1]["text_dedup"] == "alpha\nbeta\n\ngamma\n"
    assert out[1]["n_lines"] == 8 and out[1]["n_removed"] == 3
    assert out[2]["text_dedup"] == "single line doc"
    assert out[2]["n_removed"] == 0
    # Empty / NULL text -> one blank line, kept, nothing removed.
    for d in (3, 4):
        assert out[d]["text_dedup"] == ""
        assert out[d]["n_lines"] == 1 and out[d]["n_removed"] == 0
    assert out[5]["text_dedup"] == "x" and out[5]["n_removed"] == 3


def test_strip_repeated_lines_whitespace_only_lines_kept(spark):
    """Whitespace-only (space) lines count as blank: never removed,
    never treated as duplicates of each other."""
    from document_ai_spark.operators.curation import strip_repeated_lines

    out = strip_repeated_lines(
        _docs(spark, [(1, "a\n \n \na")])).collect()[0]
    assert out["text_dedup"] == "a\n \n "
    assert out["n_removed"] == 1


def test_strip_repeated_lines_composes_with_hot_lines(spark):
    """Same output contract as strip_hot_lines, so the corpus-level and
    intra-doc passes chain: corpus boilerplate first, then within-doc
    repeats on the rebuilt text."""
    from document_ai_spark.operators.curation import (
        hot_lines,
        strip_hot_lines,
        strip_repeated_lines,
    )

    rows = [
        (1, "BANNER\ncontent one\ncontent one"),
        (2, "BANNER\ncontent two"),
    ]
    docs = _docs(spark, rows)
    pass1 = strip_hot_lines(docs, hot_lines(docs, min_docs=2)).select(
        "doc_id", F.col("text_dedup").alias("text"))
    out = {r["doc_id"]: r for r in strip_repeated_lines(pass1).collect()}
    # doc 1 keeps its canonical BANNER (min doc_id) and one content line.
    assert out[1]["text_dedup"] == "BANNER\ncontent one"
    assert out[1]["n_removed"] == 1
    # doc 2's BANNER was corpus-stripped; nothing repeats within it.
    assert out[2]["text_dedup"] == "content two"
    assert out[2]["n_removed"] == 0


def test_strip_repeated_lines_matches_python_reference(spark):
    """Seeded fuzz: 60 random multi-line texts (repeats, blanks,
    space-only lines, CJK, empty) — Spark must match the obvious
    pure-Python first-occurrence filter. NOTE the blank rule is
    ASCII-space trim (Spark/DuckDB `trim` semantics), so the reference
    uses strip(' '), not strip()."""
    import random

    from document_ai_spark.operators.curation import strip_repeated_lines

    rng = random.Random(1234)
    pool = ["alpha", "beta", "gamma", "", " ", "  ", "文字",
            "x y", "alpha", "tab\there"]
    texts = []
    for _ in range(60):
        n = rng.randint(0, 12)
        texts.append("\n".join(rng.choice(pool) for _ in range(n))
                     if n else rng.choice(["", None]))

    rows = [(i, t) for i, t in enumerate(texts)]
    got = {r["doc_id"]: (r["text_dedup"], r["n_lines"], r["n_removed"])
           for r in strip_repeated_lines(
               spark.createDataFrame(rows, "doc_id long, text string")
           ).collect()}

    for i, t in enumerate(texts):
        ls = (t or "").split("\n")
        kept = [l for j, l in enumerate(ls)
                if l.strip(" ") == "" or ls.index(l) == j]
        want = ("\n".join(kept), len(ls), len(ls) - len(kept))
        assert got[i] == want, (i, repr(t), got[i], want)
