"""Semantic tests for the published-heuristic selection operators
(operators/selection.py): Gopher rule flags on planted pathologies,
CCNet bucket thirds + monotonicity, DSIR target-likeness ordering and
deterministic Gumbel resampling. Engine parity is separately pinned by
tests/test_entry_oracle.py (gopher_rules / perplexity_buckets /
dsir_weights / dsir_sample rows)."""
from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from document_ai_spark.operators.selection import (
    dsir_logweights,
    dsir_sample,
    gopher_rules,
    perplexity_buckets,
)

GOOD = ("the quick brown fox jumps over the lazy dog and then runs to "
        "town with a friend to be sure that all of the words have good "
        "shape and that the line keeps going for long enough to clear "
        "the fifty word floor set by the gopher rules paper so we add "
        "more plain words here") * 1


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, "
                                       "lang string, source string")


@pytest.fixture(scope="module")
def gopher_out(spark):
    rows = [
        (0, GOOD, "en", "s"),
        (1, "too short to pass", "en", "s"),                 # < 50 words
        (2, "\n".join(f"- bullet item {i} of the list with that have "
                      f"to be of and" for i in range(20)), "en", "s"),
        (3, "\n".join(f"trailing thought number {i} of the set that "
                      f"have to be with and..." for i in range(20)),
         "en", "s"),
        (4, GOOD + " " + "#" * 40, "en", "s"),               # symbol bomb
        (5, " ".join("123456" for _ in range(60)), "en", "s"),  # no alpha
        (6, " ".join("zzz" for _ in range(60)), "en", "s"),  # no stopwords
    ]
    out = gopher_rules(_df(spark, rows))
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_gopher_good_doc_keeps(gopher_out):
    assert gopher_out[0]["gopher_keep"] is True
    assert all(gopher_out[0][f] for f in
               ("ok_words", "ok_mwl", "ok_symbols", "ok_bullets",
                "ok_ellipsis", "ok_alpha", "ok_stops"))


def test_gopher_each_rule_fires_alone(gopher_out):
    assert gopher_out[1]["ok_words"] is False
    assert gopher_out[2]["ok_bullets"] is False
    assert gopher_out[2]["bullet_frac"] == 1.0
    assert gopher_out[3]["ok_ellipsis"] is False
    assert gopher_out[3]["ellipsis_frac"] == 1.0
    assert gopher_out[4]["ok_symbols"] is False
    assert gopher_out[5]["ok_alpha"] is False
    assert gopher_out[5]["alpha_frac"] == 0.0
    assert gopher_out[6]["ok_stops"] is False
    assert gopher_out[6]["stop_hits"] == 0
    for d in (1, 2, 3, 4, 5, 6):
        assert gopher_out[d]["gopher_keep"] is False


def test_gopher_zero_token_doc_is_safe(spark):
    out = gopher_rules(_df(spark, [(0, "   ", "en", "s")])).collect()[0]
    assert out["n_words"] == 0
    assert out["mean_word_len"] == 0.0
    assert out["gopher_keep"] is False


def test_perplexity_buckets_thirds_and_monotone(spark):
    # 30 natural-ish docs + reuse of shared vocab; per lang the thirds
    # must be ~equal and every head logprob >= every tail logprob.
    rows = []
    for i in range(30):
        lang = "en" if i % 2 == 0 else "fr"
        # vary naturalness: low i repeats common words, high i uses
        # one-off rare tokens -> lower unigram logprob.
        common = " ".join("alpha beta gamma".split() * 5)
        rare = " ".join(f"rare{i}x{j}" for j in range(i))
        rows.append((i, (common + " " + rare).strip(), lang, "s"))
    out = perplexity_buckets(_df(spark, rows)).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        counts = {b: sum(1 for r in rs if r["ppl_bucket"] == b)
                  for b in ("head", "middle", "tail")}
        assert max(counts.values()) - min(counts.values()) <= 1, counts
        heads = [r["unigram_logprob"] for r in rs
                 if r["ppl_bucket"] == "head"]
        tails = [r["unigram_logprob"] for r in rs
                 if r["ppl_bucket"] == "tail"]
        assert min(heads) >= max(tails)


def test_perplexity_buckets_pinned_thresholds(spark):
    rows = [(i, f"word{i % 3} word{i % 3} filler", "en", "s")
            for i in range(6)]
    th = spark.createDataFrame([("en", -100.0, 100.0)],
                               "lang string, t_mid double, t_head double")
    out = perplexity_buckets(_df(spark, rows), thresholds=th).collect()
    assert {r["ppl_bucket"] for r in out} == {"middle"}


def test_dsir_target_like_docs_score_higher(spark):
    # Target (en) vocabulary A, off-target (de) vocabulary B; a fresh
    # en-vocab doc must outscore a fresh de-vocab doc.
    rows = []
    for i in range(20):
        rows.append((i, "tea scone garden rain queen " * 4, "en", "s"))
    for i in range(20, 40):
        rows.append((i, "berg wald fluss stein zug " * 4, "de", "s"))
    w = {r["doc_id"]: r["dsir_logw"]
         for r in dsir_logweights(_df(spark, rows)).collect()}
    assert w[0] > w[20]
    assert min(w[i] for i in range(20)) > max(w[i] for i in range(20, 40))


def test_dsir_reference_corpus_form(spark):
    # The paper's setup: target distribution from a SEPARATE trusted
    # corpus. Raw docs sharing the reference's vocabulary must outscore
    # raw docs that don't.
    raw = _df(spark, [
        (0, "tea scone garden rain queen tea scone", "xx", "s"),
        (1, "berg wald fluss stein zug berg wald", "xx", "s"),
    ])
    ref = spark.createDataFrame(
        [(100, "tea scone garden rain queen crown palace")],
        "doc_id bigint, text string")
    w = {r["doc_id"]: r["dsir_logw"]
         for r in dsir_logweights(raw, target_docs=ref).collect()}
    assert w[0] > w[1]
    # target predicate is ignored when target_docs is given: lang 'xx'
    # matches nothing, yet weights are finite and ordered.
    s = dsir_sample(raw, k=1, target_docs=ref).collect()
    assert [r["doc_id"] for r in s] == [0]


def test_dsir_sample_deterministic_topk(spark):
    rows = [(i, f"doc {i} words tea rain " + ("garden " * (i % 5)),
             "en" if i % 3 else "de", "s") for i in range(40)]
    df = _df(spark, rows)
    a = [r["doc_id"] for r in dsir_sample(df, k=7).collect()]
    b = [r["doc_id"] for r in dsir_sample(df, k=7).collect()]
    assert len(a) == 7 and a == b
    c = [r["doc_id"] for r in dsir_sample(df, k=7, seed=1).collect()]
    assert a != c  # a different seed reshuffles the Gumbel draws


def test_dsir_zero_token_docs_drop(spark):
    rows = [(0, "tea rain garden tea rain", "en", "s"), (1, "  ", "en", "s")]
    out = dsir_logweights(_df(spark, rows)).collect()
    assert [r["doc_id"] for r in out] == [0]
    # unigrams + bigrams of a 5-token doc = 9 features
    assert out[0]["n_features"] == 9


def test_gopher_plan_has_no_python_stage(spark):
    rows = [(0, GOOD, "en", "s")]
    plan = gopher_rules(_df(spark, rows))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
