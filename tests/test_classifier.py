"""Naive Bayes quality classifier (operators/classifier.py) and
best-copy-per-cluster selection (operators/curation.py canonical_docs).

Cross-engine value parity is graded by the registry rows `nb_quality`
and `canonical_docs`; these tests pin the learning behavior itself —
class separation, the unseen-word default path, prior dominance on
empty evidence, and the argmax-keep policy.
"""
from __future__ import annotations

from pyspark.sql import Row, functions as F

from document_ai_spark.operators.classifier import (
    nb_quality,
    nb_score,
    nb_train,
)
from document_ai_spark.operators.curation import canonical_docs


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t)
                                  for i, t in enumerate(rows)])


def test_nb_separates_disjoint_vocab(spark):
    """Two classes with disjoint vocabularies: every doc classified
    into its own class with confident log-odds."""
    pos = ["alpha beta gamma delta", "beta gamma alpha",
           "delta alpha beta beta"]
    neg = ["omega psi chi phi", "psi chi omega", "phi omega psi psi"]
    docs = _docs(spark, pos + neg).withColumn(
        "label", F.col("doc_id") < len(pos))
    model, params = nb_train(docs)
    out = {r["doc_id"]: r for r in nb_score(docs, model, params).collect()}
    assert len(out) == 6
    for i in range(len(pos)):
        assert out[i]["nb_pred"] is True and out[i]["nb_logodds"] > 1.0
    for i in range(len(pos), 6):
        assert out[i]["nb_pred"] is False and out[i]["nb_logodds"] < -1.0


def test_nb_unseen_words_use_smoothed_default(spark):
    """Scoring a doc made entirely of words absent from training must
    not drop rows or produce NULL: each token scores the smoothed
    default delta ln((n_neg+V)/(n_pos+V))."""
    train = _docs(spark, ["alpha beta", "omega psi"]).withColumn(
        "label", F.col("doc_id") == 0)
    model, params = nb_train(train)
    probe = _docs(spark, ["zzz qqq xxx"])
    rows = nb_score(probe, model, params).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_scored_tokens"] == 3
    assert r["nb_logodds"] is not None
    # Balanced training (equal tokens, equal docs) -> default delta 0,
    # prior 0 -> total log-odds exactly 0 and pred False (not > 0).
    assert r["nb_logodds"] == 0.0
    assert r["nb_pred"] is False


def test_nb_prior_reflects_class_imbalance(spark):
    """With 3 positive docs and 1 negative, the prior pushes a
    no-evidence (all-unseen) probe positive."""
    train = _docs(spark, ["alpha", "beta", "gamma", "omega"]).withColumn(
        "label", F.col("doc_id") < 3)
    model, params = nb_train(train)
    p = params.collect()[0]
    import math

    # ln((3+1)/(1+1)) = ln 2
    assert abs(p["prior_logodds"] - math.log(2.0)) < 1e-12
    # 3 pos tokens, 1 neg token, vocab 4 (alpha/beta/gamma/omega):
    # default = ln(1/(3+4)) - ln(1/(1+4))
    assert abs(p["default_delta"]
               - (math.log(1.0 / 7) - math.log(1.0 / 5))) < 1e-12


def test_nb_quality_wrapper_matches_train_score(spark):
    """nb_quality(docs, cond) == nb_train+nb_score composed by hand."""
    docs = _docs(spark, ["alpha beta alpha", "omega psi", "alpha omega",
                         "psi psi beta"]).withColumn(
        "lang", F.when(F.col("doc_id") % 2 == 0, "en").otherwise("zz"))
    via_wrapper = {tuple(r) for r in
                   nb_quality(docs, F.col("lang") == "en").collect()}
    model, params = nb_train(docs.withColumn(
        "label", F.col("lang") == "en"))
    via_parts = {tuple(r) for r in nb_score(docs, model, params).collect()}
    assert via_wrapper == via_parts


def test_canonical_docs_keeps_best_quality_member(spark):
    """Planted cluster: a natural-text doc and a near-dup copy whose
    stopwords were stripped (worse stopword_ratio -> lower quality).
    The natural doc must be the kept member regardless of doc_id
    order."""
    base = ("the quick brown fox jumps over the lazy dog and then "
            "the fox naps by the warm stone wall for a while")
    # Near-dup: the same text with a run of appended stopwords. The run
    # adds only ~2 distinct shingles (high shingle Jaccard, so the LSH
    # bands still collide) but pushes stopword_ratio past the 0.6 band
    # edge -> quality 0.8 vs the base's 1.0.
    degraded = base + " the" * 20
    filler = [f"filler document number {i} with totally distinct words "
              f"col{i}a col{i}b col{i}c col{i}d col{i}e col{i}f col{i}g"
              for i in range(8)]
    # Give the DEGRADED doc the lower doc_id: min-id tie-break would
    # wrongly keep it, so this pins the quality argmax specifically.
    docs = _docs(spark, [degraded, base] + filler)
    out = canonical_docs(docs, jaccard_min=0.3).collect()
    assert len(out) >= 2
    by_id = {r["doc_id"]: r for r in out}
    assert 0 in by_id and 1 in by_id
    assert by_id[0]["cluster"] == by_id[1]["cluster"]
    assert by_id[1]["keep"] is True and by_id[0]["keep"] is False
    assert by_id[1]["quality_score"] > by_id[0]["quality_score"]
    # Exactly one keep per cluster.
    from collections import Counter
    keeps = Counter(r["cluster"] for r in out if r["keep"])
    sizes = Counter(r["cluster"] for r in out)
    assert keeps == Counter({c: 1 for c in sizes})


def test_nb_matches_pure_python_reference(spark):
    """Seeded random corpus: Spark's relational NB must match a
    straightforward pure-Python multinomial NB to float tolerance
    (identical after the 4-decimal rounding contract)."""
    import math
    import random

    rng = random.Random(20260817)
    vocab = [f"w{i}" for i in range(30)]
    texts, labels = [], []
    for i in range(40):
        n = rng.randint(1, 25)
        texts.append(" ".join(rng.choice(vocab) for _ in range(n)))
        labels.append(rng.random() < 0.4)

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t, label=bool(b))
         for i, (t, b) in enumerate(zip(texts, labels))])
    model, params = nb_train(docs)
    got = {r["doc_id"]: (r["nb_logodds"], r["nb_pred"],
                         r["n_scored_tokens"])
           for r in nb_score(docs, model, params).collect()}

    # Pure-Python reference (same tokenization: whitespace words,
    # lowercased — the corpus here is ASCII so the script-aware
    # tokenizer degenerates to a whitespace split).
    c_pos, c_neg = {}, {}
    n_pos = n_neg = d_pos = d_neg = 0
    for t, b in zip(texts, labels):
        d_pos, d_neg = d_pos + b, d_neg + (not b)
        for w in t.lower().split():
            if b:
                c_pos[w] = c_pos.get(w, 0) + 1
                n_pos += 1
            else:
                c_neg[w] = c_neg.get(w, 0) + 1
                n_neg += 1
    seen = set(c_pos) | set(c_neg)
    v = len(seen)
    prior = math.log((d_pos + 1) / (d_neg + 1))
    for i, t in enumerate(texts):
        words = t.lower().split()
        s = sum(math.log((c_pos.get(w, 0) + 1) / (n_pos + v))
                - math.log((c_neg.get(w, 0) + 1) / (n_neg + v))
                for w in words)
        want = round(s + prior, 4)
        assert got[i][0] == want, (i, got[i][0], want)
        assert got[i][1] == (want > 0)
        assert got[i][2] == len(words)


def test_nb_train_null_labels_excluded(spark):
    """Review regression: a NULL label predicate (lang IS NULL under
    lang == 'en') means 'unknown', and when/otherwise counting used to
    train every such doc as a confident NEGATIVE example."""
    from pyspark.sql import functions as F

    from document_ai_spark.operators.classifier import nb_quality

    rows = ([("p%d" % i, "good words here always", "en")
             for i in range(6)]
            + [("n%d" % i, "bad junk tokens everywhere", "de")
               for i in range(6)]
            + [("u%d" % i, "good words here always", None)
               for i in range(20)])      # unknown-lang POSITIVE-looking
    docs = spark.createDataFrame(
        rows, "doc_id string, text string, lang string")
    out = {r["doc_id"]: r["nb_logodds"]
           for r in nb_quality(docs, F.col("lang") == "en").collect()}
    # the unknown-language docs share the POSITIVE class's exact text;
    # with NULL labels excluded from training they must score positive
    # (trained as negatives, they would drag their own text negative)
    assert all(out[f"u{i}"] > 0 for i in range(20))
    assert all(out[f"p{i}"] > 0 for i in range(6))
    assert all(out[f"n{i}"] < 0 for i in range(6))
