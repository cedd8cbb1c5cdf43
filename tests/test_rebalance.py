"""temperature_rebalance (operators/curation.py): deterministic
mixture flattening with exactly-rounded tau=2 cuts."""
from pyspark.sql import functions as F

from document_ai_spark.operators.curation import temperature_rebalance


def _corpus(spark, sizes):
    rows, i = [], 0
    for (lang, src), n in sizes.items():
        for _ in range(n):
            rows.append((i, f"doc {i}", lang, src))
            i += 1
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")


def test_rarest_slice_keeps_all_and_big_thins(spark):
    sizes = {("en", "a"): 256, ("fr", "b"): 4}
    docs = _corpus(spark, sizes)
    out = temperature_rebalance(docs, tau=2.0).cache()
    by = {r["source"]: r for r in
          out.groupBy("source").agg(
              F.count("*").alias("n"),
              F.max("keep_frac").alias("f")).collect()}
    # rarest slice: keep_frac == 1.0 exactly, every doc survives
    assert by["b"]["f"] == 1.0 and by["b"]["n"] == 4
    # p_en/p_fr = 64 -> keep_frac_en = sqrt(4/256) / sqrt(256/256)... =
    # sqrt(p_fr/p_en) = 1/8; md5 thinning lands near n*frac
    f_en = by["a"]["f"]
    assert abs(f_en - 0.125) < 1e-12
    assert 0 < by["a"]["n"] < 256


def test_deterministic_and_column_order(spark):
    docs = _corpus(spark, {("en", "a"): 50, ("de", "c"): 5})
    a = temperature_rebalance(docs, tau=2.0)
    b = temperature_rebalance(docs, tau=2.0)
    assert a.columns == ["doc_id", "text", "lang", "source", "keep_frac"]
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_tau_one_is_identity(spark):
    docs = _corpus(spark, {("en", "a"): 40, ("fr", "b"): 10})
    out = temperature_rebalance(docs, tau=1.0)
    # p^(1/1 - 1) = 1 for every slice -> keep_frac 1.0, nothing dropped
    assert out.count() == 50
    assert out.agg(F.min("keep_frac")).first()[0] == 1.0


def test_null_slice_key_is_its_own_slice(spark):
    rows = ([(i, f"d{i}", "en", "a") for i in range(40)]
            + [(100 + i, f"n{i}", None, "a") for i in range(3)])
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    out = temperature_rebalance(docs, tau=2.0)
    kept_null = [r for r in out.collect() if r["lang"] is None]
    # the NULL-lang slice is the rarest -> keep_frac 1.0, all 3 kept
    assert len(kept_null) == 3
    assert all(r["keep_frac"] == 1.0 for r in kept_null)


# -- budget_sample (absolute per-slice token budget) -------------------------

def _bs_docs(spark):
    # two slices: 'big' ~3000 tokens across 100 docs, 'small' ~60 tokens
    rows = ([(i, " ".join(f"w{j}" for j in range(30)), "en", "big")
             for i in range(100)]
            + [(1000 + i, "a b c d e f", "en", "small") for i in range(10)])
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")


def test_budget_sample_caps_only_over_budget_slices(spark):
    from document_ai_spark.operators.curation import budget_sample
    out = budget_sample(_bs_docs(spark), max_tokens=600).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # small slice (60 tokens) is under budget: all 10 kept at frac 1.0
    assert len(by_src["small"]) == 10
    assert all(r["keep_frac"] == 1.0 for r in by_src["small"])
    # big slice (3000 tokens) thins to ~600/3000 = 0.2 of its docs
    assert all(abs(r["keep_frac"] - 0.2) < 1e-9 for r in by_src["big"])
    kept_tokens = 30 * len(by_src["big"])
    assert 200 <= kept_tokens <= 1200        # ~600 expected, md5-binomial
    assert all(r["slice_tokens"] == 3000 for r in by_src["big"])


def test_budget_sample_stable_under_slice_growth(spark):
    """With the slice total held fixed, appending docs to ANOTHER slice
    never changes which docs this slice keeps (the decision reads only
    (seed, doc_id, own-slice total))."""
    from document_ai_spark.operators.curation import budget_sample
    base = _bs_docs(spark)
    grown = base.unionByName(spark.createDataFrame(
        [(2000 + i, "x y z", "de", "other") for i in range(50)],
        "doc_id long, text string, lang string, source string"))
    a = {r["doc_id"] for r in budget_sample(base, 600).collect()
         if r["source"] == "big"}
    b = {r["doc_id"] for r in budget_sample(grown, 600).collect()
         if r["source"] == "big"}
    assert a == b


def test_budget_sample_seed_redeals_and_validates(spark):
    import pytest
    from document_ai_spark.operators.curation import budget_sample
    docs = _bs_docs(spark)
    a = {r["doc_id"] for r in budget_sample(docs, 600, seed=0).collect()}
    b = {r["doc_id"] for r in budget_sample(docs, 600, seed=1).collect()}
    assert a != b
    with pytest.raises(ValueError):
        budget_sample(docs, 0)


def test_budget_sample_null_slice_keys_survive(spark):
    from document_ai_spark.operators.curation import budget_sample
    docs = spark.createDataFrame(
        [(1, "a b c", None, None), (2, "d e f", None, None)],
        "doc_id long, text string, lang string, source string")
    out = budget_sample(docs, max_tokens=100).collect()
    assert {r["doc_id"] for r in out} == {1, 2}


def test_budget_sample_sub_2e16_fraction_not_zeroed(spark):
    """Review regression: the old 4-hex (2^-16) cut rounded any
    keep_frac below 1/65536 to a zero cut, DROPPING a giant slice
    entirely instead of thinning it to the budget. At 2^-32
    granularity the kept set equals the pure-Python md5 rule."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from document_ai_spark.operators.curation import budget_sample

    n = 70_000                               # frac = 1/70000 < 1/65536
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("w").alias("text"),
        F.lit("en").alias("lang"), F.lit("web").alias("source"))
    got = sorted(r["doc_id"] for r in
                 budget_sample(docs, max_tokens=1).collect())
    cut = math.floor(1.0 / n * 4294967296)
    want = [i for i in range(n)
            if int(hashlib.md5(f"0:{i}".encode()).hexdigest()[:8], 16)
            < cut]
    assert want, "test construction must keep a nonempty set"
    assert got == want                       # [1004, 3208, 6479]


def test_quality_gates_auto_null_slice_gets_floor(spark):
    """Review regression: lang=NULL is a real slice — the floors join
    must be null-safe so its derived floor applies (the plain equi-join
    left such docs floorless and the salad gate silently open)."""
    import random

    from pyspark.sql import Row

    from document_ai_spark.operators.curation import quality_gates

    rng = random.Random(7)
    common = ["the", "market", "and", "harvest", "of", "river", "to",
              "field", "in", "crop", "for", "water"]
    rows = []
    for i in range(40):                      # natural mass, lang NULL
        rows.append(Row(doc_id=f"n{i:02d}",
                        text=" ".join(rng.choice(common)
                                      for _ in range(30)),
                        lang=None, source="web"))
    salad = " ".join(
        "".join(rng.choice("bcdfgkmpqvxz") for _ in range(7)) + f"u{j}"
        for j in range(40))                  # corpus-unique tokens
    rows.append(Row(doc_id="salad", text=salad, lang=None, source="web"))
    docs = spark.createDataFrame(
        rows, "doc_id string, text string, lang string, source string")
    out = {r["doc_id"]: r for r in
           quality_gates(docs, logprob_min="auto").collect()}
    assert out["salad"]["logprob_floor"] is not None
    assert not out["salad"]["keep"]
    kept_naturals = sum(bool(out[f"n{i:02d}"]["keep"]) for i in range(40))
    assert kept_naturals >= 35


def test_quality_gates_auto_floorless_slice_fails_closed(spark):
    """Review regression: a slice whose every doc is zero-token has no
    floor row; its docs must fail CLOSED under 'auto' (missing floor
    coalesces to +inf, not -inf) even when every other gate passes."""
    from pyspark.sql import Row

    from document_ai_spark.operators.curation import quality_gates

    docs = spark.createDataFrame([
        Row(doc_id="e1", text="   ", lang="zz", source="void"),
        Row(doc_id="e2", text="", lang="zz", source="void"),
    ])
    out = quality_gates(docs, quality_min=0.0, dup_line_max=1.0,
                        top_bigram_max=1.0, logprob_min="auto").collect()
    assert out and all(not r["keep"] for r in out)
