"""Property test: the Spark Column renderings of the extraction cascade
(Java regex, higher-order functions) must agree with the pure-python
reference semantics (Python re) on adversarial generated texts.

This is the Java-vs-Python regex dialect gate: the golden tests cover the
generator's distribution; hypothesis covers the weird corners (partial
tokens, boundary HP values, comma noise, multiline headers)."""
from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from document_ai_spark.functions import extraction as X

FRAGMENTS = [
    "55 HP", "350 HP", "20 एचपी", "H.P.", "HP: 45", "Horse Power - 90",
    "Rs. 9,11,769", "Total: 1,00,000", "₹50,000", "INR 12,345.67",
    "only", "5,00,000 only", "Grand Total Rs 99", "Cost of Tractor: 2,50,000",
    "Model: SWARAJ 744 FE", "Tractor MF 241", "XT-750", "Model:xy",
    "Sri Amutham Tractors", "Dealer: Bharat Agro Ltd",
    "National Tractor Sales", "lowercase dealers ltd",
    "The Odisha Agro Industries Corporation Ltd", "Mahindra & Mahindra Ltd",
    "...", "12", ",,,", "HP", "--- PAGE BREAK ---", "एचपी", "45एचपी",
    # Non-ASCII digits + Unicode whitespace: Python re's \d/\s and
    # int()/float() are Unicode-aware; the Spark side must agree ((?U) +
    # digit transliteration in extraction.py).
    "५५ एचपी", "९० अश्वशक्ति", "Rs ५५०००", "Total: ५०,०००",
    " XT-750 ", "Dealer: Bharat Agro Ltd", "१२ एचपी",
]


@st.composite
def doc_texts(draw):
    n = draw(st.integers(min_value=0, max_value=14))
    parts = draw(st.lists(st.sampled_from(FRAGMENTS), min_size=n, max_size=n))
    seps = draw(st.lists(st.sampled_from([" ", "\n", "  ", " : "]),
                         min_size=max(n - 1, 0), max_size=max(n - 1, 0)))
    out = []
    for i, p in enumerate(parts):
        out.append(p)
        if i < len(seps):
            out.append(seps[i])
    return "".join(out)


@settings(max_examples=60, deadline=None)
@given(st.lists(doc_texts(), min_size=1, max_size=8))
def test_spark_exprs_match_python_re(spark, texts):
    df = spark.createDataFrame([{"id": i, "t": t}
                                for i, t in enumerate(texts)],
                               schema="id int, t string")
    rows = {r["id"]: r for r in df.select(
        "id",
        X.hp_col(F.col("t")).alias("hp"),
        F.round(X.cost_col(F.col("t")), 6).alias("cost"),
        X.model_col(F.col("t")).alias("model"),
        X.dealer_col(F.col("t")).alias("dealer"),
    ).collect()}
    for i, t in enumerate(texts):
        r = rows[i]
        assert r["hp"] == X.extract_hp(t), ("hp", t)
        exp_cost = X.extract_cost(t)
        got_cost = r["cost"]
        assert (got_cost is None) == (exp_cost is None) and (
            exp_cost is None or abs(got_cost - exp_cost) < 1e-6), ("cost", t)
        assert r["model"] == X.extract_model(t), ("model", t)
        assert r["dealer"] == X.extract_dealer(t), ("dealer", t)
