"""Robustness of the HTML main-content extractor: arbitrary byte salad
must never throw, must be deterministic, and the Spark UDF must agree
with the pure function on every input."""
from __future__ import annotations

from hypothesis import given, settings, strategies as st

from document_ai_spark.functions.textops import (
    classify_blocks,
    extract_main_text,
    segment_blocks,
)

html_ish = st.text(
    alphabet=st.sampled_from(list(
        "abc <>/=\"'&;!-\nDIVdivpPaAnavNAVfooterli table#x01й文")),
    min_size=0, max_size=300,
)


@settings(max_examples=300, deadline=None)
@given(html_ish)
def test_extract_never_throws_and_is_deterministic(s):
    a = extract_main_text(s)
    b = extract_main_text(s)
    assert a == b
    assert isinstance(a, str)
    for blk in classify_blocks(s):
        assert set(blk) == {"block_idx", "text", "link_ratio",
                            "tag_density", "in_chrome", "is_content"}


@settings(max_examples=100, deadline=None)
@given(html_ish)
def test_segmentation_plain_text_is_line_normalized(s):
    # For inputs without any '<', segmentation is line-based passthrough
    # with per-line whitespace normalization (runs collapsed, edges
    # stripped) — the same normalization every Block gets.
    if "<" not in s:
        import re
        norm = [re.sub(r"[ \t\r\f\v]+", " ", line).strip()
                for line in s.split("\n")]
        # Empty lines are boilerplate-filtered (BP_MIN_TEXT_LEN).
        expected = "\n".join(line for line in norm if line)
        assert extract_main_text(s) == expected


def test_udf_agrees_with_pure_function(spark):
    import random
    rng = random.Random(5)
    alphabet = "abc <>/=\"'&;!-\nDIVdivp nav footer a href"
    samples = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 200)))
               for _ in range(200)]
    from pyspark.sql import functions as F, types as T
    from document_ai_spark.plans.pipeline import _main_text_udf
    df = spark.createDataFrame(
        [{"i": i, "t": t} for i, t in enumerate(samples)],
        schema="i int, t string")
    got = {r["i"]: r["m"] for r in
           df.select("i", _main_text_udf(F.col("t")).alias("m")).collect()}
    for i, t in enumerate(samples):
        assert got[i] == extract_main_text(t), repr(t)
