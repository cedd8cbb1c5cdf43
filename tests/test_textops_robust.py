"""Robustness of the HTML main-content extractor: arbitrary byte salad
must never throw, must be deterministic, and the Spark UDF must agree
with the pure function on every input."""
from __future__ import annotations

from hypothesis import given, settings, strategies as st

from document_ai_spark.functions.textops import (
    classify_blocks,
    extract_main_text,
    segment_blocks,
    segment_blocks_reference,
)


def _block_features(blocks):
    return [(b.text, b.link_text, b.tag_count, b.in_chrome) for b in blocks]


@settings(max_examples=500, deadline=None)
@given(st.text(
    alphabet=st.sampled_from(list(
        "abc <>/=\"'&;!-\nDIVdivpPaAnavNAVfooterli table#x01й文 script")),
    min_size=0, max_size=300,
))
def test_fast_tokenizer_matches_htmlparser(s):
    # The fast regex tokenizer must be BIT-IDENTICAL to the html.parser
    # path on every input it accepts (it falls back on anything else, so
    # comparing the public function against the reference path covers both).
    assert _block_features(segment_blocks(s)) == \
        _block_features(segment_blocks_reference(s))


def test_fast_tokenizer_matches_on_corpus():
    from document_ai_spark.sources.docgen import gen_corpus_local
    docs, _ = gen_corpus_local(300, seed=7)
    for d in docs:
        for s in d["spans"]:
            if s["kind"] == "text":
                assert _block_features(segment_blocks(s["text"])) == \
                    _block_features(segment_blocks_reference(s["text"]))


def test_fast_tokenizer_edge_tags():
    for s in ["<br/><div>self closing with enough words to be a content "
              "block here</div>",
              "<a href=/x/>unquoted trailing slash</a>",
              "<a href='x>y'>quoted gt</a><p>" + "word " * 20 + "</p>",
              "<div-foo>dashed tag name none block</div-foo>",
              "<SCRIPT>var a = '<div>';</SCRIPT><div>" + "word " * 12
              + "</div>",
              "</div extra>junk end tag<p>" + "word " * 12 + "</p>",
              "<!-- c --><div>" + "word " * 12 + "</div>"]:
        assert _block_features(segment_blocks(s)) == \
            _block_features(segment_blocks_reference(s)), repr(s)

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


def test_malformed_and_hostile_markup_degrade_gracefully():
    """Every weird input must produce SOME deterministic output (never
    raise), and fast/reference paths must agree wherever both parse."""
    from document_ai_spark.functions.textops import (
        extract_main_text, segment_blocks, segment_blocks_reference)

    hostile = [
        '<div class="a>b">quote traps a gt</div>',       # > inside attr
        "<div><p>unclosed everywhere",
        "text < notatag > more",
        "<script>if (a<b && c>d) {}</script><p>" + "x" * 60 + "</p>",
        "<!-- comment --><p>" + "y" * 60 + "</p>",        # forces fallback
        "<!DOCTYPE html><p>" + "z" * 60 + "</p>",
        "<p>" + "&amp;" * 30 + "</p>",
        "<a href=/x/>slash-attr anchor</a>",
        "<" * 50,
        "<p></p>" * 200,
        "\x00<div>nul</div>",
        "<DIV><P>UPPER TAGS " + "w" * 50 + "</P></DIV>",
    ]
    for h in hostile:
        out1 = extract_main_text(h)
        out2 = extract_main_text(h)
        assert out1 == out2, "non-deterministic output"
        # parity whenever the fast path claims the input (it may decline)
        fast = segment_blocks(h)
        ref = segment_blocks_reference(h)
        if [b.texts for b in fast] == [b.texts for b in ref]:
            assert [(b.text, b.is_content()) for b in fast] == \
                   [(b.text, b.is_content()) for b in ref]


def test_unicode_markup_parity():
    """Devanagari / CJK / emoji / RTL content through both tokenizer
    paths: identical blocks, deterministic output, no exceptions."""
    from document_ai_spark.functions.textops import (
        extract_main_text, segment_blocks, segment_blocks_reference)

    cases = [
        "<div><p>ट्रैक्टर ५५ एचपी की कीमत Rs. ९,११,७६९ है " + "य" * 40
        + "</p></div>",
        "<p>混合内容 with latin ٱلْعَرَبِيَّة and עברית " + "字" * 50 + "</p>",
        "<p>emoji 🚜💰 inside <a href='x'>लिंक 🙂</a> " + "e" * 50 + "</p>",
        "नमस्ते\n<div>देवनागरी ब्लॉक " + "क" * 60 + "</div>\nplain tail",
    ]
    for h in cases:
        assert extract_main_text(h) == extract_main_text(h)
        fast = segment_blocks(h)
        ref = segment_blocks_reference(h)
        assert [(b.text, b.is_content()) for b in fast] == \
               [(b.text, b.is_content()) for b in ref]
