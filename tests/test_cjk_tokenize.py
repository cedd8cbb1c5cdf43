"""Script-aware tokenization (functions/tokenize.py): CJK/no-space
scripts get real tokens, the whole text-op family stays engine-parity
(Spark Java regex vs DuckDB RE2 on the same \\x{hhhh}-range pattern),
and near-dup detection actually catches CJK near-duplicates.

The driver's synthetic corpus is English-ish, so these tests build a
MIXED-SCRIPT documents table (CJK, Japanese, Korean, Devanagari,
Arabic, accented Latin, emoji, empty/whitespace edge docs) in the
documents.parquet layout and run the REGISTRY queries against their
DuckDB oracles on it — the same compare the correctness driver runs.
"""
from __future__ import annotations

import math
from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from document_ai_spark.functions.tokenize import TOKEN_PATTERN, tokens_col
from document_ai_spark.operators.dedup import banded_near_dup_pairs

# doc_id 0 matters: the contamination query uses doc_id % 97 == 0 as its
# eval split, so 0 puts one CJK doc in the blocklist side.
_ROWS = [
    (0, "the quick brown fox jumps over the lazy dog and runs away",
     "en", "web"),
    (1, "深度学习模型在大规模语料库上进行预训练以提升下游任务表现", "zh", "web"),
    (2, "深度学习模型在大规模语料库上进行预训练以提升性能表现", "zh", "web"),
    (3, "機械学習のモデルはデータから学ぶ、そして汎化する", "ja", "web"),
    (4, "기계 학습 모델은 데이터에서 배운다 그리고 일반화한다", "ko", "web"),
    (5, "mixed script 混合文本 document with ラテン and 한글 inline",
     "mix", "web"),
    (6, "यह एक हिंदी वाक्य है जो देवनागरी लिपि में लिखा गया है", "hi", "web"),
    (7, "هذه جملة عربية مكتوبة من اليمين إلى اليسار", "ar", "web"),
    (8, "étude naïve café über straße çok güzel", "fr", "web"),
    (9, "emoji test \U0001F600 \U0001F680 done", "en", "web"),
    (10, "", "en", "edge"),
    (11, "   \t  \n ", "en", "edge"),
    (12, "the quick brown fox jumps over the lazy dog and runs away today",
     "en", "web"),
    # near-dup CJK pair for doc 1/2 lives above; 97 pairs with the eval
    # doc 0's n-grams for the contamination check
    (97, "quick brown fox jumps over the lazy dog again and again",
     "en", "web"),
]

# Registry queries whose semantics ride on the token model.
_TOKEN_QUERIES = [
    "token_stats", "quality_score", "minhash_sketch", "banded_near_dup",
    "near_dup_pairs", "simhash", "token_estimate", "token_budget",
    "unigram_logprob", "repetition_stats", "contamination", "tfidf_terms",
    "lang_guess", "ngram_jaccard", "dup_clusters", "dup_clusters_star",
    "curation_budget", "quality_gates",
]


@pytest.fixture(scope="module")
def cjk_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cjk_sf")
    df = spark.createDataFrame(
        [(i, t, lang, src, len(t)) for (i, t, lang, src) in _ROWS],
        "doc_id long, text string, lang string, source string, n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def cjk_ddb(cjk_dir):
    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; DuckDB needs the part-file glob.
    con.execute("CREATE VIEW documents AS "
                f"SELECT * FROM '{cjk_dir}/documents.parquet/*.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 6)
    return v


@pytest.mark.parametrize("name", _TOKEN_QUERIES)
def test_token_query_oracle_parity_on_mixed_scripts(spark, cjk_ddb,
                                                    cjk_dir, name):
    sdf = E.queries()[name](spark, cjk_dir)
    res = cjk_ddb.execute(E.oracle_sql()[name])
    duck_cols = [c[0].lower() for c in res.description]
    duck_rows = res.fetchall()
    assert [c.lower() for c in sdf.columns] == duck_cols
    spark_rows = [tuple(r) for r in sdf.collect()]
    assert len(spark_rows) == len(duck_rows), name
    sset = Counter(tuple(_norm(v) for v in r) for r in spark_rows)
    dset = Counter(tuple(_norm(v) for v in r) for r in duck_rows)
    if sset != dset:
        diff_s = [r for r in sset if sset[r] != dset.get(r, 0)][:3]
        diff_d = [r for r in dset if dset[r] != sset.get(r, 0)][:3]
        raise AssertionError(
            f"{name}: mixed-script value mismatch\n spark-only={diff_s}"
            f"\n duck-only={diff_d}")


def test_cjk_token_counts(spark):
    """A CJK document tokenizes to one token per character, not 1 token
    total; spaced scripts keep whitespace-run tokens; empty text has 0."""
    df = spark.createDataFrame(
        [("日本語のテキスト",), ("hello world",), ("汉字 and 漢字",),
         ("",), ("   ",)], "text string")
    got = [r[0] for r in df.select(F.size(tokens_col())).collect()]
    assert got == [8, 2, 5, 0, 0]


def test_cjk_near_dups_are_caught(spark):
    """Two CJK docs differing by a couple of trailing chars — invisible
    to the old whitespace token model (1 giant token each, jaccard 0) —
    must surface as a near-dup pair via char-3-gram shingles."""
    base = "深度学习模型在大规模语料库上进行预训练以提升下游任务的表现和泛化能力"
    rows = [("a", base), ("b", base + "测试"),
            ("c", "完全不同的另一篇文档内容与前面毫无相似之处而且主题也不一样")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    pairs = {(r["doc_a"], r["doc_b"])
             for r in banded_near_dup_pairs(docs, jaccard_min=0.5).collect()}
    assert ("a", "b") in pairs
    assert all("c" not in p for p in pairs)


def test_cjk_contamination_caught(spark):
    """A benchmark doc sharing a CJK char-3-gram run with a corpus doc
    is flagged by contamination() — the old token model saw disjoint
    single giant tokens and flagged nothing."""
    from document_ai_spark.operators.curation import (
        contamination,
        eval_ngrams,
    )

    corpus = spark.createDataFrame(
        [("d1", "模型在大规模语料库上预训练效果显著"),
         ("d2", "一段与评测集完全无关的普通文字内容")],
        "doc_id string, text string")
    evals = spark.createDataFrame(
        [("e1", "大规模语料库上预训练")], "doc_id string, text string")
    hits = {r["doc_id"]: r["n_hits"]
            for r in contamination(corpus, eval_ngrams(evals, n=3),
                                   n=3).collect()}
    assert hits.get("d1", 0) > 0
    assert "d2" not in hits


def test_spaced_scripts_unchanged_vs_whitespace_split(spark):
    """On spaced scripts the new tokenizer is byte-identical to the old
    split(trim(text), '\\s+') — existing English-corpus results hold."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    mismatch = docs.where(
        ~tokens_col().eqNullSafe(F.split(F.trim("text"), r"\s+"))).count()
    assert mismatch == 0


def test_token_pattern_engine_parity_chars():
    """The regex itself: DuckDB RE2 and Spark's Java regex must agree
    token-for-token on adversarial inputs (this is the invariant the
    whole oracle family rests on)."""
    con = duckdb.connect()
    texts = [t for _, t, _, _ in _ROWS] + [
        "a\u3000b",                # ideographic space: WHITESPACE since r5
        "ｶﾀｶﾅ halfwidth",          # halfwidth katakana: char tokens since r5
        "\u30FC長音符",             # katakana-hiragana prolonged sound mark
        "ภาษาไทยไม่มีช่องว่าง",  # Thai graphemes
        "ພາສາລາວ ກໍບໍ່ມີ",   # Lao
        "ភាសាខ្មែរ",   # Khmer
        "မြန်မာဘာသာ",  # Myanmar
    ]
    duck = [r[0] for r in con.execute(
        "SELECT regexp_extract_all(t, ?, 0) FROM (SELECT unnest(?) AS t)",
        [TOKEN_PATTERN, texts]).fetchall()]
    import re
    # Python's re is NOT one of the two engines, but serves as an
    # independent referee: rewrite \x{hhhh} to literal chars and force
    # (?a) so \s is ASCII-only like Java regex and RE2 (Python's default
    # \s would wrongly split on U+3000 ideographic space).
    py_pat = "(?a)" + re.sub(r"\\x\{([0-9A-Fa-f]{4})\}",
                             lambda m: chr(int(m.group(1), 16)),
                             TOKEN_PATTERN)
    ref = [re.findall(py_pat, t) for t in texts]
    assert duck == ref


def test_hybrid_equals_pure_regex(spark):
    """tokens_sql's per-row fast path (whitespace split when a row has
    no CJK char) must be EXACTLY the pure regex tokenizer — on the real
    corpus and on adversarial mixed/edge rows."""
    from document_ai_spark.functions.tokenize import (
        tokens_regex_sql,
        tokens_sql,
    )

    corpus = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select("text")
    extra = spark.createDataFrame(
        [(t,) for (_, t, _, _) in _ROWS] +
        [("a　b",), ("tab\tsep",), ("trail 漢 ",), (" 漢lead",),
         ("multi  space",), (None,)], "text string")
    both = corpus.union(extra)
    bad = both.where(~F.expr(tokens_sql()).eqNullSafe(
        F.expr(tokens_regex_sql()))).count()
    assert bad == 0


def test_tokenizer_engine_parity_fuzz(spark):
    """Randomized cross-engine parity: 300 seeded random strings mixing
    ASCII, punctuation, whitespace variants, CJK blocks, combining
    marks, surrogate-pair emoji, and boundary chars — Spark and DuckDB
    must tokenize every one identically (single batched comparison)."""
    import random

    rng = random.Random(1234)
    pools = [
        lambda: chr(rng.randint(0x20, 0x7E)),          # ASCII
        lambda: chr(rng.randint(0x4E00, 0x9FFF)),      # CJK unified
        lambda: chr(rng.randint(0x3040, 0x30FF)),      # kana
        lambda: chr(rng.randint(0xAC00, 0xD7AF)),      # hangul
        lambda: chr(rng.randint(0x0900, 0x097F)),      # devanagari
        lambda: chr(rng.randint(0x0300, 0x036F)),      # combining marks
        lambda: chr(rng.randint(0x0E00, 0x0E7F)),      # thai (incl. strays)
        lambda: chr(rng.randint(0x0E80, 0x0EFF)),      # lao
        lambda: chr(rng.randint(0x1780, 0x17FF)),      # khmer
        lambda: chr(rng.randint(0x1000, 0x109F)),      # myanmar
        lambda: chr(rng.randint(0xFF66, 0xFF9F)),      # halfwidth katakana
        lambda: chr(rng.randint(0x31F0, 0x31FF)),      # katakana phon. ext
        lambda: rng.choice(" \t\n\r\x0b\x0c　"),   # whitespace-ish
        lambda: rng.choice("。、．，！？・ー〜"),        # CJK punctuation
        lambda: chr(rng.randint(0x1F300, 0x1F6FF)),    # emoji (astral)
        lambda: rng.choice(["〿", "㐀", "䶿", "鿿",
                            "ꀀ", "꯿", "가", "힯",
                            "", "豈", "﫿", "ﬀ"]),
    ]
    texts = ["".join(rng.choice(pools)()
                     for _ in range(rng.randint(0, 60)))
             for _ in range(300)]

    import duckdb
    duck = [r[0] or [] for r in duckdb.connect().execute(
        "SELECT regexp_extract_all(t, ?, 0) "
        "FROM (SELECT unnest(?) AS t)",
        [TOKEN_PATTERN, texts]).fetchall()]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r[0] for r in df.select(tokens_col().alias("t")).collect()]
    assert got == duck


def test_tokenizer_concat_and_invariance_properties(spark):
    """Algebraic properties over 200 seeded random mixed-script strings,
    checked in one batch:
      * whitespace-join invariance: tokens(a + ' ' + b) ==
        tokens(a) ++ tokens(b)
      * idempotence under re-join: tokens(' '.join(tokens(t)))
        == tokens(t)  (tokens never contain whitespace, and CJK chars
        re-tokenize to themselves)
      * no token is empty or contains whitespace."""
    import random

    rng = random.Random(99)
    alphabet = ("abc XY12 ,.!?" "   \t"
                "深度学习モデル한글データ" "é𝔘🎋")

    def rand_text():
        return "".join(rng.choice(alphabet)
                       for _ in range(rng.randint(0, 40)))

    pairs = [(rand_text(), rand_text()) for _ in range(200)]
    df = spark.createDataFrame(pairs, "a string, b string")
    toks = [(r["ta"], r["tb"], r["tj"], r["trej"]) for r in df.select(
        tokens_col("a").alias("ta"),
        tokens_col("b").alias("tb"),
        tokens_col(F.concat("a", F.lit(" "), "b")).alias("tj"),
        tokens_col(F.array_join(tokens_col("a"), " ")).alias("trej"),
    ).collect()]
    for ta, tb, tj, trej in toks:
        assert tj == ta + tb
        assert trej == ta
        for t in ta + tb:
            assert t != ""
            assert not any(c in t for c in " \t\n\r\x0b\x0c")


def test_thai_near_dups_are_caught(spark):
    """Round-5: Thai text previously tokenized as ONE run-token per
    phrase (jaccard 0 between near-identical docs); the grapheme-cluster
    fallback must make a planted Thai near-dup pair surface."""
    base = ("การเรียนรู้ของเครื่องช่วยให้ระบบคอมพิวเตอร์เรียนรู้จากข้อมูล"
            "และปรับปรุงประสิทธิภาพได้เอง")
    rows = [("a", base), ("b", base + "ทดสอบ"),
            ("c", "เนื้อหาอื่นที่แตกต่างกันโดยสิ้นเชิงและไม่มีความคล้ายคลึง"
                  "กับเอกสารก่อนหน้า")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    pairs = {(r["doc_a"], r["doc_b"])
             for r in banded_near_dup_pairs(docs, jaccard_min=0.5).collect()}
    assert ("a", "b") in pairs
    assert all("c" not in p for p in pairs)


def test_thai_graphemes_not_bare_chars(spark):
    """Combining marks must ride their base (ไม่ is ไ+ม+่ -> 1 token
    'ม่' after lead ไ... the cluster rule: lead?+base+marks = 1 token),
    never stand alone as tokens."""
    df = spark.createDataFrame([("ไม่มีช่องว่าง",), ("ภาษา ลาว",)],
                               "text string")
    toks = [r[0] for r in df.select(tokens_col().alias("t")).collect()]
    for ts in toks:
        for t in ts:
            # no token is a bare combining mark
            assert not all(0x0E30 <= ord(c) <= 0x0E4E for c in t), ts
    # spaced Thai still splits on the space boundary
    assert len(toks[1]) >= 2


def test_segmenter_seam_plugs_and_resets(spark):
    """set_segmenter swaps the tokenizer globally for every consumer of
    tokens_sql/tokens_col; reset restores the default (deployment knob
    for real dictionary segmentation)."""
    from document_ai_spark.functions import tokenize as TK
    from document_ai_spark.operators.textquality import with_token_stats

    df = spark.createDataFrame([("hello world",)], "text string")
    try:
        TK.set_segmenter(
            lambda c: f"split(upper({c}), ' ')",
            duck_sql_fn=lambda c: f"str_split(upper({c}), ' ')",
            col_fn=lambda c: F.split(F.upper(c), " "))
        toks = df.select(tokens_col().alias("t")).first()["t"]
        assert toks == ["HELLO", "WORLD"]
        # a downstream operator picks it up too
        n = with_token_stats(
            df.withColumn("doc_id", F.lit("d"))).first()["n_tokens"]
        assert n == 2
    finally:
        TK.reset_segmenter()
    assert df.select(tokens_col().alias("t")).first()["t"] == \
        ["hello", "world"]


def test_isolated_leading_vowels_not_dropped(spark):
    """A Thai/Lao leading vowel with no base following (the 'เเ'
    digraph spelling of แ, or a vowel before punctuation) must
    tokenize as its own token — previously regexp_extract_all skipped
    the character entirely, so it vanished from n_tokens, shingles,
    and strip_dup_spans' token-rejoin rebuild. Both engines must
    agree (leftmost-first alternation puts vowel+base clusters ahead
    of the lone-vowel fallback)."""
    import duckdb

    from document_ai_spark.functions.tokenize import (
        duck_tokens_sql,
        tokens_sql,
    )

    cases = ["เเตก", "เ", "เ.", "ແ ເກ", "abc เ def"]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    got = [list(r["t"]) for r in
           df.selectExpr(f"{tokens_sql('text')} as t").collect()]
    assert got[0] == ["เ", "เต", "ก"]      # digraph: lone vowel survives
    assert got[1] == ["เ"]
    assert got[2] == ["เ", "."]
    con = duckdb.connect()
    for c, g in zip(cases, got):
        d = con.execute("select " + duck_tokens_sql("t")
                        + " from (select ? as t)", [c]).fetchone()[0]
        assert list(d) == g, c
    # every character of a pure-Thai string is covered by some token
    assert sum(len(t) for t in got[0]) == len(cases[0])
