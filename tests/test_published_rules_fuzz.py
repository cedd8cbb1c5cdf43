"""Randomized cross-engine parity for the published-rule operators
(c4_clean / gopher_rules / ngram_repetition): 150 seeded adversarial
documents — policy phrases split across casing, javascript-as-substring
vs as-word, bullet/ellipsis/quote line endings, braces, lorem-ipsum,
CJK runs, U+3000, repeated phrases — run through the Spark operator AND
the registry's EXACT oracle SQL over the same rows. The tokenizer fuzz
test (test_cjk_tokenize) caught a real Java-vs-RE2 divergence this way;
this extends the net to the line/page regexes and the n-gram window
arithmetic."""
from __future__ import annotations

import math
import random
from collections import Counter

import duckdb
import pytest

import __spark_entry__ as E


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 6)
    return v


def _rowset(rows):
    return Counter(tuple(_norm(v) for v in r) for r in rows)


WORDS = ["the", "quick", "brown", "fox", "data", "spark", "lorem",
         "ipsum", "Lorem", "Ipsum", "javascript", "Javascript",
         "javascripting", "nojavascript", "cookies", "uses", "privacy",
         "policy", "of", "use", "terms", "#tag", "...", "a{b", "词汇",
         "漢字文字", "east", "…", "x"]
# Line edges deliberately include U+3000 / NBSP / tab AFTER punctuation
# and bullets BEHIND U+3000 — the exact shapes where Spark trim (U+0020
# only) and DuckDB trim (Unicode Zs) disagree; the ws_trim sweep makes
# both engines strip the same WS_RANGES class (NBSP stays, by design).
ENDINGS = [".", "!", "?", '"', "", "...", "…", " .", ". ", ".　", "! ",
           "?\t", "　", ". "]
STARTS = ["", "- ", "* ", "• ", "  - ", "　", "　- ", " ", "\t* ",
          " 12 likes"]


@pytest.fixture(scope="module")
def fuzz_docs():
    rng = random.Random(20260818)
    docs = []
    for i in range(150):
        lines = []
        for _ in range(rng.randint(0, 8)):
            n = rng.randint(0, 9)
            body = " ".join(rng.choice(WORDS) for _ in range(n))
            if rng.random() < 0.3:   # plant a repeated phrase
                phrase = " ".join(rng.choice(WORDS) for _ in range(3))
                body = f"{body} {phrase} {phrase}".strip()
            lines.append(rng.choice(STARTS) + body + rng.choice(ENDINGS))
        text = "\n".join(lines)
        if rng.random() < 0.15:
            text += " uses cookies"
        docs.append((i, text, rng.choice(["en", "zh"]), "fuzz",
                     len(text)))
    return docs


@pytest.fixture(scope="module")
def fuzz_ddb(fuzz_docs):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, "
                "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?, ?, ?)",
                    fuzz_docs)
    return con


@pytest.fixture(scope="module")
def fuzz_sdf(spark, fuzz_docs):
    return spark.createDataFrame(
        fuzz_docs, "doc_id bigint, text string, lang string, "
                   "source string, n_chars bigint")


@pytest.mark.parametrize("op", ["c4_clean", "gopher_rules",
                                "ngram_repetition", "fineweb_filters",
                                "refinedweb_lines", "url_block"])
def test_published_rules_cross_engine_fuzz(op, fuzz_sdf, fuzz_ddb):
    if op == "c4_clean":
        from document_ai_spark.operators.web import c4_clean as fn
    elif op == "gopher_rules":
        from document_ai_spark.operators.selection import (
            gopher_rules as fn,
        )
    elif op == "fineweb_filters":
        from document_ai_spark.operators.web import fineweb_filters as fn
    elif op == "refinedweb_lines":
        from document_ai_spark.operators.web import refinedweb_lines as fn
    elif op == "url_block":
        fn = E._url_block_from_docs
    else:
        from document_ai_spark.operators.textquality import (
            ngram_repetition as fn,
        )
    sdf = fn(fuzz_sdf).orderBy("doc_id")
    spark_rows = [tuple(r) for r in sdf.collect()]
    duck_rows = fuzz_ddb.execute(E.oracle_sql()[op]).fetchall()
    assert len(spark_rows) == len(duck_rows)
    s, d = _rowset(spark_rows), _rowset(duck_rows)
    if s != d:
        only_s = list((s - d).keys())[:3]
        only_d = list((d - s).keys())[:3]
        raise AssertionError(
            f"{op} diverged:\n spark-only={only_s}\n duck-only={only_d}")


def test_bloom_decontam_cross_engine_fuzz(spark, fuzz_sdf, fuzz_ddb):
    """bloom_decontam over the adversarial corpus (empty texts, CJK,
    U+3000 edges, duplicate texts across docs): the Bloom+confirm path
    must equal DuckDB's NOT EXISTS text equality byte-for-byte. A
    small bitmap (2^10) raises the false-positive rate on purpose."""
    from pyspark.sql import functions as F

    from document_ai_spark.operators.curation import bloom_decontaminate

    docs = fuzz_sdf.select("doc_id", "text")
    copies = (docs.where(F.col("doc_id") % 25 == 0)
              .select((F.col("doc_id") + 1000000).alias("doc_id"), "text"))
    evals = docs.where(F.col("doc_id") % 25 == 0).select("text")
    sdf = (bloom_decontaminate(docs.unionByName(copies), evals,
                               m_bits=1 << 10)
           .orderBy("doc_id"))
    spark_rows = [tuple(r) for r in sdf.collect()]
    duck_rows = fuzz_ddb.execute(E.oracle_sql()["bloom_decontam"]).fetchall()
    assert len(spark_rows) == len(duck_rows)
    assert _rowset(spark_rows) == _rowset(duck_rows)


def test_diversity_stats_cross_engine_fuzz(fuzz_sdf, fuzz_ddb):
    """diversity_stats over the adversarial corpus plus supplementary-
    plane chars (emoji, CJK ext-B): the run-length entropy fold must
    produce the identical rounded doubles on both engines — same sorted
    fold order (binary UTF-8 on both: Spark UTF8String compares bytes,
    DuckDB default collation is binary), log2 ulp drift absorbed by
    round(6). Char-class single-char matches must treat a surrogate
    pair as ONE code point in both Java regex and RE2."""
    from pyspark.sql import functions as F

    from document_ai_spark.operators.textquality import (
        with_diversity_stats,
    )

    cols = ["doc_id", "n_types", "ttr", "token_entropy", "char_entropy"]
    extra = [(9001, "emoji \U0001F600\U0001F600\U0001F601 mix \U00020000"
                    "\U00020000 east 词 � tail"),
             (9002, "\U0001F600" * 7),
             (9003, "plain words only plain words")]
    sdf = fuzz_sdf.select("doc_id", "text").unionByName(
        fuzz_sdf.sparkSession.createDataFrame(
            extra, "doc_id bigint, text string"))
    spark_rows = [tuple(r) for r in
                  with_diversity_stats(sdf).select(*cols)
                  .orderBy("doc_id").collect()]
    fuzz_ddb.execute(
        "CREATE OR REPLACE TABLE _extra (doc_id BIGINT, text VARCHAR)")
    fuzz_ddb.executemany("INSERT INTO _extra VALUES (?, ?)", extra)
    sql = E.oracle_sql()["diversity_stats"].replace(
        "FROM documents",
        "FROM (SELECT doc_id, text FROM documents "
        "UNION ALL SELECT doc_id, text FROM _extra)")
    duck_rows = fuzz_ddb.execute(sql).fetchall()
    assert len(spark_rows) == len(duck_rows)
    s, d = _rowset(spark_rows), _rowset(duck_rows)
    if s != d:
        only_s = list((s - d).keys())[:3]
        only_d = list((d - s).keys())[:3]
        raise AssertionError(
            f"diversity_stats diverged:\n spark-only={only_s}"
            f"\n duck-only={only_d}")


def test_containment_cross_engine_fuzz(fuzz_sdf, fuzz_ddb):
    """containment_pairs over the adversarial corpus with planted
    chrome-wrapped containers (the registry construction, but against
    fuzz text rather than the synthetic corpus): the winnow selection,
    fp-set dedup order, and pair arithmetic must agree exactly."""
    duck_rows = fuzz_ddb.execute(
        E.oracle_sql()["containment_pairs"]).fetchall()
    # Spark side: the registry's own planted-union builder over the
    # SAME fuzz rows (the registry fn reads parquet, so compose here).
    from pyspark.sql import functions as F

    from document_ai_spark.operators.mining import containment_pairs

    d = fuzz_sdf.select(
        F.col("doc_id").cast("string").alias("doc_id"), "text")
    sdf = containment_pairs(E._planted_containment_union(d)) \
        .orderBy("doc_a", "doc_b")
    spark_rows = [tuple(r) for r in sdf.collect()]
    assert len(spark_rows) == len(duck_rows)
    s, dd = _rowset(spark_rows), _rowset(duck_rows)
    if s != dd:
        only_s = list((s - dd).keys())[:3]
        only_d = list((dd - s).keys())[:3]
        raise AssertionError(
            f"containment_pairs diverged:\n spark-only={only_s}"
            f"\n duck-only={only_d}")
