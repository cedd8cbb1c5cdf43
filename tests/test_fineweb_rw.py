"""FineWeb custom filters, RefinedWeb line corrections, and URL
blocklist filtering (operators/web.py) — planted pathologies that fire
each rule in isolation, exact fraction math, and the broadcast-only
plan shape for url_block."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_ai_spark.operators.web import (
    fineweb_filters,
    refinedweb_lines,
    url_block,
)

GOOD_LINE = "This is a normal sentence with plenty of words in it."


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, (t, _why) in enumerate(rows)],
        "doc_id bigint, text string")


# -- fineweb_filters --------------------------------------------------------

FW_ROWS = [
    ("\n".join([f"This is sentence number {i} with plenty of words in it."
                for i in range(4)]),
     "keep: unique long punct lines"),
    ("\n".join(["short"] * 7 + [GOOD_LINE] * 3),
     "drop: 7/10 short lines >= 0.67"),
    ("\n".join([GOOD_LINE, GOOD_LINE, GOOD_LINE + " unique tail one.",
                GOOD_LINE + " unique tail two."]),
     "drop: duplicated line chars > 1%"),
    ("one two.\n" * 40, "drop: dup chars dominate"),
    ("word " * 60, "drop: zero punct-ending lines"),
    ("", "drop: empty doc, all ratios 0"),
]


def test_fineweb_rules_fire_individually(spark):
    out = {r["doc_id"]: r for r in
           fineweb_filters(_docs(spark, FW_ROWS)).collect()}
    assert out[0]["fineweb_keep"] is True
    assert out[1]["short_line_frac"] == 0.7
    assert out[1]["fineweb_keep"] is False
    # doc 2: one line occurs twice -> (2-1)*54 dup chars over 4 lines
    d2 = out[2]
    tot = 3 * len(GOOD_LINE) + len(GOOD_LINE + " unique tail one.") \
        + len(GOOD_LINE + " unique tail two.") - len(GOOD_LINE)
    assert d2["dup_line_char_frac"] == round(len(GOOD_LINE) / tot, 6)
    assert d2["fineweb_keep"] is False
    assert out[3]["fineweb_keep"] is False
    assert out[4]["line_punct_ratio"] == 0.0
    assert out[4]["fineweb_keep"] is False
    d5 = out[5]
    assert (d5["n_lines"], d5["n_words"]) == (1, 0)
    assert d5["newline_word_ratio"] == 0.0
    assert d5["fineweb_keep"] is False


def test_fineweb_newline_word_ratio(spark):
    # 9 newlines / 20 words = 0.45 > 0.3 -> drop even though lines are
    # otherwise fine.
    text = "\n".join(["Nice words arrive here."] * 10)
    half = "\n".join(["Nice words arrive here again soon today truly."] * 4)
    out = {r["doc_id"]: r for r in fineweb_filters(
        _docs(spark, [(text, ""), (half, "")])).collect()}
    assert out[0]["newline_word_ratio"] == round(9 / 40, 6)
    # doc 1: 3 newlines / 32 words
    assert out[1]["newline_word_ratio"] == round(3 / 32, 6)


# -- refinedweb_lines -------------------------------------------------------

RW_ROWS = [
    (GOOD_LINE + "\n" + GOOD_LINE, "keep: nothing removed"),
    ("THIS IS ALL SHOUTING LOUDLY\n" + GOOD_LINE, "mainly uppercase"),
    ("1234567\n" + GOOD_LINE, "numeric only"),
    ("42 likes\n" + GOOD_LINE, "counter"),
    ("Standalone\n" + GOOD_LINE, "single word"),
    (GOOD_LINE + "\nok.", "short removals survive: 'ok.' is kept "
                          "(two chars + punct is not a single word? no"
                          " - it IS one word, but removal is tiny)"),
]


def test_refinedweb_line_rules(spark):
    out = {r["doc_id"]: r for r in
           refinedweb_lines(_docs(spark, RW_ROWS)).collect()}
    assert out[0]["n_removed_lines"] == 0
    assert out[0]["rw_keep"] is True
    assert out[0]["text_clean"] == RW_ROWS[0][0]
    for i in (1, 2, 3, 4):
        assert out[i]["n_removed_lines"] == 1, RW_ROWS[i][1]
        assert out[i]["text_clean"] == GOOD_LINE
        # the removed line is a large char fraction -> doc dropped
        # except doc 4 where 'Standalone' is 10 chars of 64
    frac1 = out[1]["removed_char_frac"]
    assert frac1 == round(27 / (27 + len(GOOD_LINE)), 6)
    assert out[1]["rw_keep"] is False
    # doc 5: 'ok.' is a single word line -> removed, 3/(54+3) chars
    d5 = out[5]
    assert d5["n_removed_lines"] == 1
    assert d5["rw_keep"] is False  # 3/57 = 0.0526 > 0.05


def test_refinedweb_mixed_case_and_thresholds(spark):
    # lowercase-heavy line is NOT mainly-upper; short all-caps is.
    rows = [("MiXeD Case Words Here okay fine\n" + GOOD_LINE, ""),
            ("AB\n" + GOOD_LINE * 1, "")]
    out = {r["doc_id"]: r for r in
           refinedweb_lines(_docs(spark, rows)).collect()}
    assert out[0]["n_removed_lines"] == 0
    assert out[1]["n_removed_lines"] == 1  # 'AB' mainly upper (and 1 word)


# -- url_block --------------------------------------------------------------

def _urls(spark):
    rows = [
        (0, "https://www.good-news.example.org/story"),
        (1, "https://bad.evil.com/page"),
        (2, "https://casino-xxx-poker.fun.net/x"),   # 3 soft words
        (3, "https://onlycasino.safe.io/x"),          # 1 soft word
        (4, None),                                    # unparseable
        (5, "https://EVIL.com:8080/x"),               # port breaks domain
    ]
    return spark.createDataFrame(rows, "doc_id bigint, url string")


def _bl(spark):
    return spark.createDataFrame([("evil.com",), ("other.net",)],
                                 ["domain"])


def test_url_block_verdicts(spark):
    out = {r["doc_id"]: r for r in
           url_block(_urls(spark), _bl(spark)).collect()}
    assert out[0]["domain"] == "example.org"
    assert out[0]["url_keep"] is True
    assert out[1]["domain_blocked"] is True and out[1]["url_keep"] is False
    assert out[2]["soft_hits"] == 3 and out[2]["url_keep"] is False
    # 'sex' is a substring of neither host; 'casino' hits once -> keep
    assert out[3]["soft_hits"] == 1 and out[3]["url_keep"] is True
    assert out[4]["domain"] == "" and out[4]["url_keep"] is True
    # host with port does not parse to a registrable domain (documented)
    assert out[5]["domain"] == "" and out[5]["domain_blocked"] is False


def test_url_block_counts_distinct_words_not_occurrences(spark):
    urls = spark.createDataFrame(
        [(0, "https://casino-casino-casino.example.com/casino")],
        "doc_id bigint, url string")
    r = url_block(urls, _bl(spark)).collect()[0]
    assert r["soft_hits"] == 1
    assert r["url_keep"] is True


def test_url_block_plan_is_broadcast_only(spark):
    plan = (url_block(_urls(spark), _bl(spark))
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffleExchange" not in plan.replace(
        "BroadcastExchange", "")


def test_registry_entries_run(spark, tmp_path):
    """The three registry queries run end-to-end on a tiny parquet dir
    shaped like the driver's sf layout."""
    import __spark_entry__ as E
    docs = spark.createDataFrame(
        [(i, t, "en", "t", len(t)) for i, (t, _w) in enumerate(FW_ROWS)],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint")
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    for name in ("fineweb_filters", "refinedweb_lines", "url_block"):
        assert E.queries()[name](spark, str(tmp_path)).count() == len(FW_ROWS)
