"""Web-corpus hygiene ops: PII scrub + domain stats (operators/web.py)."""
from __future__ import annotations

from pyspark.sql import Row, functions as F

from document_ai_spark.operators.web import (
    domain_stats,
    extract_urls,
    scrub_pii,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(rows)],
        schema="doc_id bigint, text string")


def test_scrub_pii_literal(spark):
    d = _docs(spark, [
        "mail me at jane.doe+x@sub-1.example.co.uk today",
        "call +91-800-555-0101 or +1-212-555-0199",
        "server at 192.168.0.1 and 10.0.0.255 responded",
        "no pii here at all",
    ])
    out = {r["doc_id"]: r for r in scrub_pii(d).collect()}
    assert out[0]["text"] == "mail me at <EMAIL> today"
    assert (out[0]["n_email"], out[0]["n_phone"], out[0]["n_ipv4"]) == (1, 0, 0)
    assert out[1]["text"] == "call <PHONE> or <PHONE>"
    assert out[1]["n_phone"] == 2
    assert out[2]["text"] == "server at <IP> and <IP> responded"
    assert out[2]["n_ipv4"] == 2
    assert out[3]["text"] == "no pii here at all"
    assert (out[3]["n_email"], out[3]["n_phone"], out[3]["n_ipv4"]) == (0, 0, 0)


def test_scrub_pii_idempotent(spark):
    d = _docs(spark, [
        "a@b.com then +1-555-123-4567 then 8.8.8.8",
    ])
    once = scrub_pii(d)
    twice = scrub_pii(once.select("doc_id", "text"))
    r1, r2 = once.collect()[0], twice.collect()[0]
    assert r1["text"] == r2["text"] == "<EMAIL> then <PHONE> then <IP>"
    # the placeholders themselves match nothing
    assert (r2["n_email"], r2["n_phone"], r2["n_ipv4"]) == (0, 0, 0)


def test_scrub_pii_null_text(spark):
    d = spark.createDataFrame([Row(doc_id=0, text=None)],
                              schema="doc_id bigint, text string")
    r = scrub_pii(d).collect()[0]
    assert r["text"] is None
    assert r["n_email"] is None and r["n_phone"] is None and r["n_ipv4"] is None


def test_scrub_pii_counts_precede_replacement(spark):
    # an e-mail whose host is an IPv4: replaced once as <EMAIL>, but both
    # counters see the original text (documented independent-count rule)
    d = _docs(spark, ["ping admin@10.0.0.1 now"])
    r = scrub_pii(d).collect()[0]
    assert r["text"] == "ping <EMAIL> now"
    assert r["n_email"] == 1 and r["n_ipv4"] == 1


def test_scrub_pii_no_exchange(spark):
    d = _docs(spark, ["a@b.com"])
    plan = scrub_pii(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_extract_urls_and_domains(spark):
    d = _docs(spark, [
        "see https://w1.ex7.com/p/1 and http://ex7.org/q/1 end",
        "nothing linked",
        "dup https://w2.ex7.com/x/ twice https://w2.ex7.com/y/",
    ])
    urls = sorted((r["doc_id"], r["host"], r["domain"])
                  for r in extract_urls(d).collect())
    assert urls == [
        (0, "ex7.org", "ex7.org"),
        (0, "w1.ex7.com", "ex7.com"),
        (2, "w2.ex7.com", "ex7.com"),
        (2, "w2.ex7.com", "ex7.com"),
    ]
    stats = {r["domain"]: (r["n_urls"], r["n_docs"])
             for r in domain_stats(d).collect()}
    assert stats == {"ex7.com": (3, 2), "ex7.org": (1, 1)}


def test_domain_stats_single_exchange(spark):
    d = _docs(spark, ["https://a.b.com/x/"])
    plan = domain_stats(d)._jdf.queryExecution().executedPlan().toString()
    # exact count_distinct = the standard two-phase distinct aggregate:
    # one exchange keyed (domain, doc_id), one keyed (domain). Both carry
    # key+partial-count rows only — never text. A third exchange would
    # mean text leaked past the explode projection.
    n_hash_exchanges = plan.count("Exchange hashpartitioning")
    assert n_hash_exchanges == 2


# -- c4_clean ---------------------------------------------------------------

GOOD_PAGE = ("This is a good long sentence that ends well.\n"
             "Another full sentence with plenty of words here.\n"
             "And a third complete sentence closing the page.")


def _c4(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id bigint, text string")
    from document_ai_spark.operators.web import c4_clean
    return {r["doc_id"]: r.asDict() for r in c4_clean(df).collect()}


def test_c4_keeps_clean_page(spark):
    out = _c4(spark, [GOOD_PAGE])[0]
    assert out["c4_keep"] is True
    assert out["n_kept_lines"] == 3
    assert out["text_clean"] == GOOD_PAGE


def test_c4_line_rules_each_fire(spark):
    page = ("ends with no punctuation at all here\n"      # no terminal
            "Too few words.\n"                            # < 5 words
            "Please enable javascript to view this content today.\n"
            "This site uses cookies to improve your experience online.\n"
            "We keep this perfectly fine long sentence though.")
    out = _c4(spark, [page])[0]
    assert out["n_lines"] == 5
    assert out["n_kept_lines"] == 1
    assert out["text_clean"].startswith("We keep")
    assert out["c4_keep"] is False  # < 3 kept lines


def test_c4_page_rules(spark):
    brace = GOOD_PAGE + "\nvar x = { a: 1 } in a sentence ending here."
    lorem = GOOD_PAGE.replace("good long", "Lorem Ipsum")
    outs = _c4(spark, [brace, lorem])
    assert outs[0]["has_brace"] is True and outs[0]["c4_keep"] is False
    assert outs[1]["has_lorem"] is True and outs[1]["c4_keep"] is False


def test_c4_javascript_is_word_bounded(spark):
    # 'javascripting' must NOT trip the word rule; 'JavaScript' must.
    page = ("We love javascripting every single day with passion.\n"
            "JavaScript is required to view this page properly.\n"
            + GOOD_PAGE)
    out = _c4(spark, [page])[0]
    assert out["n_kept_lines"] == 4  # first line kept, second dropped


def test_c4_empty_and_null_safe(spark):
    out = _c4(spark, ["", "   \n  "])
    assert out[0]["c4_keep"] is False and out[0]["n_kept_lines"] == 0
    assert out[1]["c4_keep"] is False and out[1]["text_clean"] == ""


def test_c4_zero_exchanges(spark):
    from document_ai_spark.operators.web import c4_clean
    d = spark.createDataFrame([(0, GOOD_PAGE)],
                              "doc_id bigint, text string")
    plan = c4_clean(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
