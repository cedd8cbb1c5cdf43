"""canonical_url / url_dedup (operators/web.py): the C4 page-identity
rule — one kept document per canonical URL."""
from pyspark.sql import functions as F

from document_ai_spark.operators.web import canonical_url, url_dedup


def _canon(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "doc_id long, url string")
    return [r["c"] for r in
            df.select(canonical_url(F.col("url")).alias("c"))
              .orderBy("doc_id").collect()]


def test_canonical_url_cases(spark):
    got = _canon(spark, [
        "HTTP://WWW.Example.COM:80/Path/1/?utm_source=x&id=7#frag",
        "https://example.com:443/",
        "https://example.com",
        "http://ex.com/p?utm_a=1&utm_b=2&c=3",
        "http://ex.com/p?a=1&gclid=zz",
        "http://ex.com/p?fbclid=zz",
        "https://ex.com:8080/p/",
        "not a url",
        "ftp://files.ex.com/x/",
    ])
    assert got == [
        "http://example.com/Path/1?id=7",
        "https://example.com",
        "https://example.com",
        "http://ex.com/p?c=3",
        "http://ex.com/p?a=1",
        "http://ex.com/p",
        "https://ex.com:8080/p",   # non-default port survives
        None,
        "ftp://files.ex.com/x",    # scheme preserved, no port rule
    ]


def test_url_dedup_first_seen_wins(spark):
    rows = [
        (10, "https://WWW.ex.com/a/?utm_x=1"),
        (11, "https://ex.com/a"),
        (12, "https://ex.com/b"),
        (13, "garbage"),
        (14, "garbage"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: (r["canon_url"], r["keep_doc_id"])
           for r in url_dedup(df).collect()}
    assert out[10] == ("https://ex.com/a", 10)
    assert out[11] == ("https://ex.com/a", 10)
    assert out[12] == ("https://ex.com/b", 12)
    # unparseable rows are each their own keeper, never merged
    assert out[13] == (None, 13) and out[14] == (None, 14)
