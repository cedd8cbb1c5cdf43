"""Skew handling: media-heavy long-tail docs must be split across salt
groups in reassembly phase 1 (the north_rule's explicit skew mitigation),
and the split must never leak into results (salt invariance is covered in
test_pipeline_golden)."""
from __future__ import annotations

from pyspark.sql import functions as F

from document_ai_spark import constants as C
from document_ai_spark.plans.pipeline import parse_spans
from document_ai_spark.sources.docgen import interleaved_schema, payload_schema


def test_media_heavy_doc_splits_across_salts(spark):
    spans = [{"kind": "text", "text": f"<p>span {i}</p>", "media_ref": "",
              "offset": i} for i in range(64)]
    docs = spark.createDataFrame(
        [{"doc_id": "heavy", "spans": spans},
         {"doc_id": "small", "spans": spans[:2]}],
        schema=interleaved_schema())
    payloads = spark.createDataFrame([], schema=payload_schema())
    parsed = parse_spans(docs, payloads)
    k = C.MEDIA_SALT_BUCKETS
    dist = (parsed.groupBy("doc_id", F.pmod(F.col("offset"), F.lit(k))
                           .alias("salt"))
            .count().groupBy("doc_id")
            .agg(F.count("*").alias("n_groups"),
                 F.max("count").alias("max_group")).collect())
    rows = {r["doc_id"]: r for r in dist}
    # 64 spans spread over all K salt reducers, biggest group 64/K
    assert rows["heavy"]["n_groups"] == k
    assert rows["heavy"]["max_group"] == 64 // k
    assert rows["small"]["n_groups"] == 2


def test_corpus_has_the_long_tail(small_corpus):
    """The generator must actually produce the skew the engine claims to
    handle: ~1% media-heavy docs with 8-64 media spans."""
    docs, _ = small_corpus
    media_counts = [sum(1 for s in d["spans"] if s["kind"] == "media")
                    for d in docs]
    assert max(media_counts) >= 8
    assert sum(1 for c in media_counts if c == 0) > len(docs) * 0.7


def test_derived_salt_count_bounds_kilospan_doc(spark):
    """SURVEY §7.4 hard-part 3 'done' gate: K comes from span-count
    quantiles, a 10^3-span doc's per-reducer share is bounded by
    ~1/K, and reassembly output is byte-identical to any pinned K."""
    import math

    from document_ai_spark.plans.pipeline import (
        derive_salt_buckets, extract, parse_spans)

    def doc(doc_id, n):
        return {"doc_id": doc_id,
                "spans": [{"kind": "text", "text": f"<p>s {i} of {doc_id}</p>",
                           "media_ref": "", "offset": i} for i in range(n)]}

    rows = [doc(f"d{i:03d}", 6) for i in range(300)] + [doc("heavy", 1000)]
    docs = spark.createDataFrame(rows, schema=interleaved_schema())
    payloads = spark.createDataFrame([], schema=payload_schema())

    k = derive_salt_buckets(docs)
    # p99.9 lands on the 1000-span tail, median on 6: K well above the
    # constant floor, power of two, clamped.
    assert k > C.MEDIA_SALT_BUCKETS and k <= 256 and (k & (k - 1)) == 0

    parsed = parse_spans(docs, payloads)
    heavy = (parsed.where(F.col("doc_id") == "heavy")
             .groupBy(F.pmod(F.col("offset"), F.lit(k)).alias("salt"))
             .count().agg(F.max("count")).first()[0])
    assert heavy <= math.ceil(1000 / k), \
        f"largest salt group {heavy} exceeds 1000/{k}"

    derived = extract(docs, payloads).orderBy("doc_id").collect()
    pinned = extract(docs, payloads, salt_buckets=8).orderBy("doc_id").collect()
    assert derived == pinned, "salting must never change output bytes"


def test_derived_salt_floor_on_uniform_corpus(spark):
    """A tail-free corpus keeps the proven constant floor (K=1 would
    funnel any future long doc into one reducer)."""
    from document_ai_spark.plans.pipeline import derive_salt_buckets

    rows = [{"doc_id": f"u{i}", "spans": [
        {"kind": "text", "text": "<p>x</p>", "media_ref": "", "offset": 0}]}
        for i in range(50)]
    docs = spark.createDataFrame(rows, schema=interleaved_schema())
    assert derive_salt_buckets(docs) == C.MEDIA_SALT_BUCKETS
