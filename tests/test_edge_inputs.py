"""Edge-input behavior of the pipeline at the public API surface."""
from __future__ import annotations

from document_ai_spark.plans.pipeline import extract
from document_ai_spark.sources.docgen import interleaved_schema, payload_schema


def test_zero_span_doc_is_retained(spark):
    """explode_outer keeps empty docs in the extractions table (a plain
    explode would silently drop them — data loss at scale)."""
    docs = spark.createDataFrame(
        [
            {"doc_id": "empty_doc", "spans": []},
            {"doc_id": "normal", "spans": [
                {"kind": "text", "text": "<p>55 HP</p>",
                 "media_ref": "", "offset": 0}]},
        ],
        schema=interleaved_schema(),
    )
    payloads = spark.createDataFrame([], schema=payload_schema())
    rows = {r["doc_id"]: r for r in extract(docs, payloads).collect()}
    assert set(rows) == {"empty_doc", "normal"}
    assert rows["empty_doc"]["out_spans"] == []
    assert rows["empty_doc"]["horse_power"] is None
    assert rows["normal"]["horse_power"] == 55


def test_out_of_order_offsets_sorted(spark):
    docs = spark.createDataFrame(
        [{"doc_id": "d", "spans": [
            {"kind": "text", "text": "<p>second</p>", "media_ref": "",
             "offset": 5},
            {"kind": "text", "text": "<p>first</p>", "media_ref": "",
             "offset": 2},
        ]}],
        schema=interleaved_schema(),
    )
    payloads = spark.createDataFrame([], schema=payload_schema())
    row = extract(docs, payloads).collect()[0]
    assert [(s["text"], s["order"]) for s in row["out_spans"]] == [
        ("first", 2), ("second", 5)]


def test_media_ref_missing_payload_placeholder_and_metric(spark):
    """A media span whose payload is missing survives as an empty
    placeholder span (left join) and is counted in n_missing_payloads —
    never silently dropped."""
    docs = spark.createDataFrame(
        [{"doc_id": "d", "spans": [
            {"kind": "text", "text": "<p>keep me</p>", "media_ref": "",
             "offset": 0},
            {"kind": "media", "text": "", "media_ref": "missing",
             "offset": 1},
        ]}],
        schema=interleaved_schema(),
    )
    payloads = spark.createDataFrame([], schema=payload_schema())
    row = extract(docs, payloads).collect()[0]
    assert [(s["kind"], s["text"]) for s in row["out_spans"]] == [
        ("text", "keep me"), ("media", "")]
    assert row["n_missing_payloads"] == 1
