"""Golden tests: the distributed pipeline must match the single-node oracle
exactly — span sequences (the BASELINE.json per-row invariant) and fields."""
from __future__ import annotations

import math

import pytest

from document_ai_spark.plans import oracle as O
from document_ai_spark.plans import pipeline as P


@pytest.fixture(scope="module")
def golden(small_corpus):
    docs, payloads = small_corpus
    spans_rows, fields_rows = O.golden(docs, payloads)
    return ({r["doc_id"]: r["spans"] for r in spans_rows},
            {r["doc_id"]: r for r in fields_rows})


@pytest.fixture(scope="module")
def extractions(spark, corpus_dfs):
    docs_df, payloads_df = corpus_dfs
    ext = P.extract(docs_df, payloads_df)
    ext.cache()
    yield ext
    ext.unpersist()


def test_span_sequence_equality(extractions, golden):
    """(kind, text, media_ref, order) per doc, exact, all docs."""
    golden_spans, _ = golden
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"])
                      for s in r["spans"]]
        for r in P.output_spans(extractions).collect()
    }
    assert set(got) == set(golden_spans)
    for doc_id, expected in golden_spans.items():
        assert got[doc_id] == list(expected), f"span mismatch in {doc_id}"


def _close(a, b):
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    if isinstance(a, float) or isinstance(b, float):
        return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-12)
    return a == b


FIELD_COLS = [
    "dealer_name", "dealer_conf", "dealer_method",
    "model_name", "model_conf", "model_method",
    "horse_power", "hp_conf", "hp_method",
    "asset_cost", "cost_conf", "cost_method",
    "signature_present", "signature_conf",
    "stamp_present", "stamp_conf",
    "overall_confidence",
    "dealer_valid", "dealer_matched_to",
    "model_valid", "model_matched_to",
]


def test_field_equality(extractions, golden):
    _, golden_fields = golden
    rows = extractions.select("doc_id", *FIELD_COLS).collect()
    assert len(rows) == len(golden_fields)
    for row in rows:
        exp = golden_fields[row["doc_id"]]
        for col in FIELD_COLS:
            assert _close(row[col], exp[col]), (
                f"{row['doc_id']}.{col}: spark={row[col]!r} "
                f"oracle={exp[col]!r}")


def test_zone_struct_equality(extractions, golden):
    """Doc-level header/body/footer block counts (the reference OCR
    stage's structured zones output, ocr_service.py:143-165)."""
    _, golden_fields = golden
    for row in extractions.select("doc_id", "zones").collect():
        z = row["zones"]
        assert (z["header"], z["body"], z["footer"]) == \
            golden_fields[row["doc_id"]]["zones"], row["doc_id"]


def test_partition_count_invariance(spark, corpus_dfs, golden):
    """Same output at a pathological partitioning (1 and 17 partitions)."""
    golden_spans, _ = golden
    docs_df, payloads_df = corpus_dfs
    for n in (1, 17):
        ext = P.extract(docs_df.repartition(n), payloads_df.repartition(n))
        got = {
            r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"])
                          for s in r["spans"]]
            for r in P.output_spans(ext).collect()
        }
        assert got == {k: list(v) for k, v in golden_spans.items()}


def test_salt_bucket_invariance(corpus_dfs, golden):
    """Salting is a physical knob: K must never change results."""
    golden_spans, _ = golden
    docs_df, payloads_df = corpus_dfs
    for k in (1, 3):
        ext = P.extract(docs_df, payloads_df, salt_buckets=k)
        got = {
            r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"])
                          for s in r["spans"]]
            for r in P.output_spans(ext).collect()
        }
        assert got == {k2: list(v) for k2, v in golden_spans.items()}
