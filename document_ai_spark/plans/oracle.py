"""Single-node oracle: golden span sequences + golden fields.

Runs the reference-parity semantics (functions/*) eagerly over a local
corpus, producing the golden set the Spark pipeline must match exactly
(BASELINE.json per-row invariant: span-sequence equality on
(kind, text, media_ref, order)).

This is deliberately the same pure functions the pipeline's UDF stages
import — the golden tests therefore verify the DISTRIBUTED PLUMBING
(explode/salt/shuffle/reassemble ordering, Arrow batching, join
correctness), which is exactly what can silently break at scale.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from .. import constants as C
from ..functions.extraction import (
    extract_fields,
    overall_confidence,
    validate_against_master,
)
from ..functions.layout import parse_media_payload
from ..functions.textops import extract_main_text


def process_doc(doc: Dict, payload_by_ref: Dict[str, Dict]) -> Dict:
    """Full per-document reference pipeline, single-node."""
    spans = sorted(doc["spans"], key=lambda s: s["offset"])

    out_spans: List[Tuple[str, str, str, int]] = []
    span_texts: List[str] = []
    kv_fields: Dict[str, str] = {}
    sig_present = stamp_present = False
    sig_conf = stamp_conf = 0.0
    zones = {"header": 0, "body": 0, "footer": 0}

    for s in spans:
        if s["kind"] == "text":
            main = extract_main_text(s["text"])
            out_spans.append(("text", main, "", s["offset"]))
            span_texts.append(main)
        else:
            parsed = parse_media_payload(payload_by_ref[s["media_ref"]])
            out_spans.append(("media", parsed["raw_text"], s["media_ref"],
                              s["offset"]))
            span_texts.append(parsed["raw_text"])
            # First non-null kv candidate per field, offset order.
            for f, v in parsed["kv_fields"].items():
                if v is not None and f not in kv_fields:
                    kv_fields[f] = v
            # Doc-level presence = any page; conf = max page conf
            # (document_processor.py:151-152,185-190).
            sig_present = sig_present or parsed["signature_present"]
            stamp_present = stamp_present or parsed["stamp_present"]
            sig_conf = max(sig_conf, parsed["signature_conf"])
            stamp_conf = max(stamp_conf, parsed["stamp_conf"])
            # Structured zone rollup (ocr_service.py:143-165).
            for z, n in parsed["zones"].items():
                zones[z] += n

    combined_text = C.PAGE_BREAK.join(span_texts)
    fields = extract_fields(combined_text, kv_fields=kv_fields)
    validation = validate_against_master(
        fields["dealer_name"]["value"], fields["model_name"]["value"]
    )
    conf = overall_confidence(
        [
            fields["dealer_name"]["confidence"],
            fields["model_name"]["confidence"],
            fields["horse_power"]["confidence"],
            fields["asset_cost"]["confidence"],
            sig_conf,
            stamp_conf,
        ]
    )

    return {
        "doc_id": doc["doc_id"],
        "out_spans": out_spans,
        "combined_text": combined_text,
        "fields": fields,
        "validation": validation,
        "signature_present": sig_present,
        "stamp_present": stamp_present,
        "signature_conf": sig_conf,
        "stamp_conf": stamp_conf,
        "overall_confidence": conf,
        "zones": zones,
    }


def golden(docs: Sequence[Dict], payloads: Sequence[Dict]
           ) -> Tuple[List[Dict], List[Dict]]:
    """(golden_spans rows, golden_fields rows) for a local corpus."""
    payload_by_ref = {p["media_ref"]: p for p in payloads}
    spans_rows, fields_rows = [], []
    for doc in docs:
        r = process_doc(doc, payload_by_ref)
        spans_rows.append({"doc_id": r["doc_id"], "spans": r["out_spans"]})
        f = r["fields"]
        fields_rows.append(
            {
                "doc_id": r["doc_id"],
                "dealer_name": f["dealer_name"]["value"],
                "dealer_conf": f["dealer_name"]["confidence"],
                "dealer_method": f["dealer_name"]["method"],
                "model_name": f["model_name"]["value"],
                "model_conf": f["model_name"]["confidence"],
                "model_method": f["model_name"]["method"],
                "horse_power": f["horse_power"]["value"],
                "hp_conf": f["horse_power"]["confidence"],
                "hp_method": f["horse_power"]["method"],
                "asset_cost": f["asset_cost"]["value"],
                "cost_conf": f["asset_cost"]["confidence"],
                "cost_method": f["asset_cost"]["method"],
                "signature_present": r["signature_present"],
                "signature_conf": r["signature_conf"],
                "stamp_present": r["stamp_present"],
                "stamp_conf": r["stamp_conf"],
                "overall_confidence": r["overall_confidence"],
                "dealer_valid": r["validation"]["dealer_name"]["valid"],
                "dealer_matched_to": r["validation"]["dealer_name"]["matched_to"],
                "model_valid": r["validation"]["model_name"]["valid"],
                "model_matched_to": r["validation"]["model_name"]["matched_to"],
                "zones": (r["zones"]["header"], r["zones"]["body"],
                          r["zones"]["footer"]),
            }
        )
    return spans_rows, fields_rows
