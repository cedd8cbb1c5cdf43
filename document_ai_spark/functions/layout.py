"""Media-span layout parsing: the deterministic analog of OCR + vision.

A media span's ``media_ref`` resolves to a synthetic "scan" payload
(sources/docgen.py) carrying positioned tokens, label-value regions, and
signature/stamp marks — the same information PaddleOCR/YOLO would emit in
the reference (backend/services/ocr_service.py:88-98,
backend/services/vision_service.py:99-107). The reference itself ships
library-free fallback paths (ocr_service.py:124-131, vision heuristics
vision_service.py:123-272); this module re-implements those *semantics*
deterministically over the symbolic payload:

  * layout sort by (y1, x1)           — ocr_service.py:105
  * raw_text = "\\n".join(tokens)      — ocr_service.py:110
  * mean block confidence             — ocr_service.py:107
  * header/body/footer zoning         — ocr_service.py:143-165
  * signature heuristic (bottom 40%, area 0.5-15% of region, aspect 1.5-6,
    conf 0.65)                        — vision_service.py:165-209
  * stamp heuristic (area 0.5-10% of page, circularity>0.4 or aspect
    0.7-1.4, conf 0.6+0.3*circ)       — vision_service.py:211-272
  * greedy IoU>0.3 box union merge    — vision_service.py:274-308
  * top-3 signatures / top-5 stamps   — vision_service.py:209,272

Pure python; imported by both the oracle and the Arrow UDF stage.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from .. import constants as C

Box = Tuple[int, int, int, int]  # x1, y1, x2, y2


def iou(a: Box, b: Box) -> float:
    """Intersection-over-union (vision_service.py:310-326)."""
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0, x2 - x1) * max(0, y2 - y1)
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    union = area_a + area_b - inter
    return inter / union if union > 0 else 0.0


def merge_overlapping(
    dets: List[Dict], iou_threshold: float = C.MERGE_IOU_THRESHOLD
) -> List[Dict]:
    """Greedy confidence-descending box-union merge
    (vision_service.py:274-308). Stable sort keeps input order on ties."""
    if not dets:
        return []
    dets = sorted(dets, key=lambda d: -d["conf"])
    used = [False] * len(dets)
    merged: List[Dict] = []
    for i, d1 in enumerate(dets):
        if used[i]:
            continue
        used[i] = True
        box = list(d1["box"])
        for j in range(i + 1, len(dets)):
            if used[j]:
                continue
            if iou(tuple(d1["box"]), tuple(dets[j]["box"])) > iou_threshold:
                used[j] = True
                b2 = dets[j]["box"]
                box[0] = min(box[0], b2[0])
                box[1] = min(box[1], b2[1])
                box[2] = max(box[2], b2[2])
                box[3] = max(box[3], b2[3])
        merged.append({"box": tuple(box), "conf": d1["conf"]})
    return merged


def detect_signatures(
    marks: Sequence[Dict], page_w: int, page_h: int
) -> List[Dict]:
    """Signature heuristic on symbolic marks (vision_service.py:165-209)."""
    region_top = int(page_h * C.SIG_REGION_TOP)
    region_area = page_w * (page_h - region_top)
    out = []
    for m in marks:
        if m["cls"] != "signature":
            continue
        x1, y1, x2, y2 = m["x1"], m["y1"], m["x2"], m["y2"]
        if y1 < region_top:          # contour must lie in the bottom crop
            continue
        w, h = x2 - x1, y2 - y1
        if h <= 0 or w <= 0:
            continue
        area = w * h
        if not (C.SIG_AREA_MIN_FRAC * region_area < area
                < C.SIG_AREA_MAX_FRAC * region_area):
            continue
        aspect = w / h
        if not (C.SIG_ASPECT_MIN < aspect < C.SIG_ASPECT_MAX):
            continue
        out.append({"box": (x1, y1, x2, y2), "conf": C.SIG_CONF})
    return merge_overlapping(out)[: C.SIG_TOPK]


def detect_stamps(
    marks: Sequence[Dict], page_w: int, page_h: int
) -> List[Dict]:
    """Stamp heuristic on symbolic marks (vision_service.py:211-272).
    Circularity of the (unobserved) contour is proxied by squareness
    min(w,h)/max(w,h) — deterministic and monotone in the same feature."""
    page_area = page_w * page_h
    out = []
    for m in marks:
        if m["cls"] != "stamp":
            continue
        x1, y1, x2, y2 = m["x1"], m["y1"], m["x2"], m["y2"]
        w, h = x2 - x1, y2 - y1
        if h <= 0 or w <= 0:
            continue
        area = w * h
        if not (C.STAMP_AREA_MIN_FRAC * page_area < area
                < C.STAMP_AREA_MAX_FRAC * page_area):
            continue
        circ = min(w, h) / max(w, h)
        aspect = w / h
        if circ > C.STAMP_CIRC_MIN or (
            C.STAMP_ASPECT_MIN < aspect < C.STAMP_ASPECT_MAX
        ):
            out.append(
                {
                    "box": (x1, y1, x2, y2),
                    "conf": round(C.STAMP_BASE_CONF + C.STAMP_CIRC_WEIGHT * circ, 6),
                }
            )
    return merge_overlapping(out)[: C.STAMP_TOPK]


def zone_of(y1: int, y2: int, page_h: int) -> str:
    """header / body / footer by relative y-center (ocr_service.py:155-161)."""
    rel = ((y1 + y2) / 2) / page_h if page_h else 0.0
    if rel < C.ZONE_HEADER_MAX:
        return "header"
    if rel > C.ZONE_FOOTER_MIN:
        return "footer"
    return "body"


_KV_LABELS = {
    "horse_power": ("hp", "horse power", "एचपी"),
    "asset_cost": ("cost", "total", "amount", "price"),
    "model_name": ("model",),
    "dealer_name": ("dealer", "supplier", "seller"),
}


def extract_kv_fields(kv_pairs: Sequence[Dict]) -> Dict[str, Optional[str]]:
    """Label-value pairing (north_star): first kv region whose label
    contains a field keyword, reading order = input order."""
    out: Dict[str, Optional[str]] = {
        "dealer_name": None, "model_name": None,
        "horse_power": None, "asset_cost": None,
    }
    for kv in kv_pairs:
        label = (kv.get("label") or "").strip().lower()
        value = (kv.get("value") or "").strip()
        if not value:
            continue
        for field, keys in _KV_LABELS.items():
            if out[field] is None and any(k in label for k in keys):
                out[field] = value
                break
    return out


def parse_media_payload(payload: Dict) -> Dict:
    """Full per-media-span parse. Input is one media_payloads row (dict with
    page_w, page_h, tokens, kv_pairs, marks); output is the parsed struct the
    pipeline and oracle both consume."""
    page_w, page_h = payload["page_w"], payload["page_h"]
    tokens = sorted(
        payload.get("tokens") or [], key=lambda t: (t["y1"], t["x1"])
    )
    raw_text = "\n".join(t["text"] for t in tokens)
    confs = [t["conf"] for t in tokens]
    avg_conf = (sum(confs) / len(confs)) if confs else 0.0

    zones = {"header": 0, "body": 0, "footer": 0}
    for t in tokens:
        zones[zone_of(t["y1"], t["y2"], page_h)] += 1

    marks = payload.get("marks") or []
    sigs = detect_signatures(marks, page_w, page_h)
    stamps = detect_stamps(marks, page_w, page_h)

    return {
        "raw_text": raw_text,
        "n_blocks": len(tokens),
        "avg_conf": round(avg_conf, 6),
        "zones": zones,
        "signature_present": bool(sigs),
        "signature_conf": 0.7 if sigs else 0.0,   # vision_service.py:152-160
        "signature_boxes": [d["box"] for d in sigs],
        "stamp_present": bool(stamps),
        "stamp_conf": 0.7 if stamps else 0.0,
        "stamp_boxes": [d["box"] for d in stamps],
        "kv_fields": extract_kv_fields(payload.get("kv_pairs") or []),
    }
