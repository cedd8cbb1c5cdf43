"""Deterministic interleaved-corpus generator (BASELINE.json input_hint).

Produces the engine's primary input tables:

    documents_interleaved(doc_id: string,
                          spans: array<struct<kind,text,media_ref,offset:int>>)
    media_payloads(media_ref, page_w, page_h, tokens[], kv_pairs[], marks[])

Workload shape mirrors the reference corpus profile (FIXTURES.md §1):
~90% of docs are 1-5 text spans, ~9% mixed, ~1% media-heavy (8-64 media
spans) — the long-tail skew the north_rule requires explicit salting for.
Text spans are templated HTML invoices (dealer header line, model, HP, cost
in Rs-format, occasional Hindi) wrapped in nav/footer link-farm chrome for
the DOM boilerplate-strip stage; media payloads are symbolic scans with
positioned tokens, label-value regions, and signature/stamp marks
(deterministic stand-ins for PaddleOCR/YOLO output — the reference's own
fallback paths are library-free too: backend/services/ocr_service.py:124-131,
backend/services/vision_service.py:123-272).

Everything is a pure function of (doc index, seed): no wall-clock, no uuid4
(unlike reference backend/main.py:451), so generation can run distributed
inside mapInPandas with per-doc reproducibility, and the single-node oracle
regenerates identical inputs.
"""
from __future__ import annotations

import random
from typing import Dict, List, Tuple

from .. import constants as C

# Span-array order is intentionally scrambled at write time: correct output
# order must be carried by `offset`, never by physical position.

_FILLER_WORDS = (
    "quotation for supply of agricultural tractor as per enquiry terms "
    "delivery within thirty days from confirmed order subject to availability "
    "warranty two years standard fitment includes hydraulics and pto"
).split()

_NAV_LINKS = ["Home", "Products", "Dealers", "Finance", "Service", "Contact",
              "About Us", "Careers", "Offers", "Support"]

_EXTRA_MODELS = ["XT-750 PLUS", "AGRIKING 20", "POWERTRAC 439", "FARMTRAC 60"]

_HINDI_HP = "एचपी"


def _doc_rng(i: int, seed: int) -> random.Random:
    return random.Random((seed << 32) ^ (i * 2654435761 % (1 << 61)))


def _fmt_inr(v: int) -> str:
    """Indian-style digit grouping: 911769 -> '9,11,769'."""
    s = str(v)
    if len(s) <= 3:
        return s
    head, tail = s[:-3], s[-3:]
    parts = []
    while len(head) > 2:
        parts.insert(0, head[-2:])
        head = head[:-2]
    if head:
        parts.insert(0, head)
    return ",".join(parts + [tail])


def _nav_html(rng: random.Random) -> str:
    links = "".join(
        f'<a href="/{w.lower().replace(" ", "-")}">{w}</a> | '
        for w in rng.sample(_NAV_LINKS, k=6)
    )
    return f"<nav>{links}</nav>"


def _footer_html(rng: random.Random) -> str:
    links = "".join(
        f'<a href="#">{w}</a> '
        for w in rng.sample(_NAV_LINKS, k=5)
    )
    return f"<footer><div>{links}</div><div><a href='#'>Privacy</a> <a href='#'>Terms</a></div></footer>"


def _invoice_body(rng: random.Random) -> Tuple[List[str], Dict]:
    """Main-content HTML fragments for one invoice + planted truth values.
    Returned as a LIST of block fragments so gen_doc can interleave the
    invoice content across several text spans — extraction then genuinely
    depends on cross-span reassembly, not on any single span."""
    truth: Dict = {}
    lines: List[str] = ["<h1>TRACTOR QUOTATION</h1>"]

    # Dealer: 80% a master dealer (sometimes lightly distorted), 10% a
    # non-master pattern-matchable name, 10% absent.
    r = rng.random()
    if r < 0.8:
        dealer = rng.choice(C.DEALER_MASTER[:-1])  # ASCII masters
        if rng.random() < 0.25:  # distortion exercises fuzzy vs pattern
            dealer_shown = dealer.replace("Ltd", "Limited") \
                if "Ltd" in dealer else dealer.upper()
        else:
            dealer_shown = dealer
        lines.append(f"<div>{dealer_shown}</div>")
        truth["dealer_planted"] = dealer
    elif r < 0.9:
        dealer_shown = "Bharat Krishi Tractors"
        lines.append(f"<div>{dealer_shown}</div>")
        truth["dealer_planted"] = dealer_shown
    else:
        truth["dealer_planted"] = None

    lines.append("<div>GSTIN: 21AAACT2727Q1Z{}</div>".format(rng.randint(0, 9)))

    # Model: 75% master, 15% extra, 10% absent.
    r = rng.random()
    if r < 0.75:
        model = rng.choice(C.MODEL_MASTER)
        lines.append(f"<div>Model: {model}</div>")
        truth["model_planted"] = model
    elif r < 0.9:
        model = rng.choice(_EXTRA_MODELS)
        lines.append(f"<div>Model: {model}</div>")
        truth["model_planted"] = model
    else:
        truth["model_planted"] = None

    # HP: 80% valid, 10% out-of-range (post-process nulls), 10% absent;
    # 20% of present HPs rendered in Hindi.
    r = rng.random()
    if r < 0.9:
        hp = rng.randint(20, 200) if r < 0.8 else rng.randint(201, 400)
        unit = _HINDI_HP if rng.random() < 0.2 else "HP"
        lines.append(f"<div>Power: {hp} {unit}</div>")
        truth["hp_planted"] = hp
    else:
        truth["hp_planted"] = None

    # Cost: 80% valid range, 10% below 1e5 (extracted then nulled), 10%
    # absent. Sometimes a second smaller figure tests the max() rule.
    r = rng.random()
    if r < 0.9:
        cost = rng.randint(100_000, 2_000_000) if r < 0.8 \
            else rng.randint(10_001, 99_999)
        label = rng.choice(["Total", "Grand Total", "Amount",
                            "Cost of Tractor"])
        lines.append(f"<div>{label}: Rs. {_fmt_inr(cost)}</div>")
        if rng.random() < 0.3:
            part = max(10_001, cost // rng.randint(2, 5))
            lines.append(f"<div>Advance: Rs. {_fmt_inr(part)}</div>")
        truth["cost_planted"] = cost
    else:
        truth["cost_planted"] = None

    filler = " ".join(rng.choices(_FILLER_WORDS, k=rng.randint(8, 30)))
    lines.append(f"<p>{filler}</p>")
    return lines, truth


def gen_media_payload(media_ref: str, rng: random.Random) -> Dict:
    """One symbolic scan payload."""
    page_w = rng.choice([1240, 1654, 2048])
    page_h = rng.choice([1754, 2339, 2048])

    tokens: List[Dict] = []
    y = int(page_h * 0.05)
    dealer = rng.choice(C.DEALER_MASTER[:-1])
    model = rng.choice(C.MODEL_MASTER)
    hp = rng.randint(20, 200)
    cost = rng.randint(100_000, 2_000_000)
    text_lines = [
        dealer,
        "QUOTATION",
        f"Model: {model}",
        f"{hp} HP",
        f"Total: Rs. {_fmt_inr(cost)}",
    ] + [
        " ".join(rng.choices(_FILLER_WORDS, k=rng.randint(3, 8)))
        for _ in range(rng.randint(4, 20))
    ]
    for line in text_lines:
        x1 = rng.randint(40, 200)
        h = rng.randint(24, 48)
        tokens.append({
            "text": line,
            "conf": round(rng.uniform(0.82, 0.99), 4),
            "x1": x1, "y1": y,
            "x2": x1 + 12 * max(1, len(line)), "y2": y + h,
        })
        y += h + rng.randint(6, 30)
        if y > page_h - 80:
            break

    kv_pairs = [
        {"label": "Dealer", "value": dealer,
         "x1": 40, "y1": 100, "x2": 600, "y2": 140},
        {"label": "Model", "value": model,
         "x1": 40, "y1": 150, "x2": 600, "y2": 190},
        {"label": "HP", "value": str(hp),
         "x1": 40, "y1": 200, "x2": 300, "y2": 240},
        {"label": "Total Cost", "value": f"Rs. {_fmt_inr(cost)}",
         "x1": 40, "y1": 250, "x2": 500, "y2": 290},
    ]

    marks: List[Dict] = []
    # Valid signature: bottom 40%, aspect ~2-5, sane area.
    if rng.random() < 0.7:
        w = rng.randint(int(page_w * 0.15), int(page_w * 0.3))
        h = max(10, int(w / rng.uniform(2.0, 5.0)))
        x1 = rng.randint(0, page_w - w - 1)
        y1 = rng.randint(int(page_h * 0.62), page_h - h - 1)
        marks.append({"cls": "signature", "x1": x1, "y1": y1,
                      "x2": x1 + w, "y2": y1 + h, "conf": 0.9})
    # Distractor signature in the top half — must be rejected.
    if rng.random() < 0.3:
        marks.append({"cls": "signature", "x1": 100, "y1": 50,
                      "x2": 400, "y2": 150, "conf": 0.9})
    # Valid near-square stamp.
    if rng.random() < 0.6:
        s = rng.randint(int(page_w * 0.08), int(page_w * 0.18))
        x1 = rng.randint(0, page_w - s - 1)
        y1 = rng.randint(int(page_h * 0.5), page_h - s - 1)
        marks.append({"cls": "stamp", "x1": x1, "y1": y1,
                      "x2": x1 + s, "y2": y1 + int(s * rng.uniform(0.85, 1.15)),
                      "conf": 0.8})
    # Distractor stamp: extreme aspect, fails both circ and aspect gates.
    if rng.random() < 0.25:
        marks.append({"cls": "stamp", "x1": 10, "y1": 10,
                      "x2": 10 + int(page_w * 0.4), "y2": 10 + 20, "conf": 0.8})

    return {
        "media_ref": media_ref,
        "page_w": page_w, "page_h": page_h,
        "tokens": tokens, "kv_pairs": kv_pairs, "marks": marks,
    }


def gen_doc(i: int, seed: int = 42) -> Tuple[Dict, List[Dict]]:
    """One interleaved doc row + its media payload rows."""
    rng = _doc_rng(i, seed)
    doc_id = f"doc_{i:09d}"

    r = rng.random()
    if r < 0.90:
        n_text, n_media = rng.randint(1, 5), 0          # text-only
    elif r < 0.99:
        n_text, n_media = rng.randint(1, 3), rng.randint(1, 3)   # mixed
    else:
        n_text, n_media = rng.randint(0, 2), rng.randint(8, 64)  # media-heavy

    spans: List[Dict] = []
    payloads: List[Dict] = []
    offset = 0

    # Interleave the invoice blocks across ALL text spans (contiguous
    # chunks in offset order) so no single span carries the document:
    # correct extraction requires correct cross-span reassembly.
    body_blocks, _truth = _invoice_body(rng)
    if n_text > 0:
        chunk = max(1, -(-len(body_blocks) // n_text))  # ceil division
        chunks = [body_blocks[i:i + chunk]
                  for i in range(0, len(body_blocks), chunk)]
        chunks += [[] for _ in range(n_text - len(chunks))]
    else:
        chunks = []
    for ci in range(n_text):
        content = "".join(chunks[ci])
        filler = " ".join(rng.choices(_FILLER_WORDS, k=rng.randint(5, 25)))
        html = (
            "<html><body>" + _nav_html(rng) + content
            + f"<p>{filler}</p>" + _footer_html(rng) + "</body></html>"
        )
        spans.append({"kind": "text", "text": html,
                      "media_ref": "", "offset": offset})
        offset += 1

    for k in range(n_media):
        media_ref = f"m_{doc_id}_{k}"
        payloads.append(gen_media_payload(media_ref, rng))
        spans.append({"kind": "media", "text": "",
                      "media_ref": media_ref, "offset": offset})
        offset += 1

    # Scramble physical order: output order must be carried by `offset`.
    rng.shuffle(spans)
    return {"doc_id": doc_id, "spans": spans}, payloads


def gen_corpus_local(n_docs: int, seed: int = 42
                     ) -> Tuple[List[Dict], List[Dict]]:
    """Driver-side corpus for tests and the single-node oracle."""
    docs, payloads = [], []
    for i in range(n_docs):
        d, p = gen_doc(i, seed)
        docs.append(d)
        payloads.extend(p)
    return docs, payloads


# ---------------------------------------------------------------------------
# Spark-side schemas + distributed writer
# ---------------------------------------------------------------------------

def interleaved_schema():
    from pyspark.sql import types as T
    return T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", T.ArrayType(T.StructType([
            T.StructField("kind", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("offset", T.IntegerType()),
        ]))),
    ])


def payload_schema():
    from pyspark.sql import types as T
    box = [
        T.StructField("x1", T.IntegerType()),
        T.StructField("y1", T.IntegerType()),
        T.StructField("x2", T.IntegerType()),
        T.StructField("y2", T.IntegerType()),
    ]
    return T.StructType([
        T.StructField("media_ref", T.StringType()),
        T.StructField("page_w", T.IntegerType()),
        T.StructField("page_h", T.IntegerType()),
        T.StructField("tokens", T.ArrayType(T.StructType(
            [T.StructField("text", T.StringType()),
             T.StructField("conf", T.DoubleType())] + box))),
        T.StructField("kv_pairs", T.ArrayType(T.StructType(
            [T.StructField("label", T.StringType()),
             T.StructField("value", T.StringType())] + box))),
        T.StructField("marks", T.ArrayType(T.StructType(
            [T.StructField("cls", T.StringType())] + box
            + [T.StructField("conf", T.DoubleType())]))),
    ])


def build_corpus_df(spark, n_docs: int, seed: int = 42, partitions: int = 32):
    """Distributed generation: each partition generates its own doc range via
    mapInPandas — no driver-side materialization, scales linearly."""
    import pandas as pd

    def gen_partition(batches):
        for pdf in batches:
            rows = [gen_doc(int(i), seed)[0] for i in pdf["id"]]
            yield pd.DataFrame(rows)

    base = spark.range(n_docs).repartition(partitions)
    docs = base.mapInPandas(gen_partition, schema=interleaved_schema())

    def gen_payloads(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rows.extend(gen_doc(int(i), seed)[1])
            # Empty batch: columns MUST be object-typed — a bare
            # pd.DataFrame({...: []}) defaults to float64 and Arrow
            # cannot convert float64 -> list<struct> (hit whenever a
            # partition draws no media docs, i.e. small corpora spread
            # over many partitions).
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                {f.name: pd.Series([], dtype=object)
                 for f in payload_schema().fields})

    payloads = base.mapInPandas(gen_payloads, schema=payload_schema())
    return docs, payloads


def write_corpus(spark, out_dir: str, n_docs: int, seed: int = 42,
                 partitions: int = 32) -> None:
    docs, payloads = build_corpus_df(spark, n_docs, seed, partitions)
    docs.write.mode("overwrite").parquet(f"{out_dir}/documents_interleaved.parquet")
    payloads.write.mode("overwrite").parquet(f"{out_dir}/media_payloads.parquet")
