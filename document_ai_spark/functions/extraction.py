"""Invoice field extraction: reference-parity semantics, two renderings.

1. Pure-python functions (``extract_fields`` etc.) — used by the single-node
   oracle (plans/oracle.py) to produce golden values. These mirror the
   reference cascade exactly (reference backend/services/field_extractor.py:
   118-268, 394-454): pattern pass -> fuzzy pass (strictly-greater confidence
   wins) -> range/trim post-process -> master validation.

2. Spark Column builders (``hp_col``/``cost_col``/``model_col``/``dealer_col``
   and ``with_pattern_fields``) — the SAME semantics rendered as built-in
   Catalyst expressions (regexp_extract(_all), higher-order array functions,
   CASE), so the hot path is whole-stage-codegen JVM work, not Python.
   Only the fuzzy master lookup (difflib scoring, field_extractor.py:244-266)
   drops to an Arrow-vectorized pandas UDF.

The reference applies ``re.IGNORECASE`` to HP/cost/model scans and
case-sensitive matching to dealer header lines (field_extractor.py:175,189,
206 vs 219); we prefix ``(?i)`` accordingly on the Spark side.
"""
from __future__ import annotations

import re
from functools import lru_cache as _lru_cache
from typing import Dict, List, Optional, Tuple

from .. import constants as C
from .fuzzy import PartialRatioScorer, best_full_match, best_partial_match

# ---------------------------------------------------------------------------
# Pure-python reference semantics (oracle side)
# ---------------------------------------------------------------------------


def extract_hp(text: str) -> Optional[int]:
    """First pattern whose first match parses to an in-range HP
    (field_extractor.py:174-184)."""
    for pattern in C.HP_PATTERNS:
        m = re.search(pattern, text, re.IGNORECASE)
        if m:
            try:
                hp = int(m.group(1))
            except (ValueError, IndexError):
                continue
            if C.HP_MIN <= hp <= C.HP_MAX:
                return hp
    return None


def extract_cost(text: str) -> Optional[float]:
    """All matches across all patterns, numeric > 10k, take max
    (field_extractor.py:186-202)."""
    candidates: List[float] = []
    for pattern in C.COST_PATTERNS:
        for m in re.findall(pattern, text, re.IGNORECASE):
            try:
                v = float(m.replace(",", "").replace(" ", ""))
            except (ValueError, TypeError):
                continue
            if v > C.COST_MIN_CANDIDATE:
                candidates.append(v)
    return max(candidates) if candidates else None


def extract_model(text: str) -> Optional[str]:
    """First pattern match longer than 3 chars after strip
    (field_extractor.py:204-213)."""
    for pattern, n_groups in C.MODEL_PATTERNS:
        m = re.search(pattern, text, re.IGNORECASE)
        if m:
            raw = m.group(1) if n_groups == 1 else " ".join(m.groups())
            model = raw.strip()
            if len(model) > C.MODEL_MIN_LEN:
                return model
    return None


def extract_dealer(text: str) -> Optional[str]:
    """Scan first 10 lines, patterns in order, case-SENSITIVE, len>5
    (field_extractor.py:215-227)."""
    for line in text.split("\n")[: C.DEALER_HEADER_LINES]:
        stripped = line.strip()
        for pattern in C.DEALER_PATTERNS:
            m = re.search(pattern, stripped)
            if m:
                dealer = m.group(1).strip()
                if len(dealer) > C.DEALER_MIN_LEN:
                    return dealer
    return None


def extract_fields(text: str, kv_fields: Optional[Dict] = None
                   ) -> Dict[str, Dict]:
    """Full deterministic cascade: patterns -> fuzzy -> kv-fill ->
    post-process (reference order: field_extractor.py:138-160, with the
    label-value stage standing in for the conditional LLM stage — the LLM
    itself is keyless/non-deterministic in the reference too,
    field_extractor.py:111-113). Returns the reference's result shape
    {field: {value, confidence, method}}.
    """
    hp = extract_hp(text)
    cost = extract_cost(text)
    model = extract_model(text)
    dealer = extract_dealer(text)

    result = {
        "dealer_name": {
            "value": dealer,
            "confidence": C.CONF_DEALER_PATTERN if dealer else 0.0,
            "method": "pattern" if dealer else None,
        },
        "model_name": {
            "value": model,
            "confidence": C.CONF_MODEL_PATTERN if model else 0.0,
            "method": "pattern" if model else None,
        },
        "horse_power": {
            "value": hp,
            "confidence": C.CONF_HP_PATTERN if hp is not None else 0.0,
            "method": "pattern" if hp is not None else None,
        },
        "asset_cost": {
            "value": cost,
            "confidence": C.CONF_COST_PATTERN if cost is not None else 0.0,
            "method": "pattern" if cost is not None else None,
        },
    }

    # Fuzzy pass overrides on strictly-greater confidence
    # (field_extractor.py:144-148). One shared text index for both lists.
    text_upper = text.upper()
    scorer = PartialRatioScorer(text_upper)
    fd, fd_score = best_partial_match(
        text_upper, C.DEALER_MASTER, C.FUZZY_DEALER_EXTRACT_MIN,
        scorer=scorer,
    )
    if fd is not None and fd_score / 100.0 > result["dealer_name"]["confidence"]:
        result["dealer_name"] = {
            "value": fd, "confidence": fd_score / 100.0, "method": "fuzzy",
        }
    fm, fm_score = best_partial_match(
        text_upper, C.MODEL_MASTER, C.FUZZY_MODEL_EXTRACT_MIN,
        scorer=scorer,
    )
    if fm is not None and fm_score / 100.0 > result["model_name"]["confidence"]:
        result["model_name"] = {
            "value": fm, "confidence": fm_score / 100.0, "method": "fuzzy",
        }

    if kv_fields:
        result = ensemble_with_kv(result, kv_fields)

    return post_process(result)


def post_process(result: Dict[str, Dict]) -> Dict[str, Dict]:
    """Range nulling + trim (field_extractor.py:394-419)."""
    hp = result["horse_power"]["value"]
    if hp is not None and not (C.HP_MIN <= hp <= C.HP_MAX):
        result["horse_power"] = {"value": None, "confidence": 0.0,
                                 "method": result["horse_power"]["method"]}
    cost = result["asset_cost"]["value"]
    if cost is not None and not (C.COST_MIN <= cost <= C.COST_MAX):
        result["asset_cost"] = {"value": None, "confidence": 0.0,
                                "method": result["asset_cost"]["method"]}
    for f in ("dealer_name", "model_name"):
        if result[f]["value"]:
            result[f]["value"] = result[f]["value"].strip()
    return result


_KV_CONF = 0.8


def normalize_kv_value(field: str, value: Optional[str]):
    """Normalize a label-value-pair value to the field's type, mirroring the
    reference's LLM-response parsing (field_extractor.py:377-387:
    int() for HP, comma-stripped float() for cost)."""
    if value is None:
        return None
    value = value.strip()
    if not value:
        return None
    if field == "horse_power":
        digits = re.sub(r"[^\d]", "", value)
        return int(digits) if digits else None
    if field == "asset_cost":
        digits = re.sub(r"[^\d.]", "", value)
        try:
            return float(digits) if digits else None
        except ValueError:
            return None
    return value


def ensemble_with_kv(result: Dict[str, Dict],
                     kv_fields: Dict[str, Optional[str]]) -> Dict[str, Dict]:
    """Fill fields from label-value pairs when missing or low-confidence.

    Plays the reference's conditional-LLM slot with identical gating
    (field_extractor.py:150-157: fire only when value is None or
    confidence < 0.5), but deterministic: the candidate comes from the
    media layout stage's label-value pairing instead of a model call.
    """
    for field in ("dealer_name", "model_name", "horse_power", "asset_cost"):
        cur = result[field]
        if cur["value"] is None or cur["confidence"] < 0.5:
            cand = normalize_kv_value(field, kv_fields.get(field))
            if cand is not None:
                result[field] = {
                    "value": cand, "confidence": _KV_CONF, "method": "kv",
                }
    return result


def validate_against_master(
    dealer: Optional[str], model: Optional[str]
) -> Dict[str, Dict]:
    """First-master-over-threshold validation (field_extractor.py:421-454)."""
    validation = {
        "dealer_name": {"valid": False, "match_score": 0, "matched_to": None},
        "model_name": {"valid": False, "match_score": 0, "matched_to": None},
    }
    if dealer:
        m, s = best_full_match(dealer.upper(), C.DEALER_MASTER,
                               C.FUZZY_DEALER_VALID_MIN)
        if m is not None:
            validation["dealer_name"] = {
                "valid": True, "match_score": s, "matched_to": m}
    if model:
        m, s = best_full_match(model.upper(), C.MODEL_MASTER,
                               C.FUZZY_MODEL_VALID_MIN)
        if m is not None:
            validation["model_name"] = {
                "valid": True, "match_score": s, "matched_to": m}
    return validation


def overall_confidence(confidences: List[float]) -> Optional[float]:
    """Null-skipping mean of field confidences (document_processor.py:196-204)."""
    pos = [c for c in confidences if c > 0]
    return sum(pos) / len(pos) if pos else None


def conf_bucket(c: float) -> str:
    """Confidence level bucketing (agentic_ai.py:391-402)."""
    for threshold, name in C.CONF_BUCKETS:
        if c >= threshold:
            return name
    return C.CONF_BUCKET_DEFAULT


# ---------------------------------------------------------------------------
# Spark Column builders (pipeline side) — same semantics, JVM execution.
# Imported lazily so the pure functions stay importable without pyspark.
# ---------------------------------------------------------------------------


def _F():
    from pyspark.sql import functions as F
    return F


def py_strip(col):
    """Python str.strip() parity: Spark's trim() removes only ASCII
    spaces, while the reference strips all whitespace (\\n, \\t, ...).
    Found by the hypothesis dialect test — a model name extracted across
    a line boundary kept its trailing newline under trim().

    (?U) = Java UNICODE_CHARACTER_CLASS so \\s also covers NBSP etc.,
    which Python str.strip() removes."""
    F = _F()
    return F.regexp_replace(col, r"(?U)^\s+|\s+$", "")


# Python's int()/float() parse any Unicode decimal digit (the reference
# extracts '५५ एचपी' as HP=55); Spark casts are ASCII-only, so digits
# captured by a (?U)-Unicode \d are transliterated before try_cast.
# Devanagari is the script the reference's Hindi patterns target.
_DEVANAGARI_DIGITS = "०१२३४५६७८९"


def _ascii_digits(col):
    F = _F()
    return F.translate(col, _DEVANAGARI_DIGITS, "0123456789")


# ---------------------------------------------------------------------------
# Keyword pre-screens for the pattern regexes.
#
# Java regex scans the FULL text per pattern (~6-15 us/KB); String.contains
# is an intrinsified indexOf (~20x cheaper). Each guard below is a SOUND
# superset of its regex — the guard literals appear verbatim (case-folded)
# in every possible match, so `guard == false` implies `no match` and the
# regex can be skipped under a codegen branch. Measured corpus hit rates
# (bench corpus, sf0.1): HORSE/ONLY/अश्वशक्ति 0.0, एचपी 0.18, AMOUNT 0.22,
# COST 0.23, TOTAL 0.51, HP 0.75 — i.e. most of the 17 full-text regex
# scans are skipped for most documents. Soundness is property-tested
# against the unguarded forms in tests/test_extraction_parity.py.
# Keys are indices into the corresponding *_PATTERNS list; a missing key
# means no useful guard exists (e.g. cost[0]'s 'RS' hits 99% of docs).
# ---------------------------------------------------------------------------
_HP_GUARDS = {0: ["HP"], 1: ["HP", "H.P"], 2: ["HP"], 3: ["HORSE"],
              4: ["एचपी"], 5: ["अश्वशक्ति"]}
_COST_GUARDS = {1: ["TOTAL"], 2: ["GRAND"], 3: ["AMOUNT"], 4: ["FULL"],
                5: ["ONLY"], 6: ["COST"]}
_MODEL_GUARDS = {0: ["MODEL"]}


def _guard(up, literals):
    """OR of contains checks over the given literals."""
    F = _F()
    g = None
    for lit in literals:
        c = up.contains(F.lit(lit))
        g = c if g is None else (g | c)
    return g


def hp_col(text, up=None):
    """HP cascade as coalesce over per-pattern validated extracts.

    (?U) matches Python re's Unicode-aware \\d/\\s (field_extractor.py
    uses `re` defaults, which match Devanagari digits). `up` is an
    optional pre-computed upper(text) column the keyword guards run
    against (computed inline when absent)."""
    F = _F()
    if up is None:
        up = F.upper(text)
    candidates = []
    for i, pat in enumerate(C.HP_PATTERNS):
        # try_cast: '' (no match) and malformed digits become NULL, matching
        # the reference's swallowed ValueError (field_extractor.py:183).
        v = _ascii_digits(F.regexp_extract(text, "(?iU)" + pat, 1)) \
            .try_cast("int")
        cand = F.when(v.between(C.HP_MIN, C.HP_MAX), v)
        if i in _HP_GUARDS:
            cand = F.when(_guard(up, _HP_GUARDS[i]), cand)
        candidates.append(cand)
    return F.coalesce(*candidates)


def cost_col(text, up=None):
    """All-pattern findall -> clean -> filter>10k -> max, as array exprs.

    findall can't short-circuit (every pattern's matches feed the max),
    so the keyword guards replace a skipped pattern's array with a typed
    empty array before the concat."""
    F = _F()
    if up is None:
        up = F.upper(text)
    empty = F.expr("CAST(array() AS ARRAY<STRING>)")
    arrays = []
    for i, pat in enumerate(C.COST_PATTERNS):
        arr = F.regexp_extract_all(text, F.lit("(?iU)" + pat), 1)
        if i in _COST_GUARDS:
            arr = F.when(_guard(up, _COST_GUARDS[i]), arr).otherwise(empty)
        arrays.append(arr)
    allm = F.concat(*arrays)
    nums = F.transform(
        allm,
        lambda x: _ascii_digits(
            F.regexp_replace(F.regexp_replace(x, ",", ""), " ", ""))
        .try_cast("double"),
    )
    valid = F.filter(nums, lambda v: v > F.lit(float(C.COST_MIN_CANDIDATE)))
    return F.array_max(valid)


def model_col(text, up=None):
    """Model cascade; 2-group pattern joins groups with a space."""
    F = _F()
    if up is None:
        up = F.upper(text)
    candidates = []
    for i, (pat, n_groups) in enumerate(C.MODEL_PATTERNS):
        jpat = "(?iU)" + pat
        if n_groups == 1:
            raw = F.regexp_extract(text, jpat, 1)
            raw = F.when(raw != "", raw)
        else:
            g1 = F.regexp_extract(text, jpat, 1)
            g2 = F.regexp_extract(text, jpat, 2)
            raw = F.when(g1 != "", F.concat_ws(" ", g1, g2))
        v = py_strip(raw)
        cand = F.when(F.length(v) > C.MODEL_MIN_LEN, v)
        if i in _MODEL_GUARDS:
            cand = F.when(_guard(up, _MODEL_GUARDS[i]), cand)
        candidates.append(cand)
    return F.coalesce(*candidates)


# Per-line keyword guards for the dealer patterns (case-SENSITIVE, like
# the patterns): every possible match of pattern i contains one of these
# literals verbatim, so a line without all of them skips that regex.
_DEALER_GUARDS = {
    0: ["Ltd", "Limited", "Corporation", "Tractors", "Sales", "Dealer"],
    1: ["Dealer"],
    2: ["Tractors"],
    3: ["Agro", "Agriculture", "Industries"],
}


def dealer_col(text):
    """Header-prior dealer scan: first 10 lines x 4 case-sensitive patterns,
    earliest line wins, pattern order breaks ties within a line. Rendered as
    higher-order array functions so it stays in codegen."""
    F = _F()
    lines = F.slice(F.split(text, "\n"), 1, C.DEALER_HEADER_LINES)

    def per_line(line):
        stripped = py_strip(line)
        cands = []
        for i, pat in enumerate(C.DEALER_PATTERNS):
            # (?U) only — dealer matching stays case-SENSITIVE.
            v = py_strip(F.regexp_extract(stripped, "(?U)" + pat, 1))
            cand = F.when(F.length(v) > C.DEALER_MIN_LEN, v)
            cands.append(F.when(_guard(line, _DEALER_GUARDS[i]), cand))
        return F.coalesce(*cands)

    per_line_hits = F.filter(
        F.transform(lines, per_line), lambda x: x.isNotNull()
    )
    # F.get is null-safe on empty arrays (unlike element_at under ANSI),
    # so the 40-regex hits tree appears ONCE — a when(size>0, element_at)
    # guard would duplicate it and measurably blow up plan analysis time.
    return F.get(per_line_hits, 0)


def with_pattern_fields(df, text_col: str = "combined_text"):
    """Add pat_* value/confidence columns for all four fields.

    The upper-cased text the keyword guards scan is materialized ONCE as
    a scratch column (`_pf_up`) rather than re-derived inside each of the
    ~14 guard expressions — one byte-copy per row instead of one per
    guard (subexpression elimination would usually dedupe it, but an
    explicit attribute makes the single evaluation structural)."""
    F = _F()
    vals, confs = _pattern_field_cols(text_col)
    return (df.withColumn("_pf_up", F.upper(F.col(text_col)))
            .withColumns(vals).withColumns(confs).drop("_pf_up"))


@_lru_cache(maxsize=None)
def _pattern_field_cols(text_col: str):
    """Static Column trees, built once (regex CASE cascades are hundreds
    of py4j calls; see plans/pipeline.py plan-build cost note)."""
    F = _F()
    text = F.col(text_col)
    up = F.col("_pf_up")
    vals = {
        "pat_hp": hp_col(text, up),
        "pat_cost": cost_col(text, up),
        "pat_model": model_col(text, up),
        "pat_dealer": dealer_col(text),
    }
    confs = {
        "pat_hp_conf": F.when(F.col("pat_hp").isNotNull(),
                              F.lit(C.CONF_HP_PATTERN)).otherwise(0.0),
        "pat_cost_conf": F.when(F.col("pat_cost").isNotNull(),
                                F.lit(C.CONF_COST_PATTERN)).otherwise(0.0),
        "pat_model_conf": F.when(F.col("pat_model").isNotNull(),
                                 F.lit(C.CONF_MODEL_PATTERN)).otherwise(0.0),
        "pat_dealer_conf": F.when(F.col("pat_dealer").isNotNull(),
                                  F.lit(C.CONF_DEALER_PATTERN)).otherwise(0.0),
    }
    return vals, confs


def conf_bucket_col(conf):
    """CASE-expression rendering of conf_bucket (agentic_ai.py:391-402)."""
    F = _F()
    expr = F.lit(C.CONF_BUCKET_DEFAULT)
    for threshold, name in reversed(C.CONF_BUCKETS):
        expr = F.when(conf >= threshold, name).otherwise(expr)
    return expr
