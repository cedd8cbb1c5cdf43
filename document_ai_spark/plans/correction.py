"""Self-correction pass (reference P24/P25 semantics).

The reference's orchestrated path re-extracts fields that failed
validation with stricter alternative patterns (reference
backend/services/agentic_ai.py:264-326, also coordinator.py:269-308):

  * horse_power: three 2-digit patterns, case-SENSITIVE (no re.IGNORECASE
    in the correction path), accepted range narrowed to [20, 100]
  * asset_cost: findall ALL comma-numbers, keep 1e5..5e7, take max

Spark-first rendering: a filtered second pass over only the failed rows
(cheap df.filter), corrections computed with built-in expressions, then
merged back by coalescing — the reference's conditional re-run becomes a
CASE, not a union + shuffle. Shared pure-python twins feed the oracle.
"""
from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import DataFrame, functions as F

HP_CORRECTION_PATTERNS = [
    r"(\d{2})\s*[Hh][Pp]",
    r"(\d{2})\s*H\.P",
    r"HP[-\s:]+(\d{2})",
]
HP_CORR_MIN, HP_CORR_MAX = 20, 100      # agentic_ai.py:307
COST_CORR_PATTERN = r"[\d,]+(?:\.\d{2})?"
COST_CORR_MIN, COST_CORR_MAX = 100_000, 50_000_000


# -- pure-python (oracle) ----------------------------------------------------

def reextract_hp(text: str) -> Optional[int]:
    """agentic_ai.py:295-308 — stricter 2-digit, case-sensitive scan."""
    for pattern in HP_CORRECTION_PATTERNS:
        m = re.search(pattern, text)
        if m:
            hp = int(m.group(1))
            if HP_CORR_MIN <= hp <= HP_CORR_MAX:
                return hp
    return None


def reextract_cost(text: str) -> Optional[float]:
    """agentic_ai.py:310-325 — all numbers in range, max."""
    valid = []
    for num_str in re.findall(COST_CORR_PATTERN, text):
        try:
            num = float(num_str.replace(",", ""))
        except ValueError:
            continue
        if COST_CORR_MIN <= num <= COST_CORR_MAX:
            valid.append(num)
    return max(valid) if valid else None


def correct_fields(hp, cost, text: str):
    """Apply corrections only to missing fields (the NEEDS_REVIEW
    condition: value failed validation / is absent)."""
    new_hp, hp_corrected = hp, False
    new_cost, cost_corrected = cost, False
    if hp is None:
        cand = reextract_hp(text)
        if cand is not None:
            new_hp, hp_corrected = cand, True
    if cost is None:
        cand = reextract_cost(text)
        if cand is not None:
            new_cost, cost_corrected = cand, True
    return new_hp, hp_corrected, new_cost, cost_corrected


# -- Spark expressions (pipeline) --------------------------------------------

def hp_correction_col(text):
    candidates = []
    for pat in HP_CORRECTION_PATTERNS:
        v = F.regexp_extract(text, pat, 1).try_cast("int")
        candidates.append(F.when(v.between(HP_CORR_MIN, HP_CORR_MAX), v))
    return F.coalesce(*candidates)


def cost_correction_col(text):
    nums = F.transform(
        F.regexp_extract_all(text, F.lit(COST_CORR_PATTERN), 0),
        lambda x: F.regexp_replace(x, ",", "").try_cast("double"),
    )
    valid = F.filter(
        nums,
        lambda v: v.between(float(COST_CORR_MIN), float(COST_CORR_MAX)),
    )
    return F.array_max(valid)


def apply_corrections(ext: DataFrame,
                      text_col: str = "combined_text") -> DataFrame:
    """Second-pass correction over failed rows only. The stricter regexes
    run inside a CASE gated on the failure predicate, so Catalyst skips
    them for the (vast) majority of already-valid rows."""
    text = F.col(text_col)
    hp_fail = F.col("horse_power").isNull()
    cost_fail = F.col("asset_cost").isNull()
    hp_corr = F.when(hp_fail, hp_correction_col(text))
    cost_corr = F.when(cost_fail, cost_correction_col(text))
    return ext.withColumns({
        "hp_corrected": hp_corr.isNotNull(),
        "cost_corrected": cost_corr.isNotNull(),
        "horse_power": F.coalesce(F.col("horse_power"), hp_corr),
        "asset_cost": F.coalesce(F.col("asset_cost"), cost_corr),
        "hp_method": F.when(hp_corr.isNotNull(), F.lit("re-extraction"))
                      .otherwise(F.col("hp_method")),
        "cost_method": F.when(cost_corr.isNotNull(), F.lit("re-extraction"))
                        .otherwise(F.col("cost_method")),
    })
