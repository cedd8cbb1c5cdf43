"""Evaluation-harness tests: the pipeline must score 100% DLA against the
oracle's golden fields (self-consistency), plus rule-level unit checks."""
from __future__ import annotations

from pyspark.sql import functions as F

from document_ai_spark.plans import evaluate as EV
from document_ai_spark.plans import oracle as O
from document_ai_spark.plans import pipeline as P


def test_pipeline_scores_perfect_dla_vs_oracle(spark, corpus_dfs,
                                               small_corpus):
    docs, payloads = small_corpus
    _, golden_fields = O.golden(docs, payloads)
    gt = spark.createDataFrame(
        [{k: r[k] for k in ("doc_id", "dealer_name", "model_name",
                            "horse_power", "asset_cost",
                            "signature_present", "stamp_present")}
         for r in golden_fields],
        schema=("doc_id string, dealer_name string, model_name string, "
                "horse_power int, asset_cost double, "
                "signature_present boolean, stamp_present boolean"))
    docs_df, payloads_df = corpus_dfs
    pred = P.extract(docs_df, payloads_df)
    summary = EV.summarize(EV.evaluate(pred, gt)).collect()[0]
    assert summary["n_docs"] == len(golden_fields)
    assert summary["document_level_accuracy"] == 1.0


def test_match_rules(spark):
    pred = spark.createDataFrame([
        # fuzzy dealer >=90 passes; 5% numeric tolerance; presence flags
        ("d1", "MAHINDRA & MAHINDRA LTD", "swaraj 744 fe", 42, 104.9, True, False),
        # dealer typo below 90; hp off by >5%
        ("d2", "Totally Different Name", "X", 50, 100.0, False, False),
        # null == null matches
        ("d3", None, None, None, None, False, False),
    ], schema=("doc_id string, dealer_name string, model_name string, "
               "horse_power int, asset_cost double, "
               "signature_present boolean, stamp_present boolean"))
    gt = spark.createDataFrame([
        ("d1", "Mahindra & Mahindra Ltd", "SWARAJ 744 FE", 40, 100.0, True, False),
        ("d2", "Sri Amutham Tractors", "X", 56, 100.0, False, False),
        ("d3", None, None, None, None, False, False),
    ], schema=("doc_id string, dealer_name string, model_name string, "
               "horse_power int, asset_cost double, "
               "signature_present boolean, stamp_present boolean"))
    rows = {r["doc_id"]: r for r in EV.evaluate(pred, gt).collect()}
    assert rows["d1"]["dealer_correct"] == 1
    assert rows["d1"]["model_correct"] == 1
    assert rows["d1"]["hp_correct"] == 1          # 42 vs 40 = 5.0% exactly
    assert rows["d1"]["cost_correct"] == 1        # 104.9 vs 100 = 4.9%
    assert rows["d1"]["doc_correct"] == 1
    assert rows["d2"]["dealer_correct"] == 0
    assert rows["d2"]["hp_correct"] == 0          # 50 vs 56 > 5%
    assert rows["d2"]["doc_correct"] == 0
    assert rows["d3"]["doc_correct"] == 1         # all-null matches


def test_iou_box_match_expr(spark):
    df = spark.createDataFrame([
        ("a", [[0, 0, 10, 10]], [[1, 1, 11, 11]]),     # IoU ~0.68 -> match
        ("b", [[0, 0, 10, 10]], [[20, 20, 30, 30]]),   # disjoint
        ("c", [], [[0, 0, 10, 10]]),                   # no pred boxes
    ], schema=("doc_id string, pred_boxes array<array<int>>, "
               "gt_boxes array<array<int>>"))
    out = {r["doc_id"]: r["m"] for r in df.select(
        "doc_id",
        EV._boxes_iou_match(F.col("pred_boxes"), F.col("gt_boxes"))
        .alias("m")).collect()}
    assert out == {"a": True, "b": False, "c": False}
