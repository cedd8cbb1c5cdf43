"""Quality-gate calibration floors (CALIBRATION.md): the combined
quality_gates keep rule must separate natural text from word salad,
boilerplate, and repetition bombs on the labeled micro-corpus. A
threshold change that degrades separation fails here — re-run
scripts/calibrate.py and look at the numbers before moving a default."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_ai_spark.operators.curation import quality_gates
from document_ai_spark.sources.labeled import (
    LABELED_SCHEMA,
    LABELS,
    gen_labeled_local,
)

LOGPROB_MIN = -8.0   # matches scripts/calibrate.py


@pytest.fixture(scope="module")
def gated(spark):
    docs = spark.createDataFrame(gen_labeled_local(60, seed=42),
                                 LABELED_SCHEMA)
    g = quality_gates(docs, logprob_min=LOGPROB_MIN)
    return docs.select("doc_id", "label").join(g, "doc_id").cache()


def test_combined_rule_precision_recall_floors(gated):
    agg = gated.agg(
        F.sum(((F.col("label") == "natural") & F.col("keep")).cast("int"))
        .alias("tp"),
        F.sum(((F.col("label") != "natural") & F.col("keep")).cast("int"))
        .alias("fp"),
        F.sum(((F.col("label") == "natural") & ~F.col("keep")).cast("int"))
        .alias("fn")).first()
    precision = agg["tp"] / max(agg["tp"] + agg["fp"], 1)
    recall = agg["tp"] / max(agg["tp"] + agg["fn"], 1)
    assert precision >= 0.95, f"precision {precision} (CALIBRATION.md: 1.0)"
    assert recall >= 0.95, f"recall {recall} (CALIBRATION.md: 1.0)"


def test_each_bad_class_is_rejected(gated):
    kept = {r["label"]: r["n"] for r in gated.where("keep")
            .groupBy("label").agg(F.count("*").alias("n")).collect()}
    for label in LABELS:
        if label == "natural":
            assert kept.get(label, 0) >= 57   # >= 95% of 60
        else:
            assert kept.get(label, 0) <= 3, (label, kept)


def test_gate_signals_point_at_their_class(gated):
    """Each signal must isolate ITS failure mode with a wide margin
    (the distribution table in CALIBRATION.md)."""
    m = {r["label"]: r for r in gated.groupBy("label").agg(
        F.avg("dup_line_frac").alias("dl"),
        F.avg("top_bigram_frac").alias("tb"),
        F.avg("unigram_logprob").alias("lp")).collect()}
    assert m["boilerplate"]["dl"] > 0.5 > 2 * m["natural"]["dl"]
    assert m["repetition"]["tb"] > 0.8 > 2 * m["natural"]["tb"]
    assert m["salad"]["lp"] < LOGPROB_MIN < m["natural"]["lp"]
