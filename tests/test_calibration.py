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


@pytest.fixture(scope="module")
def mixed_gated(spark):
    from document_ai_spark.sources.labeled import gen_labeled_mixed_local
    docs = spark.createDataFrame(gen_labeled_mixed_local(seed=7),
                                 LABELED_SCHEMA)
    g = quality_gates(docs, logprob_min="auto")
    return docs.select("doc_id", "label").join(g, "doc_id").cache()


def test_per_slice_auto_floor_precision_recall(mixed_gated):
    """logprob_min='auto' (per-(lang, source) Tukey fence) must keep
    natural and reject salad WITHIN EACH LANGUAGE slice — the floors
    differ by >1 nat between the en word-token and zh char-token slices
    (CALIBRATION.md), so this is exactly where a global constant
    misfires."""
    rows = mixed_gated.groupBy("lang", "label", "keep").count().collect()
    agg = {}
    for r in rows:
        agg.setdefault((r["lang"], r["label"]), {})[r["keep"]] = r["count"]
    for lang in ("en", "zh"):
        tp = agg.get((lang, "natural"), {}).get(True, 0)
        fn = agg.get((lang, "natural"), {}).get(False, 0)
        fp = agg.get((lang, "salad"), {}).get(True, 0)
        precision = tp / max(tp + fp, 1)
        recall = tp / max(tp + fn, 1)
        assert precision >= 0.95, (lang, precision)
        assert recall >= 0.95, (lang, recall)


def test_slice_floors_are_slice_specific(spark):
    """The derived floors must actually differ across slices (else
    'auto' degenerates to a global constant) and each slice's salad
    mass must sit below its own floor while natural sits above."""
    from document_ai_spark.operators.curation import slice_logprob_floors
    from document_ai_spark.operators.textquality import with_unigram_logprob
    from document_ai_spark.sources.labeled import gen_labeled_mixed_local

    docs = spark.createDataFrame(gen_labeled_mixed_local(seed=7),
                                 LABELED_SCHEMA)
    floors = {r["lang"]: r["logprob_floor"]
              for r in slice_logprob_floors(docs).collect()}
    assert abs(floors["en"] - floors["zh"]) > 0.5
    lp = (with_unigram_logprob(docs)
          .join(docs.select("doc_id", "lang", "label"), "doc_id")
          .groupBy("lang", "label")
          .agg(F.avg("unigram_logprob").alias("m")).collect())
    means = {(r["lang"], r["label"]): r["m"] for r in lp}
    for lang in ("en", "zh"):
        assert means[(lang, "salad")] < floors[lang] < \
            means[(lang, "natural")]
