"""Self-correction pass: Spark expressions vs pure-python oracle twins,
plus end-to-end over the pipeline."""
from __future__ import annotations

from pyspark.sql import functions as F

from document_ai_spark.plans import correction as CR
from document_ai_spark.plans import pipeline as P


def test_reextract_semantics():
    # Case-SENSITIVE: 'hp' lowercase does match [Hh][Pp]; 'H.P' exact.
    assert CR.reextract_hp("power 55 HP") == 55
    assert CR.reextract_hp("55 H.P unit") == 55
    assert CR.reextract_hp("HP: 45") == 45
    # 2-digit window slides: '450 HP' matches at '50 HP'
    assert CR.reextract_hp("450 HP") == 50
    # '155 HP' matches at '55 HP' — the stricter pattern intentionally
    # re-admits a 2-digit reading of a 3-digit figure (reference behavior)
    assert CR.reextract_hp("power 155 HP") == 55
    assert CR.reextract_hp("no power") is None
    assert CR.reextract_cost("totals 1,50,000 and 2,50,000") == 250000.0
    assert CR.reextract_cost("just 99,999") is None


def test_correction_only_fills_missing():
    hp, hc, cost, cc = CR.correct_fields(60, None, "cost 5,00,000")
    assert (hp, hc) == (60, False)
    assert (cost, cc) == (500000.0, True)
    hp2, hc2, cost2, cc2 = CR.correct_fields(None, 1.0, "no power here")
    assert (hp2, hc2) == (None, False)
    assert (cost2, cc2) == (1.0, False)


def test_spark_matches_oracle_on_pipeline_output(spark, corpus_dfs,
                                                 small_corpus):
    from document_ai_spark.plans import oracle as O

    docs, payloads = small_corpus
    payload_by_ref = {p["media_ref"]: p for p in payloads}
    docs_df, payloads_df = corpus_dfs

    ext = P.extract(docs_df, payloads_df)
    corrected = CR.apply_corrections(ext)
    got = {r["doc_id"]: (r["horse_power"], r["hp_corrected"],
                         r["asset_cost"], r["cost_corrected"])
           for r in corrected.select(
               "doc_id", "horse_power", "hp_corrected",
               "asset_cost", "cost_corrected").collect()}

    n_corrected = 0
    for doc in docs:
        r = O.process_doc(doc, payload_by_ref)
        f = r["fields"]
        hp, hc, cost, cc = CR.correct_fields(
            f["horse_power"]["value"], f["asset_cost"]["value"],
            r["combined_text"])
        assert got[doc["doc_id"]] == (hp, hc, cost, cc), doc["doc_id"]
        n_corrected += int(hc or cc)
    # The corpus plants out-of-range/missing values, so the correction
    # pass must actually fire somewhere.
    assert n_corrected > 0


def test_correction_is_gated(spark, corpus_dfs):
    """Rows with valid values must pass through untouched."""
    docs_df, payloads_df = corpus_dfs
    ext = P.extract(docs_df, payloads_df)
    corrected = CR.apply_corrections(ext)
    both = ext.select("doc_id", F.col("horse_power").alias("hp0")).join(
        corrected.select("doc_id", "horse_power", "hp_corrected"), "doc_id")
    bad = both.where(
        F.col("hp0").isNotNull()
        & ((F.col("horse_power") != F.col("hp0")) | F.col("hp_corrected"))
    ).count()
    assert bad == 0
