"""dedup_weights (SoftDeDup-style reweighting): family mass sums to
one, singletons keep 1.0, chains collapse transitively."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_ai_spark.operators.dedup import dedup_weights


def _docs(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], ["doc_id"])


def _pairs(spark, edges):
    return spark.createDataFrame(edges, ["doc_a", "doc_b"])


def test_family_mass_and_singletons(spark):
    docs = _docs(spark, range(6))
    pairs = _pairs(spark, [(0, 1), (1, 2), (3, 4)])   # {0,1,2} {3,4} {5}
    out = {r["doc_id"]: r for r in
           dedup_weights(docs, pairs).collect()}
    assert len(out) == 6                               # every doc rowed
    assert [out[i]["weight"] for i in (0, 1, 2)] == [0.333333] * 3
    assert [out[i]["weight"] for i in (3, 4)] == [0.5, 0.5]
    assert out[5]["weight"] == 1.0
    assert out[5]["cluster"] == 5                      # own cluster id
    assert len({out[i]["cluster"] for i in (0, 1, 2)}) == 1


def test_chain_collapses_transitively(spark):
    n = 20
    docs = _docs(spark, range(n))
    pairs = _pairs(spark, [(i, i + 1) for i in range(n - 1)])
    out = dedup_weights(docs, pairs).collect()
    assert {r["cluster"] for r in out} == {0}
    assert all(r["weight"] == round(1 / n, 6) for r in out)
    total = sum(r["weight"] for r in out)
    assert abs(total - 1.0) < 1e-4                     # one doc of mass
