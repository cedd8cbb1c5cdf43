"""Shared fixtures: one session-scoped SparkSession, small local corpora."""
from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from document_ai_spark.session import get_spark          # noqa: E402
from document_ai_spark.sources import docgen             # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("document_ai_spark-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_corpus():
    """200 docs: covers text-only / mixed / media-heavy profiles at seed 42."""
    return docgen.gen_corpus_local(200, seed=42)


@pytest.fixture(scope="session")
def corpus_dfs(spark, small_corpus):
    docs, payloads = small_corpus
    docs_df = spark.createDataFrame(docs, schema=docgen.interleaved_schema())
    payloads_df = spark.createDataFrame(payloads,
                                        schema=docgen.payload_schema())
    return docs_df, payloads_df
