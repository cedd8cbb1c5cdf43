"""stream_decontaminate: stateless streaming benchmark decontamination
— exact n-gram blocklist + optional MinHash fuzzy pass per micro-batch
against a static eval set."""
from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from document_ai_spark.streaming.feedback import stream_decontaminate

_EVAL = ("which planet in the solar system has the most moons "
         "and how many of them were discovered after the year "
         "two thousand by ground based telescopes")

_CLEAN = ("the quarterly revenue of the company rose by twelve percent "
          "compared to the previous fiscal year according to reports")


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "doc_id string, text string") \
        .coalesce(1).write.mode("append").parquet(path)


def test_stream_decontaminate_exact_and_fuzzy(spark, tmp_path):
    ev = str(tmp_path / "eval.parquet")
    pq.write_table(pa.table({"doc_id": [100], "text": [_EVAL]}), ev)

    words = _EVAL.split()
    paraphrase = " ".join(
        w.upper() + "x" if i % 5 == 0 else w for i, w in enumerate(words))

    in_dir = str(tmp_path / "in")
    _write_batch(spark, in_dir, [("verbatim", _EVAL), ("clean1", _CLEAN)])

    kwargs = dict(ngram=5, fuzzy_jaccard=0.1, bands=8, rows=1)
    q = stream_decontaminate(spark, in_dir, ev, str(tmp_path / "out"),
                             str(tmp_path / "ckpt"), **kwargs)
    q.awaitTermination()

    # second batch arrives later: the paraphrase (5-gram-blind) and
    # another clean doc — the static eval set filters it identically
    _write_batch(spark, in_dir, [("para", paraphrase),
                                 ("clean2", _CLEAN + " again today")])
    q = stream_decontaminate(spark, in_dir, ev, str(tmp_path / "out"),
                             str(tmp_path / "ckpt"), **kwargs)
    q.awaitTermination()

    kept = {r["doc_id"]
            for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert kept == {"clean1", "clean2"}   # verbatim: exact; para: fuzzy


def test_stream_decontaminate_exact_only(spark, tmp_path):
    # without fuzzy_jaccard the paraphrase sails through — pins that the
    # fuzzy pass is what catches it, not the blocklist
    ev = str(tmp_path / "eval.parquet")
    pq.write_table(pa.table({"doc_id": [100], "text": [_EVAL]}), ev)
    words = _EVAL.split()
    paraphrase = " ".join(
        w.upper() + "x" if i % 5 == 0 else w for i, w in enumerate(words))
    in_dir = str(tmp_path / "in")
    _write_batch(spark, in_dir, [("verbatim", _EVAL), ("para", paraphrase)])
    q = stream_decontaminate(spark, in_dir, ev, str(tmp_path / "out"),
                             str(tmp_path / "ckpt"), ngram=5)
    q.awaitTermination()
    kept = {r["doc_id"]
            for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert kept == {"para"}


def test_stream_decontaminate_bloom_tier(spark, tmp_path):
    """bloom=True: the whole-text Bloom tier drops the verbatim copy
    even when the n-gram blocklist is inert (ngram longer than the
    eval text), while a one-word edit and clean docs pass — and a tiny
    bitmap (bloom_m=64, saturated) still yields the exact verdict."""
    ev = str(tmp_path / "eval.parquet")
    pq.write_table(pa.table({"doc_id": [100], "text": [_EVAL]}), ev)
    near = _EVAL.replace("moons", "moon")

    in_dir = str(tmp_path / "in")
    _write_batch(spark, in_dir, [("verbatim", _EVAL), ("near", near),
                                 ("clean1", _CLEAN)])
    q = stream_decontaminate(spark, in_dir, ev, str(tmp_path / "out"),
                             str(tmp_path / "ckpt"),
                             ngram=50, bloom=True, bloom_m=64)
    q.awaitTermination()
    kept = {r["doc_id"]
            for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert kept == {"near", "clean1"}
