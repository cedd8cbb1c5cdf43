"""stream_curate: quality gate + first-seen-wins incremental dedup over
the persisted sketch index, exactly-once per batch."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_ai_spark.streaming.feedback import stream_curate

GOOD = ("the quick brown fox jumps over the lazy dog and then runs far "
        "away to find a quiet place for a long afternoon nap today")


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(
        rows, "doc_id string, text string, lang string, source string")
    df.coalesce(1).write.mode("append").parquet(path)


def test_stream_curate_first_seen_wins(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    # batch 1: a00 good, junk1 fails quality
    _write_batch(spark, in_dir, [
        ("a00", GOOD, "en", "s1"),
        ("junk1", "x", "en", "s1"),
    ])
    q = stream_curate(spark, in_dir, str(tmp_path / "idx"),
                      str(tmp_path / "out"), str(tmp_path / "ckpt"),
                      quality_min=0.5, jaccard_min=0.4)
    q.awaitTermination()

    # batch 2: A-early-dup dups a00 (earlier wins — ids chosen so the
    # CROSS-batch rule, not id order, decides), b02/b03 duplicate each
    # other in-batch only (smaller id wins), c10 clean
    other = ("many unrelated sentences about completely different topics "
             "fill this second document with new words like ship ocean "
             "harbor lighthouse storm sailor compass voyage anchor wave")
    _write_batch(spark, in_dir, [
        ("A-early-dup", GOOD + " extra", "en", "s1"),   # id < a00 but LATER
        ("b02", other, "en", "s2"),
        ("b03", other + " tail", "en", "s2"),
        ("c10", " ".join(f"tok{i} word{i} item{i}" for i in range(20)),
         "en", "s3"),
    ])
    q = stream_curate(spark, in_dir, str(tmp_path / "idx"),
                      str(tmp_path / "out"), str(tmp_path / "ckpt"),
                      quality_min=0.5, jaccard_min=0.4)
    q.awaitTermination()

    kept = {r["doc_id"]
            for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert "a00" in kept                  # first-seen survives
    assert "A-early-dup" not in kept      # later dup loses despite smaller id
    assert "b02" in kept and "b03" not in kept  # in-batch: smaller id wins
    assert "c10" in kept
    assert "junk1" not in kept            # quality-gated


def test_stream_curate_chained_family_collapses(spark, tmp_path):
    """A doc chained to a DROPPED doc (not directly to the keeper) is
    still dropped: losers' sketches stay in the index."""
    in_dir = str(tmp_path / "in")
    base = GOOD
    _write_batch(spark, in_dir, [("k0", base, "en", "s")])
    q = stream_curate(spark, in_dir, str(tmp_path / "idx"),
                      str(tmp_path / "out"), str(tmp_path / "ckpt"),
                      quality_min=0.5, jaccard_min=0.4)
    q.awaitTermination()
    # k1 dups k0 -> dropped; k2 in a later batch dups k1 more than k0
    mut = base.replace("fox", "wolf")
    _write_batch(spark, in_dir, [("k1", mut, "en", "s")])
    q = stream_curate(spark, in_dir, str(tmp_path / "idx"),
                      str(tmp_path / "out"), str(tmp_path / "ckpt"),
                      quality_min=0.5, jaccard_min=0.4)
    q.awaitTermination()
    _write_batch(spark, in_dir, [("k2", mut + " tail", "en", "s")])
    q = stream_curate(spark, in_dir, str(tmp_path / "idx"),
                      str(tmp_path / "out"), str(tmp_path / "ckpt"),
                      quality_min=0.5, jaccard_min=0.4)
    q.awaitTermination()
    kept = {r["doc_id"]
            for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert kept.issuperset({"k0"})
    assert "k1" not in kept and "k2" not in kept


def test_stream_curate_published_gates(spark, tmp_path):
    """c4=True cleans line boilerplate and keys the index on the
    cleaned text; gopher=True drops rule violators — both stateless,
    so exactly-once semantics are untouched."""
    in_dir = str(tmp_path / "in")
    c4_page = ("This is a good long sentence that ends well today.\n"
               "Another full sentence with plenty of words is here.\n"
               "And a third complete sentence closes the page now.\n"
               "This site uses cookies to improve your experience.")
    no_stop = " ".join(f"tok{i}" for i in range(60)) + "."
    _write_batch(spark, in_dir, [
        ("good", c4_page, "en", "s1"),
        ("brace", c4_page + "\nvar x = { a } in a long sentence here.",
         "en", "s1"),
        ("nostop", "\n".join([no_stop] * 3), "en", "s1"),
    ])
    q = stream_curate(spark, in_dir, str(tmp_path / "idx"),
                      str(tmp_path / "out"), str(tmp_path / "ckpt"),
                      quality_min=0.2, jaccard_min=0.9,
                      c4=True, gopher=True,
                      gopher_min_words=10, gopher_min_stops=2)
    q.awaitTermination()
    rows = {r["doc_id"]: r["text"]
            for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert set(rows) == {"good"}
    assert "cookies" not in rows["good"]   # line stripped by c4


def test_stream_curate_rw_fineweb_gates(spark, tmp_path):
    """rw_lines=True strips RefinedWeb-dropped lines (and keys the index
    on the corrected text); fineweb=True drops docs violating the
    FineWeb ratios — both stateless maps, exactly-once untouched."""
    in_dir = str(tmp_path / "in")
    good_page = (
        "This is a good long sentence that ends well today.\n"
        "Another full sentence with plenty of words is here.\n"
        "And a third complete sentence closes the page now.\n"
        "A fourth line keeps the ratios in the natural band.")
    other_page = (
        "Entirely different prose occupies this second page.\n"
        "It discusses completely unrelated matters at length.\n"
        "Nothing here overlaps the first page vocabulary much.\n"
        "So the near-dup index keeps both pages alive today.")
    shouty = other_page + "\nSHOUT AB."          # small mainly-upper line
    no_punct = "\n".join(["just some short words"] * 8)
    _write_batch(spark, in_dir, [
        ("good", good_page, "en", "s1"),
        ("shout", shouty, "en", "s1"),
        ("nopunct", no_punct, "en", "s1"),
    ])
    q = stream_curate(spark, in_dir, str(tmp_path / "idx"),
                      str(tmp_path / "out"), str(tmp_path / "ckpt"),
                      quality_min=0.2, jaccard_min=0.9,
                      rw_lines=True, fineweb=True)
    q.awaitTermination()
    rows = {r["doc_id"]: r["text"]
            for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert set(rows) == {"good", "shout"}
    assert "SHOUT" not in rows["shout"]          # line-wise correction
    assert rows["good"] == good_page             # untouched page intact
