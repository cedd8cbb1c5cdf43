"""As-of join semantics: latest right row with ts <= left.ts per key."""
from __future__ import annotations

from document_ai_spark.operators.asof import asof_join


def test_asof_edges(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "early"), (2, 7, "c"),
         (3, 1, "nokey")],
        schema="k int, ts int, tag string")
    right = spark.createDataFrame(
        [(1, 8, 80.0), (1, 15, 150.0), (1, 20, 200.0), (2, 99, 990.0)],
        schema="k int, ts int, rv double")
    rows = {(r["k"], r["ts"]): r["rv"] for r in
            asof_join(left, right, key="k", ts="ts",
                      right_cols=["rv"]).collect()}
    assert rows[(1, 10)] == 80.0      # latest <= 10 is ts=8
    assert rows[(1, 20)] == 200.0     # equal ts matches (>= semantics)
    assert rows[(1, 5)] is None       # nothing precedes
    assert rows[(2, 7)] is None       # right row is in the future
    assert rows[(3, 1)] is None       # key absent on the right
    assert len(rows) == 5             # left-join: every left row survives


def test_asof_multi_col_null_payload(spark):
    """The latest right row is carried WHOLESALE: a NULL in one of its
    payload columns must come through as NULL, never back-filled from an
    older right row (DuckDB native-ASOF semantics; the per-column-fill
    bug would return (1.0, 'old') here instead of (1.0, None))."""
    left = spark.createDataFrame(
        [(1, 30), (1, 15)], schema="k int, ts int")
    right = spark.createDataFrame(
        [(1, 10, 9.0, "old"), (1, 20, 1.0, None)],
        schema="k int, ts int, a double, b string")
    rows = {r["ts"]: (r["a"], r["b"]) for r in
            asof_join(left, right, key="k", ts="ts",
                      right_cols=["a", "b"]).collect()}
    assert rows[30] == (1.0, None)    # latest row's NULL is preserved
    assert rows[15] == (9.0, "old")
