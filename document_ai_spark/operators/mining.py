"""Corpus-mining operators: exact frequent-n-gram discovery with a
Misra-Gries-bounded shuffle, and winnowed (minimizer) span fingerprints.

Both attack the same 100 TB problem from opposite ends: the full
n-gram/window index is O(tokens) rows into a shuffle, which at corpus
scale is the single largest intermediate any curation pass produces.

  * heavy_ngrams — the EXACT set of word n-grams occurring >= min_count
    times corpus-wide (boilerplate discovery: cookie banners, license
    headers, nav chrome — the inputs to hot-line/hot-span stripping).
    A naive groupBy(ngram) shuffles one row per DISTINCT n-gram
    (~O(tokens) at web scale; the long tail is singletons). Here each
    partition first folds its n-gram stream through a Misra-Gries
    summary of ``capacity`` counters inside one Arrow-batched
    ``mapInPandas`` pass, so only O(partitions x capacity) candidate
    rows ever reach the driver-visible plan; a second scan then counts
    ONLY the candidates (broadcast semi-join, map-side partial agg) and
    filters to the threshold. Exactness: the merged summaries
    under-count any item by at most the sum of the partitions' OBSERVED
    decrement totals (worst case N/(capacity+1), and exactly 0 for any
    partition whose distinct n-grams fit in ``capacity``), so every
    n-gram with true count >= min_count survives pass 1 whenever that
    observed sum < min_count; the job ASSERTS this inside the plan and
    fails loudly instead of silently dropping a frequent n-gram —
    raise ``capacity`` (or the threshold) and rerun. False positives
    are eliminated by the exact second pass, so the output is exactly
    {ngram : count(ngram) >= min_count}, independent of partitioning.
    (Misra & Gries 1982; mergeable-summaries form per Agarwal et al.
    2012.)

  * winnow_fps — document fingerprinting by winnowing (Schleimer,
    Wilkerson & Aiken 2003, the MOSS algorithm): from the per-position
    w-token window fingerprints, select in every run of ``window``
    consecutive positions the minimum fingerprint (rightmost-min on
    ties). Guarantee: any duplicated token span of length
    >= w + window - 1 shares at least one SELECTED fingerprint between
    the two copies, because the shared run of >= ``window`` identical
    consecutive fingerprints is a selection window in both documents
    and its minimum is picked in both. Expected density is
    ~2/(window+1), so the span index that dup_span/hot-span stripping
    shuffles shrinks ~(window+1)/2 x versus the every-offset index
    (curation._window_fp_sql) while keeping a hard detection floor.
    Selection is entirely document-local — pure array expressions, NO
    exchange; only the selected (doc_id, s, fp) rows ever shuffle.

Engine parity: n-grams ride the shared script-aware tokenizer, all
hashing is md5, and the winnowing argmin is computed as
``array_min(fp || lpad(10^9 - s))`` — one lexicographic key that both
Spark and DuckDB order identically, encoding rightmost-tie-break
without engine-specific argmin.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .dedup import MAX_BUCKET, _cap_bucket_items, _word_shingles

# Misra-Gries counters per partition. 4096 counters x ~40-byte n-grams
# is ~160 KB of task state; the OBSERVED decrement total is checked
# against min_count at run time (heavy_ngrams raises when the summaries
# decremented too much to certify exactness), so this is a performance
# knob, not a correctness one.
MG_CAPACITY = 4096

# Winnowing defaults: w-token fingerprints, selection window over
# `window` consecutive positions -> detection floor w + window - 1
# tokens, density ~2/(window+1).
WINNOW_W = 20
WINNOW_WINDOW = 8

# Position encoding inside the winnowing key: positions are 1-based
# token offsets, far below this radix for any real document.
_POS_RADIX = 1_000_000_000


def _mg_pass(capacity: int):
    """mapInPandas body: fold this partition's n-gram stream through a
    Misra-Gries summary of ``capacity`` counters; emit the surviving
    (ngram, cnt) rows plus ONE sentinel row (ngram NULL, cnt = the
    partition's OBSERVED decrement total) — the tight per-partition
    under-count ceiling the global exactness guard sums and checks."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        dec_total = 0
        for pdf in batches:
            vc = pdf["ngram"].value_counts()
            for g, c in vc.items():
                counters[g] = counters.get(g, 0) + int(c)
            if len(counters) > capacity:
                # Retire the k smallest counters (k = excess) by
                # subtracting the k-th smallest value from ALL — the
                # classic MG decrement, batched. dec_total accumulates
                # the subtracted values: no item's partition count is
                # under-counted by more than dec_total (worst case
                # n_p/(capacity+1), but the OBSERVED sum is what the
                # exactness guard asserts — a partition whose distinct
                # n-grams fit in `capacity` contributes 0).
                vals = sorted(counters.values())
                m = vals[len(counters) - capacity - 1]
                dec_total += m
                counters = {g: c - m for g, c in counters.items()
                            if c > m}
        yield pd.DataFrame({
            "ngram": list(counters.keys()) + [None],
            "cnt": list(counters.values()) + [dec_total],
        })

    return run


def heavy_ngrams(docs: DataFrame, n: int = 3, min_count: int = 5,
                 capacity: int = MG_CAPACITY) -> DataFrame:
    """Exact corpus-wide frequent word n-grams: (ngram, n_count) for
    every n-gram occurring >= min_count times (multiplicity counted
    within and across documents).

    Two corpus scans — the unavoidable shape of EXACT heavy hitters in
    one round trip (candidates, then verify) — but the shuffle after
    each scan is bounded: O(partitions x capacity) summary rows after
    scan 1, O(|candidates|) partially-aggregated count rows after scan
    2. The every-distinct-n-gram shuffle of the naive groupBy never
    happens. Raises if ``capacity`` is too small for the observed
    corpus size at this threshold — never silently wrong.

    Contract note: documents shorter than ``n`` tokens contribute ONE
    whole-document shingle (the _word_shingles fallback, mirrored by
    the DuckDB oracle), so a heavily-repeated sub-n-token doc surfaces
    as a "heavy n-gram" of fewer than n tokens — the useful behavior
    for boilerplate discovery, but consumers must not assume keys are
    exactly n tokens long."""
    grams = docs.select(F.explode(_word_shingles(n)).alias("ngram"))
    # localCheckpoint materializes the tiny summary once (it is read
    # again by the candidate filter) AND lets the exactness guard below
    # evaluate as an eager driver-side scalar.
    summ = (grams.mapInPandas(_mg_pass(capacity), schema="ngram string, cnt long")
            .localCheckpoint())
    # Exactness guard, evaluated EAGERLY here rather than as an
    # assert_true subtree inside the result plan: AQE's runtime
    # empty-relation propagation elides a guard subtree joined onto an
    # empty result (observed on Spark 4.1 — precisely the all-heavy-
    # hitters-evicted case the guard exists to catch). A 1-row agg over
    # the checkpointed summary is control-plane cost; coalesce-to-0
    # covers a zero-partition (legitimately empty) corpus.
    dec_total = int(
        (summ.where(F.col("ngram").isNull())
         .agg(F.sum("cnt")).first()[0]) or 0)
    if dec_total >= min_count:
        raise ValueError(
            f"heavy_ngrams: MG summaries decremented {dec_total} — an "
            f"n-gram with count >= {min_count} could have been dropped; "
            f"raise capacity (currently {capacity}) above the "
            f"per-partition distinct-n-gram count")
    # Candidate floor: MG guarantees true_count <= summed surviving
    # count + dec_total, so every true heavy hitter's summed summary
    # count is >= min_count - dec_total (>= 1 given the guard). The
    # filter strips the snapshot-time singleton noise each partition's
    # summary carries, keeping the broadcast candidate-set-sized
    # instead of Theta(partitions x capacity) — at web scale the
    # unfiltered set would blow the broadcast limit.
    cands = (summ.where(F.col("ngram").isNotNull())
             .groupBy("ngram").agg(F.sum("cnt").alias("_sc"))
             .where(F.col("_sc") >= min_count - dec_total)
             .select("ngram"))
    return (grams.join(F.broadcast(cands), "ngram")
            .groupBy("ngram")
            .agg(F.count(F.lit(1)).alias("n_count"))
            .where(F.col("n_count") >= min_count))


def _winnow_sel_sql(w: int, window: int) -> str:
    """Spark SQL text: array<string> of the winnow-selected keys
    (fp || lpad(RADIX - s)) of ``text``. Single-eval nesting per the
    dedup._word_shingles_sql discipline: the per-position fingerprint
    array binds once, the key array binds once."""
    from .curation import _window_fp_sql
    return (
        f"element_at(transform(array({_window_fp_sql(w)}), fps0 -> "
        "  element_at(transform(array("
        "    transform(filter(fps0, x -> x.fp is not null), "
        f"      x -> concat(x.fp, lpad(cast({_POS_RADIX} - x.s as string), "
        "                            10, '0')))"
        "  ), ks -> CASE WHEN size(ks) = 0 THEN array() ELSE "
        "    array_distinct(transform("
        f"      sequence(1, greatest(size(ks) - {window - 1}, 1)), "
        f"      i -> array_min(slice(ks, i, {window})))) END"
        "  ), 1)"
        "), 1)"
    )


def winnow_fps(docs: DataFrame, w: int = WINNOW_W,
               window: int = WINNOW_WINDOW) -> DataFrame:
    """Winnowed span fingerprints: (doc_id, s, fp) — the minimizer
    subset of the every-offset w-token window index, ~2/(window+1) of
    its rows, with the guarantee that any cross-document duplicated
    span of >= w + window - 1 tokens still collides on >= 1 selected
    fingerprint.

    Classic full selection windows: starts 1 .. max(m - window + 1, 1)
    over the m fingerprint positions, so density matches the published
    ~2/(window+1) (tail-clipped suffix windows would densify short
    documents without buying recall — the last full window already
    covers the final positions as candidates). A document with fewer
    than ``window`` fingerprints gets ONE window holding all of them
    (its global min is selected; such a doc is shorter than the
    w + window - 1 detection floor anyway, the fallback just keeps it
    indexed). Zero-token documents yield no rows.

    Entirely map-side: the selection happens inside per-document array
    expressions, so the only rows that ever reach an exchange are the
    selected minimizers themselves."""
    sel = docs.select(
        "doc_id", F.explode(F.expr(_winnow_sel_sql(w, window))).alias("k"))
    return sel.select(
        "doc_id",
        (F.lit(_POS_RADIX)
         - F.substring("k", 33, 10).cast("int")).alias("s"),
        F.substring("k", 1, 32).alias("fp"))


def winnow_fp_sets(docs: DataFrame, w: int = WINNOW_W,
                   window: int = WINNOW_WINDOW) -> DataFrame:
    """(doc_id, n_fp, fp): one row per DISTINCT winnowed fingerprint per
    document, with the doc's distinct-fp count riding along. The set
    form of winnow_fps — dedup of repeated fps happens map-side inside
    the per-doc array (array_distinct over the 32-char fp prefixes), so
    no exchange precedes the explode and n_fp needs no second pass."""
    # No size(_fps) > 0 filter: explode() drops empty arrays for free,
    # and a where() here would be predicate-pushed THROUGH the
    # projection by alias substitution, re-deriving the whole winnow
    # pipeline per row just for the predicate (the near_dup_pairs
    # lesson). _fps is referenced twice below (size + explode), which
    # CollapseProject's cost check keeps materialized once.
    sel = docs.select(
        "doc_id",
        F.expr("array_distinct(transform(" + _winnow_sel_sql(w, window)
               + ", k -> substring(k, 1, 32)))").alias("_fps"))
    return sel.select(
        "doc_id", F.size("_fps").alias("n_fp"),
        F.explode("_fps").alias("fp"))


def containment_pairs(docs: DataFrame, w: int = WINNOW_W,
                      window: int = WINNOW_WINDOW,
                      containment_min: float = 0.5,
                      min_shared: int = 1,
                      max_bucket: int = MAX_BUCKET) -> DataFrame:
    """Subset-duplication detection: pairs where one document's span
    content is largely CONTAINED in the other's — the republished-
    article / quote-farm / doc-embedded-in-template case that the
    jaccard near-dup family structurally misses (a short doc inside a
    long one has jaccard ~ |A|/|B| -> tiny, so MinHash bands rarely
    collide; its containment |A∩B|/|A| is ~1). Dolma/FineWeb-class
    pipelines treat containment as its own dedup axis for exactly this
    reason.

    Candidates come from WINNOWED span fingerprints, not MinHash bands:
    a contained copy shares whole token spans with its container, and
    winnowing guarantees any shared span of >= w + window - 1 tokens
    collides on a selected fingerprint — the right recall floor for
    containment, independent of the jaccard S-curve. Score = shared
    distinct fps / min(|fps(A)|, |fps(B)|) = max of the two direction-
    al containments; deterministic given the data (both engines compute
    the identical value — oracle row `containment_pairs`).

    Scale shape: the fp-set build is map-side (winnow selection +
    array_distinct inside per-doc arrays); ONE hash exchange groups
    (doc_id, n_fp) rows into fp buckets, capped by _cap_bucket_items
    (a hot fp = corpus boilerplate span; the cap observes drops, and
    hot spans belong to winnow_hot_spans/strip, not pair expansion);
    then ONE pair aggregation counts shared fps per (doc_a, doc_b).
    Unlike the near-dup family's first-collision-band trick, the pair
    exchange here is REQUIRED — containment needs the shared-fp COUNT,
    not mere existence — but it carries only (id, id, 3 ints) rows
    whose volume is cap-bounded per bucket, never sketches or text.

    Returns (doc_a, doc_b, shared_fps, containment), doc_a < doc_b,
    filtered to containment >= containment_min AND shared_fps >=
    min_shared. A doc shorter than the w + window - 1 detection floor
    carries ONE fallback fingerprint, so any collision scores
    containment 1.0 on one fp of evidence — raise ``min_shared`` (or
    length-gate upstream) when such docs survive into the input; the
    default keeps every collision visible."""
    fps = winnow_fp_sets(docs, w, window)
    return _containment_verdict(_containment_candidates(fps, max_bucket),
                                containment_min, min_shared)


def _containment_candidates(fps: DataFrame, max_bucket: int) -> DataFrame:
    """(doc_a, doc_b, n_a, n_b, shared_fps) from (doc_id, n_fp, fp)
    rows: fp buckets (capped, observed) -> intra-bucket pair expansion
    -> shared-fp count aggregation. Shared by the batch operator and
    the incremental index's intra-batch path."""
    grouped = (fps.groupBy("fp")
               .agg(F.collect_list(F.struct("doc_id", "n_fp"))
                    .alias("items"))
               .where(F.size("items") > 1))
    grouped = _cap_bucket_items(grouped, max_bucket)
    # items are array_sort'ed by _cap_bucket_items -> ascending doc_id,
    # so x precedes y positionally and doc_a < doc_b by construction.
    pairs = grouped.select(F.explode(F.expr(
        "flatten(transform(items, (x, i) -> "
        "  transform(slice(items, i + 2, size(items)), y -> "
        "    struct(x.doc_id AS doc_a, y.doc_id AS doc_b, "
        "           x.n_fp AS n_a, y.n_fp AS n_b))))"
    )).alias("p")).select("p.*")
    # Positional expansion pairs duplicate doc_id INPUT rows with
    # themselves; drop those so the doc_a < doc_b contract (and the
    # oracle's value-comparison join) holds. The family input contract
    # remains doc_id-is-a-key — duplicated input rows also double the
    # shared counts of their OTHER pairs, which only exact-dup
    # upstream can own.
    return (pairs.where(F.col("doc_a") != F.col("doc_b"))
            .groupBy("doc_a", "doc_b", "n_a", "n_b")
            .agg(F.count(F.lit(1)).alias("shared_fps")))


def _containment_verdict(agg: DataFrame, containment_min: float,
                         min_shared: int) -> DataFrame:
    """Score and filter (doc_a, doc_b, n_a, n_b, shared_fps) candidate
    counts. least(n_a, n_b) makes the score symmetric, so the n columns
    need not track which side is lexicographically first."""
    return (agg.withColumn(
                "containment",
                F.round(F.col("shared_fps")
                        / F.least("n_a", "n_b").cast("double"), 6))
            .where((F.col("containment") >= containment_min)
                   & (F.col("shared_fps") >= min_shared))
            .select("doc_a", "doc_b", "shared_fps", "containment"))


def winnow_hot_spans(docs: DataFrame, w: int = WINNOW_W,
                     window: int = WINNOW_WINDOW,
                     min_docs: int = 2) -> DataFrame:
    """Winnowed replacement for curation.hot_span_fps: the (fp) table of
    selected fingerprints occurring in >= min_docs distinct documents.
    Same downstream contract (join docs' winnowed fps against it to
    flag shared-span families); the aggregate's input is ~(window+1)/2 x
    smaller than the every-offset hot-span build."""
    # fp_sets (distinct per doc, map-side) rather than winnow_fps: the
    # per-row position decode is dead weight here, and the map-side
    # dedup turns the two-phase count_distinct into a plain count over
    # fewer shuffled rows. Identical output by construction.
    return (winnow_fp_sets(docs, w, window)
            .groupBy("fp")
            .agg(F.count(F.lit(1)).alias("nd"))
            .where(F.col("nd") >= min_docs)
            .select("fp"))
