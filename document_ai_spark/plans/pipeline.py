"""The flagship distributed extraction pipeline.

Spark-first re-expression of the reference's per-document loop
(reference backend/services/document_processor.py:93-218):

    read interleaved table                               [ONE scan]
      -> explode(spans)                                   [no shuffle]
      -> LEFT join media_payloads (salted sentinel key
         for non-media rows; dangling refs flagged)       [shuffle 1]
      -> kind-routed Arrow UDF parse: boilerplate-strip
         for text spans, layout/kv/zone parse for media   [narrow]
      -> SALTED two-phase reassembly                      [shuffles 2+3]
           phase 1: groupBy(doc_id, pmod(offset, K))  — splits the 64-media-
                    span long-tail docs across K reducers (north_rule's
                    explicit skew handling; collect_list is not AQE-skew-
                    splittable, so salting must be explicit)
           phase 2: groupBy(doc_id), flatten + array_sort — order carried
                    by `offset`, never by partition layout
      -> pattern fields as built-in regexp/array exprs    [codegen]
      -> fuzzy master match (Arrow UDF, 24-row dim scored in-process —
         cheaper than a 24x broadcast cross-join blowup)  [narrow]
      -> kv fill + range nulling + trim (CASE exprs)      [codegen]
      -> master validation on DISTINCT values only (the value domain is
         ~the 24 master rows, so score once, broadcast-join back)
      -> extractions + reassembled output spans

Every stage is either whole-stage-codegen JVM work or an Arrow-vectorized
pandas UDF; there is no per-row Python and no driver-side collect.
"""
from __future__ import annotations

import math
from functools import lru_cache
from typing import Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

# Plan-build cost note: Column objects are immutable expression trees, so
# every STATIC subtree (fixed column names, no per-call inputs) is built
# once behind an lru_cache and reused across extract() calls. Building
# this pipeline's ~10^3 expression nodes through py4j measured 1.8 s of
# pure driver-side serial time per call — a constant that neither
# parallelism level can touch and that a 12 s benchmark job feels hard.

from .. import constants as C
from ..functions import extraction as X
from ..functions.fuzzy import best_full_match, best_partial_match
from ..functions.layout import parse_media_payload
from ..functions.textops import extract_main_text

# ---------------------------------------------------------------------------
# Arrow UDFs (vectorized; pure functions shared with the oracle)
# ---------------------------------------------------------------------------

_main_text_udf = F.pandas_udf(
    lambda s: s.map(lambda x: extract_main_text(x) if x is not None else ""),
    T.StringType(),
)

_MEDIA_PARSE_TYPE = T.StructType([
    T.StructField("span_text", T.StringType()),
    T.StructField("n_blocks", T.IntegerType()),
    T.StructField("avg_conf", T.DoubleType()),
    T.StructField("sig_present", T.BooleanType()),
    T.StructField("sig_conf", T.DoubleType()),
    T.StructField("stamp_present", T.BooleanType()),
    T.StructField("stamp_conf", T.DoubleType()),
    T.StructField("kv_dealer", T.StringType()),
    T.StructField("kv_model", T.StringType()),
    T.StructField("kv_hp", T.StringType()),
    T.StructField("kv_cost", T.StringType()),
    T.StructField("n_header", T.IntegerType()),
    T.StructField("n_body", T.IntegerType()),
    T.StructField("n_footer", T.IntegerType()),
])


_EMPTY_MEDIA_PARSE = ("", 0, 0.0, False, 0.0, False, 0.0,
                      None, None, None, None, 0, 0, 0)


@F.pandas_udf(_MEDIA_PARSE_TYPE)
def _media_parse_udf(page_w: pd.Series, page_h: pd.Series,
                     tokens: pd.Series, kv_pairs: pd.Series,
                     marks: pd.Series) -> pd.DataFrame:
    rows = []
    for w, h, tok, kv, mk in zip(page_w, page_h, tokens, kv_pairs, marks):
        if w is None or pd.isna(w):
            # Dangling media_ref (left join found no payload): empty parse;
            # the span survives as a placeholder and is counted per-doc.
            rows.append(_EMPTY_MEDIA_PARSE)
            continue
        parsed = parse_media_payload({
            "page_w": int(w), "page_h": int(h),
            "tokens": list(tok) if tok is not None else [],
            "kv_pairs": list(kv) if kv is not None else [],
            "marks": list(mk) if mk is not None else [],
        })
        f = parsed["kv_fields"]
        z = parsed["zones"]
        rows.append((
            parsed["raw_text"], parsed["n_blocks"], parsed["avg_conf"],
            parsed["signature_present"], parsed["signature_conf"],
            parsed["stamp_present"], parsed["stamp_conf"],
            f["dealer_name"], f["model_name"],
            f["horse_power"], f["asset_cost"],
            z["header"], z["body"], z["footer"],
        ))
    return pd.DataFrame(rows, columns=[f.name for f in _MEDIA_PARSE_TYPE])


_FUZZY_TYPE = T.StructType([
    T.StructField("dealer_match", T.StringType()),
    T.StructField("dealer_score", T.IntegerType()),
    T.StructField("model_match", T.StringType()),
    T.StructField("model_score", T.IntegerType()),
])


@F.pandas_udf(_FUZZY_TYPE)
def _fuzzy_udf(text: pd.Series, need_dealer: pd.Series,
               need_model: pd.Series) -> pd.DataFrame:
    """difflib fuzzy scoring — invoked ONLY for the lists the JVM verbatim
    pre-gate could not resolve (text arrives NULL when both lists are
    gated, so the per-row cost there is O(1))."""
    from ..functions.fuzzy import PartialRatioScorer

    rows = []
    for t, nd, nm in zip(text, need_dealer, need_model):
        if t is None or not (nd or nm):
            rows.append((None, 0, None, 0))
            continue
        tu = t.upper()
        scorer = PartialRatioScorer(tu)   # one text index for both lists
        d, ds = best_partial_match(tu, C.DEALER_MASTER,
                                   C.FUZZY_DEALER_EXTRACT_MIN,
                                   scorer=scorer) if nd else (None, 0)
        m, ms = best_partial_match(tu, C.MODEL_MASTER,
                                   C.FUZZY_MODEL_EXTRACT_MIN,
                                   scorer=scorer) if nm else (None, 0)
        rows.append((d, ds, m, ms))
    return pd.DataFrame(rows, columns=[f.name for f in _FUZZY_TYPE])


def _first_verbatim(text_upper_col, masters):
    """First master (list order) contained verbatim in the uppercased text,
    as a pure JVM CASE cascade — the exact-score-100 fast path of
    best_partial_match lifted out of Python.

    Exactness: for needles shorter than 200 chars, partial_ratio == 100
    IFF the uppercased needle appears verbatim (int(round(100*2M/(la+lb)))
    == 100 forces M == la == lb, i.e. an exact window). Our masters are
    <= 42 chars (asserted below), and best_partial_match's strictly-greater
    rule makes the FIRST 100-scorer the winner — so when this column is
    non-null it equals the Python result with score 100, and difflib can be
    skipped for that list.
    """
    w = None
    for m in masters:
        cond = text_upper_col.contains(F.lit(m.upper()))
        w = F.when(cond, F.lit(m)) if w is None else w.when(cond, F.lit(m))
    return w


def _assert_gate_sound(masters) -> None:
    """The verbatim gate is exact iff (a) masters are short enough that
    score==100 forces verbatim containment and (b) no LATER master is a
    substring of an EARLIER one (else a doc shorter than the earlier master
    could score 100 on it via partial_ratio's role swap while the gate picks
    the later, contained master). Checked once at import."""
    ups = [m.upper() for m in masters]
    for i, early in enumerate(ups):
        assert len(early) < 200, "verbatim gate unsound for long masters"
        for late in ups[i + 1:]:
            assert late not in early, (
                f"gate unsound: later master {late!r} inside {early!r}")


_assert_gate_sound(C.DEALER_MASTER)
_assert_gate_sound(C.MODEL_MASTER)


_VALID_TYPE = T.StructType([
    T.StructField("valid", T.BooleanType()),
    T.StructField("match_score", T.IntegerType()),
    T.StructField("matched_to", T.StringType()),
])


def _make_valid_udf(masters, min_score):
    @F.pandas_udf(_VALID_TYPE)
    def udf(vals: pd.Series) -> pd.DataFrame:
        # Batch-local memoization: the live value domain is essentially
        # the two 12-row master lists plus extraction noise, so scoring is
        # O(distinct) per Arrow batch. (A plain dict, not lru_cache — the
        # wrapper must stay cloudpickle-able.)
        cache: dict = {}
        rows = []
        for v in vals:
            r = cache.get(v)
            if r is None:
                if not v:
                    r = (False, 0, None)
                else:
                    m, s = best_full_match(v.upper(), masters, min_score)
                    r = (m is not None, s, m)
                cache[v] = r
            rows.append(r)
        return pd.DataFrame(rows, columns=["valid", "match_score", "matched_to"])
    return udf


# ---------------------------------------------------------------------------
# Pipeline stages
# ---------------------------------------------------------------------------

_PARSED_COLS = [
    "doc_id", "kind", "media_ref", "offset", "span_text",
    "sig_present", "sig_conf", "stamp_present", "stamp_conf",
    "kv_dealer", "kv_model", "kv_hp", "kv_cost", "payload_missing",
    "n_header", "n_body", "n_footer",
]


def span_prep(docs_df: DataFrame) -> DataFrame:
    """explode -> map-side boilerplate strip -> salted join key. The
    pre-join half of parse_spans, exposed so a bucketed ingest
    (sources/bucketed.py) can persist its output keyed by `_jk` and make
    the payload join exchange-free.

    explode_outer keeps zero-span docs alive as a single null-kind row
    (routed through the text path with empty text) so they still appear
    in the extractions table — plain explode would silently drop them.

    Boilerplate-strip BEFORE the join: it runs map-side (pre-shuffle) and
    its output is a fraction of the raw HTML, so the join shuffles the
    small stripped text, never the raw markup. Media rows feed NULL into
    the UDF (its O(1) fast path) — their text comes from the payload
    parse after the join.

    Text spans don't carry a real media_ref, and routing them through the
    join under one shared key ('' or NULL) would funnel every text span
    of a 10^12-doc corpus into a single reducer — so non-media rows get a
    salted sentinel key that can never match the payload side and spreads
    evenly across partitions.
    """
    strip_col, join_key = _span_prep_cols()
    return (docs_df.select(
        "doc_id", F.explode_outer("spans").alias("s")
    ).select("doc_id", "s.kind", "s.text", "s.media_ref", "s.offset")
        .withColumn("span_text_pre", strip_col)
        .drop("text")
        .withColumn("_jk", join_key))


@lru_cache(maxsize=None)
def _span_prep_cols():
    is_media = F.col("kind") == "media"
    strip_col = _main_text_udf(
        F.when(is_media, F.lit(None)).otherwise(F.col("text")))
    join_key = F.when(is_media, F.col("media_ref")).otherwise(
        F.concat(F.lit("__nonmedia__"),
                 F.pmod(F.xxhash64("doc_id", "offset"), F.lit(4096))
                 .cast("string")))
    return strip_col, join_key


def parse_spans_from(spans: DataFrame, payloads_keyed: DataFrame
                     ) -> DataFrame:
    """Payload join + kind-routed parse over span_prep output.

    ``payloads_keyed`` carries its join key as `_jk` (= media_ref). When
    both inputs come from tables bucketed by `_jk` with the same bucket
    count (sources/bucketed.py ingest), the join plans with ZERO
    exchanges — each task zips bucket i of both tables; the test suite
    asserts the 2-exchange drop.

    LEFT join: a media span whose media_ref has no payload row must not
    vanish silently (the reference records a per-file error for unreadable
    media, backend/main.py:545-552). It survives as an empty placeholder
    span, flagged payload_missing and rolled up per-doc so data loss is
    observable at scale instead of discovered by row-count forensics.

    shuffle_hash hint: the payload table is corpus-proportional (it IS
    the media bytes), so Spark's size-based broadcast pick — which fires
    at test SFs where payloads squeeze under the 10MB threshold — is the
    wrong strategy at any real scale: a broadcast build is serial driver
    work that grows with the corpus and parallelizes with nothing.
    Shuffle-hash keeps both sides partitioned and the build per-reducer
    (and on bucketed input it needs no exchange at all).
    """
    return (spans
            .join(payloads_keyed.hint("shuffle_hash"), "_jk", "left")
            .withColumn("parsed", _media_parse_udf(
                "page_w", "page_h", "tokens", "kv_pairs", "marks"))
            .withColumns(_route_cols())
            .select(*_PARSED_COLS))


@lru_cache(maxsize=None)
def _route_cols() -> dict:
    is_media = F.col("kind") == "media"

    def route(media_col, text_val):
        return F.when(is_media, media_col).otherwise(text_val)

    return {
        "span_text": route(F.col("parsed.span_text"),
                           F.col("span_text_pre")),
        "sig_present": route(F.col("parsed.sig_present"), F.lit(False)),
        "sig_conf": route(F.col("parsed.sig_conf"), F.lit(0.0)),
        "stamp_present": route(F.col("parsed.stamp_present"), F.lit(False)),
        "stamp_conf": route(F.col("parsed.stamp_conf"), F.lit(0.0)),
        "kv_dealer": route(F.col("parsed.kv_dealer"),
                           F.lit(None).cast("string")),
        "kv_model": route(F.col("parsed.kv_model"),
                          F.lit(None).cast("string")),
        "kv_hp": route(F.col("parsed.kv_hp"), F.lit(None).cast("string")),
        "kv_cost": route(F.col("parsed.kv_cost"),
                         F.lit(None).cast("string")),
        "payload_missing": is_media & F.col("page_w").isNull(),
        "n_header": route(F.col("parsed.n_header"), F.lit(0)),
        "n_body": route(F.col("parsed.n_body"), F.lit(0)),
        "n_footer": route(F.col("parsed.n_footer"), F.lit(0)),
    }


def parse_spans(docs_df: DataFrame, payloads_df: DataFrame) -> DataFrame:
    """explode -> single payload join -> kind-routed parse. SINGLE scan.

    One pass, not two: the earlier union-of-filtered-branches form put the
    source subtree in the plan twice, so every extraction run scanned the
    interleaved table twice — at 100 TB that is the whole job's IO bill
    doubled. Both parse UDFs run over all spans with O(1) fast paths for
    the rows they don't own (text is NULL for media spans, page_w is NULL
    for text spans). The single-subtree plan also makes df.observe()
    row-count metrics well-defined (a duplicated subtree would double- or
    reject-count them). See span_prep / parse_spans_from for the halves.
    """
    return parse_spans_from(
        span_prep(docs_df),
        payloads_df.withColumnRenamed("media_ref", "_jk"))


def _kv_cand(col_name: str):
    """(offset, value) struct for earliest-non-null-kv semantics; struct min
    is lexicographic so min() = first candidate in offset order."""
    c = F.col(col_name)
    return F.when(c.isNotNull() & (F.trim(c) != ""),
                  F.struct(F.col("offset").alias("o"), c.alias("v")))


def reassemble(parsed: DataFrame, salt_buckets: int = C.MEDIA_SALT_BUCKETS
               ) -> DataFrame:
    """Salted two-phase per-doc reassembly (north_rule skew handling)."""
    salt_col, aggs1, aggs2, combined = _reassemble_exprs(salt_buckets)
    phase1 = (parsed.withColumn("salt", salt_col)
              .groupBy("doc_id", "salt").agg(*aggs1))
    return (phase1.groupBy("doc_id").agg(*aggs2)
            .withColumn("combined_text", combined))


@lru_cache(maxsize=None)
def _reassemble_exprs(salt_buckets: int) -> tuple:
    # Null-kind placeholder rows (zero-span docs) keep the group alive but
    # contribute no span: collect_list skips null elements.
    span_struct = F.when(
        F.col("kind").isNotNull(),
        F.struct(
            F.col("offset"), F.col("kind"),
            F.col("span_text"), F.col("media_ref"),
        ),
    )
    salt_col = F.pmod(F.col("offset"), F.lit(salt_buckets))
    aggs1 = (
        F.collect_list(span_struct).alias("part_spans"),
        F.max(F.col("sig_present").cast("int")).alias("p_sig"),
        F.max("sig_conf").alias("p_sig_conf"),
        F.max(F.col("stamp_present").cast("int")).alias("p_stamp"),
        F.max("stamp_conf").alias("p_stamp_conf"),
        F.min(_kv_cand("kv_dealer")).alias("p_kv_dealer"),
        F.min(_kv_cand("kv_model")).alias("p_kv_model"),
        F.min(_kv_cand("kv_hp")).alias("p_kv_hp"),
        F.min(_kv_cand("kv_cost")).alias("p_kv_cost"),
        F.sum(F.col("payload_missing").cast("long")).alias("p_missing"),
        F.sum("n_header").alias("p_header"),
        F.sum("n_body").alias("p_body"),
        F.sum("n_footer").alias("p_footer"),
    )
    aggs2 = (
        F.array_sort(F.flatten(F.collect_list("part_spans"))
                     ).alias("sorted_spans"),
        (F.max("p_sig") == 1).alias("signature_present"),
        F.max("p_sig_conf").alias("signature_conf"),
        (F.max("p_stamp") == 1).alias("stamp_present"),
        F.max("p_stamp_conf").alias("stamp_conf"),
        F.min("p_kv_dealer").getField("v").alias("kv_dealer"),
        F.min("p_kv_model").getField("v").alias("kv_model"),
        F.min("p_kv_hp").getField("v").alias("kv_hp"),
        F.min("p_kv_cost").getField("v").alias("kv_cost"),
        F.sum("p_missing").alias("n_missing_payloads"),
        # Doc-level header/body/footer block counts — the structured
        # zones output of the reference OCR stage (ocr_service.py:
        # 143-165), summed over the doc's media pages.
        F.struct(
            F.sum("p_header").alias("header"),
            F.sum("p_body").alias("body"),
            F.sum("p_footer").alias("footer"),
        ).alias("zones"),
    )
    combined = F.array_join(
        F.transform("sorted_spans", lambda s: s.getField("span_text")),
        C.PAGE_BREAK,
    )
    return salt_col, aggs1, aggs2, combined


def _ensemble(df: DataFrame) -> DataFrame:
    """patterns -> fuzzy (strictly-greater conf) -> kv fill (missing or
    conf<0.5) -> range nulling + trim. Pure CASE expressions."""
    stage1, stage2 = _ensemble_exprs()
    return (df.withColumns(stage1).withColumns(stage2)
            .drop("d_val", "d_conf", "d_method", "m_val", "m_conf",
                  "m_method", "h_val", "h_conf", "h_method", "c_val",
                  "c_conf", "c_method"))


@lru_cache(maxsize=None)
def _ensemble_exprs() -> tuple:
    fz_d_conf = F.col("fz.dealer_score") / 100.0
    fz_m_conf = F.col("fz.model_score") / 100.0
    use_fd = F.col("fz.dealer_match").isNotNull() & \
        (fz_d_conf > F.col("pat_dealer_conf"))
    use_fm = F.col("fz.model_match").isNotNull() & \
        (fz_m_conf > F.col("pat_model_conf"))

    stage1 = {
        "d_val": F.when(use_fd, F.col("fz.dealer_match"))
                  .otherwise(F.col("pat_dealer")),
        "d_conf": F.when(use_fd, fz_d_conf).otherwise(F.col("pat_dealer_conf")),
        "d_method": F.when(use_fd, F.lit("fuzzy"))
                     .when(F.col("pat_dealer").isNotNull(), F.lit("pattern")),
        "m_val": F.when(use_fm, F.col("fz.model_match"))
                  .otherwise(F.col("pat_model")),
        "m_conf": F.when(use_fm, fz_m_conf).otherwise(F.col("pat_model_conf")),
        "m_method": F.when(use_fm, F.lit("fuzzy"))
                     .when(F.col("pat_model").isNotNull(), F.lit("pattern")),
        "h_val": F.col("pat_hp"),
        "h_conf": F.col("pat_hp_conf"),
        "h_method": F.when(F.col("pat_hp").isNotNull(), F.lit("pattern")),
        "c_val": F.col("pat_cost"),
        "c_conf": F.col("pat_cost_conf"),
        "c_method": F.when(F.col("pat_cost").isNotNull(), F.lit("pattern")),
    }

    # KV fill — normalization mirrors functions.extraction.normalize_kv_value.
    kv_hp = F.nullif(F.regexp_replace("kv_hp", "[^0-9]", ""), F.lit("")) \
        .try_cast("int")
    kv_cost = F.nullif(F.regexp_replace("kv_cost", "[^0-9.]", ""), F.lit("")) \
        .try_cast("double")
    kv_dealer = F.nullif(X.py_strip(F.col("kv_dealer")), F.lit(""))
    kv_model = F.nullif(X.py_strip(F.col("kv_model")), F.lit(""))

    def fill(val, conf, method, cand):
        do = (val.isNull() | (conf < 0.5)) & cand.isNotNull()
        return (
            F.when(do, cand).otherwise(val),
            F.when(do, F.lit(X._KV_CONF)).otherwise(conf),
            F.when(do, F.lit("kv")).otherwise(method),
        )

    d_val, d_conf, d_method = fill(F.col("d_val"), F.col("d_conf"),
                                   F.col("d_method"), kv_dealer)
    m_val, m_conf, m_method = fill(F.col("m_val"), F.col("m_conf"),
                                   F.col("m_method"), kv_model)
    h_val, h_conf, h_method = fill(F.col("h_val"), F.col("h_conf"),
                                   F.col("h_method"), kv_hp)
    c_val, c_conf, c_method = fill(F.col("c_val"), F.col("c_conf"),
                                   F.col("c_method"), kv_cost)

    # Post-process: range nulling + trim (field_extractor.py:394-419).
    hp_ok = h_val.between(C.HP_MIN, C.HP_MAX)
    cost_ok = c_val.between(float(C.COST_MIN), float(C.COST_MAX))
    stage2 = {
        "dealer_name": X.py_strip(d_val),
        "dealer_conf": d_conf,
        "dealer_method": d_method,
        "model_name": X.py_strip(m_val),
        "model_conf": m_conf,
        "model_method": m_method,
        "horse_power": F.when(hp_ok, h_val),
        "hp_conf": F.when(hp_ok, h_conf).otherwise(0.0),
        "hp_method": h_method,
        "asset_cost": F.when(cost_ok, c_val),
        "cost_conf": F.when(cost_ok, c_conf).otherwise(0.0),
        "cost_method": c_method,
    }
    return stage1, stage2


def _validate(df: DataFrame) -> DataFrame:
    """Master validation, inline per row with worker-local memoization.

    NOT the distinct-subquery + broadcast-join-back pattern: each
    distinct() subquery would recompute the entire (UDF-heavy) upstream
    pipeline — measured 3x the full-pipeline cost. A memoized scalar UDF
    touches each row once and pays difflib only per distinct value per
    worker (the live domain is ~the 24 master strings)."""
    dealer_udf, model_udf = _valid_udfs()
    return (
        df.withColumn("dv", dealer_udf("dealer_name"))
        .withColumn("mv", model_udf("model_name"))
        .withColumns({
            "dealer_valid": F.col("dv.valid"),
            "dealer_matched_to": F.col("dv.matched_to"),
            "model_valid": F.col("mv.valid"),
            "model_matched_to": F.col("mv.matched_to"),
        })
        .drop("dv", "mv")
    )


@lru_cache(maxsize=None)
def _valid_udfs() -> tuple:
    return (_make_valid_udf(C.DEALER_MASTER, C.FUZZY_DEALER_VALID_MIN),
            _make_valid_udf(C.MODEL_MASTER, C.FUZZY_MODEL_VALID_MIN))


def derive_salt_buckets(docs_df: DataFrame, max_k: int = 256) -> int:
    """Data-driven salt count K (SURVEY §7.4 hard-part 3): derived from
    the corpus's span-count quantiles instead of a fixed constant.

    K = ceil(p99.9(spans/doc) / median(spans/doc)), rounded up to a
    power of two and clamped to [MEDIA_SALT_BUCKETS, max_k]: a tail doc
    at the p99.9 span count splits into groups of ~median size, so the
    heaviest reassembly reducer carries no more work than a typical
    doc's group, per-reducer share <= ~1/K of the tail doc. The floor
    keeps K at the proven constant when the corpus has no tail (K=1
    would put every long doc in one reducer the moment one appears in a
    later batch). Output is salt-invariant for ANY K (pinned by
    test_pipeline_golden), so this only moves work distribution.

    Cost: one approxQuantile pre-pass over size(spans) at PLAN BUILD —
    a no-UDF JVM scan of the spans column. At 100 TB the same number
    comes cheaper from table-level statistics or a metadata sample; the
    quantile (not max) target is what makes a sampled estimate valid."""
    # size() of ONE nested leaf (offset), not the spans array — nested
    # schema pruning keeps the scan off the text/media_ref leaves.
    qs = (docs_df.select(F.size(F.col("spans.offset"))
                         .cast("double").alias("n"))
          .approxQuantile("n", [0.5, 0.999], 0.001))
    if len(qs) < 2 or not qs[0]:
        return C.MEDIA_SALT_BUCKETS
    k = math.ceil(qs[1] / max(qs[0], 1.0))
    k_pow2 = 1 << max(k - 1, 0).bit_length()
    return max(C.MEDIA_SALT_BUCKETS, min(max_k, k_pow2))


def extract(docs_df: DataFrame, payloads_df: DataFrame,
            salt_buckets: int | None = None) -> DataFrame:
    """Full pipeline: interleaved docs + payloads -> extractions table
    (one row per doc: fields, confidences, detections, reassembled spans).

    salt_buckets=None (the default) derives K from the corpus's
    span-count quantiles (derive_salt_buckets); pass an int to pin it."""
    if salt_buckets is None:
        salt_buckets = derive_salt_buckets(docs_df)
    return _finish(parse_spans(docs_df, payloads_df), salt_buckets)


def extract_from_spans(spans_prepped: DataFrame, payloads_keyed: DataFrame,
                       salt_buckets: int = C.MEDIA_SALT_BUCKETS) -> DataFrame:
    """Full pipeline over pre-prepped span/payload tables (span_prep
    schema, payloads keyed by `_jk`) — the entry the bucketed storage
    layout (sources/bucketed.py) uses to run the payload join with zero
    exchanges. Output is identical to extract() on the original inputs."""
    return _finish(parse_spans_from(spans_prepped, payloads_keyed),
                   salt_buckets)


def _finish(parsed: DataFrame, salt_buckets: int) -> DataFrame:
    doc = reassemble(parsed, salt_buckets)
    doc = X.with_pattern_fields(doc, "combined_text")
    gate_cols, fz_raw, fz, overall, out_spans = _finish_exprs()
    doc = (doc.withColumns(gate_cols)
           .withColumn("fz_raw", fz_raw)
           .withColumn("fz", fz)
           .drop("d_verb", "m_verb", "fz_raw"))
    doc = _ensemble(doc)
    doc = _validate(doc)
    return (doc.withColumn("overall_confidence", overall)
            .withColumn("out_spans", out_spans)
            .drop("sorted_spans", "fz", "kv_dealer", "kv_model", "kv_hp",
                  "kv_cost", "pat_hp", "pat_cost", "pat_model", "pat_dealer",
                  "pat_hp_conf", "pat_cost_conf", "pat_model_conf",
                  "pat_dealer_conf"))


@lru_cache(maxsize=None)
def _finish_exprs() -> tuple:
    # JVM verbatim pre-gate: resolve score-100 matches with contains()
    # cascades (whole-stage codegen) and hand Python ONLY the rows/lists it
    # still owns — difflib never runs for a doc whose dealer AND model
    # appear verbatim (~70-75% of the corpus; exactness argued at
    # _first_verbatim/_assert_gate_sound).
    up = F.upper(F.col("combined_text"))
    gate_cols = {
        "d_verb": _first_verbatim(up, C.DEALER_MASTER),
        "m_verb": _first_verbatim(up, C.MODEL_MASTER),
    }
    need_d = F.col("d_verb").isNull()
    need_m = F.col("m_verb").isNull()
    fz_raw = _fuzzy_udf(F.when(need_d | need_m, F.col("combined_text")),
                        need_d, need_m)
    fz = F.struct(
        F.coalesce(F.col("d_verb"), F.col("fz_raw.dealer_match"))
         .alias("dealer_match"),
        F.when(~need_d, F.lit(100)).otherwise(F.col("fz_raw.dealer_score"))
         .alias("dealer_score"),
        F.coalesce(F.col("m_verb"), F.col("fz_raw.model_match"))
         .alias("model_match"),
        F.when(~need_m, F.lit(100)).otherwise(F.col("fz_raw.model_score"))
         .alias("model_score"),
    )

    confs = F.array("dealer_conf", "model_conf", "hp_conf", "cost_conf",
                    "signature_conf", "stamp_conf")
    pos = F.filter(confs, lambda c: c > 0)
    overall = F.when(
        F.size(pos) > 0,
        F.aggregate(pos, F.lit(0.0), lambda a, x: a + x) / F.size(pos))

    out_spans = F.transform(
        "sorted_spans",
        lambda s: F.struct(
            s.getField("kind").alias("kind"),
            s.getField("span_text").alias("text"),
            s.getField("media_ref").alias("media_ref"),
            s.getField("offset").alias("order"),
        ),
    )
    return gate_cols, fz_raw, fz, overall, out_spans


def output_spans(extractions: DataFrame) -> DataFrame:
    """Golden-comparable span sequences: (doc_id, spans[(kind,text,media_ref,order)])."""
    return extractions.select("doc_id", F.col("out_spans").alias("spans"))
