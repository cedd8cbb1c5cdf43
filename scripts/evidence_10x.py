"""Order-of-magnitude-larger evidence run (round-4 verdict item #3).

The per-round bench corpus is 60k interleaved docs (sf0.1). This runs
the SAME jobs once at 10x:

  * full extraction over a 600k-doc generated interleaved corpus, at
    the N / 4N scaling pair (best-of-2 each) plus a peak leg — does
    scaling efficiency hold at 10x the input?
  * the end-to-end curate() composition (quality gate -> banded LSH ->
    cluster representatives -> token budget) over a 500k-doc text
    corpus with 50k planted near-dup docs — generated JVM-side
    (spark.range + hash exprs), no driver materialization.

Recorded per job: wall time, peak JVM RSS (VmHWM of the local-mode
JVM = driver + executors), shuffle/spill bytes landed in the session's
blockmgr dirs, the observe() cap metrics, and the physical-plan
Exchange count at 60k vs 600k (same plan shape = no new exchanges).

Writes EVIDENCE_10X.json; BENCH.md summarizes.

Usage: python scripts/evidence_10x.py [--quick] [--only S1,S2]
(--quick = 1/10 sizes for a smoke run of the harness itself; --only
limits the run to a comma list of sections from {shape, extract,
curate, gates, semdedup, pack}). Results MERGE into an existing
EVIDENCE_10X.json so a sectioned run never drops the other sections
(including the resume legs evidence_resume.py merges in); the
top-level size/quick metadata is rewritten only by a full run, so a
sectioned --quick refresh cannot mislabel previously recorded
full-scale sections.
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F                      # noqa: E402

QUICK = "--quick" in sys.argv
N_EXTRACT = 60_000 if QUICK else 600_000
N_CURATE = 50_000 if QUICK else 500_000
SCALE_LOW, SCALE_HIGH, PEAK = 2, 8, 32
SHUFFLE = 16

_ALL_SECTIONS = ("shape", "extract", "curate", "gates", "semdedup",
                 "pack", "containment")


def _sections() -> set[str]:
    for i, a in enumerate(sys.argv):
        if a == "--only":
            if i + 1 >= len(sys.argv):
                raise SystemExit(
                    f"--only needs a comma list from {_ALL_SECTIONS}")
            picked = set(sys.argv[i + 1].split(","))
        elif a.startswith("--only="):
            picked = set(a.split("=", 1)[1].split(","))
        else:
            continue
        bad = picked - set(_ALL_SECTIONS)
        if bad:
            raise SystemExit(f"unknown --only sections: {sorted(bad)}")
        return picked
    return set(_ALL_SECTIONS)


def _jvm_peak_rss_mb(spark) -> float:
    """VmHWM of the gateway JVM (local mode: driver+executors in one)."""
    try:
        pid = spark.sparkContext._gateway.proc.pid
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmHWM"):
                    return round(int(line.split()[1]) / 1024, 1)
    except Exception:                                   # noqa: BLE001
        return -1.0
    return -1.0


def _blockmgr_bytes() -> int:
    total = 0
    for d in glob.glob("/tmp/blockmgr-*"):
        for root, _dirs, files in os.walk(d):
            for fn in files:
                try:
                    total += os.path.getsize(os.path.join(root, fn))
                except OSError:
                    pass
    return total


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange ") + plan.count("Exchange\n")


def _session(name, threads, extra=None):
    from document_ai_spark.session import get_spark
    conf = {"spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
            "spark.sql.adaptive.coalescePartitions.minPartitionSize":
                "256k", **(extra or {})}
    s = get_spark(name, master=f"local[{threads}]",
                  shuffle_partitions=SHUFFLE, extra_conf=conf)
    s.sparkContext.setLogLevel("OFF")
    return s


def gen_text_corpus(spark, n):
    """(doc_id, text, lang, source) generated entirely JVM-side: ~40-word
    docs over a 500-word hash vocabulary + 10% planted near-dup copies."""
    base_n = int(n * 0.9)
    vocab = ("array(" + ", ".join(
        f"'w{i:03d}'" for i in range(500)) + ")")
    text = (f"array_join(transform(sequence(1, 25 + pmod(id, 30)), i -> "
            f"element_at({vocab}, 1 + cast(pmod(xxhash64(id * 1000 + i), "
            f"500) as int))), ' ')")
    base = spark.range(base_n).select(
        F.col("id").alias("doc_id"), F.expr(text).alias("text"),
        F.expr("element_at(array('en','de','fr'), "
               "1 + cast(pmod(id, 3) as int))").alias("lang"),
        F.expr("concat('src', pmod(id, 4))").alias("source"))
    dups = (base.where(F.col("doc_id") < n - base_n)
            .select((F.col("doc_id") + base_n).alias("doc_id"),
                    F.concat("text", F.lit(" tail marker")).alias("text"),
                    "lang", "source"))
    return base.unionByName(dups)


def gen_web_corpus(spark, n):
    """C4-shaped pages generated JVM-side: 3-6 lines of 12-20 vocab
    words each ending '.', with planted cookie-boilerplate lines (5%),
    shouting lines (~6%), and a brace page per 100 — so every
    published gate has real work to do."""
    # ~11% of token draws are Gopher stopwords (8 words x 7 slots of
    # 500) so natural docs pass the required-stopword rule while the
    # rest of the vocabulary stays synthetic.
    stops = ["the", "be", "to", "of", "and", "that", "have", "with"]
    words = [stops[i % 8] if i < 56 else f"w{i:03d}" for i in range(500)]
    vocab = "array(" + ", ".join(f"'{w}'" for w in words) + ")"
    line = (f"concat(array_join(transform("
            f"sequence(1, 12 + cast(pmod(xxhash64(id * 131 + l), 9) as int)),"
            f" i -> element_at({vocab}, 1 + cast(pmod(xxhash64("
            f"id * 1000 + l * 37 + i), 500) as int))), ' '), '.')")
    text = (f"array_join(transform(sequence(1, 3 + cast(pmod(id, 4) as int)),"
            f" l -> {line}), chr(10))")
    planted = ("CASE WHEN pmod(doc_id, 20) = 0 THEN concat(txt, chr(10), "
               "'This site uses cookies to improve your experience.') "
               "WHEN pmod(doc_id, 17) = 0 THEN concat(txt, chr(10), "
               "'THIS ENTIRE LINE IS SHOUTING VERY LOUDLY.') "
               "WHEN pmod(doc_id, 100) = 99 THEN concat(txt, ' { brace }') "
               "ELSE txt END")
    return (spark.range(n)
            .select(F.col("id").alias("doc_id"),
                    F.expr(text).alias("txt"))
            .select("doc_id", F.expr(planted).alias("text")))


def gen_containment_corpus(spark, n):
    """90% base docs (30-59 vocab-hash tokens, all above the winnow
    detection floor w + window - 1 = 27) + 10% planted CONTAINERS: 40
    chrome tokens wrapped around each side of a full base doc's text —
    subset-duplication at jaccard ~ |A|/|B| ~ 0.3, the regime MinHash
    banding structurally misses."""
    base_n = int(n * 0.9)
    vocab = "array(" + ", ".join(f"'w{i:03d}'" for i in range(500)) + ")"
    text = (f"array_join(transform(sequence(1, 30 + pmod(id, 30)), i -> "
            f"element_at({vocab}, 1 + cast(pmod(xxhash64(id * 1000 + i), "
            f"500) as int))), ' ')")
    base = spark.range(base_n).select(
        F.col("id").alias("doc_id"), F.expr(text).alias("text"))
    chrome_pre = " ".join(f"nav{i}" for i in range(40))
    chrome_suf = " ".join(f"foot{i}" for i in range(40))
    containers = (base.where(F.col("doc_id") < n - base_n)
                  .select((F.col("doc_id") + base_n).alias("doc_id"),
                          F.concat(F.lit(chrome_pre + " "), "text",
                                   F.lit(" " + chrome_suf)).alias("text")))
    return base.unionByName(containers)


def gen_embeddings(spark, n):
    """(vec_id, embedding: array<double>[64]) generated JVM-side from
    hash draws in [-1, 1], plus 10% planted scalar-multiple copies —
    cosine-identical to their originals (cos is scale-invariant), so
    each copy ties its original on cos-to-centroid and loses the
    (cos_c ASC, vec_id ASC) keep order: SemDeDup must drop ~all of
    them."""
    base_n = int(n * 0.9)
    emb = ("transform(sequence(1, 64), i -> "
           "(cast(pmod(xxhash64(id * 131 + i), 2001) as double) - 1000.0)"
           " / 1000.0)")
    base = spark.range(base_n).select(
        F.col("id").alias("vec_id"), F.expr(emb).alias("embedding"))
    dups = (base.where(F.col("vec_id") < n - base_n)
            .select((F.col("vec_id") + base_n).alias("vec_id"),
                    F.expr("transform(embedding, x -> x * 2.0d)")
                     .alias("embedding")))
    return base.unionByName(dups)


def gen_interleaved(spark, n):
    """Interleaved span table (the north-rule input shape) over the
    text-corpus generator: every 3rd doc carries a media span after its
    text span."""
    spans = F.expr(
        "CASE WHEN pmod(doc_id, 3) = 0 THEN array("
        " named_struct('kind','text','text',text,'media_ref','',"
        "              'offset',0),"
        " named_struct('kind','media','text','','media_ref',"
        "              concat('m', doc_id),'offset',1)) "
        "ELSE array(named_struct('kind','text','text',text,"
        "           'media_ref','','offset',0)) END")
    return (gen_text_corpus(spark, n)
            .select("doc_id", spans.alias("spans")))


def published_gate_battery(docs):
    """The full published-rule battery as ONE composed DataFrame plan:
    C4 clean -> RefinedWeb line corrections -> Gopher rule set ->
    Gopher n-gram repetition -> FineWeb ratios. Returns the surviving
    (doc_id, text) frame."""
    from document_ai_spark.operators.selection import gopher_rules
    from document_ai_spark.operators.textquality import ngram_repetition
    from document_ai_spark.operators.web import (
        c4_clean,
        fineweb_filters,
        refinedweb_lines,
    )

    c = (c4_clean(docs).where("c4_keep")
         .select("doc_id", F.col("text_clean").alias("text")))
    # Materialization boundary after the text-REWRITE stages — the CLI
    # equivalent point is the per-bucket write of cleaned text. Without
    # it, every downstream gate branch (gopher, ngram, fineweb, and
    # each join-back) re-derives the full generator+c4+rw expression
    # chain: HOF pipelines are outside codegen subexpression
    # elimination, so the composed lazy plan re-cleans the corpus once
    # PER BRANCH (measured 2x wall on the 50k smoke).
    r = (refinedweb_lines(c).where("rw_keep")
         .select("doc_id", F.col("text_clean").alias("text"))
         .persist())
    g = gopher_rules(r, min_words=20)
    kept = r.join(g.where("gopher_keep").select("doc_id"), "doc_id")
    rep_ = ngram_repetition(kept)
    kept = (kept.join(rep_.select("doc_id", "rep_keep"), "doc_id", "left")
            .where(F.coalesce("rep_keep", F.lit(True))).drop("rep_keep"))
    fw = fineweb_filters(kept)
    return (kept.join(fw.where("fineweb_keep").select("doc_id"), "doc_id"),
            r)


def main():
    from document_ai_spark.operators.curation import curate
    from document_ai_spark.operators.dedup import collect_cap_metrics
    from document_ai_spark.plans.pipeline import extract
    from document_ai_spark.sources.docgen import write_corpus
    from pyspark.sql import Observation

    sections = _sections()
    path = Path(__file__).resolve().parents[1] / "EVIDENCE_10X.json"
    out = {}
    if sections != set(_ALL_SECTIONS) and path.exists():
        out = json.loads(path.read_text())
    else:
        # full run: the top-level metadata describes every section
        out.update({"n_extract_docs": N_EXTRACT,
                    "n_curate_docs": N_CURATE, "quick": QUICK})
    corpus = f"/tmp/evidence_corpus_{N_EXTRACT}"

    # ---- corpus generation at full parallelism -------------------------
    if sections & {"shape", "extract"}:
        s = _session("evidence-gen", PEAK)
        if not os.path.exists(f"{corpus}/documents_interleaved.parquet"):
            shutil.rmtree(corpus, ignore_errors=True)
            t0 = time.monotonic()
            write_corpus(s, corpus, n_docs=N_EXTRACT, seed=42,
                         partitions=PEAK)
            out["corpus_gen_sec"] = round(time.monotonic() - t0, 1)

        # plan-shape check: Exchange count at the bench-scale corpus vs
        # this one must match. NOT limit(n) — GlobalLimit adds its own
        # exchange and would fake a difference; compare two real corpora.
        if "shape" in sections:
            small_corpus = f"/tmp/bench_corpus_{N_EXTRACT // 10}"
            if not os.path.exists(
                    f"{small_corpus}/documents_interleaved.parquet"):
                write_corpus(s, small_corpus, n_docs=N_EXTRACT // 10,
                             seed=42, partitions=PEAK)
            for tag, c in (("small", small_corpus), ("large", corpus)):
                d = s.read.parquet(f"{c}/documents_interleaved.parquet")
                p = s.read.parquet(f"{c}/media_payloads.parquet")
                out[f"extract_exchanges_{tag}"] = {
                    "n_docs":
                        N_EXTRACT // 10 if tag == "small" else N_EXTRACT,
                    "exchanges": _exchanges(extract(d, p))}
        s.stop()

    # ---- extraction scaling pair at 10x --------------------------------
    def trial(threads):
        s = _session(f"evidence-extract-{threads}", threads)
        try:
            d = s.read.parquet(f"{corpus}/documents_interleaved.parquet")
            p = s.read.parquet(f"{corpus}/media_payloads.parquet")
            extract(d.limit(512).repartition(threads * 2), p) \
                .write.format("noop").mode("overwrite").save()
            spill0 = _blockmgr_bytes()
            obs = Observation()
            t0 = time.monotonic()
            ext = extract(d, p).observe(
                obs, F.sum(F.col("n_missing_payloads").cast("long"))
                .alias("missing_payloads"))
            ext.write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            return {"sec": round(dt, 1),
                    "docs_per_sec": round(N_EXTRACT / dt, 1),
                    "missing_payloads": int(
                        obs.get["missing_payloads"] or 0),
                    "peak_jvm_rss_mb": _jvm_peak_rss_mb(s),
                    "shuffle_bytes": _blockmgr_bytes() - spill0}
        finally:
            s.stop()

    if "extract" in sections:
        legs = {}
        for threads in (SCALE_LOW, SCALE_HIGH, PEAK):
            trials = [trial(threads) for _ in range(2)]
            best = min(trials, key=lambda t: t["sec"])
            best["trials_sec"] = [t["sec"] for t in trials]
            legs[f"t{threads}"] = best
            print(f"extract {threads}t: {best}", flush=True)
        eff = (legs[f"t{SCALE_HIGH}"]["docs_per_sec"]
               / ((SCALE_HIGH / SCALE_LOW)
                  * legs[f"t{SCALE_LOW}"]["docs_per_sec"]))
        out["extraction"] = {"n_docs": N_EXTRACT, **legs,
                             "scaling_efficiency": round(eff, 4),
                             "scaling_rule":
                                 f"T({SCALE_HIGH})/(4*T({SCALE_LOW})) "
                                 ">= 0.8"}

    # ---- curate() composition at half a million docs -------------------
    if "curate" in sections:
        s = _session("evidence-curate", PEAK)
        try:
            docs = gen_text_corpus(s, N_CURATE)
            spill0 = _blockmgr_bytes()
            with collect_cap_metrics() as caps:
                t0 = time.monotonic()
                budget = curate(docs).collect()
                dt = time.monotonic() - t0
            out["curate"] = {
                "n_docs": N_CURATE,
                "sec": round(dt, 1),
                "docs_per_sec": round(N_CURATE / dt, 1),
                "budget_rows": len(budget),
                "total_tokens": int(
                    sum(r["total_tokens"] for r in budget)),
                **caps.summary(),
                "peak_jvm_rss_mb": _jvm_peak_rss_mb(s),
                "shuffle_bytes": _blockmgr_bytes() - spill0,
            }
            print(f"curate: {out['curate']}", flush=True)
        finally:
            s.stop()

    # ---- full published-gate battery at half a million docs ------------
    if "gates" in sections:
        s = _session("evidence-gates", PEAK)
        try:
            docs = gen_web_corpus(s, N_CURATE)
            small = gen_web_corpus(s, N_CURATE // 10)
            bs, cs = published_gate_battery(small)
            bl, cl = published_gate_battery(docs)
            out["gates_exchanges"] = {
                "small": _exchanges(bs), "large": _exchanges(bl)}
            cs.unpersist()
            t0 = time.monotonic()
            n_keep = bl.count()
            dt = time.monotonic() - t0
            cl.unpersist()
            out["published_gates"] = {
                "n_docs": N_CURATE, "sec": round(dt, 1),
                "docs_per_sec": round(N_CURATE / dt, 1),
                "n_kept": int(n_keep),
                "peak_jvm_rss_mb": _jvm_peak_rss_mb(s)}
            print(f"published gates: {out['published_gates']}", flush=True)
        finally:
            s.stop()

    # ---- SemDeDup at half a million vectors -----------------------------
    # Evidences the SCALE.md story: the O(N^2/k) cosine sweep is paid
    # task-locally (no pair shuffle), the codebook trains ONCE and
    # broadcasts, and the plan's exchange count is input-invariant.
    # k sizes clusters to ~2.5k (< SEM_MAX_CLUSTER) per the production
    # rule k ~ N/2500 (the mean must sit under the cap) — the cap must
    # NOT engage on natural clusters.
    if "semdedup" in sections:
        from document_ai_spark.operators.similarity import (
            kmeans_codebook,
            semdedup,
        )
        k = max(8, N_CURATE // 2500)
        s = _session("evidence-semdedup", PEAK)
        try:
            vecs = gen_embeddings(s, N_CURATE)
            small = gen_embeddings(s, N_CURATE // 10)
            t0 = time.monotonic()
            cents = kmeans_codebook(vecs, k=k).localCheckpoint()
            codebook_sec = time.monotonic() - t0
            cents_small = kmeans_codebook(
                small, k=max(8, k // 10)).localCheckpoint()
            out["semdedup_exchanges"] = {
                "small": _exchanges(semdedup(small, codebook=cents_small)),
                "large": _exchanges(semdedup(vecs, codebook=cents))}
            with collect_cap_metrics() as caps:
                t0 = time.monotonic()
                res = (semdedup(vecs, codebook=cents)
                       .agg(F.count("*").alias("n"),
                            F.sum(F.col("sem_keep").cast("long"))
                            .alias("n_kept")).collect()[0])
                dt = time.monotonic() - t0
            out["semdedup"] = {
                "n_vecs": N_CURATE, "k": k,
                "codebook_sec": round(codebook_sec, 1),
                "sec": round(dt, 1),
                "vecs_per_sec": round(N_CURATE / dt, 1),
                "n_kept": int(res["n_kept"]),
                "n_dropped": int(res["n"] - res["n_kept"]),
                "n_planted_dups": N_CURATE - int(N_CURATE * 0.9),
                **caps.summary(),
                "peak_jvm_rss_mb": _jvm_peak_rss_mb(s)}
            print(f"semdedup: {out['semdedup']}", flush=True)
        finally:
            s.stop()

    # ---- multimodal packing at half a million interleaved docs ---------
    # The two-pass prefix sum's exchange count must not grow with input
    # (2 hash exchanges of (doc_id, three longs) rows), and the layout
    # invariant — last doc's start_offset + n_tokens == sum(n_tokens) —
    # must hold exactly in 64-bit at full size.
    if "pack" in sections:
        from document_ai_spark.operators.curation import pack_interleaved
        s = _session("evidence-pack", PEAK)
        try:
            big = gen_interleaved(s, N_CURATE)
            small = gen_interleaved(s, N_CURATE // 10)
            out["pack_exchanges"] = {
                "small": _exchanges(pack_interleaved(small, seq_len=2048)),
                "large": _exchanges(pack_interleaved(big, seq_len=2048))}
            t0 = time.monotonic()
            r = (pack_interleaved(big, seq_len=2048)
                 .agg(F.count("*").alias("n"),
                      F.sum("n_tokens").alias("total_tokens"),
                      F.sum("n_media").alias("total_media"),
                      F.max(F.col("start_offset") + F.col("n_tokens"))
                       .alias("stream_end"),
                      F.max("chunk_id").alias("max_chunk"))
                 .collect()[0])
            dt = time.monotonic() - t0
            out["pack"] = {
                "n_docs": N_CURATE, "sec": round(dt, 1),
                "docs_per_sec": round(N_CURATE / dt, 1),
                "total_tokens": int(r["total_tokens"]),
                "total_media_spans": int(r["total_media"]),
                "stream_contiguous":
                    bool(r["stream_end"] == r["total_tokens"]),
                "n_sequences": int(r["max_chunk"]) + 1,
                "peak_jvm_rss_mb": _jvm_peak_rss_mb(s)}
            print(f"pack: {out['pack']}", flush=True)
        finally:
            s.stop()

    # ---- containment dedup at half a million docs -----------------------
    # Evidences the containment_pairs scale story: TWO exchanges total
    # (fp buckets + pair-count agg), input-invariant, only id/int rows
    # shuffled; planted containers (chrome-wrapped full copies at
    # jaccard ~ |A|/|B|, unreachable for MinHash bands) must ALL be
    # found at containment 1.0.
    if "containment" in sections:
        from document_ai_spark.operators.mining import containment_pairs
        s = _session("evidence-containment", PEAK)
        try:
            big = gen_containment_corpus(s, N_CURATE)
            small = gen_containment_corpus(s, N_CURATE // 10)
            out["containment_exchanges"] = {
                "small": _exchanges(containment_pairs(small)),
                "large": _exchanges(containment_pairs(big))}
            base_n = int(N_CURATE * 0.9)
            t0 = time.monotonic()
            r = (containment_pairs(big)
                 .agg(F.count("*").alias("n_pairs"),
                      F.sum(((F.col("doc_b") >= base_n)
                             & (F.col("doc_a")
                                == F.col("doc_b") - base_n)
                             & (F.col("containment") == 1.0))
                            .cast("long")).alias("n_planted_found"))
                 .collect()[0])
            dt = time.monotonic() - t0
            out["containment"] = {
                "n_docs": N_CURATE, "sec": round(dt, 1),
                "docs_per_sec": round(N_CURATE / dt, 1),
                "n_pairs": int(r["n_pairs"]),
                "n_planted": N_CURATE - base_n,
                "n_planted_found_at_1": int(r["n_planted_found"]),
                "planted_recall": round(
                    r["n_planted_found"] / (N_CURATE - base_n), 4),
                "peak_jvm_rss_mb": _jvm_peak_rss_mb(s)}
            print(f"containment: {out['containment']}", flush=True)
        finally:
            s.stop()

    path.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
