"""Deduplication operators: exact, MinHash-bucketed near-dup, SimHash,
n-gram Jaccard — the dedup family a pretraining-data pipeline needs.

Design for scale:
  * exact dedup = hash-groupBy on md5(text): one shuffle, partial agg
    map-side, no text comparison ever crosses the wire (only 32-byte keys).
  * near-dup = bottom-k MinHash sketch per doc (array expr, no UDF) ->
    candidate generation by MIN-hash bucket join (docs sharing their
    smallest shingle hash land in one bucket) -> exact Jaccard verify on
    candidates only. The candidate join is an equi-join on the bucket key,
    NOT a cross join — at 10^12 docs the cross join is impossible, the
    bucket join shuffles each doc once.
  * SimHash = 16-bit bitwise-majority signature over word hashes, pure
    integer expressions; hamming-0 collision = near-dup bucket.

All hashing is md5-based so the DuckDB oracle computes bit-identical
values (Spark xxhash64 has no DuckDB twin).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SHINGLE_K = 3          # words per shingle
SKETCH_SIZE = 8        # bottom-k sketch size
SIMHASH_BITS = 16


def _word_shingles(k: int = SHINGLE_K):
    """Array of k-word shingles (space-joined), via SQL higher-order fns."""
    return F.expr(
        "transform("
        f"  sequence(1, greatest(size(split(trim(text), '\\\\s+')) - {k - 1}, 1)),"
        f"  i -> array_join(slice(split(trim(text), '\\\\s+'), i, {k}), ' '))"
    )


def with_minhash_sketch(df: DataFrame, sketch_size: int = SKETCH_SIZE
                        ) -> DataFrame:
    """Bottom-k MinHash sketch: the k lexicographically-smallest md5 values
    over the doc's word shingles. Pure array expressions."""
    hashes = F.transform(_word_shingles(), lambda s: F.md5(s))
    sketch = F.slice(F.array_sort(F.array_distinct(hashes)), 1, sketch_size)
    return df.withColumns({
        "minhash_sketch": sketch,
        "minhash_bucket": F.element_at(sketch, 1),
    })


def exact_duplicates(df: DataFrame) -> DataFrame:
    """Groups of byte-identical texts: (content_hash, n_dups, keep_doc_id)."""
    return (
        df.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.count("*").alias("n_dups"),
             F.min("doc_id").alias("keep_doc_id"))
        .where(F.col("n_dups") > 1)
    )


def near_dup_pairs(df: DataFrame, jaccard_min: float = 0.6) -> DataFrame:
    """MinHash-bucketed candidate pairs verified by sketch-Jaccard.

    Self-join on minhash_bucket (equi-join, broadcast-able per bucket via
    AQE), pair de-dup by doc_id ordering, then Jaccard over the bottom-k
    sketches. Returns (doc_a, doc_b, jaccard)."""
    s = with_minhash_sketch(df).select(
        "doc_id", "minhash_bucket", "minhash_sketch")
    a = s.select(F.col("doc_id").alias("doc_a"),
                 F.col("minhash_bucket"),
                 F.col("minhash_sketch").alias("sk_a"))
    b = s.select(F.col("doc_id").alias("doc_b"),
                 F.col("minhash_bucket"),
                 F.col("minhash_sketch").alias("sk_b"))
    pairs = a.join(b, "minhash_bucket").where(F.col("doc_a") < F.col("doc_b"))
    inter = F.size(F.array_intersect("sk_a", "sk_b"))
    union = F.size(F.array_union("sk_a", "sk_b"))
    return (
        pairs.withColumn("jaccard", F.round(inter / union, 6))
        .where(F.col("jaccard") >= jaccard_min)
        .select("doc_a", "doc_b", "jaccard")
    )


def with_simhash(df: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """16-bit SimHash: per word, take md5's first 4 hex chars as a 16-bit
    int; signature bit b = majority of word-hash bit b. Integer exprs only."""
    word_hashes = F.expr(
        "transform(split(trim(text), '\\\\s+'), "
        "w -> conv(substring(md5(w), 1, 4), 16, 10))"
    )
    # For each bit: count words with the bit set; majority -> signature bit.
    n_words = F.expr("size(split(trim(text), '\\\\s+'))")
    def bit_ones(b: int):
        def merge(acc, h):
            return acc + F.shiftright(h.cast("long"), b) \
                .bitwiseAND(1).cast("int")
        return F.aggregate(word_hashes, F.lit(0), merge)

    bit_terms = []
    for b in range(bits):
        ones = bit_ones(b)
        bit_terms.append(
            F.when(ones * 2 >= n_words, F.lit(1 << b)).otherwise(F.lit(0)))
    sig = bit_terms[0]
    for t in bit_terms[1:]:
        sig = sig + t
    return df.withColumn("simhash", sig.cast("long"))


def ngram_jaccard_pairs(df: DataFrame, sample_ids, k: int = SHINGLE_K
                        ) -> DataFrame:
    """Exact n-gram Jaccard for a small probe set vs the corpus: probe side
    is broadcast (tiny), corpus side streams — no full cross join."""
    sh = df.withColumn("shingles",
                       F.array_distinct(_word_shingles(k=k)))
    probe = sh.where(F.col("doc_id").isin(list(sample_ids))).select(
        F.col("doc_id").alias("probe_id"),
        F.col("shingles").alias("probe_shingles"))
    pairs = sh.crossJoin(F.broadcast(probe)).where(
        F.col("doc_id") != F.col("probe_id"))
    inter = F.size(F.array_intersect("shingles", "probe_shingles"))
    union = F.size(F.array_union("shingles", "probe_shingles"))
    return pairs.select(
        "probe_id", "doc_id",
        F.round(inter / union, 6).alias("jaccard"))
