"""Similarity search over an embedding column (array<float>).

Two paths, mirroring how a real 100 TB pipeline tiers ANN:
  * brute-force cosine top-k for a SMALL probe set: probe vectors are
    broadcast, the corpus streams once, per-probe top-k via window —
    O(corpus x probes) but a single scan, no shuffle of the corpus.
  * sign-LSH bucketed variant: bucket = sign-bit pattern of the first B
    dimensions (a deterministic random-hyperplane stand-in). Probes only
    compare against their own bucket — the scale path where the corpus
    side is hash-partitioned by bucket and never fully scanned per query.

Dot products are computed with built-in higher-order functions
(zip_with + aggregate) — JVM-side, no Python.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

LSH_BITS = 8


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def brute_force_topk(emb: DataFrame, probe_ids, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors per probe id.
    Returns (probe_id, vec_id, cos_sim, rank) — ties broken by vec_id."""
    base = emb.select("vec_id",
                      F.col("embedding").cast("array<double>").alias("emb"))
    probes = base.where(F.col("vec_id").isin(list(probe_ids))).select(
        F.col("vec_id").alias("probe_id"), F.col("emb").alias("probe_emb"))
    scored = (
        base.crossJoin(F.broadcast(probes))
        .where(F.col("vec_id") != F.col("probe_id"))
        .withColumn("cos_sim", F.round(_cosine("emb", "probe_emb"), 6))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("probe_id", "vec_id", "cos_sim", "rank")
    )


def with_lsh_bucket(emb: DataFrame, bits: int = LSH_BITS) -> DataFrame:
    """Sign-pattern bucket over the first `bits` dimensions."""
    e = F.col("embedding")
    bucket = F.lit(0)
    for i in range(bits):
        bucket = bucket + F.when(F.element_at(e, i + 1) >= 0,
                                 F.lit(1 << i)).otherwise(F.lit(0))
    return emb.withColumn("lsh_bucket", bucket)


def lsh_topk(emb: DataFrame, probe_ids, k: int = 5,
             bits: int = LSH_BITS) -> DataFrame:
    """Approximate top-k: candidates restricted to the probe's LSH bucket.
    Same output shape as brute_force_topk; recall < 1 by design."""
    b = with_lsh_bucket(emb, bits).select(
        "vec_id", "lsh_bucket",
        F.col("embedding").cast("array<double>").alias("emb"))
    probes = b.where(F.col("vec_id").isin(list(probe_ids))).select(
        F.col("vec_id").alias("probe_id"),
        F.col("lsh_bucket"),
        F.col("emb").alias("probe_emb"))
    scored = (
        b.join(F.broadcast(probes), "lsh_bucket")
        .where(F.col("vec_id") != F.col("probe_id"))
        .withColumn("cos_sim", F.round(_cosine("emb", "probe_emb"), 6))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("probe_id", "vec_id", "cos_sim", "rank")
    )


IVF_K = 8


def with_ivf_cluster(emb: DataFrame, k: int = IVF_K) -> DataFrame:
    """IVF coarse quantization: assign each vector to its max-cosine
    centroid. Centroids are the embeddings of vec_id 0..k-1 — a
    deterministic stand-in for a trained codebook (k-means would go here
    on a real corpus); the *plumbing* (broadcast centroids, one scan,
    argmax assignment, cluster-pruned search) is the scale path.
    Ties break to the lowest centroid id."""
    cents = emb.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").cast("array<double>").alias("cent"))
    base = emb.select("vec_id",
                      F.col("embedding").cast("array<double>").alias("emb"),
                      "embedding", *[c for c in emb.columns
                                     if c not in ("vec_id", "embedding")])
    scored = base.crossJoin(F.broadcast(cents)).withColumn(
        "cos_c", F.round(_cosine("emb", "cent"), 6))
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_c"), F.asc("centroid_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .drop("rn", "cent", "cos_c"))


def ivf_topk(emb: DataFrame, probe_ids, k: int = 5,
             n_clusters: int = IVF_K) -> DataFrame:
    """Approximate top-k with IVF nprobe=1: candidates restricted to the
    probe's own cluster — at 10^12 vectors the corpus is hash-partitioned
    by centroid_id and a query touches 1/K of it."""
    assigned = with_ivf_cluster(emb, n_clusters).select(
        "vec_id", "centroid_id", "emb")
    probes = assigned.where(F.col("vec_id").isin(list(probe_ids))).select(
        F.col("vec_id").alias("probe_id"),
        F.col("centroid_id"),
        F.col("emb").alias("probe_emb"))
    scored = (
        assigned.join(F.broadcast(probes), "centroid_id")
        .where(F.col("vec_id") != F.col("probe_id"))
        .withColumn("cos_sim", F.round(_cosine("emb", "probe_emb"), 6))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("probe_id", "vec_id", "cos_sim", "rank")
    )


def embedding_near_dups(emb: DataFrame, cos_min: float = 0.95,
                        bits: int = LSH_BITS) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucket self-join."""
    b = with_lsh_bucket(emb, bits).select(
        "vec_id", "lsh_bucket",
        F.col("embedding").cast("array<double>").alias("emb"))
    a = b.select(F.col("vec_id").alias("id_a"), "lsh_bucket",
                 F.col("emb").alias("emb_a"))
    c = b.select(F.col("vec_id").alias("id_b"), "lsh_bucket",
                 F.col("emb").alias("emb_b"))
    pairs = a.join(c, "lsh_bucket").where(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cos_sim", F.round(_cosine("emb_a", "emb_b"), 6))
        .where(F.col("cos_sim") >= cos_min)
        .select("id_a", "id_b", "cos_sim")
    )
