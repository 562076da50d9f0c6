"""Similarity search over the ``embeddings`` table (array<float>, 64-dim).

Brute-force cosine top-k is the exact baseline; the LSH-bucketed variant is
the 100 TB path (bucket join instead of full cross product). Dot products
run JVM-side via zip_with/aggregate with a double accumulator — bit-exact
against DuckDB's list_dot_product over DOUBLE[] (both fold in index order),
so even raw cosine values hash-match the oracle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from cstore_fdw_spark.operators import register, table

N_QUERIES = 5    # demo query set: vec_id < 5
TOP_K = 3


def dot(x: Column, y: Column) -> Column:
    """Ordered-fold double dot product (JVM higher-order functions — no
    Python in the loop)."""
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def cosine(x: Column, y: Column) -> Column:
    return dot(x, y) / (F.sqrt(dot(x, x)) * F.sqrt(dot(y, y)))


_ORACLE_COS = """
  list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
  (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
   sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))
"""


@register(
    "ann_cosine_topk",
    category="similarity",
    bench=True,
    oracle=f"""
    SELECT query_id, neighbor_id, rank, cos FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_ORACLE_COS} AS cos,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                ORDER BY {_ORACLE_COS} DESC, b.vec_id) AS rank
      FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < {N_QUERIES}) t
    WHERE rank <= {TOP_K}
    """)
def ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k: broadcast the query set, stream the
    candidate table once, per-query top-k via window. At 100 TB the
    candidate scan is embarrassingly parallel and nothing shuffles except
    the k·|queries| result rows."""
    e = table(spark, sf_dir, "embeddings")
    # hoist norms: ||q|| and ||c|| computed once per vector, not per pair
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"),
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("qnorm"))
    c = e.select(F.col("vec_id").alias("neighbor_id"),
                 F.col("embedding").alias("cvec"),
                 F.sqrt(dot(F.col("embedding"), F.col("embedding")))
                 .alias("cnorm"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(),
                                               "neighbor_id")
    cos = dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm"))
    return (c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id", cos.alias("cos"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "neighbor_id", "rank", "cos"))


@register(
    "cosine_pairs_threshold",
    category="similarity",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {_ORACLE_COS} AS cos
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_ORACLE_COS} >= 0.35
    """)
def cosine_pairs_threshold(spark, sf_dir):
    """All near-duplicate embedding pairs (cosine ≥ 0.35) within a label —
    label acts as the blocking key so the pair space is |label-group|²,
    not |table|² (the embedding-cosine near-dup family from the dedup
    inventory)."""
    e = table(spark, sf_dir, "embeddings")
    a, b = e.alias("a"), e.alias("b")
    cos = cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (a.join(b, (F.col("a.label") == F.col("b.label"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
            .select(F.col("a.vec_id").alias("vec_a"),
                    F.col("b.vec_id").alias("vec_b"),
                    cos.alias("cos"))
            .filter(F.col("cos") >= 0.35))


# ------------------------------------------------- LSH-bucketed ANN (scale)

LSH_BITS = 12
DIM = 64


def _hyperplanes() -> list[list[float]]:
    """Deterministic ±1 random hyperplanes from SHA-256 (no RNG state,
    reproducible across sessions/engines)."""
    planes = []
    for j in range(LSH_BITS):
        row = []
        for k in range(DIM):
            digest = hashlib.sha256(f"cstore-lsh-{j}-{k}".encode()).digest()
            row.append(1.0 if digest[0] & 1 else -1.0)
        planes.append(row)
    return planes


def lsh_signature(vec: Column) -> Column:
    """Sign-random-projection signature: bit j = sign(vec · plane_j)."""
    sig = F.lit(0).cast("long")
    for j, plane in enumerate(_hyperplanes()):
        p = F.array(*[F.lit(v) for v in plane])
        bit = F.when(dot(vec, p) > 0,
                     F.shiftleft(F.lit(1).cast("long"), j)).otherwise(0)
        sig = sig + bit
    return sig


@register("ann_lsh_bucketed", category="similarity", bench=True)
def ann_lsh_bucketed(spark, sf_dir):
    """Approximate NN via sign-random-projection LSH: 12-bit signatures,
    candidates = same bucket, exact cosine re-rank within bucket. The
    scale path: the join is on the signature (≈ table/4096 per bucket)
    instead of a cross product. Rows-only gate (bucketing is
    hyperplane-specific; ann_cosine_topk is the exact anchor).
    Output: (query_id, neighbor_id, rank, cos)."""
    e = table(spark, sf_dir, "embeddings")
    sig = e.select("vec_id", "embedding",
                   lsh_signature(F.col("embedding")).alias("bucket"),
                   F.sqrt(dot(F.col("embedding"), F.col("embedding")))
                   .alias("norm"))
    q = (sig.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qvec"),
                 F.col("norm").alias("qnorm"), "bucket"))
    c = sig.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("embedding").alias("cvec"),
                   F.col("norm").alias("cnorm"), "bucket")
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(),
                                               "neighbor_id")
    cos = dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm"))
    return (c.join(F.broadcast(q), ["bucket"])
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id", cos.alias("cos"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "neighbor_id", "rank", "cos"))
