"""Similarity search over the ``embeddings`` table (array<float>, 64-dim).

Brute-force cosine top-k is the exact baseline; the LSH-bucketed variant is
the 100 TB path (bucket join instead of full cross product). Dot products
run JVM-side via zip_with/aggregate with a double accumulator — bit-exact
against DuckDB's list_dot_product over DOUBLE[] (both fold in index order),
so even raw cosine values hash-match the oracle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, functions as F
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
             CAST(ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                ORDER BY {_ORACLE_COS} DESC, b.vec_id) AS BIGINT) AS rank
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
            .withColumn("rank", F.row_number().over(w).cast("long"))
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

#: L hash tables of b bits each (classic E2LSH layout): a vector lands in
#: one bucket per table; candidates = union over tables. b sizes bucket
#: occupancy (~N/2^b per table), L buys recall. At 100 TB raise b with
#: corpus size and L with the recall target.
LSH_BITS = 6
LSH_TABLES = 6
DIM = 64


def _plane_matrix():
    """(LSH_TABLES·LSH_BITS, DIM) ±1 matrix, SHA-256-derived —
    deterministic, no RNG state, reproducible across sessions."""
    import numpy as np
    rows = []
    for t in range(LSH_TABLES):
        for j in range(LSH_BITS):
            rows.append([1.0 if hashlib.sha256(
                f"cstore-lsh-{t}-{j}-{k}".encode()).digest()[0] & 1 else -1.0
                for k in range(DIM)])
    return np.asarray(rows)


def lsh_buckets(vec_col_name: str) -> Column:
    """array of per-table bucket ids (index = table): bit j of table t's
    bucket = sign(vec · plane_{t,j}).

    Arrow-vectorized pandas UDF: all L·b projections are ONE BLAS matmul
    per batch. The JVM higher-order-function formulation was measured at
    ~2.3 ms/row (interpreted fold overhead) vs microseconds here — this is
    the documented case where built-ins genuinely can't express the
    semantics efficiently (batch linear algebra)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def buckets_of(vecs):
        import numpy as np
        import pandas as pd
        planes = _plane_matrix()                       # (L*B, DIM)
        V = np.stack(vecs.to_numpy()).astype(np.float64)   # (n, DIM)
        bits = (V @ planes.T) > 0                       # (n, L*B)
        bits = bits.reshape(len(V), LSH_TABLES, LSH_BITS)
        weights = (1 << np.arange(LSH_BITS)).astype(np.int64)
        out = bits @ weights                            # (n, L)
        return pd.Series(list(out))

    return buckets_of(vec_col_name)


@register("ann_lsh_bucketed", category="similarity", bench=True)
def ann_lsh_bucketed(spark, sf_dir):
    """Approximate NN via multi-table sign-random-projection LSH
    (LSH_TABLES tables × LSH_BITS bits): candidates share a bucket in any
    table, then exact cosine re-ranks within the candidate set. The scale
    path: the join is on bucket keys (occupancy ≈ N/2^bits per table)
    instead of a cross product; recall is bounded by L·p^b collision
    probability — low on these *uniform random* test vectors by
    construction, high on clustered real embeddings. Rows-only gate
    (bucketing is hyperplane-specific; ann_cosine_topk is the exact
    anchor). Output: (query_id, neighbor_id, rank, cos)."""
    e = table(spark, sf_dir, "embeddings")
    sig = (e.select("vec_id", "embedding",
                    F.posexplode(lsh_buckets("embedding")),
                    F.sqrt(dot(F.col("embedding"), F.col("embedding")))
                    .alias("norm"))
           .select("vec_id", "embedding", "norm",
                   F.struct(F.col("pos").alias("t"),
                            F.col("col").alias("b")).alias("tb")))
    q = (sig.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qvec"),
                 F.col("norm").alias("qnorm"), "tb"))
    c = sig.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("embedding").alias("cvec"),
                   F.col("norm").alias("cnorm"), "tb")
    # candidate = shares a bucket in ANY table (dedupe multi-table hits
    # before the cosine so each pair is scored once)
    cand = (c.join(F.broadcast(q), ["tb"])
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id", "qvec", "cvec",
                    "qnorm", "cnorm")
            .dropDuplicates(["query_id", "neighbor_id"]))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(),
                                               "neighbor_id")
    cos = dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm"))
    return (cand.select("query_id", "neighbor_id", cos.alias("cos"))
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "neighbor_id", "rank", "cos"))


# ------------------------------------------------------ IVF ANN (scale alt)

IVF_NLIST = 16    # coarse centroids
IVF_NPROBE = 3    # probed cells per query


@register("ann_ivf_coarse", category="similarity")
def ann_ivf_coarse(spark, sf_dir):
    """IVF-style approximate NN: k-means coarse quantizer (pyspark.ml,
    fixed seed) partitions vectors into nlist cells; each query probes its
    nprobe nearest centroids and re-ranks exactly within those cells only.

    The other classic ANN scale path next to LSH: candidate count ≈
    N·nprobe/nlist instead of N. Centroids train on a sample and are tiny
    (nlist×dim) → broadcast; assignment is one map-side pass. Rows-only
    gate (centroids are model-specific; ann_cosine_topk is the exact
    anchor). Output: (query_id, neighbor_id, rank, cos)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    e = table(spark, sf_dir, "embeddings")
    vecs = e.select("vec_id", "embedding",
                    array_to_vector(F.col("embedding").cast("array<double>"))
                    .alias("features"))
    # random init + few iterations: the quantizer only needs rough cells
    # (k-means|| init runs extra distributed passes that dominate at
    # training time without improving the probe structure meaningfully)
    model = KMeans(k=IVF_NLIST, seed=42, maxIter=3,
                   initMode="random").fit(vecs)
    assigned = (model.transform(vecs)
                .select("vec_id", "embedding",
                        F.col("prediction").alias("cell"),
                        F.sqrt(dot(F.col("embedding"), F.col("embedding")))
                        .alias("norm")))

    # query → nprobe nearest centroids (centroid list is tiny: broadcast
    # as a literal-free cross join + rank)
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, centroid array<double>")
    q = (assigned.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qvec"),
                 F.col("norm").alias("qnorm")))
    wprobe = Window.partitionBy("query_id").orderBy(F.col("cdist").asc(),
                                                    "cell")
    probes = (q.crossJoin(F.broadcast(centroids))
              .select("query_id", "qvec", "qnorm", "cell",
                      (-dot(F.col("qvec"), F.col("centroid"))).alias("cdist"))
              .withColumn("pr", F.row_number().over(wprobe))
              .filter(F.col("pr") <= IVF_NPROBE)
              .select("query_id", "qvec", "qnorm", "cell"))

    c = assigned.select(F.col("vec_id").alias("neighbor_id"),
                        F.col("embedding").alias("cvec"),
                        F.col("norm").alias("cnorm"), "cell")
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(),
                                               "neighbor_id")
    cos = dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm"))
    return (c.join(F.broadcast(probes), ["cell"])
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id", cos.alias("cos"))
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "neighbor_id", "rank", "cos"))
