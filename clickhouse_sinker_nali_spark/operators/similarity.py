"""Similarity search over embedding columns (array<float>).

Two tiers, as a 100 TB pipeline needs:

- **Brute-force top-k** — exact baseline: broadcast the (small) query set,
  score every corpus vector JVM-side (zip_with/aggregate fold — no Python),
  per-query top-k via window rank.  Cost O(|corpus|·|queries|·d) but
  embarrassingly parallel; right answer for ≤ a few thousand queries.
- **LSH-bucketed ANN** — scale path: random-hyperplane signatures (sign-bit
  LSH) computed map-side; candidates = corpus vectors sharing the query's
  bucket; exact cosine re-rank only within buckets.  Equi-join on the
  bucket key instead of a full cross product.  (An IVF variant would swap
  the hyperplane bucket for a nearest-centroid assignment; same join shape.)

Hyperplanes are deterministic module constants derived from md5 so the
DuckDB oracle can rebuild the identical planes inline.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions import cosine
from ..session import load_table

N_QUERIES = 8  # vec_id < 8 are the query vectors
TOP_K = 5
LSH_PLANES = 6
DIM = 64


def _plane_component(i: int, j: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1].

    Same formula as the inline SQL in ANN_LSH_SQL:
    (md5-60-bit("p{i}:{j}") % 2001 - 1000) / 1000.
    """
    h = int(hashlib.md5(f"p{i}:{j}".encode()).hexdigest()[:15], 16)
    return (h % 2001 - 1000) / 1000.0


PLANES = [[_plane_component(i, j) for j in range(DIM)] for i in range(LSH_PLANES)]


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast queries × corpus, window rank.

    The corpus side never shuffles for scoring (broadcast nested-loop);
    the only shuffle is the per-query rank, keyed on query_id (tiny).
    """
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"), "label"
    )
    scored = corpus.join(broadcast(queries)).select(
        "query_id",
        "neighbor_id",
        "label",
        cosine("qe", "ce").alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "label", "cos_sim")
        .orderBy("query_id", "rank")
    )


_COS = (
    "(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])"
    " / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))))"
)

ANN_BRUTEFORCE_SQL = f"""
SELECT query_id, rank, neighbor_id, label, cos_sim
FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS label,
           {_COS} AS cos_sim,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                ORDER BY {_COS} DESC, c.vec_id) AS rank
    FROM embeddings q, embeddings c
    WHERE q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
)
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


def _bucket_expr(emb_col: str):
    """Sign-bit LSH bucket id from the deterministic hyperplanes.

    Σ_b 2^b·[dot(v, plane_b) > 0] — planes enter the plan as literal
    arrays, the dot is a zip_with fold: all JVM-side, map-only.
    """
    bucket = F.lit(0)
    for b, plane in enumerate(PLANES):
        parr = F.array(*[F.lit(x) for x in plane])
        d = F.aggregate(
            F.zip_with(F.col(emb_col), parr, lambda x, p: x.cast("double") * p),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return bucket


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: hyperplane bucket equi-join, exact re-rank inside.

    Recall < 1 by construction (bucket boundaries); the oracle runs the
    identical algorithm so results still match exactly.  At 100 TB the
    bucket join replaces the broadcast cross product of the brute-force
    path: corpus bucketing is map-side, the join shuffles only bucket keys.
    """
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    with_bucket = emb.select(
        "vec_id", "label", "embedding", _bucket_expr("embedding").alias("bucket")
    )
    queries = with_bucket.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        "bucket",
    )
    corpus = with_bucket.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        "bucket",
    )
    scored = corpus.join(broadcast(queries), "bucket").select(
        "query_id", "neighbor_id", "bucket", cosine("qe", "ce").alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "bucket", "cos_sim")
        .orderBy("query_id", "rank")
    )


def _bucket_sql(alias: str) -> str:
    """Inline SQL rebuilding the identical hyperplane bucket id."""
    terms = []
    for b in range(LSH_PLANES):
        plane_list = (
            "list_transform(range(0, "
            + str(DIM)
            + "), j -> ((('0x' || substr(md5('p"
            + str(b)
            + ":' || j), 1, 15))::BIGINT % 2001 - 1000) / 1000.0)"
            + ")"
        )
        terms.append(
            f"(CASE WHEN list_dot_product({alias}.embedding::DOUBLE[], {plane_list}) > 0 "
            f"THEN {1 << b} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


ANN_LSH_SQL = f"""
WITH emb_b AS (
    SELECT e.vec_id, e.label, e.embedding, {_bucket_sql('e')} AS bucket
    FROM embeddings e
)
SELECT query_id, rank, neighbor_id, bucket, cos_sim
FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.bucket AS bucket,
           {_COS} AS cos_sim,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                ORDER BY {_COS} DESC, c.vec_id) AS rank
    FROM emb_b q JOIN emb_b c ON q.bucket = c.bucket
    WHERE q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
)
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""
