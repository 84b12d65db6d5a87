"""Model-based quality classification at corpus scale — the
fastText-style hashed-feature linear scorer every CCNet/LLaMA-class
curation pipeline runs over its full corpus.

The expensive part of "run a quality classifier over 100 TB" is not the
model (a sparse linear layer) — it is the feature extraction and the
dot product over trillions of tokens.  Both are expressible as pure
DataFrame operations, so the whole inference pass stays JVM-side inside
whole-stage codegen: tokenize → feature-hash into B buckets → per-(doc,
bucket) counts → join the broadcast weight table → per-doc dot product.
No UDF anywhere, no per-row Python.

The weight table is INJECTED (a trained model's coefficients would be
loaded the same way — a B-row DataFrame broadcast to every executor);
training itself is out of scope, exactly as the reference engine ships
its GeoIP databases pre-built rather than building them.  Here the
weights are a deterministic pseudo-model derived from the bucket id so
the DuckDB oracle can reproduce them; swap :func:`weight_table` for
``spark.read.parquet(model_path)`` to serve a real model.

Score discipline: weights are DECIMAL(7,3) and counts integers, so the
logit is exact decimal arithmetic in both engines — the classifier
emits the raw logit and a sign label rather than a sigmoid, because
``exp()`` is the one transcendental whose last-ULP behavior differs
across engines.  (Monotone in the logit, the sigmoid adds no ranking
information anyway.)

100 TB notes: the (doc, bucket) aggregate is a map-side partial groupBy;
the weight join broadcasts B rows (B = 4096 here, a few KB); the per-doc
reduce shuffles once on doc_id.  Identical plan shape to tfidf — proven
at scale.  Skewed documents (one doc with millions of tokens) only widen
one group; AQE's skew split covers the aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import portable_hash64, portable_hash64_sql
from ..session import load_table

N_BUCKETS = 4096
_W_MOD = 2001  # weights span [-1.000, +1.000] in 0.001 steps


def weight_table(spark: SparkSession, n_buckets: int = N_BUCKETS) -> DataFrame:
    """The injected model: one DECIMAL(7,3) weight per feature bucket.

    Pseudo-model: ``w(b) = (portable_hash64('w:'||b) % 2001 - 1000) /
    1000`` — deterministic, reproducible in the oracle, and shaped like
    a real trained vector (dense, signed, bounded).
    """
    return spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket"),
        (
            (
                F.pmod(portable_hash64(F.concat(F.lit("w:"), F.col("id").cast("string"))), F.lit(_W_MOD))
                - F.lit(1000)
            ).cast("decimal(7,3)")
            / F.lit(1000).cast("decimal(7,3)")
        ).cast("decimal(7,3)").alias("w"),
    )


def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document linear-classifier logit over hashed bag-of-words
    features, plus the sign label — the full-corpus inference pass.
    """
    docs = load_table(spark, sf_dir, "documents")
    feats = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .select(
            "doc_id",
            F.pmod(portable_hash64(F.col("word")), F.lit(N_BUCKETS))
            .cast("int")
            .alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = F.broadcast(weight_table(spark))
    return (
        feats.join(w, "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("cnt") * F.col("w")).cast("double").alias("logit"),
            F.sum("cnt").alias("n_tokens"),
        )
        .select(
            "doc_id",
            F.round("logit", 6).alias("logit"),
            F.when(F.col("logit") > 0, F.lit("keep"))
            .otherwise(F.lit("drop"))
            .alias("label"),
            "n_tokens",
        )
        .orderBy("doc_id")
    )


_WH = portable_hash64_sql("'w:' || CAST(b.bucket AS VARCHAR)")

QUALITY_CLASSIFIER_SQL = f"""
WITH weights AS (
    SELECT b.bucket,
           CAST(CAST((({_WH}) % {_W_MOD} + {_W_MOD}) % {_W_MOD} - 1000
                AS DECIMAL(7,3))
                / CAST(1000 AS DECIMAL(7,3)) AS DECIMAL(7,3)) AS w
    FROM (SELECT UNNEST(generate_series(0, {N_BUCKETS - 1})) AS bucket) b
),
feats AS (
    SELECT doc_id,
           CAST((({portable_hash64_sql('word')}) % {N_BUCKETS} + {N_BUCKETS})
                % {N_BUCKETS} AS INT) AS bucket,
           COUNT(*) AS cnt
    FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
          FROM documents)
    WHERE word <> ''
    GROUP BY doc_id, bucket
)
SELECT f.doc_id,
       ROUND(CAST(SUM(f.cnt * w.w) AS DOUBLE), 6) AS logit,
       CASE WHEN SUM(f.cnt * w.w) > 0 THEN 'keep' ELSE 'drop' END AS label,
       CAST(SUM(f.cnt) AS BIGINT) AS n_tokens
FROM feats f JOIN weights w ON f.bucket = w.bucket
GROUP BY f.doc_id
ORDER BY f.doc_id
"""
