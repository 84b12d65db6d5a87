"""End-to-end training-data curation: the flagship composition query.

quality filter → exact-dedup survivors → benchmark decontamination →
stratified sampling → per-language corpus stats.  Each stage is an
already-oracle-checked operator; this pipeline proves they COMPOSE — the
thing a real 100 TB curation run actually is (one pass materializing a
kept-set, not five separate jobs).

Scale shape: every stage keys on ``doc_id``, so Catalyst plans the whole
chain as joins over one hash-partitioning of the corpus — quality/token
stats are scan-projections, dedup survivors and the sample gate are
map-side predicates, and only the decontamination semi-join (broadcast
blocklist) and the final tiny per-lang aggregate add work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table
from . import advanced as A
from . import dedup as D
from . import text as T

QUALITY_MIN = 0.55


def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept-corpus statistics per language after the full curation chain.

    FUSED single-scan formulation: the naive composition (join the five
    standalone operator outputs on doc_id) reads the corpus six times; at
    100 TB that is six passes over the dominant cost.  Here one scan
    computes every per-doc signal map-side (quality, tokens, content hash,
    sample gate), one window over ``content_hash`` picks dedup survivors,
    and contamination is a broadcast-blocklist anti-join — so the corpus
    is read twice (main pass + the tiny benchmark-subset pass that builds
    the blocklist) and shuffled once.  Results are identical to the
    composed operators; the oracle SQL is deliberately written in the
    composed form to prove it.
    """
    from pyspark.sql.window import Window

    from ..functions import portable_hash64, word_shingles

    docs = load_table(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % T._BENCH_MOD == 0
    qc = T.quality_columns()
    base = docs.select(
        "doc_id",
        "lang",
        qc["quality"].alias("quality"),
        F.size(F.split("text", r"\s+")).alias("n_ws_tokens"),
        portable_hash64("text").alias("content_hash"),
        A.sample_gate().alias("sampled"),
        is_bench.alias("is_bench"),
        # raw text rides along (shingled only AFTER the survivor filter —
        # shingling first would shuffle a ~5× payload through the window)
        "text",
    )
    w = Window.partitionBy("content_hash")
    survivors = base.withColumn("min_id", F.min("doc_id").over(w)).filter(
        (F.col("doc_id") == F.col("min_id"))
        & F.col("sampled")
        & ~F.col("is_bench")
        & (F.col("quality") >= QUALITY_MIN)
    )
    bench_grams = (
        docs.filter(is_bench)
        .select(F.explode(word_shingles("text", T._CONTAM_K)).alias("gram"))
        .distinct()
    )
    contaminated = (
        survivors.select(
            "doc_id", F.explode(word_shingles("text", T._CONTAM_K)).alias("gram")
        )
        .join(F.broadcast(bench_grams), "gram")
        .select("doc_id")
        .distinct()
    )
    kept = survivors.join(contaminated, "doc_id", "left_anti")
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_ws_tokens").alias("total_tokens"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
        )
        .orderBy("lang")
    )


CURATION_SQL = f"""
WITH samp AS (SELECT * FROM ({A.STRATIFIED_SAMPLE_SQL}) s),
surv AS (SELECT survivor_doc_id AS doc_id FROM ({D.DEDUP_EXACT_SQL}) e),
qual AS (SELECT doc_id, quality FROM ({T.QUALITY_SQL}) q),
decon AS (SELECT doc_id, contaminated FROM ({T.DECONTAMINATE_SQL}) d),
toks AS (SELECT doc_id, n_ws_tokens FROM ({T.TOKEN_STATS_SQL}) t)
SELECT samp.lang, COUNT(*) AS n_docs, SUM(toks.n_ws_tokens) AS total_tokens,
       round(AVG(qual.quality), 6) AS avg_quality
FROM samp
JOIN qual ON samp.doc_id = qual.doc_id
JOIN decon ON samp.doc_id = decon.doc_id
JOIN toks ON samp.doc_id = toks.doc_id
WHERE samp.doc_id IN (SELECT doc_id FROM surv)
  AND qual.quality >= {QUALITY_MIN} AND NOT decon.contaminated
GROUP BY samp.lang
ORDER BY samp.lang
"""
