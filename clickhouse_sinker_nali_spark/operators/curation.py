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
    """Kept-corpus statistics per language after the full curation chain."""
    sample = A.stratified_sample(spark, sf_dir)  # doc_id, lang (gate passed)
    survivors = D.dedup_exact(spark, sf_dir).select(
        F.col("survivor_doc_id").alias("doc_id")
    )
    qual = T.quality_score(spark, sf_dir).select("doc_id", "quality")
    decon = T.decontaminate(spark, sf_dir).select("doc_id", "contaminated")
    toks = T.token_stats(spark, sf_dir).select("doc_id", "n_ws_tokens")
    kept = (
        sample.join(survivors, "doc_id")
        .join(qual, "doc_id")
        .join(decon, "doc_id")
        .join(toks, "doc_id")
        .filter((F.col("quality") >= QUALITY_MIN) & ~F.col("contaminated"))
    )
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
