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

from ..functions import portable_hash64_sql
from ..session import load_table
from . import advanced as A
from . import dedup as D
from . import text as T

QUALITY_MIN = 0.55


def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept-corpus statistics per language after the full curation chain.

    FUSED formulation: the naive composition (join the five standalone
    operator outputs on doc_id) reads the corpus six times; at 100 TB
    that is six passes over the dominant cost.  Here one NARROW scan
    computes every per-doc signal map-side (quality, tokens, content
    hash, sample gate), one window over ``content_hash`` picks dedup
    survivors, and contamination is a broadcast-blocklist probe.

    The document TEXT never crosses a shuffle (r7: it previously rode
    through the dedup window's exchange, the plan's biggest byte-mover —
    ~2/3 of the query's wall at sf0.1): the window sees only the narrow
    signal columns, and the contamination probe explodes n-grams
    STRAIGHT OFF THE SCAN for every non-benchmark doc (a superset of the
    survivors — contamination is independent of survivor status, so the
    result is identical), map-side against the broadcast benchmark-gram
    set.  The contaminated id set is tiny (benchmark-overlap docs), so
    the final anti-join broadcasts.  Corpus reads: two text scans (probe
    + blocklist) and one narrow scan — scans are the cheap part; shuffled
    bytes are the narrow window columns and the gram-hit ids only.
    Results are identical to the composed operators; the oracle SQL is
    deliberately written in the composed form to prove it.
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
        docs.filter(~is_bench)
        .select(
            "doc_id", F.explode(word_shingles("text", T._CONTAM_K)).alias("gram")
        )
        .join(F.broadcast(bench_grams), "gram")
        .select("doc_id")
        .distinct()
    )
    kept = survivors.join(F.broadcast(contaminated), "doc_id", "left_anti")
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
SELECT samp.lang, COUNT(*) AS n_docs,
       CAST(SUM(toks.n_ws_tokens) AS BIGINT) AS total_tokens,
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


# --------------------------------------------------------------------------
# Sequence packing: assign documents to fixed-token-capacity training packs
# --------------------------------------------------------------------------

PACK_CAPACITY = 2048
# width of each doc_id range handled as one prefix-sum bucket; at 100 TB
# this is sized so one bucket's rows fit comfortably in an executor
# (capacity ~millions of docs per bucket), keeping the bucket-offset table
# tiny (corpus_size / bucket_width rows) and broadcastable
PACK_BUCKET_WIDTH = 64


def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack the doc stream into fixed-capacity token sequences (the LLM
    pretraining 'sequence packing' step: concatenate docs in a stable
    order, cut every PACK_CAPACITY tokens; a doc's pack is where its
    first token lands).

    Semantics = running token count over doc_id order.  A naive window
    ``sum() over (order by doc_id)`` with no partition key forces ALL rows
    through ONE task — the classic global-prefix-sum scaling wall.  This
    implementation is the distributed two-phase prefix sum instead:

    1. within-bucket cumulative sum, partitioned by ``doc_id div W``
       (parallel, one shuffle);
    2. per-bucket totals → running offset over the tiny bucket table
       (corpus/W rows — the only single-task window, microscopic);
    3. broadcast the offsets back; global cumsum = offset + within-bucket.

    Identical output to the single-window formulation (the oracle SQL *is*
    the single-window formulation), but every wide stage is parallel.
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        (F.col("doc_id") - (F.col("doc_id") % PACK_BUCKET_WIDTH)).alias("bucket"),
    )
    wb = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = toks.withColumn("cum_in_bucket", F.sum("n_tokens").over(wb))
    wo = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        toks.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("bucket_tokens"))
        .select(
            "bucket",
            F.coalesce(F.sum("bucket_tokens").over(wo), F.lit(0)).alias("bucket_offset"),
        )
    )
    return (
        within.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "n_tokens",
            F.expr(
                f"(bucket_offset + cum_in_bucket - n_tokens) DIV {PACK_CAPACITY}"
            ).alias("pack_id"),
        )
        .orderBy("doc_id")
    )


SEQUENCE_PACK_SQL = f"""
SELECT doc_id, n_tokens,
       CAST((cum - n_tokens) // {PACK_CAPACITY} AS BIGINT) AS pack_id
FROM (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM documents
)
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Document chunking with stride (context-window packing's upstream step)
# --------------------------------------------------------------------------

CHUNK_SIZE = 64  # tokens per chunk
CHUNK_STRIDE = 48  # 16-token overlap between adjacent chunks


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into fixed-size token chunks with overlap —
    the step that turns variable-length documents into trainable windows
    (stride < size preserves cross-boundary context; the final short chunk
    is kept iff it adds unseen tokens).

    Chunk count and slicing are pure per-row array algebra (split /
    sequence / slice) — scan-speed, zero shuffle, no UDF; the explode
    multiplies rows ~len/stride×, which is the intended output volume.
    Chunks are re-joined to text here for inspectability; a production
    variant keeps the token array.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), r"\s+")
    n = F.size(words)
    # number of stride starts that expose at least one NEW token
    n_chunks = F.greatest(
        F.ceil((n - F.lit(CHUNK_SIZE)) / F.lit(CHUNK_STRIDE)).cast("int") + 1,
        F.lit(1),
    )
    chunked = docs.select(
        "doc_id",
        n.alias("n_tokens"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        words.alias("w"),
    )
    start = F.col("chunk_idx") * CHUNK_STRIDE
    piece = F.slice(F.col("w"), start + 1, CHUNK_SIZE)
    return chunked.select(
        "doc_id",
        "chunk_idx",
        "n_tokens",
        F.size(piece).alias("chunk_len"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    ).orderBy("doc_id", "chunk_idx")


CHUNK_SQL = f"""
WITH base AS (
    SELECT doc_id, regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+') AS w,
           len(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+')) AS n_tokens
    FROM documents
), idx AS (
    SELECT doc_id, w, n_tokens,
           unnest(range(0, greatest(
               CAST(ceil((n_tokens - {CHUNK_SIZE}) / {CHUNK_STRIDE}.0) AS INT) + 1,
               1))) AS chunk_idx
    FROM base
)
SELECT doc_id, chunk_idx, n_tokens,
       len(w[chunk_idx * {CHUNK_STRIDE} + 1 : chunk_idx * {CHUNK_STRIDE} + {CHUNK_SIZE}])
           AS chunk_len,
       array_to_string(
           w[chunk_idx * {CHUNK_STRIDE} + 1 : chunk_idx * {CHUNK_STRIDE} + {CHUNK_SIZE}],
           ' ') AS chunk_text
FROM idx
ORDER BY doc_id, chunk_idx
"""


# --------------------------------------------------------------------------
# GDPR / right-to-be-forgotten delete cascade
# --------------------------------------------------------------------------

# synthetic deletion-request list: every 13th document
GDPR_MOD = 13


def gdpr_delete_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purge-audit for a deletion-request list across every derived store:
    raw documents, training chunks, and the embedding index (vec_id is the
    source doc_id for corpus vectors).

    A takedown in a training pipeline is not one DELETE — every derivative
    (chunks, packed sequences, indexes) must drop the lineage.  The scan
    pattern is one broadcast left-join of the (tiny) request list against
    each store plus a count aggregate; the returned audit states, per
    store, how many rows exist / must be purged / remain — the compliance
    artifact a real pipeline persists next to the rewrite.
    """
    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    requests = (
        docs.filter(F.col("doc_id") % GDPR_MOD == 0)
        .select(F.col("doc_id").alias("req_id"))
        .withColumn("_del", F.lit(1))
    )

    def audit(df: DataFrame, key: str, store: str) -> DataFrame:
        marked = df.join(
            F.broadcast(requests), F.col(key) == F.col("req_id"), "left"
        )
        return marked.agg(
            F.lit(store).alias("store"),
            F.count(F.lit(1)).alias("n_total"),
            F.coalesce(F.sum("_del"), F.lit(0)).cast("long").alias("n_purged"),
            (F.count(F.lit(1)) - F.coalesce(F.sum("_del"), F.lit(0)))
            .cast("long")
            .alias("n_retained"),
        )

    return (
        audit(docs, "doc_id", "documents")
        .unionByName(audit(chunks, "doc_id", "chunks"))
        .unionByName(audit(emb, "vec_id", "embeddings"))
        .orderBy("store")
    )


GDPR_CASCADE_SQL = f"""
WITH base AS (
    SELECT doc_id, len(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+')) AS n_tokens
    FROM documents
), idx AS (
    SELECT doc_id,
           unnest(range(0, greatest(
               CAST(ceil((n_tokens - {CHUNK_SIZE}) / {CHUNK_STRIDE}.0) AS INT) + 1,
               1))) AS chunk_idx
    FROM base
), req AS (
    SELECT doc_id AS req_id FROM documents WHERE doc_id % {GDPR_MOD} = 0
)
SELECT 'chunks' AS store,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN doc_id IN (SELECT req_id FROM req) THEN 1 ELSE 0 END) AS BIGINT) AS n_purged,
       CAST(SUM(CASE WHEN doc_id IN (SELECT req_id FROM req) THEN 0 ELSE 1 END) AS BIGINT) AS n_retained
FROM idx
UNION ALL
SELECT 'documents', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN doc_id IN (SELECT req_id FROM req) THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN doc_id IN (SELECT req_id FROM req) THEN 0 ELSE 1 END) AS BIGINT)
FROM documents
UNION ALL
SELECT 'embeddings', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN vec_id IN (SELECT req_id FROM req) THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN vec_id IN (SELECT req_id FROM req) THEN 0 ELSE 1 END) AS BIGINT)
FROM embeddings
ORDER BY store
"""


# --------------------------------------------------------------------------
# Data mixing: sample the corpus to target source/language proportions
# --------------------------------------------------------------------------

# Target language mixture for the training corpus (weights sum to 1).
MIXTURE_WEIGHTS = {"en": 0.5, "de": 0.2, "es": 0.2, "fr": 0.1}


def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture sampling: the largest corpus whose language
    proportions exactly match ``MIXTURE_WEIGHTS``.

    The binding constraint is the scarcest language relative to its
    weight: N_out = min_l floor(n_l / w_l), then each language
    contributes floor(w_l * N_out) docs — chosen as the lowest
    content-hash rows per language, so the "random" subset is stable
    under repartitioning, task retries, and engine (same hash in the
    oracle).  This is the mixing step every multi-source training recipe
    runs (weights per source/language/quality-bucket), expressed as one
    window over a per-language hash order: the corpus shuffles ONCE on
    lang, the per-lang counts ride a broadcast.

    Returns the kept rows with their language, hash rank, and the
    per-language quota that admitted them.
    """
    from pyspark.sql.window import Window

    from ..functions import portable_hash64

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("lang").isin(list(MIXTURE_WEIGHTS))
    )
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    weights = F.create_map(
        *[F.lit(x) for kv in MIXTURE_WEIGHTS.items() for x in kv]
    )
    limiting = counts.select(
        F.min(
            F.floor(F.col("n_l") / F.element_at(weights, F.col("lang")))
        ).alias("n_out")
    )
    quotas = counts.crossJoin(F.broadcast(limiting)).select(
        "lang",
        F.floor(F.element_at(weights, F.col("lang")) * F.col("n_out"))
        .cast("bigint")
        .alias("quota"),
    )
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    ranked = docs.select(
        "doc_id", "lang", portable_hash64(F.col("text")).alias("h")
    ).withColumn("hash_rank", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(quotas), "lang")
        .filter(F.col("hash_rank") <= F.col("quota"))
        .select("doc_id", "lang", "hash_rank", "quota")
        .orderBy("doc_id")
    )


_MIX_CASES = " ".join(
    f"WHEN '{lang}' THEN {w}" for lang, w in MIXTURE_WEIGHTS.items()
)
_MIX_LANGS = ", ".join(f"'{lang}'" for lang in MIXTURE_WEIGHTS)

MIXTURE_SAMPLE_SQL = f"""
WITH docs AS (
    SELECT doc_id, lang, {portable_hash64_sql('text')} AS h,
           CASE lang {_MIX_CASES} END AS w
    FROM documents WHERE lang IN ({_MIX_LANGS})
),
counts AS (SELECT lang, ANY_VALUE(w) AS w, COUNT(*) AS n_l FROM docs GROUP BY lang),
limiting AS (SELECT MIN(FLOOR(n_l / w)) AS n_out FROM counts),
quotas AS (
    SELECT lang, CAST(FLOOR(w * (SELECT n_out FROM limiting)) AS BIGINT) AS quota
    FROM counts
),
ranked AS (
    SELECT doc_id, lang, h,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS hash_rank
    FROM docs
)
SELECT r.doc_id, r.lang, r.hash_rank, q.quota
FROM ranked r JOIN quotas q USING (lang)
WHERE r.hash_rank <= q.quota
ORDER BY r.doc_id
"""


# --------------------------------------------------------------------------
# Export sharding: assign curated docs to fixed output shards, audit stats
# --------------------------------------------------------------------------

EXPORT_SHARDS = 16


def export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan the training-data export: every document assigned to one of
    N output shards by content hash, with per-shard doc/token budgets and
    a deterministic within-shard sequence number — the manifest a writer
    consumes to emit WebDataset/tfrecord-style shard files.

    Hash-on-content (not doc_id ranges) balances shards under any id
    distribution and keeps assignment stable across re-runs and
    repartitioning; the within-shard ordinal is a rank over (shard,
    hash, doc_id) so replays produce byte-identical shard layouts.  At
    100 TB: assignment is map-side, the only wide stages are the rank
    (keyed on shard — N parallel sequences) and the tiny per-shard
    aggregate.  Writers then ``repartition(N, shard)`` and stream each
    partition to its file.
    """
    from pyspark.sql.window import Window

    from ..functions import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    h = portable_hash64(F.concat(F.lit("export:"), F.col("text")))
    assigned = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        (h % EXPORT_SHARDS).cast("int").alias("shard"),
        h.alias("h"),
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    seq = assigned.withColumn("seq_in_shard", F.row_number().over(w))
    stats = assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("shard_docs"),
        F.sum("n_tokens").alias("shard_tokens"),
    )
    return (
        seq.join(F.broadcast(stats), "shard")
        .select(
            "doc_id", "shard", "seq_in_shard", "n_tokens",
            "shard_docs", "shard_tokens",
        )
        .orderBy("doc_id")
    )


_EXPORT_HASH_SQL = portable_hash64_sql("'export:' || text")

EXPORT_SHARDS_SQL = f"""
WITH assigned AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST({_EXPORT_HASH_SQL} % {EXPORT_SHARDS} AS INT) AS shard,
           {_EXPORT_HASH_SQL} AS h
    FROM documents
), seq AS (
    SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id)
                   AS INT) AS seq_in_shard
    FROM assigned
), stats AS (
    SELECT shard, COUNT(*) AS shard_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
    FROM assigned GROUP BY shard
)
SELECT seq.doc_id, seq.shard, seq.seq_in_shard, seq.n_tokens,
       stats.shard_docs, stats.shard_tokens
FROM seq JOIN stats USING (shard)
ORDER BY seq.doc_id
"""


# --------------------------------------------------------------------------
# Cross-document segment dedup with reassembly (ExactSubstr-as-transform)
# --------------------------------------------------------------------------

_SEG_W = 10  # words per segment


def segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove corpus-duplicated word segments from every document and
    reassemble the cleaned text — the *transform* counterpart of
    ``dedup.dedup_exact_substring`` (which only reports pairs).

    This is the "exact substring deduplication" treatment from
    Lee et al. 2022 (Deduplicating Training Data Makes Language Models
    Better) realized as a distributed rewrite: tile each document into
    fixed ``_SEG_W``-word segments, keep exactly ONE occurrence of every
    distinct segment corpus-wide (the first, in (doc_id, position)
    order), drop the rest, and stitch the survivors back in order.
    Fixed tiling (vs suffix arrays) is the shuffle-friendly formulation:
    one row per segment, one window per distinct segment value.

    Plan: posexplode → window ``row_number() OVER (PARTITION BY segment
    ORDER BY doc_id, seg_idx)`` → filter rank 1 → groupBy doc_id with an
    order-preserving sort_array reassembly.  Two shuffles (segment key,
    then doc_id).  At 100 TB the segment-key shuffle dominates and is the
    same cost class as any shingle join; hot boilerplate segments do NOT
    blow up (the window ranks within a key without pairing rows, unlike
    the pair-join in exact-substring detection).
    """
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_seg = F.ceil(F.size(words) / F.lit(_SEG_W)).cast("int")
    segs = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_seg - 1),
                lambda i: F.array_join(F.slice(words, i * _SEG_W + 1, _SEG_W), " "),
            )
        ).alias("seg_idx", "segment"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("segment").orderBy("doc_id", "seg_idx")
    kept = segs.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return (
        kept.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg_idx", "segment"))),
                    lambda s: s["segment"],
                ),
                " ",
            ).alias("text_clean"),
            F.count(F.lit(1)).alias("n_kept"),
        )
        .join(
            segs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_segments")),
            "doc_id",
        )
        .select(
            "doc_id",
            "text_clean",
            "n_segments",
            (F.col("n_segments") - F.col("n_kept")).alias("n_dropped"),
        )
        .orderBy("doc_id")
    )


SEGMENT_DEDUP_SQL = f"""
WITH segs AS (
    SELECT doc_id, i - 1 AS seg_idx,
           array_to_string(words[(i - 1) * {_SEG_W} + 1 : i * {_SEG_W}], ' ')
               AS segment
    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         LATERAL (SELECT UNNEST(generate_series(
             1, CAST(CEIL(len(words) / {_SEG_W}.0) AS BIGINT))) AS i)
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY segment
                                 ORDER BY doc_id, seg_idx) AS rk
    FROM segs
)
SELECT s.doc_id,
       (SELECT string_agg(r.segment, ' ' ORDER BY r.seg_idx)
        FROM ranked r
        WHERE r.doc_id = s.doc_id AND r.rk = 1) AS text_clean,
       COUNT(*) AS n_segments,
       CAST(COUNT(*) - COUNT(CASE WHEN s_rk = 1 THEN 1 END) AS BIGINT)
           AS n_dropped
FROM (SELECT doc_id, seg_idx, rk AS s_rk FROM ranked) s
GROUP BY s.doc_id
HAVING COUNT(CASE WHEN s_rk = 1 THEN 1 END) > 0
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Temperature resampling (UniMax / alpha-sampling language rebalance)
# --------------------------------------------------------------------------

_TEMP_BUDGET = 0.6  # output corpus size as a fraction of the input


def temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalanced subsample with temperature α = 0.5 — the
    UniMax/mT5 "alpha sampling" step that upweights rare languages:
    target share ∝ n_l^α instead of n_l, here realized by SUBSAMPLING
    overrepresented languages down to quota (no repetition, so every
    kept row is a distinct document).

    Unlike :func:`mixture_sample` (externally fixed weights), the
    quotas here are DERIVED from the observed distribution: one tiny
    per-lang count aggregate rides a broadcast; the corpus itself
    shuffles once on lang for the hash-ranked window, exactly the
    mixture_sample plan shape.

    Determinism discipline: α = 0.5 means ``sqrt`` — correctly rounded
    by IEEE 754 in every engine, unlike ``pow`` — and the cross-language
    normalizer Σ√n_l is summed in DECIMAL(20,10) so summation order
    (Spark partition order, DuckDB scan order) cannot perturb the last
    bit; quotas floor a 6-dp-rounded share, far from any ULP boundary.
    """
    from pyspark.sql.window import Window

    from ..functions import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    scored = counts.select(
        "lang", "n_l",
        F.sqrt(F.col("n_l").cast("double")).cast("decimal(20,10)").alias("s_l"),
    )
    norm = scored.agg(
        F.sum("s_l").cast("decimal(28,10)").alias("s_total"),
        F.sum("n_l").alias("n_total"),
    )
    quotas = scored.crossJoin(F.broadcast(norm)).select(
        "lang", "n_l",
        F.least(
            F.col("n_l"),
            F.floor(
                F.round(
                    F.floor(F.lit(_TEMP_BUDGET) * F.col("n_total")).cast("double")
                    * F.col("s_l").cast("double")
                    / F.col("s_total").cast("double"),
                    6,
                )
            ).cast("bigint"),
        ).alias("quota"),
    )
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    ranked = docs.select(
        "doc_id", "lang", portable_hash64(F.col("text")).alias("h")
    ).withColumn("hash_rank", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(quotas), "lang")
        .filter(F.col("hash_rank") <= F.col("quota"))
        .select("doc_id", "lang", "hash_rank", "quota")
        .orderBy("doc_id")
    )


TEMPERATURE_RESAMPLE_SQL = f"""
WITH counts AS (
    SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang
),
scored AS (
    SELECT lang, n_l, CAST(SQRT(CAST(n_l AS DOUBLE)) AS DECIMAL(20,10)) AS s_l
    FROM counts
),
norm AS (
    SELECT CAST(SUM(s_l) AS DECIMAL(28,10)) AS s_total,
           CAST(SUM(n_l) AS BIGINT) AS n_total
    FROM scored
),
quotas AS (
    SELECT lang, n_l,
           LEAST(n_l, CAST(FLOOR(ROUND(
               CAST(FLOOR(CAST({_TEMP_BUDGET} AS DOUBLE) * n_total) AS DOUBLE)
               * CAST(s_l AS DOUBLE) / CAST(s_total AS DOUBLE), 6))
             AS BIGINT)) AS quota
    FROM scored, norm
),
ranked AS (
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY ({{hash}}), doc_id) AS hash_rank
    FROM documents
)
SELECT r.doc_id, r.lang, CAST(r.hash_rank AS BIGINT) AS hash_rank, q.quota
FROM ranked r JOIN quotas q ON r.lang = q.lang
WHERE r.hash_rank <= q.quota
ORDER BY r.doc_id
""".replace("{hash}", portable_hash64_sql("text"))


# --------------------------------------------------------------------------
# Curriculum ordering (quality-binned interleave, no global window)
# --------------------------------------------------------------------------

_N_BINS = 10  # fixed quality deciles over the score's known [0, 1] range


def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic curriculum position for every document: quality-binned
    round-robin (bin b's r-th doc trains at step r·10 + b), so each stretch
    of the schedule sees the full quality spectrum while within-bin order
    stays stable — the data-ordering half of curriculum learning.

    A global ``row_number() over (order by quality)`` is the same
    single-task wall as naive sequence packing.  Because the quality score
    has a KNOWN range ([0,1] by construction), binning is a map-side
    ``floor(quality·10)`` — no ntile, no global sort — and the only window
    runs per-bin (10-way parallel, one shuffle on ``bin``).  The interleave
    position is then pure arithmetic on (rank_in_bin, bin).  At 100 TB:
    one corpus scan, one shuffle keyed on 10 balanced keys; skew between
    bins is bounded by the score distribution, and a finer `_N_BINS` both
    raises parallelism and smooths the curriculum.
    """
    from pyspark.sql.window import Window

    from . import text as T

    docs = load_table(spark, sf_dir, "documents")
    qc = T.quality_columns()
    binned = docs.select(
        "doc_id",
        F.least(
            F.lit(_N_BINS - 1), F.floor(qc["quality"] * _N_BINS)
        ).cast("int").alias("q_bin"),
    )
    w = Window.partitionBy("q_bin").orderBy("doc_id")
    return (
        binned.withColumn("rank_in_bin", F.row_number().over(w))
        .select(
            "doc_id",
            "q_bin",
            F.col("rank_in_bin").cast("bigint").alias("rank_in_bin"),
            ((F.col("rank_in_bin") - 1) * _N_BINS + F.col("q_bin"))
            .cast("bigint")
            .alias("curriculum_pos"),
        )
        .orderBy("doc_id")
    )


CURRICULUM_ORDER_SQL = f"""
WITH binned AS (
    SELECT doc_id,
           CAST(LEAST({_N_BINS - 1}, FLOOR(quality * {_N_BINS})) AS INTEGER)
               AS q_bin
    FROM ({{quality}}) q
),
ranked AS (
    SELECT doc_id, q_bin,
           ROW_NUMBER() OVER (PARTITION BY q_bin ORDER BY doc_id) AS rk
    FROM binned
)
SELECT doc_id, q_bin,
       CAST(rk AS BIGINT) AS rank_in_bin,
       CAST((rk - 1) * {_N_BINS} + q_bin AS BIGINT) AS curriculum_pos
FROM ranked
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Token-budget selection (per-source greedy fill under a token cap)
# --------------------------------------------------------------------------

TOKEN_BUDGET = 800  # whitespace tokens each source may contribute


def token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select the best documents from each source until that source's token
    budget is spent: rank by quality (ties → doc_id), keep every doc whose
    whole token count still fits the running budget — the mixture-building
    step that turns "dataset X gets 50 B tokens" into an actual row set.

    One scan computes quality + token count map-side; the cumulative fill
    is a window PARTITIONED BY SOURCE — thousands of independent prefix
    sums, never a global one (contrast :func:`sequence_pack`, which needs
    the two-phase trick precisely because its running sum is global).  A
    source so large its per-source window skews would hit the same
    bucket-offset decomposition, per source.  Budget semantics are
    whole-doc (a doc either fits entirely or is skipped along with the
    rest of its tail), so `cum_tokens ≤ budget` is exact, not truncating.
    """
    from pyspark.sql.window import Window

    from . import text as T

    docs = load_table(spark, sf_dir, "documents")
    qc = T.quality_columns()
    scored = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", r"\s+")).cast("bigint").alias("n_ws_tokens"),
        qc["quality"].alias("quality"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("quality").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        scored.withColumn("cum_tokens", F.sum("n_ws_tokens").over(w))
        .filter(F.col("cum_tokens") <= TOKEN_BUDGET)
        .select("doc_id", "source", "n_ws_tokens", "cum_tokens",
                F.round("quality", 6).alias("quality"))
        .orderBy("doc_id")
    )


TOKEN_BUDGET_SQL = f"""
WITH scored AS (
    SELECT t.doc_id, d.source,
           CAST(t.n_ws_tokens AS BIGINT) AS n_ws_tokens,
           q.quality
    FROM ({{tokens}}) t
    JOIN ({{quality}}) q ON t.doc_id = q.doc_id
    JOIN documents d ON t.doc_id = d.doc_id
),
filled AS (
    SELECT doc_id, source, n_ws_tokens,
           CAST(SUM(n_ws_tokens) OVER (
               PARTITION BY source
               ORDER BY quality DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_tokens,
           quality
    FROM scored
)
SELECT doc_id, source, n_ws_tokens, cum_tokens, ROUND(quality, 6) AS quality
FROM filled
WHERE cum_tokens <= {TOKEN_BUDGET}
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Epoch shuffle (deterministic, cluster-size-invariant training order)
# --------------------------------------------------------------------------

_EPOCH = 1
_N_SHUFFLE_SHARDS = 16


def epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible global shuffle for training epoch E: every doc gets a
    pseudorandom sort key ``h = hash(epoch ‖ doc_id)`` and lands in shard
    ``h mod S``; readers stream each shard ordered by ``h``.  This is how
    100 TB actually gets shuffled — a seeded hash ORDER, not an in-memory
    permutation: reshuffling for the next epoch is just E+1, any worker
    can materialize exactly its shard, and the order is independent of
    cluster size, partition count, and task retries (Spark's own
    ``orderBy(rand(seed))`` is none of these — rand() is per-partition
    seeded, so the "same" seed yields a different epoch order on a
    different cluster).

    Plan shape: pure map-side projection (hash + pmod), then the sink's
    ``repartition(S, shard)`` + within-partition sort — one shuffle whose
    keys are uniform by construction (no skew: the hash is 60-bit).  The
    oracle replays the identical hash in DuckDB, pinning engine-portable
    reproducibility — the property that makes a training run resumable
    from any step on any hardware.
    """
    from ..functions import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    h = portable_hash64(
        F.concat(F.lit(f"epoch{_EPOCH}:"), F.col("doc_id").cast("string"))
    )
    return (
        docs.select(
            "doc_id",
            h.alias("sort_key"),
            F.pmod(h, F.lit(_N_SHUFFLE_SHARDS)).cast("int").alias("shard"),
        )
        .orderBy("shard", "sort_key")
    )


EPOCH_SHUFFLE_SQL = f"""
SELECT doc_id,
       {portable_hash64_sql(f"'epoch{_EPOCH}:' || doc_id::VARCHAR")} AS sort_key,
       CAST({portable_hash64_sql(f"'epoch{_EPOCH}:' || doc_id::VARCHAR")}
            % {_N_SHUFFLE_SHARDS} AS INTEGER) AS shard
FROM documents
ORDER BY shard, sort_key
"""

CURRICULUM_ORDER_SQL = CURRICULUM_ORDER_SQL.replace("{quality}", T.QUALITY_SQL)
TOKEN_BUDGET_SQL = (
    TOKEN_BUDGET_SQL
    .replace("{tokens}", T.TOKEN_STATS_SQL)
    .replace("{quality}", T.QUALITY_SQL)
)


# --------------------------------------------------------------------------
# Full training-run materialization (budget → shuffle → pack, one pipeline)
# --------------------------------------------------------------------------


# shorter than PACK_CAPACITY: the budget gate caps each source's tokens, so
# shard streams are small — a context-window-sized capacity keeps multiple
# packs per shard at every test SF (and is the realistic unit anyway)
RUN_PACK_CAPACITY = 256


def make_training_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard summary of a complete materialized training run: the
    token-budget selection picks what trains, the epoch-shuffle hash
    decides order and shard, and fixed-capacity packing cuts each shard's
    stream into sequences — the three ops a training job actually chains,
    composed here to prove they compose in ONE plan.

    Every stage keys on doc_id or shard: selection is a per-source window
    (parallel), shard assignment is map-side hash arithmetic, and packing
    is a per-shard prefix sum (S independent windows — the global-cumsum
    wall never appears because the epoch shuffle already sharded the
    stream; this is why production runs pack per shard, not globally).
    One corpus scan feeds everything; the only shuffles are the two window
    partitionings and the final S-row aggregate.
    """
    from pyspark.sql.window import Window

    from ..functions import portable_hash64

    kept = token_budget_select(spark, sf_dir).select("doc_id", "n_ws_tokens")
    h = portable_hash64(
        F.concat(F.lit(f"epoch{_EPOCH}:"), F.col("doc_id").cast("string"))
    )
    sharded = kept.select(
        "doc_id",
        "n_ws_tokens",
        h.alias("sort_key"),
        F.pmod(h, F.lit(_N_SHUFFLE_SHARDS)).cast("int").alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("sort_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = sharded.withColumn("cum", F.sum("n_ws_tokens").over(w)).select(
        "shard",
        "n_ws_tokens",
        F.expr(f"(cum - n_ws_tokens) DIV {RUN_PACK_CAPACITY}").alias("pack_id"),
    )
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("pack_id").alias("n_packs"),
            F.sum("n_ws_tokens").cast("bigint").alias("shard_tokens"),
        )
        .orderBy("shard")
    )


MAKE_TRAINING_RUN_SQL = f"""
WITH kept AS (
    SELECT doc_id, n_ws_tokens FROM ({{budget}}) b
),
sharded AS (
    SELECT doc_id, n_ws_tokens,
           {portable_hash64_sql(f"'epoch{_EPOCH}:' || doc_id::VARCHAR")} AS sort_key,
           CAST({portable_hash64_sql(f"'epoch{_EPOCH}:' || doc_id::VARCHAR")}
                % {_N_SHUFFLE_SHARDS} AS INTEGER) AS shard
    FROM kept
),
packed AS (
    SELECT shard, n_ws_tokens,
           CAST((SUM(n_ws_tokens) OVER (
               PARTITION BY shard ORDER BY sort_key, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - n_ws_tokens) // {RUN_PACK_CAPACITY} AS BIGINT) AS pack_id
    FROM sharded
)
SELECT shard,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT pack_id) AS n_packs,
       CAST(SUM(n_ws_tokens) AS BIGINT) AS shard_tokens
FROM packed
GROUP BY shard
ORDER BY shard
"""

MAKE_TRAINING_RUN_SQL = MAKE_TRAINING_RUN_SQL.replace("{budget}", TOKEN_BUDGET_SQL)


# --------------------------------------------------------------------------
# Cluster-weighted sampling (dedup-aware training weights)
# --------------------------------------------------------------------------


def cluster_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One survivor per near-dup cluster, carrying the cluster size as its
    training weight — the dedup policy that neither over-counts (training
    on every duplicate) nor under-counts (dropping duplicates loses the
    popularity signal); upweighting the survivor by cluster size preserves
    the corpus distribution at 1/cluster-size the tokens.

    Pure composition on doc_id keys: cluster resolution (already
    banded/iterative-safe) → min-id survivor per cluster → weight = size.
    The weight column plugs into :func:`mixture_sample`-style samplers or
    loss weighting downstream.
    """
    from . import dedup as D

    clusters = D.dedup_clusters(spark, sf_dir)
    return (
        clusters.groupBy("cluster_id")
        .agg(
            F.min("doc_id").alias("survivor_doc_id"),
            F.count(F.lit(1)).alias("weight"),
        )
        .orderBy("survivor_doc_id")
    )

CLUSTER_WEIGHTED_SQL = """
WITH clusters AS ({clusters})
SELECT cluster_id,
       MIN(doc_id) AS survivor_doc_id,
       COUNT(*) AS weight
FROM clusters
GROUP BY cluster_id
ORDER BY survivor_doc_id
""".replace("{clusters}", D.DEDUP_CLUSTERS_SQL.replace("ORDER BY doc_id", ""))


# --------------------------------------------------------------------------
# Length-bucketed batching (padding-efficiency batch formation)
# --------------------------------------------------------------------------

_LB_BUCKET_W = 64   # token-length bucket width
_LB_BATCH = 16      # docs per batch


def length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch formation by length bucket: docs of similar token length
    batch together, so per-batch padding (to the batch max) wastes far
    less compute than random batching — the standard dynamic-batching
    trick, quantified here by emitting each batch's padding ratio.

    Map-side bucket assignment (length DIV width), per-bucket hash-ordered
    row_number DIV batch-size for the batch id (parallel windows keyed on
    the bucket, the curriculum/budget discipline — never a global
    sequence), then per-batch aggregates.  ``padding_ratio`` =
    1 − Σtokens/(n·max) — the number a pipeline watches to tune the
    bucket width.
    """
    from pyspark.sql.window import Window

    from ..functions import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(F.split("text", r"\s+")).cast("bigint").alias("n_tokens"),
        portable_hash64(F.concat(F.lit("lb:"), F.col("doc_id").cast("string")))
        .alias("h"),
    ).withColumn("bucket", F.expr(f"n_tokens DIV {_LB_BUCKET_W}").cast("int"))
    w = Window.partitionBy("bucket").orderBy("h", "doc_id")
    batched = toks.withColumn(
        "batch_id", ((F.row_number().over(w) - 1) / _LB_BATCH).cast("bigint")
    )
    return (
        batched.groupBy("bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .select(
            "bucket",
            "batch_id",
            "n_docs",
            "max_tokens",
            F.round(
                F.lit(1.0)
                - F.col("sum_tokens")
                / (F.col("n_docs") * F.col("max_tokens")).cast("double"),
                6,
            ).alias("padding_ratio"),
        )
        .orderBy("bucket", "batch_id")
    )


LENGTH_BUCKET_SQL = f"""
WITH toks AS (
    SELECT doc_id,
           CAST(len(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+')) AS BIGINT) AS n_tokens,
           {portable_hash64_sql("'lb:' || doc_id::VARCHAR")} AS h
    FROM documents
),
batched AS (
    SELECT doc_id, n_tokens,
           CAST(n_tokens // {_LB_BUCKET_W} AS INTEGER) AS bucket,
           CAST((ROW_NUMBER() OVER (
               PARTITION BY n_tokens // {_LB_BUCKET_W} ORDER BY h, doc_id
           ) - 1) // {_LB_BATCH} AS BIGINT) AS batch_id
    FROM toks
)
SELECT bucket, batch_id,
       COUNT(*) AS n_docs,
       CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
       ROUND(1.0 - CAST(SUM(n_tokens) AS DOUBLE)
             / CAST(COUNT(*) * MAX(n_tokens) AS DOUBLE), 6) AS padding_ratio
FROM batched
GROUP BY bucket, batch_id
ORDER BY bucket, batch_id
"""


# --------------------------------------------------------------------------
# MLM masking (BERT-style span corruption, deterministic mask selection)
# --------------------------------------------------------------------------

_MLM_RATE = 15     # percent of tokens masked
_MLM_SENTINEL = "[MASK]"


def mlm_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masked-language-model corruption: ~15 % of each doc's tokens become
    ``[MASK]`` and ride along as (position, token) labels — the actual
    pretraining example builder for encoder models, run at corpus scale.

    Mask selection is a HASH GATE on (doc_id, position), not an RNG — the
    stratified-sample discipline: reproducible row-for-row across cluster
    sizes and retries, and replayable by the SQL oracle.  Spark side is
    array-native (posexplode-free: one ``transform`` with the element
    index, ``array_join`` recompose — pure map-side, zero shuffle); the
    oracle recomposes via explode + ordered ``string_agg``, proving the
    two formulations agree.
    """
    from ..functions import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", r"\s+")
    gate = lambda pos: (  # noqa: E731
        F.pmod(
            portable_hash64(
                F.concat(
                    F.lit("mlm:"),
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    pos.cast("string"),
                )
            ),
            F.lit(100),
        )
        < _MLM_RATE
    )
    masked = F.transform(
        toks, lambda t, i: F.when(gate(i), F.lit(_MLM_SENTINEL)).otherwise(t)
    )
    labels = F.filter(
        F.transform(
            toks,
            lambda t, i: F.when(
                gate(i), F.concat(i.cast("string"), F.lit(":"), t)
            ),
        ),
        lambda x: x.isNotNull(),
    )
    return docs.select(
        "doc_id",
        F.array_join(masked, " ").alias("masked_text"),
        F.array_join(labels, ",").alias("mask_labels"),
        F.size(labels).alias("n_masked"),
        F.size(toks).alias("n_tokens"),
    ).orderBy("doc_id")


_MLM_GATE = (
    "(('0x' || substr(md5('mlm:' || doc_id::VARCHAR || ':' "
    "|| (pos - 1)::VARCHAR), 1, 15))::BIGINT % 100) < " + str(_MLM_RATE)
)

MLM_MASKING_SQL = f"""
WITH toks AS (
    SELECT doc_id,
           generate_subscripts(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+'), 1) AS pos,
           unnest(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+')) AS tok
    FROM documents
),
gated AS (
    SELECT doc_id, pos, tok, {_MLM_GATE} AS is_masked
    FROM toks
)
SELECT doc_id,
       string_agg(CASE WHEN is_masked THEN '{_MLM_SENTINEL}' ELSE tok END,
                  ' ' ORDER BY pos) AS masked_text,
       COALESCE(string_agg(CASE WHEN is_masked
                                THEN (pos - 1)::VARCHAR || ':' || tok END,
                           ',' ORDER BY pos), '') AS mask_labels,
       CAST(COUNT(CASE WHEN is_masked THEN 1 END) AS INTEGER) AS n_masked,
       CAST(COUNT(*) AS INTEGER) AS n_tokens
FROM gated
GROUP BY doc_id
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# DoReMi-lite domain reweighting (excess-score softmax over sources)
# --------------------------------------------------------------------------

_DOREMI_T = 0.5  # softmax temperature over excess scores


def doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source training-mixture weights from each domain's EXCESS
    quality signal — the DoReMi idea (domains where the proxy struggles
    get upweighted) with the unigram-LM logprob standing in for proxy
    loss: excess_s = corpus_mean_logprob − domain_mean_logprob (positive
    ⇔ harder-than-average), weights = softmax(excess/T) over sources.

    Where :func:`temperature_resample` rebalances by SIZE and
    :func:`mixture_sample` takes weights as INPUT, this DERIVES weights
    from a model signal.  Everything reduces to one per-(source) mean of
    the already-oracle-checked per-doc logprob plus a |sources|-row
    softmax (decimal-summed normalizer, the chi-square discipline —
    softmax needs exp(), whose last ULP round(6) absorbs exactly as the
    LM ops absorb ln()).
    """
    from pyspark.sql.window import Window

    from . import text as T

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    scores = T.unigram_logprob(spark, sf_dir).select("doc_id", "avg_logprob")
    per_src = (
        docs.join(scores, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                F.sum(F.col("avg_logprob").cast("decimal(38,18)"))
                / F.count(F.lit(1))
            ).cast("double").alias("mean_lp"),
        )
    )
    overall = per_src.agg(
        (
            F.sum((F.col("mean_lp") * F.col("n_docs")).cast("decimal(38,18)"))
            / F.sum("n_docs")
        ).cast("double").alias("corpus_lp")
    )
    exed = per_src.crossJoin(F.broadcast(overall)).select(
        "source", "n_docs",
        (F.col("corpus_lp") - F.col("mean_lp")).alias("excess"),
    )
    expcol = F.exp(F.col("excess") / F.lit(_DOREMI_T))
    # softmax normalizer via 1-row aggregate + broadcast cross (sources are
    # bounded, but the global window would still single-partition them and
    # trip the r8 plan gate; the decimal sum keeps the fold order-free)
    zsum = exed.agg(F.sum(expcol.cast("decimal(38,18)")).alias("_z"))
    return (
        exed.crossJoin(F.broadcast(zsum))
        .select(
            "source", "n_docs",
            F.round("excess", 6).alias("excess"),
            F.round(expcol / F.col("_z").cast("double"), 6).alias("weight"),
        )
        .orderBy("source")
    )


DOREMI_SQL = f"""
WITH scores AS ({{unigram}}),
per_src AS (
    SELECT d.source, COUNT(*) AS n_docs,
           CAST(SUM(CAST(s.avg_logprob AS DECIMAL(38,18))) / COUNT(*) AS DOUBLE)
               AS mean_lp
    FROM documents d JOIN scores s ON d.doc_id = s.doc_id
    GROUP BY d.source
),
overall AS (
    SELECT CAST(SUM(CAST(mean_lp * n_docs AS DECIMAL(38,18))) / SUM(n_docs)
                AS DOUBLE) AS corpus_lp
    FROM per_src
),
exed AS (
    SELECT source, n_docs, (o.corpus_lp - mean_lp) AS excess
    FROM per_src, overall o
)
SELECT source, n_docs,
       ROUND(excess, 6) AS excess,
       ROUND(EXP(excess / {_DOREMI_T})
             / CAST(SUM(CAST(EXP(excess / {_DOREMI_T}) AS DECIMAL(38,18)))
                    OVER () AS DOUBLE), 6) AS weight
FROM exed
ORDER BY source
"""

DOREMI_SQL = DOREMI_SQL.replace("{unigram}", T.UNIGRAM_LOGPROB_SQL)


# --------------------------------------------------------------------------
# Corpus health report (one-row dashboard over the quality families)
# --------------------------------------------------------------------------


def corpus_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE row summarizing corpus health — the number a data lead reads
    before any training run: size, duplication (exact rate + near-dup
    pair count), mean quality, language balance (entropy), benchmark
    contamination rate, token volume.  Each signal is an already-audited
    operator's aggregate; composing them into a single row proves the
    report is one job, not six notebooks.

    Every input collapses to a 1-row (or |langs|-row) aggregate before
    the final crossJoin of broadcasts — the corpus-scale work is the
    scans the underlying operators already do; entropy's Σ p·ln p runs
    over |langs| terms in decimal (order-free).
    """
    from ..functions import portable_hash64
    from . import dedup as D
    from . import text as T

    docs = load_table(spark, sf_dir, "documents")
    base = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(portable_hash64("text")).alias("n_distinct"),
    )
    qc = T.quality_columns()
    qual = docs.select(
        qc["quality"].cast("decimal(38,18)").alias("q"),
        F.size(F.split("text", r"\s+")).cast("bigint").alias("nt"),
    ).agg(
        (F.sum("q") / F.count(F.lit(1))).cast("double").alias("mean_quality"),
        F.sum("nt").alias("total_tokens"),
    )
    lang_counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    lang_tot = lang_counts.agg(F.sum("n").alias("t"))
    p = F.col("n").cast("double") / F.col("t")
    entropy = (
        lang_counts.crossJoin(F.broadcast(lang_tot))
        .select((-(p * F.log(p))).cast("decimal(38,18)").alias("term"))
        .agg(F.sum("term").cast("double").alias("lang_entropy"))
    )
    pairs = D.dedup_minhash_lsh(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("near_dup_pairs")
    )
    contam = T.decontaminate(spark, sf_dir).agg(
        F.sum(F.when(F.col("contaminated"), 1).otherwise(0))
        .cast("bigint").alias("n_contaminated"),
        F.count(F.lit(1)).alias("n_checked"),
    )
    return (
        base.crossJoin(F.broadcast(qual))
        .crossJoin(F.broadcast(entropy))
        .crossJoin(F.broadcast(pairs))
        .crossJoin(F.broadcast(contam))
        .select(
            "n_docs",
            (
                F.lit(1.0)
                - F.col("n_distinct").cast("double") / F.col("n_docs")
            ).alias("exact_dup_rate"),
            "near_dup_pairs",
            "mean_quality",
            "lang_entropy",
            "total_tokens",
            (
                F.col("n_contaminated").cast("double") / F.col("n_checked")
            ).alias("contamination_rate"),
        )
    )


CORPUS_HEALTH_SQL = f"""
WITH base AS (
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT {portable_hash64_sql('text')}) AS n_distinct
    FROM documents
),
qual AS (
    SELECT CAST(SUM(CAST(quality AS DECIMAL(38,18))) / COUNT(*) AS DOUBLE)
               AS mean_quality
    FROM ({{quality}}) q
),
toks AS (
    SELECT CAST(SUM(CAST(len(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+')) AS BIGINT))
                AS BIGINT) AS total_tokens
    FROM documents
),
lc AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
lt AS (SELECT SUM(n) AS t FROM lc),
ent AS (
    SELECT CAST(SUM(CAST(-(CAST(n AS DOUBLE) / t)
                         * LN(CAST(n AS DOUBLE) / t) AS DECIMAL(38,18)))
                AS DOUBLE) AS lang_entropy
    FROM lc, lt
),
pairs AS (SELECT COUNT(*) AS near_dup_pairs FROM ({{lsh}}) p),
contam AS (
    SELECT CAST(SUM(CASE WHEN contaminated THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated,
           COUNT(*) AS n_checked
    FROM ({{decon}}) c
)
SELECT base.n_docs,
       1.0 - CAST(base.n_distinct AS DOUBLE) / base.n_docs AS exact_dup_rate,
       pairs.near_dup_pairs,
       qual.mean_quality,
       ent.lang_entropy,
       toks.total_tokens,
       CAST(contam.n_contaminated AS DOUBLE) / contam.n_checked
           AS contamination_rate
FROM base, qual, toks, ent, pairs, contam
"""

CORPUS_HEALTH_SQL = (
    CORPUS_HEALTH_SQL
    .replace("{quality}", T.QUALITY_SQL)
    .replace("{lsh}", D.DEDUP_MINHASH_SQL.replace("ORDER BY doc_a, doc_b", ""))
    .replace("{decon}", T.DECONTAMINATE_SQL.replace("ORDER BY d.doc_id", ""))
)
