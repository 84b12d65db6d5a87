"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

All per-row column expressions (JVM-side, whole-stage-codegen'd — no UDFs),
so at 100 TB these run at parquet-scan speed and reduce to narrow outputs.
Every computed value is double/long arithmetic on deterministic inputs, so
the DuckDB oracle reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions import (
    portable_hash64,
    portable_hash64_sql,
    word_shingles,
    word_shingles_sql,
)
from ..session import load_table

# n-gram-heuristic language ID: per-language stopword marker sets.
# Deterministic argmax with a fixed precedence order (en > es > de > fr).
_MARKERS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "en", "un"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
    "fr": ["le", "les", "et", "une", "est", "dans"],
}

# BPE-ish tokenizer regex: letter runs, digit runs, single non-space symbols.
# \s is ASCII-identical in Java and RE2 EXCEPT vertical tab (Java has it,
# RE2 does not) — the explicit class means the same bytes in both engines
_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\x0b\\f\\r]"

_STOPWORDS = _MARKERS["en"]


def _words(col: str = "text"):
    return F.split(F.col(col), r"\s+")


def _hits(words, markers: list[str]):
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(words, lambda w: F.array_contains(arr, w)))


def _pred_lang() -> "F.Column":
    """Strict-precedence argmax over the per-language hit counts
    (columns ``hits_en/hits_es/hits_de/hits_fr``) — ONE definition shared
    by the document-level (:func:`lang_id`) and window-level
    (:func:`lang_segments`) identifiers, with :func:`_pred_lang_sql` as
    its byte-identical SQL twin; the pair must never drift or the two
    granularities disagree on the same evidence."""
    he, hs, hd, hf = (F.col(f"hits_{x}") for x in ("en", "es", "de", "fr"))
    return (
        F.when((he >= hs) & (he >= hd) & (he >= hf) & (he > 0), "en")
        .when((hs >= hd) & (hs >= hf) & (hs > 0), "es")
        .when((hd >= hf) & (hd > 0), "de")
        .when(hf > 0, "fr")
        .otherwise("unknown")
    )


_PRED_LANG_SQL = """CASE WHEN hits_en >= hits_es AND hits_en >= hits_de AND hits_en >= hits_fr
                 AND hits_en > 0 THEN 'en'
            WHEN hits_es >= hits_de AND hits_es >= hits_fr AND hits_es > 0 THEN 'es'
            WHEN hits_de >= hits_fr AND hits_de > 0 THEN 'de'
            WHEN hits_fr > 0 THEN 'fr'
            ELSE 'unknown' END"""


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID with strict-precedence argmax."""
    docs = load_table(spark, sf_dir, "documents")
    w = _words()
    hits = {lang: _hits(w, ms).alias(f"hits_{lang}") for lang, ms in _MARKERS.items()}
    scored = docs.select("doc_id", "lang", *hits.values())
    pred = _pred_lang()
    return scored.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("pred_lang"),
        *[F.col(f"hits_{x}") for x in ("en", "es", "de", "fr")],
    ).orderBy("doc_id")


def _hits_sql(markers: list[str]) -> str:
    inlist = ", ".join(f"'{m}'" for m in markers)
    return (
        "len(list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+'), "
        f"w -> w IN ({inlist})))"
    )


LANG_ID_SQL = f"""
WITH scored AS (
    SELECT doc_id, lang AS labeled_lang,
           {_hits_sql(_MARKERS['en'])} AS hits_en,
           {_hits_sql(_MARKERS['es'])} AS hits_es,
           {_hits_sql(_MARKERS['de'])} AS hits_de,
           {_hits_sql(_MARKERS['fr'])} AS hits_fr
    FROM documents
)
SELECT doc_id, labeled_lang,
       {_PRED_LANG_SQL} AS pred_lang,
       hits_en, hits_es, hits_de, hits_fr
FROM scored
ORDER BY doc_id
"""


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace-token and BPE-ish-regex-token counts per document."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(_words()).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_TOKEN_RE), 0)).alias("n_re_tokens"),
        F.length("text").alias("n_chars"),
    ).orderBy("doc_id")


TOKEN_STATS_SQL = f"""
SELECT doc_id,
       len(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{_TOKEN_RE}')) AS n_re_tokens,
       length(text) AS n_chars
FROM documents
ORDER BY doc_id
"""


def quality_columns(text_col: str = "text") -> dict[str, "F.Column"]:
    """The quality-score column family as reusable expressions.

    score = 0.4·min(1, n_words/64) + 0.3·stopword_ratio·4 (capped at 0.3)
          + 0.3·(1 − |mean_word_len − 4.5|/4.5, floored at 0)
    Pure double arithmetic — same IEEE ops in both engines.  Exposed so
    composition queries (curation pipeline) can fuse these into a single
    scan instead of re-reading the corpus per signal.
    """
    w = _words(text_col)
    n_words = F.size(w).cast("double")
    total_len = F.aggregate(
        F.transform(w, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    ).cast("double")
    mean_wl = total_len / n_words
    stop_ratio = _hits(w, _STOPWORDS).cast("double") / n_words
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), n_words / F.lit(64.0))
        + F.least(F.lit(0.3), F.lit(0.3) * stop_ratio * F.lit(4.0))
        + F.lit(0.3)
        * F.greatest(
            F.lit(0.0), F.lit(1.0) - F.abs(mean_wl - F.lit(4.5)) / F.lit(4.5)
        )
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_wl,
        "stopword_ratio": stop_ratio,
        "quality": score,
    }


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: length, mean word length, stopword ratio."""
    docs = load_table(spark, sf_dir, "documents")
    qc = quality_columns()
    return docs.select(
        "doc_id", *[expr.alias(name) for name, expr in qc.items()]
    ).orderBy("doc_id")


_STOP_LIST = ", ".join(f"'{m}'" for m in _STOPWORDS)

QUALITY_SQL = f"""
WITH base AS (
    SELECT doc_id,
           len(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+'))::DOUBLE AS n_words,
           list_sum(list_transform(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+'),
                                   w -> length(w)))::DOUBLE AS total_len,
           len(list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+'),
                           w -> w IN ({_STOP_LIST})))::DOUBLE AS n_stop
    FROM documents
)
SELECT doc_id, n_words,
       total_len / n_words AS mean_word_len,
       n_stop / n_words AS stopword_ratio,
       0.4 * least(1.0, n_words / 64.0)
       + least(0.3, 0.3 * (n_stop / n_words) * 4.0)
       + 0.3 * greatest(0.0, 1.0 - abs(total_len / n_words - 4.5) / 4.5)
           AS quality
FROM base
ORDER BY doc_id
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash content fingerprint over char 8-grams (stride 4).

    min-hash of the sampled k-gram hash stream (a winnowing-style content
    signature robust to small edits).  ``sequence``/``transform`` keep it
    JVM-side; per-row, order-independent.
    """
    docs = load_table(spark, sf_dir, "documents")
    grams = F.expr(
        "transform(sequence(1, greatest(1, length(text) - 7), 4), "
        "i -> substring(text, i, 8))"
    )
    hashes = F.transform(grams, lambda g: portable_hash64(g))
    return docs.select(
        "doc_id",
        F.array_min(hashes).alias("fingerprint"),
        F.size(grams).alias("n_grams"),
    ).orderBy("doc_id")


DOC_FINGERPRINT_SQL = f"""
SELECT doc_id,
       list_min(list_transform(
           list_transform(range(1, greatest(1, length(text) - 7) + 1, 4),
                          i -> substring(text, i, 8)),
           g -> {portable_hash64_sql('g')})) AS fingerprint,
       len(range(1, greatest(1, length(text) - 7) + 1, 4)) AS n_grams
FROM documents
ORDER BY doc_id
"""


# PII patterns restricted to the Java-regex ∩ RE2 common dialect (no
# backrefs, no lookaround) so Spark and the DuckDB oracle compile the SAME
# expression.  Long digit runs stand in for phone/account numbers.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_LONGNUM = r"\b\d{9,}\b"


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: replace emails / IPv4s / long digit runs with typed
    placeholder tokens, and count each class per document.

    Pure ``regexp_replace``/``regexp_extract_all`` column expressions —
    per-row, JVM-side, runs at scan speed over 100 TB with no shuffle at
    all (the orderBy here is presentation-only for the oracle compare; a
    production scrub writes the projection straight back out).
    """
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, _PII_EMAIL, "<EMAIL>"),
            _PII_IPV4,
            "<IP>",
        ),
        _PII_LONGNUM,
        "<NUM>",
    )
    # audit counts track what each stage ACTUALLY replaced: ips are counted
    # on the email-redacted text and longnums on the email+ip-redacted
    # text, so a digit run inside an already-swallowed email local-part is
    # not double-counted and the counts sum to the placeholders present in
    # redacted_text
    after_email = F.regexp_replace(t, _PII_EMAIL, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, _PII_IPV4, "<IP>")
    return docs.select(
        "doc_id",
        redacted.alias("redacted_text"),
        F.size(F.regexp_extract_all("text", F.lit(_PII_EMAIL), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(after_email, F.lit(_PII_IPV4), 0)).alias("n_ips"),
        F.size(F.regexp_extract_all(after_ip, F.lit(_PII_LONGNUM), 0)).alias(
            "n_longnums"
        ),
    ).orderBy("doc_id")


PII_REDACT_SQL = f"""
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(text,
           '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_IPV4}', '<IP>', 'g'),
           '{_PII_LONGNUM}', '<NUM>', 'g') AS redacted_text,
       len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_emails,
       len(regexp_extract_all(
           regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_IPV4}')) AS n_ips,
       len(regexp_extract_all(
           regexp_replace(regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                          '{_PII_IPV4}', '<IP>', 'g'),
           '{_PII_LONGNUM}')) AS n_longnums
FROM documents
ORDER BY doc_id
"""


VOCAB_TOP_K = 100


def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-100 words by occurrence count (tokenizer /
    BPE-seed building block).

    explode → two-level aggregate; the per-(doc, word) pre-count is NOT
    needed because ``count`` is already map-combinable — one narrow shuffle
    keyed on word carries (word, partial_count) pairs, then a tiny top-k.
    At 100 TB the word-key space is Zipfian but the partial agg absorbs the
    head: each map task emits 'the' ONCE, so the hot key receives
    n_partitions rows, not n_occurrences.

    The top-k itself is :func:`~..operators.scale.ranked_topk`
    (TakeOrderedAndProject + rank-of-survivors), NOT a global
    ``row_number()`` window — at 100 TB the vocabulary has billions of
    distinct tokens and an unpartitioned window would sort all of them on
    one executor (the r7 verdict's last scale seam).
    """
    from .scale import ranked_topk

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", r"\s+")).alias("word")
    )
    counts = words.groupBy("word").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.count_distinct("doc_id").alias("n_docs"),
    )
    return ranked_topk(
        counts, [("n_occurrences", False), ("word", True)], VOCAB_TOP_K
    ).select("rank", "word", "n_occurrences", "n_docs").orderBy("rank")


VOCAB_TOPK_SQL = f"""
SELECT rank, word, n_occurrences, n_docs
FROM (
    SELECT word, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word) AS rank
    FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+')) AS word
          FROM documents)
    GROUP BY word
)
WHERE rank <= {VOCAB_TOP_K}
ORDER BY rank
"""


def ngram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition: fraction of 3-gram occurrences that are
    duplicates (the Gopher/RefinedWeb 'repetitious text' quality signal).

    Whole computation is per-row array algebra (sequence/transform/
    array_distinct) — scan-speed, no shuffle, no UDF.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), r"\s+")
    n = F.size(words)
    grams = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(0), n - 3),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, 3)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", words)))
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return docs.select(
        "doc_id",
        total.alias("n_grams_total"),
        distinct.alias("n_grams_distinct"),
        ((total - distinct) / total.cast("double")).alias("dup_ratio"),
    ).orderBy("doc_id")


NGRAM_REPETITION_SQL = """
WITH g AS (
    SELECT doc_id,
           CASE WHEN len(w) >= 3
                THEN list_transform(range(0, len(w) - 2),
                                    i -> array_to_string(w[i + 1 : i + 3], ' '))
                ELSE [array_to_string(w, ' ')] END AS grams
    FROM (SELECT doc_id, regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+') AS w FROM documents)
)
SELECT doc_id,
       len(grams) AS n_grams_total,
       len(list_distinct(grams)) AS n_grams_distinct,
       (len(grams) - len(list_distinct(grams))) / len(grams)::DOUBLE AS dup_ratio
FROM g
ORDER BY doc_id
"""


# every 50th doc stands in for a held-out benchmark whose n-grams must not
# leak into training data
_BENCH_MOD = 50
_CONTAM_K = 5


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any 5-gram
    with the benchmark set (docs with ``doc_id % 50 == 0`` here).

    The blocklist (distinct benchmark n-grams) is small relative to the
    corpus — built once and BROADCAST, so the contamination check is a
    map-side semi-join over the exploded training n-grams: no shuffle of
    the corpus, exactly how benchmark-overlap filtering runs over 100 TB
    (the real blocklist — MMLU/GSM8K/... n-grams — is a few MB).
    """
    docs = load_table(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % _BENCH_MOD == 0
    bench_grams = (
        docs.filter(is_bench)
        .select(F.explode(word_shingles("text", _CONTAM_K)).alias("gram"))
        .distinct()
    )
    train_grams = docs.filter(~is_bench).select(
        "doc_id", F.explode(word_shingles("text", _CONTAM_K)).alias("gram")
    )
    hits = (
        train_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        docs.filter(~is_bench)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


DECONTAMINATE_SQL = f"""
WITH grams AS ({word_shingles_sql('documents', 'doc_id', 'text', _CONTAM_K)}),
bench AS (SELECT DISTINCT shingle FROM grams WHERE doc_id % {_BENCH_MOD} = 0),
hits AS (
    SELECT g.doc_id, COUNT(*) AS n_hits
    FROM grams g JOIN bench b ON g.shingle = b.shingle
    WHERE g.doc_id % {_BENCH_MOD} <> 0
    GROUP BY g.doc_id
)
SELECT d.doc_id,
       COALESCE(h.n_hits, 0) AS n_hits,
       COALESCE(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % {_BENCH_MOD} <> 0
ORDER BY d.doc_id
"""


# --------------------------------------------------------------------------
# TF-IDF: per-document top term (corpus-weighted term importance)
# --------------------------------------------------------------------------


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Highest-TF-IDF term per document (smoothed idf = ln((N+1)/(df+1))+1).

    Three aggregates over the exploded term stream, all map-side-combinable:
    per-(doc,term) tf, per-term df, and the 1-row corpus size N (joined by
    broadcast — no collect, no driver round-trip).  The per-doc argmax is a
    window over the (doc_id, term) partial — at 100 TB the explode is the
    dominant cost and everything downstream is orders of magnitude smaller.

    Rounded to 6 dp: tf/df/N are exact integers, so the only cross-engine
    wobble is the last ULP of ln(); 6 dp absorbs it.
    """
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id", F.explode(_words()).alias("term")
    ).filter(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = terms.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .join(F.broadcast(n))
        .withColumn(
            "score",
            F.col("tf")
            * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + F.lit(1.0)),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("term").alias("top_term"), F.round("score", 6).alias("tfidf"))
        .orderBy("doc_id")
    )


TFIDF_SQL = """
WITH terms AS (
    SELECT doc_id, unnest(string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+')) AS term
    FROM documents
), terms_f AS (
    SELECT doc_id, term FROM terms WHERE term <> ''
), tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM terms_f GROUP BY doc_id, term
), dfreq AS (
    SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms_f GROUP BY term
), n AS (
    SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
    SELECT tf.doc_id, tf.term,
           tf.tf * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1.0) AS score
    FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT doc_id, term AS top_term, round(score, 6) AS tfidf
FROM (
    SELECT doc_id, term, score,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, term ASC) AS rn
    FROM scored
)
WHERE rn = 1
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Token-length histogram: corpus length distribution (fixed-width buckets)
# --------------------------------------------------------------------------

_HIST_BUCKET_TOKENS = 16


def length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of document lengths in fixed 16-token buckets — the
    first diagnostic anyone runs on a new pretraining corpus.  Pure
    scan-project-aggregate; integer bucket arithmetic, exact everywhere.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", r"\s+"))
    bucket = (n_tok - (n_tok % _HIST_BUCKET_TOKENS)).alias("bucket_lo")
    return (
        docs.select(bucket)
        .groupBy("bucket_lo")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("bucket_lo")
    )


LENGTH_HISTOGRAM_SQL = f"""
SELECT bucket_lo, COUNT(*) AS n_docs
FROM (
    SELECT len(string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+'))
           - (len(string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+')) % {_HIST_BUCKET_TOKENS}) AS bucket_lo
    FROM documents
)
GROUP BY bucket_lo
ORDER BY bucket_lo
"""


# --------------------------------------------------------------------------
# PMI bigram collocations: strongly-associated word pairs
# --------------------------------------------------------------------------

_PMI_MIN_COUNT = 5
_PMI_TOP = 20


def pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top bigram collocations by pointwise mutual information
    ``ln(c12·N / (c1·c2))`` over the adjacent-pair stream (marginals taken
    over the pair table).  The phrase-mining / tokenizer-merge primer step.

    All counts are exact integers aggregated map-side; only the final ln()
    touches floats (rounded to 6 dp → cross-engine stable).  The pair
    explode is the dominant cost at scale; everything after is aggregates
    over the (much smaller) distinct-pair table, and top-k is TakeOrdered.
    """
    from pyspark.sql.window import Window  # noqa: F401 (symmetry w/ siblings)

    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), r"\s+")
    # single-token docs MUST be excluded before the sequence: with n=1,
    # sequence(0, -1) steps backward to [0, -1] and element_at(words, 0)
    # throws INVALID_INDEX_OF_ZERO, killing the whole job
    pairs = (
        docs.filter(F.size(words) >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size(words) - 2),
                    lambda i: F.struct(
                        F.element_at(words, i + 1).alias("w1"),
                        F.element_at(words, i + 2).alias("w2"),
                    ),
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    c12 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    c2 = pairs.groupBy("w2").agg(F.count(F.lit(1)).alias("c2"))
    n = pairs.agg(F.count(F.lit(1)).alias("n_pairs"))
    return (
        c12.filter(F.col("c12") >= _PMI_MIN_COUNT)
        .join(c1, "w1")
        .join(c2, "w2")
        .join(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                F.log(F.col("c12") * F.col("n_pairs") / (F.col("c1") * F.col("c2"))), 6
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(_PMI_TOP)
    )


PMI_BIGRAMS_SQL = f"""
WITH toks AS (
    SELECT doc_id, generate_subscripts(ws, 1) AS pos, unnest(ws) AS w
    FROM (SELECT doc_id,
                 regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+') AS ws
          FROM documents)
), pairs AS (
    SELECT a.w AS w1, b.w AS w2
    FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
), c12 AS (
    SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY w1, w2
), c1 AS (
    SELECT w1, COUNT(*) AS c1 FROM pairs GROUP BY w1
), c2 AS (
    SELECT w2, COUNT(*) AS c2 FROM pairs GROUP BY w2
), n AS (
    SELECT COUNT(*) AS n_pairs FROM pairs
)
SELECT w1, w2, c12,
       round(ln(c12 * n_pairs / (c1 * c2 * 1.0)), 6) AS pmi
FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN n
WHERE c12 >= {_PMI_MIN_COUNT}
ORDER BY pmi DESC, w1, w2
LIMIT {_PMI_TOP}
"""


# --------------------------------------------------------------------------
# Inverted index: term -> document-frequency + capped posting list
# --------------------------------------------------------------------------

_INVIDX_TOP_TERMS = 100
_INVIDX_POSTING_CAP = 10


def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the corpus inverted index: for the top terms by document
    frequency, the sorted (capped) posting list of containing doc_ids —
    the retrieval-side building block (BM25 / keyword search / contamination
    lookup) over a training corpus.

    Shape: explode → distinct (map-side combined on (word, doc_id)) → one
    shuffle keyed on word for the df-count + posting aggregation.  The
    posting list is capped at the aggregation (slice after sort), so hot
    terms ('the' in every doc) carry a BOUNDED array through the plan —
    at 100 TB an uncapped collect_list on a stopword would OOM an executor;
    a production index would instead bucket-partition postings by doc range,
    which is this same plan with a (word, doc_bucket) key.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select(
        F.explode(F.split("text", r"\s+")).alias("word"), "doc_id"
    ).distinct()
    agg = pairs.groupBy("word").agg(
        F.count(F.lit(1)).alias("df"),
        F.slice(F.sort_array(F.collect_list("doc_id")), 1, _INVIDX_POSTING_CAP).alias(
            "postings"
        ),
    )
    from .scale import ranked_topk

    # ranked_topk, not a global row_number window: the term space is the
    # full vocabulary — unbounded at 100 TB (r7 verdict scale seam)
    return (
        ranked_topk(agg, [("df", False), ("word", True)], _INVIDX_TOP_TERMS)
        # serialize the posting list: raw array columns are unhashable in
        # the driver's pandas-based canonicalizer (same seam as the r1
        # array-harness errors) — string-join on BOTH sides instead
        .select(
            "rank",
            "word",
            "df",
            F.array_join(F.col("postings").cast("array<string>"), ",").alias(
                "postings"
            ),
        )
        .orderBy("rank")
    )


INVERTED_INDEX_SQL = f"""
SELECT rank, word, df, array_to_string(postings, ',') AS postings
FROM (
    SELECT word, COUNT(*) AS df,
           list_slice(list_sort(array_agg(doc_id)), 1, {_INVIDX_POSTING_CAP}) AS postings,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word) AS rank
    FROM (SELECT DISTINCT unnest(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+')) AS word, doc_id
          FROM documents)
    GROUP BY word
)
WHERE rank <= {_INVIDX_TOP_TERMS}
ORDER BY rank
"""


# --------------------------------------------------------------------------
# Unigram language-model document scoring (log-likelihood quality signal)
# --------------------------------------------------------------------------


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean token log-probability under the corpus unigram
    model — the classic cheap LM quality filter (wiki-like docs score high,
    gibberish scores low) run before expensive model-based scoring.

    Self-supervised: p(w) = corpus_count(w)/total_tokens from one
    map-combined word count, then words⋈probs equi-join keyed on word and
    a per-doc average.  Hot stopword keys are fine: the probs side is ONE
    row per word, so the join is a broadcast at any realistic vocab size
    (vocab grows ~log corpus).  The corpus total folds into the plan as a
    1-row aggregate over the per-word COUNTS, broadcast-crossed back onto
    them — no separate ``words.count()`` job rescanning the largest
    intermediate, and no global window (the former
    ``sum().over(W.partitionBy())`` single-partitioned the vocab-sized
    counts — unbounded at 100 TB; r8 fix).  ln() is evaluated identically
    enough across engines that round(6) on the per-doc mean absorbs ulp
    differences.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", r"\s+")).alias("word")
    )
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.agg(F.sum("c").alias("_tot"))
    probs = counts.crossJoin(F.broadcast(tot)).select(
        "word",
        (F.col("c").cast("double") / F.col("_tot")).alias("p"),
    )
    return (
        words.join(F.broadcast(probs), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(F.log("p")), 6).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


UNIGRAM_LOGPROB_SQL = """
WITH words AS (
    SELECT doc_id, unnest(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+')) AS word
    FROM documents
), tot AS (SELECT COUNT(*)::DOUBLE AS n FROM words),
probs AS (
    SELECT word, COUNT(*)::DOUBLE / (SELECT n FROM tot) AS p
    FROM words GROUP BY word
)
SELECT doc_id, COUNT(*) AS n_tokens, ROUND(AVG(ln(p)), 6) AS avg_logprob
FROM words JOIN probs USING (word)
GROUP BY doc_id
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Gopher-style rule filter (Rae et al. 2021, "Scaling Language Models" §A.1)
# --------------------------------------------------------------------------

# Rule constants, scaled to this corpus' short synthetic docs (the
# published thresholds are 50..100k words, mean word length 3..10,
# >= 80% alphabetic words, and stop-word presence >= 2).
_GOPHER_MIN_WORDS = 8
_GOPHER_MAX_WORDS = 100_000
_GOPHER_MIN_MEAN_WLEN = 3.0
_GOPHER_MAX_MEAN_WLEN = 10.0
_GOPHER_MIN_ALPHA_RATIO = 0.8
_GOPHER_MIN_STOPWORDS = 2


def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher repetition-free quality rules as one scan+project pass:
    per-doc word count bounds, mean word length window, alphabetic-word
    ratio, and distinct-stop-word floor, each as its own boolean column
    plus the conjunction ``keep`` — the shape every rule-based curation
    stage wants (audit WHY a doc dropped, not just that it did).

    Pure column algebra over one split: no shuffle, no UDF — at 100 TB
    this runs at parquet-scan speed and the selectivity stats come from
    one ``groupBy().count()`` on the booleans if needed downstream.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(_words(), lambda w: w != "")
    n_words = F.size(words)
    mean_wlen = (
        F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
        .cast("double") / n_words
    )
    alpha_ratio = (
        F.size(F.filter(words, lambda w: w.rlike("^[A-Za-z]+$"))).cast("double")
        / n_words
    )
    n_stop_distinct = F.size(
        F.array_distinct(
            F.filter(words, lambda w: F.lower(w).isin(list(_STOPWORDS)))
        )
    )
    # ratio rules COALESCE to False on zero-word docs: 0/0 surfaces as
    # NULL in Spark but as NaN through DuckDB's pandas fetch (the one
    # hostile-unicode gate divergence, r7) — and a doc with no words
    # fails a quality rule by any reading
    rules = {
        "ok_word_count": (n_words >= _GOPHER_MIN_WORDS)
        & (n_words <= _GOPHER_MAX_WORDS),
        "ok_mean_word_len": F.coalesce(
            (mean_wlen >= _GOPHER_MIN_MEAN_WLEN)
            & (mean_wlen <= _GOPHER_MAX_MEAN_WLEN),
            F.lit(False),
        ),
        "ok_alpha_ratio": F.coalesce(
            alpha_ratio >= _GOPHER_MIN_ALPHA_RATIO, F.lit(False)
        ),
        "ok_stopwords": n_stop_distinct >= _GOPHER_MIN_STOPWORDS,
    }
    keep = rules["ok_word_count"]
    for r in list(rules.values())[1:]:
        keep = keep & r
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        n_stop_distinct.alias("n_stop_distinct"),
        *[expr.alias(name) for name, expr in rules.items()],
        keep.alias("keep"),
    ).orderBy("doc_id")


GOPHER_FILTER_SQL = f"""
WITH base AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+'), w -> w <> '') AS ws
    FROM documents
), m AS (
    -- zero-word guard is EXPLICIT (CASE, not division): DuckDB 1.0 gives
    -- NULL for 0.0/0 but >=1.1 (ieee_floating_point_ops) gives NaN, and
    -- NaN >= x is TRUE under DuckDB's total order — the COALESCE(...,
    -- FALSE) downstream only works if the 0-word ratio is NULL on every
    -- engine version (r7 ADVICE)
    SELECT doc_id,
           len(ws) AS n_words,
           CASE WHEN len(ws) = 0 THEN NULL
                ELSE list_sum(list_transform(ws, w -> length(w)))::DOUBLE
                     / len(ws) END AS mean_word_len,
           CASE WHEN len(ws) = 0 THEN NULL
                ELSE len(list_filter(ws,
                         w -> regexp_full_match(w, '[A-Za-z]+')))::DOUBLE
                     / len(ws) END AS alpha_ratio,
           len(list_distinct(list_filter(ws,
               w -> lower(w) IN ({_STOP_LIST})))) AS n_stop_distinct
    FROM base
)
SELECT doc_id, n_words,
       ROUND(mean_word_len, 6) AS mean_word_len,
       ROUND(alpha_ratio, 6) AS alpha_ratio,
       n_stop_distinct,
       n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS} AS ok_word_count,
       COALESCE(mean_word_len BETWEEN {_GOPHER_MIN_MEAN_WLEN}
                AND {_GOPHER_MAX_MEAN_WLEN}, FALSE) AS ok_mean_word_len,
       COALESCE(alpha_ratio >= {_GOPHER_MIN_ALPHA_RATIO}, FALSE)
           AS ok_alpha_ratio,
       n_stop_distinct >= {_GOPHER_MIN_STOPWORDS} AS ok_stopwords,
       (n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS})
       AND COALESCE(mean_word_len BETWEEN {_GOPHER_MIN_MEAN_WLEN}
                    AND {_GOPHER_MAX_MEAN_WLEN}, FALSE)
       AND COALESCE(alpha_ratio >= {_GOPHER_MIN_ALPHA_RATIO}, FALSE)
       AND n_stop_distinct >= {_GOPHER_MIN_STOPWORDS} AS keep
FROM m
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# CCNet-style perplexity bucketing (Wenzek et al. 2020)
# --------------------------------------------------------------------------


def ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """head/middle/tail quality buckets per language from the unigram-LM
    score — CCNet's split of each language's corpus into perplexity
    tertiles, using :func:`unigram_logprob` as the cheap stand-in LM.

    ``ntile(3)`` over (lang, avg_logprob DESC): higher likelihood → head.
    The window runs per language partition — at 100 TB each language's
    scores shuffle once on the lang key; skewed languages (English) split
    fine because ntile is a single ordered pass within the partition.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    scored = unigram_logprob(spark, sf_dir).join(docs, "doc_id")
    w = W.partitionBy("lang").orderBy(
        F.col("avg_logprob").desc(), F.col("doc_id")
    )
    tile = F.ntile(3).over(w)
    return (
        scored.select(
            "doc_id",
            "lang",
            "avg_logprob",
            tile.alias("tertile"),
        )
        .withColumn(
            "bucket",
            F.element_at(
                F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
                F.col("tertile"),
            ),
        )
        .orderBy("doc_id")
    )


CCNET_BUCKETS_SQL = f"""
WITH scores AS ({UNIGRAM_LOGPROB_SQL.replace("ORDER BY doc_id", "")}),
t AS (
    SELECT s.doc_id, d.lang, s.avg_logprob,
           NTILE(3) OVER (PARTITION BY d.lang
                          ORDER BY s.avg_logprob DESC, s.doc_id) AS tertile
    FROM scores s JOIN documents d USING (doc_id)
)
SELECT doc_id, lang, avg_logprob, tertile,
       CASE tertile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                    ELSE 'tail' END AS bucket
FROM t
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# DSIR-style importance weighting (Xie et al. 2023, data selection via
# importance resampling) — unigram-LM likelihood-ratio scoring
# --------------------------------------------------------------------------

_DSIR_TARGET_LANG = "en"  # the target-domain subset the sampler upweights


def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document importance score for resampling the raw corpus toward
    a target domain: avg_w ln(p_target(w) / p_raw(w)) under add-one-
    smoothed unigram LMs (the hashed-ngram variant of DSIR reduces to
    exactly this with unigram features).

    Docs that look like the target domain (here: the ``en`` subset) score
    high; a downstream sampler keeps documents with probability ∝
    exp(score).  Both LMs come from ONE word-count pass each (the target
    side is a filtered aggregate of the same exploded relation, so the
    corpus explodes once); the ratio join broadcasts the vocab-sized
    table.  Add-one smoothing keeps every ratio finite so the score is a
    total function — and integer counts + round(6) make it engine-exact.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split("text", r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    counts = words.groupBy("word").agg(
        F.count(F.lit(1)).alias("c_raw"),
        F.sum(
            F.when(F.col("lang") == _DSIR_TARGET_LANG, 1).otherwise(0)
        ).alias("c_tgt"),
    )
    # totals + vocab size fold in as a 1-row aggregate broadcast-crossed
    # back onto the vocab-sized counts relation (same single-scan trick as
    # unigram_logprob; a global window here would single-partition the
    # vocabulary — unbounded at 100 TB; r8 fix)
    tots = counts.agg(
        F.sum("c_tgt").alias("_t_tgt"),
        F.sum("c_raw").alias("_t_raw"),
        F.count(F.lit(1)).alias("_v"),
    )
    probs = counts.crossJoin(F.broadcast(tots)).select(
        "word",
        (
            (F.col("c_tgt") + 1).cast("double")
            / (F.col("_t_tgt") + F.col("_v"))
        ).alias("p_tgt"),
        (
            (F.col("c_raw") + 1).cast("double")
            / (F.col("_t_raw") + F.col("_v"))
        ).alias("p_raw"),
    )
    # AVG folds doubles in partition order, which differs between engines
    # (and between runs) — a 1-ULP sum difference flips round(6) when a
    # doc's true mean sits on a rounding boundary (seen at sf0.1).  Fold
    # each doc's log-ratios in SORTED order instead: array_sort +
    # index-order aggregate is the same fold in both engines, bit-exact.
    log_ratio = F.log(F.col("p_tgt") / F.col("p_raw"))
    return (
        words.join(F.broadcast(probs), "word")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # + 0.0 normalizes IEEE -0.0 to +0.0: one engine rounding a tiny
            # negative mean to -0.0 and the other to 0.0 renders differently
            # through the comparator (seen at sf0.1)
            (
                F.round(
                    F.aggregate(
                        F.array_sort(F.collect_list(log_ratio)),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    / F.count(F.lit(1)),
                    6,
                )
                + F.lit(0.0)
            ).alias("importance"),
        )
        .orderBy("doc_id")
    )


DSIR_IMPORTANCE_SQL = f"""
WITH words AS (
    SELECT doc_id, lang,
           unnest(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+')) AS word
    FROM documents
), w AS (SELECT * FROM words WHERE word <> ''),
counts AS (
    SELECT word, COUNT(*) AS c_raw,
           SUM(CASE WHEN lang = '{_DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS c_tgt
    FROM w GROUP BY word
),
tot AS (SELECT SUM(c_raw) AS t_raw, SUM(c_tgt) AS t_tgt, COUNT(*) AS v FROM counts),
probs AS (
    SELECT word,
           (c_tgt + 1)::DOUBLE / ((SELECT t_tgt FROM tot) + (SELECT v FROM tot)) AS p_tgt,
           (c_raw + 1)::DOUBLE / ((SELECT t_raw FROM tot) + (SELECT v FROM tot)) AS p_raw
    FROM counts
)
SELECT w.doc_id, w.lang, COUNT(*) AS n_tokens,
       ROUND(list_sum(list_sort(list(ln(p.p_tgt / p.p_raw)))) / COUNT(*), 6)
           + 0.0 AS importance
FROM w JOIN probs p USING (word)
GROUP BY w.doc_id, w.lang
ORDER BY w.doc_id
"""


# --------------------------------------------------------------------------
# BM25 retrieval: score the corpus for a fixed keyword query, top-k docs
# --------------------------------------------------------------------------

BM25_TERMS = ("spark", "hash", "merge")  # fixed query, in scoring order
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 20


def bm25_topk(
    spark: SparkSession, sf_dir: str, terms: tuple[str, ...] = BM25_TERMS
) -> DataFrame:
    """Okapi BM25 (Lucene idf variant) top-k documents for a keyword
    query (``terms``, default the oracle's fixed query) — the retrieval
    scorer a curation pipeline runs for contamination lookup / quality
    probes over the corpus index.

    Shape: tokenize → filter to the query terms BEFORE any shuffle (the
    selective predicate prunes ~all tokens map-side), one groupBy for the
    per-(doc, term) tf, a tiny per-term df aggregate broadcast back, and a
    per-doc ordered sum of per-term scores.  At 100 TB the only wide
    stage carries |docs_containing_query_terms| rows, never the corpus.

    Numeric determinism across engines: tf/df/dl are integer aggregates
    (order-free); each per-term score is computed from those scalars with
    one expression; the final doc score adds the (≤3) per-term scores in
    FIXED term order via conditional-aggregated columns, not a float
    SUM() whose fold order an engine may choose.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", r"\s+")).alias("word")
    ).filter(F.col("word").isin(*terms))
    dl = docs.select(
        "doc_id", F.size(F.split("text", r"\s+")).cast("long").alias("dl")
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", r"\s+")).cast("long")).alias("total_tokens"),
    )
    tf = toks.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    # dl is CORPUS-sized (one row per document) — never broadcast it; the
    # small side is tf (only docs containing the <=3 query terms), so that
    # side ships and dl stays a shuffle/stream side.  df_t/stats are tiny.
    scored = (
        F.broadcast(tf.join(F.broadcast(df_t), "word"))
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("total_tokens").cast("double") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / avgdl)
    term_score = idf * F.col("tf") / denom
    per_term = scored.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("word") == t, term_score)).alias(f"s_{i}")
            for i, t in enumerate(terms)
        ]
    )
    total = None
    for i in range(len(terms)):  # fixed-order addition
        part = F.coalesce(F.col(f"s_{i}"), F.lit(0.0))
        total = part if total is None else total + part
    from .scale import ranked_topk

    # ranked_topk, not a global row_number window: every doc containing a
    # query term is a candidate — a stopword-ish term would drag most of
    # the corpus into a single-partition sort (r7 verdict scale seam)
    return ranked_topk(
        per_term.select("doc_id", F.round(total, 6).alias("bm25")),
        [("bm25", False), ("doc_id", True)],
        BM25_TOP,
    ).select("rank", "doc_id", "bm25").orderBy("rank")


def bm25_sql(terms: tuple[str, ...] = BM25_TERMS) -> str:
    """DuckDB twin of :func:`bm25_topk` for the same ``terms`` — the SQL
    is built per term set so a parameterized call has a matching oracle."""
    terms_sql = ", ".join(f"'{t}'" for t in terms)
    per_doc = " + ".join(
        f"COALESCE(SUM(CASE WHEN word = '{t}' THEN term_score END), 0.0)"
        for t in terms
    )
    return f"""
WITH toks AS (
    SELECT doc_id, unnest(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+')) AS word
    FROM documents
), dl AS (
    SELECT doc_id, CAST(len(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+')) AS BIGINT) AS dl
    FROM documents
), stats AS (
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(len(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+'))) AS BIGINT)
               AS total_tokens
    FROM documents
), tf AS (
    SELECT doc_id, word, COUNT(*) AS tf FROM toks
    WHERE word IN ({terms_sql}) GROUP BY doc_id, word
), df_t AS (
    SELECT word, COUNT(*) AS df FROM tf GROUP BY word
), scored AS (
    SELECT tf.doc_id, tf.word,
           ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
             * tf.tf / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                        + {BM25_B} * dl.dl / (s.total_tokens::DOUBLE / s.n_docs)))
               AS term_score
    FROM tf JOIN df_t d USING (word) JOIN dl USING (doc_id) CROSS JOIN stats s
), per_doc AS (
    SELECT doc_id, {per_doc} AS bm25
    FROM scored GROUP BY doc_id
)
SELECT rank, doc_id, bm25 FROM (
    SELECT doc_id, ROUND(bm25, 6) AS bm25,
           ROW_NUMBER() OVER (ORDER BY ROUND(bm25, 6) DESC, doc_id) AS rank
    FROM per_doc
) WHERE rank <= {BM25_TOP}
ORDER BY rank
"""


BM25_SQL = bm25_sql(BM25_TERMS)


# --------------------------------------------------------------------------
# Perplexity buckets: decile the corpus by LM score, per-bucket stats
# --------------------------------------------------------------------------

PPL_BUCKETS = 10
# coarse monotone quantization of avg_logprob for the distributed rank:
# distinct blocks ≈ score range × scale (a few hundred here), each block a
# separate window partition
PPL_BLOCK_SCALE = 64


def perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile the corpus by unigram-LM score and summarize each bucket —
    the CCNet/FineWeb-style 'perplexity bucketing' step that decides which
    quality slices of a crawl feed training (keep the head, drop or
    down-sample the tail).

    Composes :func:`unigram_logprob` (one scan + one broadcast join) with
    EXACT NTILE semantics over (avg_logprob, doc_id) — deterministic total
    order, so both engines cut identical deciles.  The NTILE is computed
    DISTRIBUTED (r7 verdict scale seam — the former global
    ``ntile().over(Window.orderBy(...))`` moved the whole corpus to one
    partition): scores are blocked by a deterministic monotone
    quantization (``floor(avg_logprob × PPL_BLOCK_SCALE)``), per-block counts are
    a bounded driver artifact (≤ score-range × scale rows) whose prefix
    sums broadcast back as block offsets, and the global rank is then
    offset + a PARTITIONED per-block row_number.  Bucket follows in
    closed form from the rank (first N%n buckets hold ⌈N/n⌉ rows — the
    standard NTILE split), so the result is bit-identical to the oracle's
    NTILE while every sort stays inside hash-partitioned blocks.  Residual
    skew: a score value that dominates the corpus concentrates its block
    (quantization is monotone, so blocks cannot be salted without breaking
    rank order); raise PPL_BLOCK_SCALE to split finer.
    """
    scored = unigram_logprob(spark, sf_dir)
    blk = F.floor(F.col("avg_logprob") * PPL_BLOCK_SCALE).cast("long")
    with_blk = scored.withColumn("_blk", blk)
    # bounded driver artifact: one count per distinct quantized score
    blk_rows = sorted(
        with_blk.groupBy("_blk").count().collect(), key=lambda r: r["_blk"]
    )
    n_total = sum(r["count"] for r in blk_rows)
    offs, acc = [], 0
    for r in blk_rows:
        offs.append((int(r["_blk"]), acc))
        acc += int(r["count"])
    off_df = spark.createDataFrame(
        offs or [(0, 0)], "_blk long, _off long"
    )
    wb = W.partitionBy("_blk").orderBy(
        F.col("avg_logprob").asc(), F.col("doc_id").asc()
    )
    ranked = with_blk.join(F.broadcast(off_df), "_blk").withColumn(
        "_r", F.row_number().over(wb) + F.col("_off") - F.lit(1)
    )
    q, rem = divmod(n_total, PPL_BUCKETS)
    if q == 0:  # fewer rows than buckets: NTILE gives row i bucket i+1
        bucket = F.col("_r") + F.lit(1)
    else:
        cut = rem * (q + 1)
        bucket = F.when(
            F.col("_r") < F.lit(cut), F.floor(F.col("_r") / F.lit(q + 1))
        ).otherwise(
            F.lit(rem) + F.floor((F.col("_r") - F.lit(cut)) / F.lit(q))
        ) + F.lit(1)
    bucketed = ranked.withColumn("bucket", bucket.cast("int"))
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.min("avg_logprob"), 6).alias("min_lp"),
            F.round(F.max("avg_logprob"), 6).alias("max_lp"),
            F.sum("n_tokens").cast("long").alias("bucket_tokens"),
        )
        .orderBy("bucket")
    )


PPL_BUCKETS_SQL = f"""
WITH scored AS ({{unigram}}),
bucketed AS (
    SELECT *, NTILE({PPL_BUCKETS}) OVER (ORDER BY avg_logprob ASC, doc_id ASC)
                  AS bucket
    FROM scored
)
SELECT bucket, COUNT(*) AS n_docs,
       ROUND(MIN(avg_logprob), 6) AS min_lp,
       ROUND(MAX(avg_logprob), 6) AS max_lp,
       CAST(SUM(n_tokens) AS BIGINT) AS bucket_tokens
FROM bucketed
GROUP BY bucket
ORDER BY bucket
"""

PPL_BUCKETS_SQL = PPL_BUCKETS_SQL.format(unigram=UNIGRAM_LOGPROB_SQL)


# ---------------------------------------------------------------------------
# Text normalization (UTF-8 sanitize + control strip + whitespace collapse)

# C0 controls, DEL, and C1 controls — the bytes a crawl dump leaks into text
# fields; tab/newline land in the \s collapse anyway but are included here so
# a single pass removes every control.
_CONTROL_RE = "[\\x00-\\x1f\\x7f\\x{0080}-\\x{009f}]"

# Unicode-aware whitespace: \s in both Java regex and RE2 is ASCII-only, so
# NBSP / ogham / en-quads / line+paragraph separators / BOM would survive an
# \s+ collapse (found by the hypothesis idempotence property).  \p{Zs} is
# the Unicode space-separator category in both engines.
_WS_RE = "[ \\t\\n\\x0b\\f\\r\\p{Zs}\\x{2028}\\x{2029}\\x{feff}]+"


def normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-text normalization: make the bytes valid UTF-8, strip control
    characters, collapse whitespace runs, trim, casefold.

    The canonical first stage of every training-data pipeline (CCNet /
    Gopher / Dolma all normalize before hashing — content hashes over
    unnormalized text under-deduplicate).  Pure JVM column expressions
    (``make_valid_utf8`` + ``regexp_replace`` + ``lower``): per-row at scan
    speed over 100 TB, no shuffle (the orderBy is presentation-only for the
    oracle compare).  Unicode NFC, which has no JVM builtin, is the separate
    opt-in :func:`nfc_normalize` pandas UDF.

    ``was_valid_utf8`` records pre-sanitize validity: parquet string columns
    are UTF-8 by spec, so it is true here, but the flag is the audit column
    a real pipeline keeps when ingesting from raw bytes.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    cleaned = F.regexp_replace(F.make_valid_utf8(t), _CONTROL_RE, " ")
    norm = F.lower(F.regexp_replace(
        F.regexp_replace(cleaned, _WS_RE, " "), "^ | $", ""))
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).alias("norm_chars"),
        (F.length(t) - F.length(norm)).alias("chars_removed"),
        F.is_valid_utf8(t).alias("was_valid_utf8"),
    ).orderBy("doc_id")


NORMALIZE_TEXT_SQL = f"""
SELECT doc_id,
       lower(regexp_replace(regexp_replace(
           regexp_replace(text, '{_CONTROL_RE}', ' ', 'g'),
           '{_WS_RE}', ' ', 'g'), '^ | $', '', 'g')) AS norm_text,
       len(lower(regexp_replace(regexp_replace(
           regexp_replace(text, '{_CONTROL_RE}', ' ', 'g'),
           '{_WS_RE}', ' ', 'g'), '^ | $', '', 'g'))) AS norm_chars,
       len(text) - len(lower(regexp_replace(regexp_replace(
           regexp_replace(text, '{_CONTROL_RE}', ' ', 'g'),
           '{_WS_RE}', ' ', 'g'), '^ | $', '', 'g'))) AS chars_removed,
       TRUE AS was_valid_utf8
FROM documents
ORDER BY doc_id
"""


def nfc_normalize(df: DataFrame, text_col: str = "text",
                  out_col: str = "nfc_text") -> DataFrame:
    """Unicode NFC composition via an Arrow-batched pandas UDF.

    The one normalization step with no JVM builtin (Spark exposes UTF8_BINARY
    collations, not NFC rewriting).  Arrow moves each batch once; the
    per-batch work is pandas ``str`` vectorized over ``unicodedata.normalize``
    — the documented slow path, kept OUT of :func:`normalize_text`'s
    oracle-checked hot pipeline and applied only where decomposed input is
    actually possible (upstream of content-hash dedup on non-ASCII corpora).
    DuckDB's ``nfc_normalize`` pins parity in tests/test_operators.py.
    """
    import unicodedata

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _apply(s):
        return s.map(
            lambda v: unicodedata.normalize("NFC", v) if v is not None else None
        )

    # explicit eval-type registration: with ``from __future__ import
    # annotations`` active, decorator type-hint inference can't resolve the
    # locally-imported ``pd`` name, so hint with the real classes directly
    _apply.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _nfc = pandas_udf(_apply, "string")

    return df.withColumn(out_col, _nfc(F.col(text_col)))


# --------------------------------------------------------------------------
# Character coverage (SentencePiece's character_coverage statistic)
# --------------------------------------------------------------------------

# SentencePiece's multilingual default is 0.9995; this corpus has a ~25-char
# synthetic alphabet whose RAREST char exceeds 0.05%, so the default would
# put every char in the alphabet — 0.98 keeps the cut exercised end-to-end
CHAR_COVERAGE = 0.98


def char_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus character-frequency table with cumulative share and the
    coverage cut — which characters a tokenizer alphabet must include to
    cover 99.95 % of all text (SentencePiece's ``character_coverage``;
    everything below the cut becomes ``<unk>``/byte-fallback).

    The heavy half (per-char counts) is explode + map-side-combined
    groupBy — one shuffle of char-cardinality keys (≤ a few thousand even
    for CJK corpora).  The cumulative share then windows over that tiny
    aggregate: the classic safe global window, ordered by (count desc,
    char) so ties are deterministic in both engines.
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(
            F.explode(F.regexp_extract_all("text", F.lit("."), 0)).alias("ch")
        )
        .groupBy("ch")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("total"))
    w = (
        Window.orderBy(F.col("n").desc(), "ch")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("cum", F.sum("n").over(w))
        .select(
            "ch",
            "n",
            F.round(F.col("cum") / F.col("total"), 6).alias("cum_share"),
            # a char is in the alphabet if the PREVIOUS cum share had not
            # yet reached the target (so the char crossing the line is in)
            (
                (F.col("cum") - F.col("n")) / F.col("total") < F.lit(CHAR_COVERAGE)
            ).alias("in_alphabet"),
        )
        .orderBy(F.col("n").desc(), "ch")
    )


CHAR_COVERAGE_SQL = f"""
WITH counts AS (
    SELECT ch, COUNT(*) AS n
    FROM (SELECT unnest(regexp_extract_all(text, '.')) AS ch FROM documents)
    GROUP BY ch
),
tot AS (SELECT SUM(n) AS total FROM counts)
SELECT ch, n,
       ROUND(SUM(n) OVER (ORDER BY n DESC, ch
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / total, 6) AS cum_share,
       ((SUM(n) OVER (ORDER BY n DESC, ch
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n)
        / total) < {CHAR_COVERAGE} AS in_alphabet
FROM counts, tot
ORDER BY n DESC, ch
"""


# --------------------------------------------------------------------------
# Bigram Kneser-Ney LM scoring (the serious cheap LM quality filter)
# --------------------------------------------------------------------------

_KN_D = 0.75  # absolute discount


def bigram_kn_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean bigram log-probability under an interpolated
    Kneser-Ney model trained on the corpus itself — one rung up from
    :func:`unigram_logprob`: KN's continuation counts score "seen in many
    CONTEXTS" over "merely frequent", the property that made it the
    standard n-gram smoother (Kneser & Ney 1995) and a far sharper
    gibberish/boilerplate discriminator than unigram frequency.

    P(w2|w1) = max(C(w1w2)−d, 0)/C(w1·) + d·N1+(w1·)/C(w1·) · N1+(·w2)/B

    All counts are exact integers from ONE bigram aggregate (map-side
    combined); the continuation normalizer B rides a vocab-sized window
    like unigram's total (no extra corpus pass).  Bigram extraction is a
    lead() window per doc — keyed on doc_id, even partitioning.  Model
    and scoring join on the bigram key; self-trained, so no OOV branch.
    Per-doc mean log p rounds at 6 dp (the unigram op's ulp discipline).
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("doc_id").orderBy("pos")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", r"\s+")).alias("pos", "w1")
    )
    bigrams = (
        toks.withColumn("w2", F.lead("w1").over(w))
        .filter(F.col("w2").isNotNull())
        .select("doc_id", "w1", "w2")
    )
    bc = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    cw1 = bc.groupBy("w1").agg(
        F.sum("c").alias("cw1"), F.count(F.lit(1)).alias("n1f")
    )
    cont = bc.groupBy("w2").agg(F.count(F.lit(1)).alias("cont"))
    # continuation-mass total via 1-row aggregate + broadcast cross, not a
    # global window over the vocab-sized continuation counts (r8 fix)
    b_tot = cont.agg(F.sum("cont").alias("b"))
    cont_b = cont.crossJoin(F.broadcast(b_tot)).select("w2", "cont", "b")
    d = F.lit(_KN_D)
    p_kn = (
        F.greatest(F.col("c") - d, F.lit(0.0)) / F.col("cw1")
        + (d * F.col("n1f") / F.col("cw1")) * (F.col("cont") / F.col("b"))
    )
    model = (
        bc.join(cw1, "w1")
        .join(cont_b, "w2")
        .select("w1", "w2", p_kn.alias("p"))
    )
    return (
        bigrams.join(model, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(F.log("p")), 6).alias("avg_kn_logprob"),
        )
        .orderBy("doc_id")
    )


BIGRAM_KN_SQL = f"""
WITH toks AS (
    SELECT doc_id,
           generate_subscripts(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+'), 1) AS pos,
           unnest(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+')) AS w1
    FROM documents
),
bigrams AS (
    SELECT doc_id, w1, w2 FROM (
        SELECT doc_id, w1,
               LEAD(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM toks
    ) WHERE w2 IS NOT NULL
),
bc AS (SELECT w1, w2, COUNT(*) AS c FROM bigrams GROUP BY w1, w2),
cw1 AS (SELECT w1, SUM(c) AS cw1, COUNT(*) AS n1f FROM bc GROUP BY w1),
cont AS (SELECT w2, COUNT(*) AS cont FROM bc GROUP BY w2),
cont_b AS (SELECT w2, cont, SUM(cont) OVER () AS b FROM cont),
model AS (
    SELECT bc.w1, bc.w2,
           GREATEST(bc.c - {_KN_D}, 0.0) / cw1.cw1
           + ({_KN_D} * cw1.n1f / cw1.cw1) * (cont_b.cont / cont_b.b) AS p
    FROM bc JOIN cw1 ON bc.w1 = cw1.w1 JOIN cont_b ON bc.w2 = cont_b.w2
)
SELECT b.doc_id,
       COUNT(*) AS n_bigrams,
       ROUND(AVG(LN(m.p)), 6) AS avg_kn_logprob
FROM bigrams b JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2
GROUP BY b.doc_id
ORDER BY b.doc_id
"""


# --------------------------------------------------------------------------
# Language segmentation (code-switch detection over token windows)
# --------------------------------------------------------------------------

_SEG_WIN = 16  # tokens per language-ID window


def lang_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous same-language SEGMENTS within each document — the
    code-switch detector: documents that interleave languages defeat
    doc-level language ID (one label for mixed content mislabels half the
    tokens), so multilingual pipelines segment first and route each
    segment to its own cleaning/filtering stack.

    Composition of two audited patterns: the lang-ID marker argmax
    applied per 16-token WINDOW (explode → window aggregate, both
    map-side-combinable and keyed on (doc, window) — even partitioning),
    then the sessionize collapse (LAG + running boundary count,
    partitioned per doc) to merge consecutive same-language windows into
    segments.  Output is one row per segment with its language and
    window span.
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(_words()).alias("pos", "tok")
    ).select("doc_id", (F.col("pos") / _SEG_WIN).cast("int").alias("win"), "tok")
    marker_arrays = {
        lang: F.array(*[F.lit(m) for m in ms]) for lang, ms in _MARKERS.items()
    }
    hits = toks.groupBy("doc_id", "win").agg(
        *[
            F.sum(
                F.when(F.array_contains(marker_arrays[lang], F.col("tok")), 1)
                .otherwise(0)
            ).alias(f"hits_{lang}")
            for lang in ("en", "es", "de", "fr")
        ]
    )
    wins = hits.select("doc_id", "win", _pred_lang().alias("win_lang"))
    w = Window.partitionBy("doc_id").orderBy("win")
    seg = wins.withColumn(
        "is_start",
        F.when(
            F.lag("win_lang").over(w).isNull()
            | (F.lag("win_lang").over(w) != F.col("win_lang")),
            1,
        ).otherwise(0),
    ).withColumn(
        "seg_id",
        F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint"),
    )
    return (
        seg.groupBy("doc_id", "seg_id")
        .agg(
            F.min_by("win_lang", "win").alias("seg_lang"),
            F.min("win").alias("first_win"),
            F.max("win").alias("last_win"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .orderBy("doc_id", "seg_id")
    )


LANG_SEGMENTS_SQL = f"""
WITH toks AS (
    SELECT doc_id,
           CAST((generate_subscripts(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+'), 1) - 1)
                // {_SEG_WIN} AS INTEGER) AS win,
           unnest(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+')) AS tok
    FROM documents
),
hits AS (
    SELECT doc_id, win,
           SUM(CASE WHEN tok IN ({", ".join(f"'{m}'" for m in _MARKERS['en'])})
                    THEN 1 ELSE 0 END) AS hits_en,
           SUM(CASE WHEN tok IN ({", ".join(f"'{m}'" for m in _MARKERS['es'])})
                    THEN 1 ELSE 0 END) AS hits_es,
           SUM(CASE WHEN tok IN ({", ".join(f"'{m}'" for m in _MARKERS['de'])})
                    THEN 1 ELSE 0 END) AS hits_de,
           SUM(CASE WHEN tok IN ({", ".join(f"'{m}'" for m in _MARKERS['fr'])})
                    THEN 1 ELSE 0 END) AS hits_fr
    FROM toks GROUP BY doc_id, win
),
wins AS (
    SELECT doc_id, win,
           {_PRED_LANG_SQL} AS win_lang
    FROM hits
),
seg AS (
    SELECT doc_id, win, win_lang,
           CAST(SUM(CASE WHEN prev IS NULL OR prev <> win_lang THEN 1 ELSE 0 END)
                OVER (PARTITION BY doc_id ORDER BY win
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS seg_id
    FROM (
        SELECT doc_id, win, win_lang,
               LAG(win_lang) OVER (PARTITION BY doc_id ORDER BY win) AS prev
        FROM wins
    )
)
SELECT doc_id, seg_id,
       MIN_BY(win_lang, win) AS seg_lang,
       CAST(MIN(win) AS INTEGER) AS first_win,
       CAST(MAX(win) AS INTEGER) AS last_win,
       COUNT(*) AS n_windows
FROM seg
GROUP BY doc_id, seg_id
ORDER BY doc_id, seg_id
"""


# --------------------------------------------------------------------------
# Vocabulary drift (Jensen-Shannon divergence between time/corpus halves)
# --------------------------------------------------------------------------


def vocab_jsd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between the word distributions of the
    corpus's two halves (split by doc_id hash gate) — the distribution-
    drift monitor for text: run against last month's snapshot it answers
    "did the crawl change under us" with one bounded number (JSD ∈
    [0, ln 2]), where raw KL explodes on any term new to one side.

    One word-count aggregate per half from a single exploded pass
    (conditional sums, not two scans), P/Q/M in doubles with fixed
    expression order, and the two KL halves accumulated in DECIMAL(38,18)
    (the chi-square discipline — per-term ln() wobble is captured exactly
    once; cross-term order cannot move the sum).  Absent terms contribute
    their half's KL term with p·ln(2p/m) where the OTHER side is 0 —
    finite by construction.
    """
    from ..functions import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    half = (
        F.pmod(
            portable_hash64(
                F.concat(F.lit("jsd:"), F.col("doc_id").cast("string"))
            ),
            F.lit(2),
        )
    ).alias("half")
    words = docs.select(half, F.explode(_words()).alias("word")).filter(
        F.col("word") != ""
    )
    counts = words.groupBy("word").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("cb"),
    )
    totals = counts.agg(
        F.sum("ca").alias("ta"), F.sum("cb").alias("tb")
    )
    with_p = counts.crossJoin(F.broadcast(totals)).select(
        "word",
        (F.col("ca").cast("double") / F.col("ta")).alias("p"),
        (F.col("cb").cast("double") / F.col("tb")).alias("q"),
    )
    m = (F.col("p") + F.col("q")) / F.lit(2.0)
    term = (
        F.when(F.col("p") > 0, F.col("p") * F.log(F.col("p") / m)).otherwise(0.0)
        + F.when(F.col("q") > 0, F.col("q") * F.log(F.col("q") / m)).otherwise(0.0)
    )
    return with_p.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(F.when((F.col("p") > 0) & (F.col("q") == 0), 1).otherwise(0))
        .cast("bigint").alias("n_only_a"),
        F.sum(F.when((F.col("q") > 0) & (F.col("p") == 0), 1).otherwise(0))
        .cast("bigint").alias("n_only_b"),
        (
            F.sum(term.cast("decimal(38,18)")).cast("double") / F.lit(2.0)
        ).alias("jsd"),
    )


_JSD_GATE = "(('0x' || substr(md5('jsd:' || doc_id::VARCHAR), 1, 15))::BIGINT % 2)"

VOCAB_JSD_SQL = f"""
WITH words AS (
    SELECT {_JSD_GATE} AS half,
           unnest(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+')) AS word
    FROM documents
),
counts AS (
    SELECT word,
           SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS ca,
           SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS cb
    FROM words WHERE word <> '' GROUP BY word
),
totals AS (SELECT SUM(ca) AS ta, SUM(cb) AS tb FROM counts),
with_p AS (
    SELECT word,
           CAST(ca AS DOUBLE) / ta AS p,
           CAST(cb AS DOUBLE) / tb AS q
    FROM counts, totals
)
SELECT COUNT(*) AS n_terms,
       CAST(SUM(CASE WHEN p > 0 AND q = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_only_a,
       CAST(SUM(CASE WHEN q > 0 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_only_b,
       CAST(SUM(CAST(
           (CASE WHEN p > 0 THEN p * LN(p / ((p + q) / 2.0)) ELSE 0.0 END)
           + (CASE WHEN q > 0 THEN q * LN(q / ((p + q) / 2.0)) ELSE 0.0 END)
           AS DECIMAL(38,18))) AS DOUBLE) / 2.0 AS jsd
FROM with_p
"""


# --------------------------------------------------------------------------
# IR evaluation: MRR + nDCG of TF-IDF retrieval vs shingle-overlap truth
# --------------------------------------------------------------------------

_IR_K = 10          # evaluate the top-10
_IR_MAX_DF = 100    # postings df cap (the dedup_tfidf_cosine contract)


def ir_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval quality per query: MRR and nDCG@10 of a TF-IDF-cosine
    retriever, judged against an INDEPENDENT relevance signal (sharing a
    5-gram with the query document) — the evaluation loop a retrieval
    pipeline runs after every index change, at corpus scale.

    Queries = the benchmark subset (doc_id % 50 = 0, the decontamination
    split); the index unit is the 2-GRAM SHINGLE, not the word — this
    corpus's ~30-word vocabulary makes word postings degenerate (every
    word is a stopword) and 3-grams nearly unique (no candidates);
    bigrams sit in the discriminative mid-frequency band, exactly the
    phrase-indexing call real engines make when the unigram vocabulary
    is small relative to the corpus.  Candidates come
    from the df-capped postings join (never all-pairs), ranked by
    weighted cosine; relevance is the 5-gram equi-join — a longer-span
    signal than the 3-gram ranker, so the grade is not the ranker's own
    score.  DCG's 1/log2(rank+1) discounts are fixed per-rank constants;
    per-query sums run over ≤10 terms in decimal (order-free).
    """
    from pyspark.sql.window import Window

    from ..functions import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % _BENCH_MOD == 0
    terms = docs.select(
        "doc_id", is_bench.alias("is_q"),
        F.explode(word_shingles("text", 2)).alias("term"),
    )
    tf = terms.groupBy("doc_id", "is_q", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    weights = (
        tf.join(df_t.filter(F.col("df") <= _IR_MAX_DF), "term")
        .join(F.broadcast(n))
        .select(
            "doc_id", "is_q", "term",
            (
                F.col("tf")
                * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + F.lit(1.0))
            ).alias("w"),
        )
    )
    norms = weights.groupBy("doc_id").agg(
        F.sqrt(
            F.sum((F.col("w") * F.col("w")).cast("decimal(38,18)")).cast("double")
        ).alias("nrm")
    )
    q = weights.filter(F.col("is_q")).select(
        F.col("doc_id").alias("qid"), "term", F.col("w").alias("qw")
    )
    c = weights.filter(~F.col("is_q")).select(
        F.col("doc_id").alias("cid_doc"), "term", F.col("w").alias("cw")
    )
    dots = (
        q.join(c, "term")
        .groupBy("qid", "cid_doc")
        .agg(
            F.sum((F.col("qw") * F.col("cw")).cast("decimal(38,18)"))
            .cast("double").alias("dot")
        )
    )
    nq = norms.select(F.col("doc_id").alias("qid"), F.col("nrm").alias("qn"))
    nc = norms.select(F.col("doc_id").alias("cid_doc"), F.col("nrm").alias("cn"))
    ranked = (
        dots.join(nq, "qid").join(nc, "cid_doc")
        .select(
            "qid", "cid_doc",
            (F.col("dot") / (F.col("qn") * F.col("cn"))).alias("cos"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(
                    F.col("cos").desc(), F.col("cid_doc")
                )
            ),
        )
        .filter(F.col("rank") <= _IR_K)
    )
    sh = docs.select(
        "doc_id", F.explode(word_shingles("text", _CONTAM_K)).alias("g")
    )
    rel_pairs = (
        sh.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select(F.col("doc_id").alias("qid"), "g")
        .join(
            sh.filter(F.col("doc_id") % _BENCH_MOD != 0)
            .select(F.col("doc_id").alias("cid_doc"), "g"),
            "g",
        )
        .select("qid", "cid_doc")
        .distinct()
        .withColumn("rel", F.lit(1))
    )
    judged = ranked.join(rel_pairs, ["qid", "cid_doc"], "left").select(
        "qid", "rank", F.coalesce("rel", F.lit(0)).alias("rel")
    )
    discount = F.lit(1.0) / (F.log(F.col("rank") + 1.0) / F.lit(float(__import__("math").log(2.0))))
    return (
        judged.groupBy("qid")
        .agg(
            F.count(F.lit(1)).alias("n_retrieved"),
            F.sum("rel").cast("bigint").alias("n_relevant_in_topk"),
            F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("first_rel_rank"),
            F.sum(
                (F.col("rel") * discount).cast("decimal(38,18)")
            ).cast("double").alias("dcg"),
        )
        .select(
            "qid", "n_retrieved", "n_relevant_in_topk", "first_rel_rank",
            F.coalesce(
                F.lit(1.0) / F.col("first_rel_rank"), F.lit(0.0)
            ).alias("rr"),
            "dcg",
        )
        .orderBy("qid")
    )


_IR_LOG2 = __import__("math").log(2.0)

IR_EVAL_SQL = f"""
WITH tri AS ({{tri_shingles}}),
terms AS (
    SELECT doc_id, doc_id % {_BENCH_MOD} = 0 AS is_q, shingle AS term
    FROM tri
),
tf AS (SELECT doc_id, is_q, term, COUNT(*) AS tf
       FROM terms GROUP BY doc_id, is_q, term),
dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
weights AS (
    SELECT tf.doc_id, tf.is_q, tf.term,
           tf.tf * (LN(CAST(n.n_docs + 1 AS DOUBLE) / (dft.df + 1)) + 1.0) AS w
    FROM tf JOIN dft ON tf.term = dft.term CROSS JOIN n
    WHERE dft.df <= {_IR_MAX_DF}
),
norms AS (
    SELECT doc_id,
           SQRT(CAST(SUM(CAST(w * w AS DECIMAL(38,18))) AS DOUBLE)) AS nrm
    FROM weights GROUP BY doc_id
),
dots AS (
    SELECT q.doc_id AS qid, c.doc_id AS cid_doc,
           CAST(SUM(CAST(q.w * c.w AS DECIMAL(38,18))) AS DOUBLE) AS dot
    FROM weights q JOIN weights c ON q.term = c.term
    WHERE q.is_q AND NOT c.is_q
    GROUP BY q.doc_id, c.doc_id
),
ranked AS (
    SELECT qid, cid_doc, rank FROM (
        SELECT d.qid, d.cid_doc,
               ROW_NUMBER() OVER (PARTITION BY d.qid
                    ORDER BY d.dot / (nq.nrm * nc.nrm) DESC, d.cid_doc) AS rank
        FROM dots d
        JOIN norms nq ON d.qid = nq.doc_id
        JOIN norms nc ON d.cid_doc = nc.doc_id
    ) WHERE rank <= {_IR_K}
),
sh AS ({{shingles}}),
rel AS (
    SELECT DISTINCT a.doc_id AS qid, b.doc_id AS cid_doc
    FROM sh a JOIN sh b ON a.shingle = b.shingle
    WHERE a.doc_id % {_BENCH_MOD} = 0 AND b.doc_id % {_BENCH_MOD} <> 0
),
judged AS (
    SELECT r.qid, r.rank,
           CASE WHEN rel.qid IS NOT NULL THEN 1 ELSE 0 END AS rel
    FROM ranked r
    LEFT JOIN rel ON r.qid = rel.qid AND r.cid_doc = rel.cid_doc
)
SELECT qid,
       COUNT(*) AS n_retrieved,
       CAST(SUM(rel) AS BIGINT) AS n_relevant_in_topk,
       MIN(CASE WHEN rel = 1 THEN rank END) AS first_rel_rank,
       COALESCE(1.0 / MIN(CASE WHEN rel = 1 THEN rank END), 0.0) AS rr,
       CAST(SUM(CAST(rel * (1.0 / (LN(rank + 1.0) / {_IR_LOG2!r}))
                     AS DECIMAL(38,18))) AS DOUBLE) AS dcg
FROM judged
GROUP BY qid
ORDER BY qid
"""

IR_EVAL_SQL = (
    IR_EVAL_SQL
    .replace("{tri_shingles}", word_shingles_sql("documents", "doc_id", "text", 2))
    .replace("{shingles}", word_shingles_sql("documents", "doc_id", "text", _CONTAM_K))
)


# --------------------------------------------------------------------------
# C4 line-level cleaning cascade (the T5 corpus rules)
# --------------------------------------------------------------------------

_C4_MIN_LINE_WORDS = 5   # C4: "retained lines that contained at least 5 words"
_C4_MIN_KEPT_LINES = 3   # C4: "discarded pages with fewer than 3 sentences"


def c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 (T5-corpus) line-level cleaning cascade, complementing the
    doc-level ``gopher_quality_filter``: a line survives only if it ends
    in terminal punctuation, has ≥5 words, and does not mention
    "javascript"; a doc survives only if ≥3 lines survive and the page
    mentions neither "lorem ipsum" nor a curly brace (the code marker).
    Per-doc audit columns for every rule plus the conjunction ``keep`` —
    line filtering is where web-scrape curation removes most of its
    boilerplate mass, and it is pure per-row column algebra here.

    Higher-order array functions over one ``split`` — no shuffle, no
    UDF: at 100 TB this runs at parquet-scan speed like the Gopher pass.
    Reference has no curation layer (it is an ingest engine,
    input/kafka_sarama.go); this extends the repo's training-data
    pipeline family.
    """
    docs = load_table(spark, sf_dir, "documents")
    lines = F.split(F.col("text"), "\n")

    def _line_words(line):
        # canonical ASCII whitespace class (identical bytes in Java and
        # RE2); \n can't occur inside a split line, so this equals the
        # plain space/tab split while surviving stray \r / \f / \x0b
        return F.filter(
            F.split(line, "[ \\t\\n\\x0b\\f\\r]+"), lambda w: w != ""
        )

    # terminal-punctuation test via right(t, 1), not a '$'-anchored regex:
    # Java's '$' matches BEFORE a final line terminator (a trailing '\r'
    # from CRLF text would pass) where RE2/DuckDB's does not — the last
    # character test is definitional in both engines
    _TERMINAL = ('.', '!', '?', '"')

    def _line_ok(line):
        t = F.rtrim(line)
        return (
            F.right(t, F.lit(1)).isin(*_TERMINAL)
            & (F.size(_line_words(t)) >= _C4_MIN_LINE_WORDS)
            & ~F.lower(line).contains("javascript")
        )

    kept = F.filter(lines, _line_ok)
    n_lines = F.size(lines)
    n_kept = F.size(kept)
    kept_words = F.aggregate(
        kept,
        F.lit(0),
        lambda acc, line: acc + F.size(_line_words(F.rtrim(line))),
    ).cast("bigint")
    has_lorem = F.lower(F.col("text")).contains("lorem ipsum")
    has_brace = F.col("text").contains("{")
    keep = (n_kept >= _C4_MIN_KEPT_LINES) & ~has_lorem & ~has_brace
    return docs.select(
        "doc_id",
        n_lines.alias("n_lines"),
        n_kept.alias("n_kept_lines"),
        kept_words.alias("kept_words"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_brace"),
        keep.alias("keep"),
    ).orderBy("doc_id")


C4_FILTERS_SQL = f"""
WITH base AS (
    SELECT doc_id, text, lower(text) AS lt,
           string_split(text, chr(10)) AS ls
    FROM documents
), k AS (
    SELECT doc_id, len(ls) AS n_lines,
           list_filter(ls, l ->
               right(rtrim(l), 1) IN ('.', '!', '?', '"')
               AND len(list_filter(
                       regexp_split_to_array(rtrim(l), '[ \\t\\n\\x0b\\f\\r]+'),
                       w -> w <> '')) >= {_C4_MIN_LINE_WORDS}
               AND NOT contains(lower(l), 'javascript')) AS kept,
           contains(lt, 'lorem ipsum') AS has_lorem_ipsum,
           contains(text, '{{') AS has_brace
    FROM base
)
SELECT doc_id, n_lines,
       len(kept) AS n_kept_lines,
       CAST(COALESCE(list_sum(list_transform(kept, l ->
            len(list_filter(regexp_split_to_array(rtrim(l), '[ \\t\\n\\x0b\\f\\r]+'),
                            w -> w <> '')))), 0) AS BIGINT) AS kept_words,
       has_lorem_ipsum,
       has_brace,
       len(kept) >= {_C4_MIN_KEPT_LINES}
           AND NOT has_lorem_ipsum AND NOT has_brace AS keep
FROM k
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Per-source boilerplate line detection (the CCNet/RefinedWeb dedup-by-
# document-frequency rule: a line appearing in many of a domain's pages is
# chrome — cookie banners, nav menus, license footers — not content)
# --------------------------------------------------------------------------

_BOILER_MIN_DF = 2      # a line must recur in ≥2 docs to be boilerplate
_BOILER_FRAC = 0.3      # ...and in >30% of the source's documents


def boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc boilerplate audit: for every document, how many of its
    (non-empty, trimmed) lines occur in >30% of the documents of the SAME
    source — the frequency-based boilerplate rule web-corpus curation
    applies before any quality scoring (distinct from ``segment_dedup``,
    which keeps a global first occurrence; here a line is dropped from
    EVERY doc once it is domain-chrome).

    Plan shape for 100 TB: one explode, a (source, line)-keyed aggregate
    with map-side combine (the line itself never rides the shuffle twice:
    the doc-frequency join is keyed on the same (source, line)), and a
    broadcast of the tiny per-source doc counts.  Output is one row per
    document — join-safe downstream.
    """
    docs = load_table(spark, sf_dir, "documents")
    lines = (
        docs.select(
            "doc_id",
            "source",
            F.explode(F.split(F.col("text"), "\n")).alias("raw"),
        )
        .select("doc_id", "source", F.trim(F.col("raw")).alias("line"))
        .filter(F.col("line") != "")
    )
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    line_df = (
        lines.select("source", "line", "doc_id")
        .distinct()
        .groupBy("source", "line")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    boiler = (
        line_df.join(F.broadcast(per_source), "source")
        .filter(
            (F.col("df") >= _BOILER_MIN_DF)
            & (F.col("df").cast("double") / F.col("n_docs") > _BOILER_FRAC)
        )
        .select("source", "line", F.lit(True).alias("is_boiler"))
    )
    per_doc = (
        lines.join(boiler, ["source", "line"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("is_boiler"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_boiler_lines"),
            F.sum(
                F.when(F.col("is_boiler"), F.length("line")).otherwise(0)
            ).cast("bigint").alias("boiler_chars"),
        )
    )
    return (
        docs.select("doc_id", "source")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("n_lines", F.lit(0)).cast("bigint").alias("n_lines"),
            F.coalesce("n_boiler_lines", F.lit(0)).cast("bigint")
            .alias("n_boiler_lines"),
            F.coalesce("boiler_chars", F.lit(0)).cast("bigint")
            .alias("boiler_chars"),
        )
        .orderBy("doc_id")
    )


BOILERPLATE_SQL = f"""
WITH lines AS (
    SELECT doc_id, source, trim(l) AS line
    FROM documents, unnest(string_split(text, chr(10))) AS t(l)
    WHERE trim(l) <> ''
),
ns AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
ldf AS (
    SELECT source, line, COUNT(*) AS df
    FROM (SELECT DISTINCT source, line, doc_id FROM lines)
    GROUP BY source, line
),
boiler AS (
    SELECT ldf.source, ldf.line
    FROM ldf JOIN ns USING (source)
    WHERE df >= {_BOILER_MIN_DF}
      AND CAST(df AS DOUBLE) / n_docs > {_BOILER_FRAC}
),
per_doc AS (
    SELECT l.doc_id,
           COUNT(*) AS n_lines,
           CAST(SUM(CASE WHEN b.line IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_boiler_lines,
           CAST(SUM(CASE WHEN b.line IS NOT NULL THEN length(l.line)
                         ELSE 0 END) AS BIGINT) AS boiler_chars
    FROM lines l
    LEFT JOIN boiler b ON l.source = b.source AND l.line = b.line
    GROUP BY l.doc_id
)
SELECT d.doc_id, d.source,
       COALESCE(p.n_lines, 0) AS n_lines,
       COALESCE(p.n_boiler_lines, 0) AS n_boiler_lines,
       COALESCE(p.boiler_chars, 0) AS boiler_chars
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
"""


# --------------------------------------------------------------------------
# Within-document repeated-line removal (intra-doc line dedup)
# --------------------------------------------------------------------------


def intradoc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove REPEATED lines inside each document and reassemble the text
    in first-occurrence order — the within-page cleanup step web-corpus
    pipelines apply before any cross-doc treatment (C4 drops pages by
    repeated content; RefinedWeb/CCNet strip the repeats): navigation
    chrome, duplicated footers, and scraper stutter repeat INSIDE a page
    long before they repeat across pages.

    Complements the existing line family: ``boilerplate_lines`` is
    cross-doc per-source detection (a line frequent across docs),
    ``segment_dedup`` keeps one global occurrence of a word segment;
    here identity is the trimmed line and scope is a single document —
    every doc keeps its own first occurrence.

    Plan shape for 100 TB: one explode, then two doc_id-keyed aggregates
    (first-occurrence per (doc, line), then ordered reassembly) — the
    shuffle key is doc_id both times so AQE coalesces them, there is no
    global window, and no line crosses the wire more than once.  Skew is
    bounded by the largest single document, never by corpus-wide line
    frequency (the hot key that makes the CROSS-doc variants need df
    caps does not exist within one page).

    Determinism: pure string ops + integer positions; the DuckDB twin
    replays trim/split byte-for-byte (``trim`` strips ASCII spaces only
    in both engines — the boilerplate_lines convention).
    """
    docs = load_table(spark, sf_dir, "documents")
    lines = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), "\n")).alias("ord", "raw"),
        )
        .select("doc_id", "ord", F.trim(F.col("raw")).alias("line"))
        .filter(F.col("line") != "")
    )
    # per-(doc, line) first position AND occurrence count in ONE pass, so
    # the total-line statistic folds into the reassembly aggregate — one
    # scan, one explode, two chained doc_id-keyed aggregates, no join
    # (the first cut joined a separate count branch, which re-read and
    # re-exploded the corpus)
    firsts = lines.groupBy("doc_id", "line").agg(
        F.min("ord").alias("first_ord"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        firsts.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("first_ord", "line"))
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("text_dedup"),
            F.sum("cnt").alias("n_lines"),
            F.count(F.lit(1)).alias("n_kept"),
        )
        .select(
            "doc_id",
            "text_dedup",
            F.col("n_lines").cast("bigint").alias("n_lines"),
            (F.col("n_lines") - F.col("n_kept"))
            .cast("bigint")
            .alias("n_dupe_lines"),
        )
        .orderBy("doc_id")
    )


# 1-based parts[i] vs Spark's 0-based posexplode is order-only (MIN per
# line compares like for like within each engine).
INTRADOC_DEDUP_SQL = """
WITH lines AS (
    SELECT doc_id, i AS ord, trim(parts[i]) AS line
    FROM (SELECT doc_id, string_split(text, chr(10)) AS parts
          FROM documents),
         LATERAL (SELECT UNNEST(generate_series(1, len(parts))) AS i)
    WHERE trim(parts[i]) <> ''
),
firsts AS (
    SELECT doc_id, line, MIN(ord) AS first_ord, COUNT(*) AS cnt
    FROM lines GROUP BY doc_id, line
)
SELECT doc_id,
       string_agg(line, chr(10) ORDER BY first_ord) AS text_dedup,
       CAST(SUM(cnt) AS BIGINT) AS n_lines,
       CAST(SUM(cnt) - COUNT(*) AS BIGINT) AS n_dupe_lines
FROM firsts GROUP BY doc_id
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 and dense ANN rankings
# --------------------------------------------------------------------------

RRF_K = 60        # the standard fusion constant (Cormack et al.)
RRF_DEPTH = 20    # per-list depth; fused output is <= 2*RRF_DEPTH rows
RRF_QUERY_VEC = 0  # the ANN side's query vector (one of the N_QUERIES)


def hybrid_retrieval_rrf(
    spark: SparkSession, sf_dir: str, terms: tuple[str, ...] = BM25_TERMS
) -> DataFrame:
    """Reciprocal-rank fusion of the lexical (BM25) and dense (cosine ANN)
    rankings — the standard hybrid-retrieval combiner (score =
    Σ 1/(k + rank) over the lists a doc appears in, k = 60): sparse and
    dense retrievers fail differently, and RRF needs no score
    calibration between them, only ranks.  Documents and their embedding
    rows share the id space (vec_id == doc_id in the corpus convention).

    Composition, not reimplementation: the BM25 list IS
    :func:`bm25_topk` (same ``terms``), the dense list is the exact
    cosine ranking of the corpus against one query vector.  Both lists
    arrive as ≤ ``RRF_DEPTH`` rows via ``ranked_topk`` (TakeOrdered — no
    unpartitioned window anywhere), so the fusion join touches ≤ 2·depth
    rows regardless of corpus size; at 100 TB the cost is the two
    retrievals, and the ANN side would swap in any indexed form
    (``ann_ivf_*``) with the same fused contract.

    Absent-from-list ranks are emitted as 0 (not NULL): both engines
    then hash integer columns, and 0 is unambiguous (real ranks are
    1-based).
    """
    from ..functions import cosine
    from .scale import ranked_topk
    from .similarity import N_QUERIES

    bm25 = bm25_topk(spark, sf_dir, terms).select(
        F.col("rank").alias("bm25_rank"), "doc_id"
    )
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == RRF_QUERY_VEC).select(
        F.col("embedding").alias("qe")
    )
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("ce")
    )
    scored = corpus.join(F.broadcast(q)).select(
        "doc_id", cosine("qe", "ce").alias("cos_sim")
    )
    ann = ranked_topk(
        scored, [("cos_sim", False), ("doc_id", True)], RRF_DEPTH,
        rank_name="ann_rank",
    ).select("ann_rank", "doc_id")
    fused = bm25.join(ann, "doc_id", "full")
    # fixed addition order (bm25 term first) — bit-reproducible across
    # engines; each term is 1/(60+rank), an exact-integer division
    rrf = F.round(
        F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("bm25_rank")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("ann_rank")), F.lit(0.0)),
        6,
    )
    return ranked_topk(
        fused.select(
            "doc_id",
            rrf.alias("rrf_score"),
            F.coalesce("bm25_rank", F.lit(0)).cast("bigint").alias("bm25_rank"),
            F.coalesce("ann_rank", F.lit(0)).cast("bigint").alias("ann_rank"),
        ),
        [("rrf_score", False), ("doc_id", True)],
        2 * RRF_DEPTH,
    ).select("rank", "doc_id", "rrf_score", "bm25_rank", "ann_rank")


def hybrid_rrf_sql(terms: tuple[str, ...] = BM25_TERMS) -> str:
    """DuckDB twin of :func:`hybrid_retrieval_rrf` for the same terms."""
    from .similarity import N_QUERIES

    cos = (
        "(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])"
        " / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))"
        " * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))))"
    )
    return f"""
WITH bm25 AS ({bm25_sql(terms)}),
ann AS (
    SELECT rank AS ann_rank, doc_id FROM (
        SELECT c.vec_id AS doc_id,
               ROW_NUMBER() OVER (ORDER BY {cos} DESC, c.vec_id) AS rank
        FROM embeddings q, embeddings c
        WHERE q.vec_id = {RRF_QUERY_VEC} AND c.vec_id >= {N_QUERIES}
    ) WHERE rank <= {RRF_DEPTH}
),
fused AS (
    SELECT COALESCE(b.doc_id, a.doc_id) AS doc_id,
           b.rank AS bm25_rank, a.ann_rank,
           ROUND(COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + b.rank), 0.0)
               + COALESCE(CAST(1 AS DOUBLE) / ({RRF_K} + a.ann_rank), 0.0),
               6) AS rrf_score
    FROM bm25 b FULL JOIN ann a ON b.doc_id = a.doc_id
)
SELECT ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS rank,
       doc_id, rrf_score,
       COALESCE(bm25_rank, 0) AS bm25_rank,
       COALESCE(ann_rank, 0) AS ann_rank
FROM fused
ORDER BY rank
"""


HYBRID_RRF_SQL = hybrid_rrf_sql(BM25_TERMS)


# --------------------------------------------------------------------------
# Topic clusters: c-TF-IDF labels for the embedding-space clusters
# --------------------------------------------------------------------------

TOPIC_TERMS = 5  # label terms per cluster


def topic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label every embedding-space cluster with its most DISTINCTIVE
    terms — the corpus-exploration readout (BERTopic's c-TF-IDF): assign
    each document's vector to an IVF cell (documents and embeddings
    share the id space), pool each cluster's text into one pseudo-doc,
    and score terms by tf × (ln((K+1)/(cluster_df+1)) + 1) where
    cluster_df counts CLUSTERS containing the term — high for terms
    frequent in this cluster and rare across the others.  The top
    :data:`TOPIC_TERMS` per cluster are its label.

    Reuses the engine's own machinery end to end: the Arrow cell
    assigner (broadcast centroids, one matmul per batch — the
    ``ann_ivf_arrow``/``dedup_embedding_cosine_cells`` path) and the
    tf-idf aggregate shape of :func:`tfidf_top_terms` with cluster in
    place of document.

    Scale: the explode dominates exactly as in ``tfidf_top_terms``; all
    aggregates are map-side-combinable on (cluster, term) / term keys;
    the rank window is PARTITIONED by cluster (cells grow with N, each
    stays ~128 docs, so no partition outgrows its executor).  Clusters
    whose documents contain no words do not appear (no label exists).
    """
    from .similarity import _centroids, assign_cells_arrow

    emb = load_table(spark, sf_dir, "embeddings")
    cents = _centroids(emb)
    assigned = assign_cells_arrow(
        emb.select("vec_id", "embedding"), cents,
        id_col="vec_id", emb_out="embedding",
    ).select(
        F.col("vec_id").alias("doc_id"),
        F.col("cid").cast("bigint").alias("cluster"),
    )
    docs = load_table(spark, sf_dir, "documents")
    dc = docs.join(assigned, "doc_id")
    terms = dc.select(
        "cluster", F.explode(_words()).alias("term")
    ).filter(F.col("term") != "")
    tf = terms.groupBy("cluster", "term").agg(F.count(F.lit(1)).alias("tf"))
    # one tf row per (cluster, term) -> COUNT(*) per term IS the number
    # of clusters containing it (no second distinct pass)
    cdf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("cdf"))
    k = dc.agg(F.count_distinct("cluster").alias("n_clusters"))
    sizes = dc.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(cdf, "term")
        .join(F.broadcast(k))
        .withColumn(
            "score",
            F.col("tf")
            * (F.log((F.col("n_clusters") + 1) / (F.col("cdf") + 1)) + F.lit(1.0)),
        )
    )
    w = W.partitionBy("cluster").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPIC_TERMS)
        .join(sizes, "cluster")
        .select(
            "cluster",
            "n_docs",
            "rank",
            "term",
            F.round("score", 6).alias("ctfidf"),
        )
        .orderBy("cluster", "rank")
    )


def _topic_clusters_sql() -> str:
    """DuckDB twin — replays the argmax cell assignment (the streaming-
    aggregate form shared with ``_dedup_cells_sql``) then the c-TF-IDF
    aggregates byte-for-byte."""
    from .similarity import _COS_CT, _IVF_K_SQL, N_QUERIES

    return f"""
WITH kk AS ({_IVF_K_SQL}),
cent AS (
    SELECT vec_id - {N_QUERIES} AS cid, embedding FROM embeddings, kk
    WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES} + kk.k
),
cell AS (
    SELECT c.vec_id,
           CAST(max([{_COS_CT}, CAST(t.cid AS DOUBLE)])[2] AS BIGINT) AS cid
    FROM embeddings c, cent t
    GROUP BY c.vec_id
),
dc AS (
    SELECT d.doc_id, d.text, cell.cid AS cluster
    FROM documents d JOIN cell ON d.doc_id = cell.vec_id
),
terms AS (
    SELECT cluster,
           unnest(string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+')) AS term
    FROM dc
),
tf AS (
    SELECT cluster, term, COUNT(*) AS tf FROM terms
    WHERE term <> '' GROUP BY cluster, term
),
cdf AS (SELECT term, COUNT(*) AS cdf FROM tf GROUP BY term),
k AS (SELECT COUNT(DISTINCT cluster) AS n_clusters FROM dc),
sizes AS (SELECT cluster, COUNT(*) AS n_docs FROM dc GROUP BY cluster),
scored AS (
    SELECT tf.cluster, tf.term,
           tf.tf * (ln((k.n_clusters + 1.0) / (cdf.cdf + 1.0)) + 1.0) AS score
    FROM tf JOIN cdf USING (term) CROSS JOIN k
)
SELECT s.cluster, z.n_docs, s.rank, s.term, round(s.score, 6) AS ctfidf
FROM (
    SELECT cluster, term, score,
           ROW_NUMBER() OVER (PARTITION BY cluster
                              ORDER BY score DESC, term ASC) AS rank
    FROM scored
) s JOIN sizes z USING (cluster)
WHERE s.rank <= {TOPIC_TERMS}
ORDER BY s.cluster, s.rank
"""


# --------------------------------------------------------------------------
# Curation funnel: per-stage attrition through the quality filter chain
# --------------------------------------------------------------------------

_FUNNEL_STAGES = ("input", "gopher", "c4", "lang_en")


def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attrition report for the standard filter chain — how many
    documents survive each successive gate (input → Gopher quality
    rules → C4 line rules → language=en), with cumulative survival
    against the input count.  The first chart anyone draws when tuning
    a curation recipe: it shows WHICH stage is eating the corpus.

    Pure composition: the per-doc ``keep`` booleans come from
    :func:`gopher_quality_filter`, :func:`c4_filters` and
    :func:`lang_id` themselves (no rule is re-implemented, so this can
    never drift from the filters it reports on).  Three 1:1 joins on
    doc_id feed ONE aggregate row of conjunction counts; the 4-row
    funnel is projected from that single row, so the whole readout adds
    one narrow aggregation to the cost of the filters it audits.
    """
    g = gopher_quality_filter(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("g_keep")
    )
    c = c4_filters(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("c_keep")
    )
    lng = lang_id(spark, sf_dir).select(
        "doc_id", (F.col("pred_lang") == "en").alias("l_keep")
    )
    joined = g.join(c, "doc_id").join(lng, "doc_id")
    survives = [
        F.lit(True),
        F.col("g_keep"),
        F.col("g_keep") & F.col("c_keep"),
        F.col("g_keep") & F.col("c_keep") & F.col("l_keep"),
    ]
    one = joined.agg(
        *[
            F.sum(F.when(s, 1).otherwise(0)).cast("bigint").alias(f"n_{i}")
            for i, s in enumerate(survives)
        ]
    )
    parts = []
    for i, stage in enumerate(_FUNNEL_STAGES):
        n_in = F.col(f"n_{i - 1}") if i else F.col("n_0")
        parts.append(
            one.select(
                F.lit(i).alias("stage_idx"),
                F.lit(stage).alias("stage"),
                n_in.alias("n_in"),
                F.col(f"n_{i}").alias("n_kept"),
                (n_in - F.col(f"n_{i}")).alias("n_dropped"),
                F.when(
                    F.col("n_0") > 0,
                    F.round(
                        F.col(f"n_{i}").cast("double") / F.col("n_0"), 6
                    ),
                ).alias("survival"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("stage_idx")


def _curation_funnel_sql() -> str:
    """DuckDB twin: the filters' OWN oracle SQL nested as CTEs (DuckDB
    accepts WITH inside a CTE body), so the funnel's twin composes the
    same audited definitions it composes in Spark."""
    selects = "\nUNION ALL\n".join(
        f"SELECT {i} AS stage_idx, '{stage}' AS stage,\n"
        f"       n_{max(i - 1, 0)} AS n_in, n_{i} AS n_kept,\n"
        f"       n_{max(i - 1, 0)} - n_{i} AS n_dropped,\n"
        f"       CASE WHEN n_0 > 0 THEN\n"
        f"           ROUND(CAST(n_{i} AS DOUBLE) / n_0, 6) END AS survival\n"
        f"FROM agg"
        for i, stage in enumerate(_FUNNEL_STAGES)
    )
    return f"""
WITH g AS ({GOPHER_FILTER_SQL}),
c AS ({C4_FILTERS_SQL}),
l AS ({LANG_ID_SQL}),
j AS (
    SELECT g.doc_id, g.keep AS g_keep, c.keep AS c_keep,
           (l.pred_lang = 'en') AS l_keep
    FROM g JOIN c USING (doc_id) JOIN l USING (doc_id)
),
agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_0,
           CAST(SUM(CASE WHEN g_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_1,
           CAST(SUM(CASE WHEN g_keep AND c_keep THEN 1 ELSE 0 END)
                AS BIGINT) AS n_2,
           CAST(SUM(CASE WHEN g_keep AND c_keep AND l_keep THEN 1 ELSE 0 END)
                AS BIGINT) AS n_3
    FROM j
)
{selects}
ORDER BY stage_idx
"""
