"""Distributed BPE (byte-pair-encoding) merge learning over the corpus.

Part of the LLM-training-data layer (no counterpart in the reference — it
has no tokenizer surface; SURVEY.md §2.10 "counted absences").  This is the
sentencepiece/fastBPE training shape re-expressed Spark-first:

- corpus → word-frequency vocab: ONE shuffle keyed on ``word``.  Every
  later sweep runs on the vocab (``|vocab| ≪ |corpus|``) — at 100 TB the
  corpus parquet is read exactly once and the iterative state is a
  few-million-row DataFrame.
- each merge sweep: adjacent-symbol-pair count (map-combined ``groupBy``,
  shuffling only (pair, partial_sum) cells), argmax collected to the
  driver (ONE row — the algorithm's sync point, exactly like k-means
  centroid sync in ``similarity.kmeans_refine``), then the merge applied
  vocab-wide with the built-in ``replace`` (codegen'd, no UDF).
- greedy left-to-right non-overlapping merging == ``replace()`` scan
  semantics, identical in Spark SQL and DuckDB.  Symbols are joined with a
  DOUBLE space and the search pattern carries single-space boundaries, so
  a match consumes only the inner half of each boundary and consecutive
  occurrences still match ("s  a  t  a  t" → "s  at  at") — the same
  result as the canonical BPE regex ``(?<!\\S)a\\ t(?!\\S)`` without
  lookarounds (which RE2/DuckDB lacks).

All arithmetic is integer (BIGINT pair sums, lexicographic tie-breaks), so
the chained-CTE DuckDB oracle (v0 → p1/b1/v1 → … — the fixed-sweep pattern
of the PageRank oracle) reproduces the Spark result exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..session import load_table

# Number of merge sweeps learned by bpe_learn_merges (fixed so the oracle's
# chained CTEs match the Spark loop 1:1).
BPE_MERGES = 12

# Top-k cap for the seed pair-count query.
PAIR_TOP_K = 200

# Adjacent-symbol pairs of a double-space-joined symbol string; empty for
# single-symbol words.  NOTE: the CASE guard is load-bearing — Spark's
# sequence(0, -1) yields a DESCENDING [0, -1], not an empty array.
_PAIRS_EXPR = (
    "CASE WHEN size(split(sym, '  ')) >= 2 THEN "
    "transform(sequence(0, size(split(sym, '  ')) - 2), "
    "i -> split(sym, '  ')[i] || '  ' || split(sym, '  ')[i+1]) "
    "ELSE CAST(array() AS ARRAY<STRING>) END"
)


def _word_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, wc) frequency table — the single corpus-sized shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed statistics for BPE: top adjacent-CHARACTER-pair frequencies
    over the corpus, weighted by word occurrence count.

    Pairs are cut with ``substring(word, i, 2)`` over 1..len-1 — per-row
    array algebra at scan speed; the only wide exchange is the final
    groupBy on a tiny key space (≤ alphabet²).
    """
    vocab = _word_vocab(spark, sf_dir).filter(F.length("word") >= 2)
    pairs = vocab.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1), "
                "i -> substring(word, i, 2))"
            )
        ).alias("pair"),
        "wc",
    )
    counts = pairs.groupBy("pair").agg(F.sum("wc").alias("freq"))
    # distinct pairs are charset²-bounded, but the top-k still uses the
    # distributed TakeOrdered form (ranked_topk) rather than a global
    # row_number window — same fix as vocab_topk (r8 plan-gate sweep)
    from .scale import ranked_topk

    return (
        ranked_topk(counts, [("freq", False), ("pair", True)], PAIR_TOP_K)
        .select("rank", "pair", "freq")
        .orderBy("rank")
    )


BPE_PAIR_COUNTS_SQL = f"""
WITH vocab AS (
    SELECT word, COUNT(*) AS wc
    FROM (SELECT unnest(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+')) AS word
          FROM documents)
    WHERE word <> '' AND length(word) >= 2
    GROUP BY word
),
pairs AS (
    SELECT substring(v.word, t.i, 2) AS pair, CAST(SUM(v.wc) AS BIGINT) AS freq
    FROM vocab v,
         LATERAL (SELECT unnest(generate_series(1, length(v.word) - 1)) AS i) t
    GROUP BY 1
)
SELECT rank, pair, freq
FROM (SELECT pair, freq,
             ROW_NUMBER() OVER (ORDER BY freq DESC, pair) AS rank
      FROM pairs)
WHERE rank <= {PAIR_TOP_K}
ORDER BY rank
"""


# Vocab-size ceiling for learning merges on the driver.  Vocabulary grows
# ~sublinearly with corpus size (Heaps' law), so even a 100 TB corpus's
# vocab (a few million types) fits in driver memory — which is where every
# practical BPE trainer (sentencepiece, fastBPE) runs its merge loop.  The
# distributed sweep loop remains as the fallback above this ceiling.
DRIVER_LEARN_MAX_VOCAB = 2_000_000


def _learn_local(
    vocab: list[tuple[str, int]]
) -> list[tuple[int, str, str, str, int]]:
    """Driver-side merge loop — semantics identical to the Spark sweep loop
    (same double-space symbol strings, same padded single-space replace,
    same (freq DESC, pair ASC) tie-break; Python's left-to-right
    non-overlapping ``str.replace`` == Spark's ``replace`` == DuckDB's).

    One pass per merge over the vocab list: O(merges × vocab) driver work
    with zero job-scheduling overhead — for the common case where the
    vocab is thousands-to-millions of rows, this collapses 1 job per merge
    into 0.
    """
    syms = [(sym, wc) for sym, wc in vocab]
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, BPE_MERGES + 1):
        counts: dict[str, int] = {}
        for sym, wc in syms:
            parts = sym.split("  ")
            for i in range(len(parts) - 1):
                pair = parts[i] + "  " + parts[i + 1]
                counts[pair] = counts.get(pair, 0) + wc
        if not counts:
            break
        # max freq, ties broken by ascending pair (UTF-8 order == code
        # point order, matching Spark/DuckDB string comparison)
        pair = min(counts, key=lambda p: (-counts[p], p))
        freq = counts[pair]
        merged = pair.replace("  ", "")
        left, right = pair.split("  ")
        merges.append((rank, left, right, merged, freq))
        find, repl = f" {pair} ", f" {merged} "
        syms = [
            ((" " + sym + " ").replace(find, repl).strip(), wc)
            for sym, wc in syms
        ]
    return merges


def _learn(
    spark: SparkSession, sf_dir: str
) -> list[tuple[int, str, str, str, int]]:
    """Run the merge sweeps; returns the merge list.

    Adaptive: the symbolized vocab is fetched with a ``limit(MAX+1)`` probe
    (one job); when it fits under ``DRIVER_LEARN_MAX_VOCAB`` the merge loop
    runs locally (:func:`_learn_local`).  Beyond that, the distributed
    sweep loop below takes over: generation k is persisted lazily and
    materialized by generation k+1's argmax action; the grandparent is
    unpersisted only then, so every sweep costs exactly one job and
    lineage stays one replace deep without defensive count()
    materializations.
    """
    symbolized = _word_vocab(spark, sf_dir).select(
        F.trim(F.regexp_replace("word", "(.)", "$1  ")).alias("sym"),
        "wc",
    )
    probe = symbolized.limit(DRIVER_LEARN_MAX_VOCAB + 1).collect()
    if len(probe) <= DRIVER_LEARN_MAX_VOCAB:
        return _learn_local([(r.sym, r.wc) for r in probe])

    vocab = symbolized.persist()
    gens = [vocab]
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, BPE_MERGES + 1):
        best = (
            vocab.select(F.explode(F.expr(_PAIRS_EXPR)).alias("pair"), "wc")
            .groupBy("pair")
            .agg(F.sum("wc").alias("freq"))
            .orderBy(F.col("freq").desc(), "pair")
            .limit(1)
            .collect()
        )
        # the action above materialized `vocab`; its parent is now dead
        if len(gens) >= 2:
            gens[-2].unpersist()
        if not best:
            break
        pair, freq = best[0]["pair"], int(best[0]["freq"])
        merged = pair.replace("  ", "")
        left, right = pair.split("  ")
        merges.append((rank, left, right, merged, freq))
        vocab = vocab.select(
            F.trim(
                F.replace(
                    F.concat(F.lit(" "), F.col("sym"), F.lit(" ")),
                    F.lit(f" {pair} "),
                    F.lit(f" {merged} "),
                )
            ).alias("sym"),
            "wc",
        ).persist()
        gens.append(vocab)
    for g in gens[-2:]:
        g.unpersist()
    return merges


_MERGES_SCHEMA = (
    "rank int, left_sym string, right_sym string, merged string, freq bigint"
)


def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn BPE_MERGES merge rules: repeatedly take the most frequent
    adjacent symbol pair (ties broken lexicographically) and fuse it
    greedily left-to-right across the vocab.

    Per sweep the cluster does one map-combined pair count; only the
    winning (pair, freq) row crosses to the driver.  The vocab is
    persisted and the previous generation unpersisted each sweep, so
    lineage stays one-replace deep instead of growing quadratically.
    Returns the merge table (the learned artifact, analogous to k-means
    returning centroids).
    """
    return spark.createDataFrame(_learn(spark, sf_dir), schema=_MERGES_SCHEMA)


def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the learned merge table: per-document word
    and BPE-token counts plus the compression ratio tokens/words.

    After learning, the merges are driver literals, so tokenization is a
    PURE column expression — the word padded once, then one built-in
    ``replace`` per merge rule in rank order (greedy left-to-right, same
    scan semantics as learning), all inside whole-stage codegen.  Token
    counts are computed ONCE per distinct word and broadcast-joined back
    to the exploded corpus: at 100 TB the expensive side is a single
    corpus scan + broadcast hash join + one groupBy on doc_id.
    """
    merges = _learn(spark, sf_dir)
    padded = F.concat(
        F.lit(" "),
        F.trim(F.regexp_replace("word", "(.)", "$1  ")),
        F.lit(" "),
    )
    for _, left, right, merged_sym, _ in merges:
        padded = F.replace(
            padded, F.lit(f" {left}  {right} "), F.lit(f" {merged_sym} ")
        )
    word_tokens = _word_vocab(spark, sf_dir).select(
        "word",
        F.size(F.split(F.trim(padded), "  ")).alias("nt"),
    )
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    out = (
        words.join(F.broadcast(word_tokens), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("nt").alias("n_tokens"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_tokens",
            F.round(
                F.col("n_tokens").cast("double") / F.col("n_words"), 6
            ).alias("tokens_per_word"),
        )
        .orderBy("doc_id")
    )
    return out


def _learn_ctes(n: int) -> str:
    out = []
    for k in range(1, n + 1):
        prev = f"v{k - 1}"
        out.append(
            f"p{k} AS MATERIALIZED (\n"
            "  SELECT string_split(v.sym, '  ')[t.i] || '  ' || "
            "string_split(v.sym, '  ')[t.i + 1] AS pair,\n"
            "         CAST(SUM(v.wc) AS BIGINT) AS freq\n"
            f"  FROM {prev} v,\n"
            "       LATERAL (SELECT unnest(generate_series(1, "
            "len(string_split(v.sym, '  ')) - 1)) AS i) t\n"
            "  GROUP BY 1)"
        )
        out.append(
            f"b{k} AS MATERIALIZED (SELECT pair, freq FROM p{k} "
            "ORDER BY freq DESC, pair LIMIT 1)"
        )
        out.append(
            f"v{k} AS MATERIALIZED (\n"
            "  SELECT trim(replace(' ' || v.sym || ' ',\n"
            f"      ' ' || (SELECT pair FROM b{k}) || ' ',\n"
            f"      ' ' || (SELECT replace(pair, '  ', '') FROM b{k}) || ' '"
            ")) AS sym,\n"
            f"         v.wc AS wc\n  FROM {prev} v)"
        )
    return ",\n".join(out)


BPE_LEARN_MERGES_SQL = (
    "WITH v0 AS MATERIALIZED (\n"
    "  SELECT trim(regexp_replace(word, '(.)', '\\1  ', 'g')) AS sym,\n"
    "         COUNT(*) AS wc\n"
    "  FROM (SELECT unnest(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+')) AS word\n"
    "        FROM documents)\n"
    "  WHERE word <> '' GROUP BY 1),\n"
    + _learn_ctes(BPE_MERGES)
    + ",\nmerges AS (\n  "
    + "\n  UNION ALL ".join(
        f"SELECT {k} AS rank, pair, freq FROM b{k}"
        for k in range(1, BPE_MERGES + 1)
    )
    + ")\n"
    "SELECT CAST(rank AS INTEGER) AS rank,\n"
    "       string_split(pair, '  ')[1] AS left_sym,\n"
    "       string_split(pair, '  ')[2] AS right_sym,\n"
    "       replace(pair, '  ', '') AS merged,\n"
    "       freq\n"
    "FROM merges\nORDER BY rank"
)


BPE_ENCODE_SQL = (
    "WITH v0 AS MATERIALIZED (\n"
    "  SELECT trim(regexp_replace(word, '(.)', '\\1  ', 'g')) AS sym,\n"
    "         COUNT(*) AS wc\n"
    "  FROM (SELECT unnest(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+')) AS word\n"
    "        FROM documents)\n"
    "  WHERE word <> '' GROUP BY 1),\n"
    + _learn_ctes(BPE_MERGES)
    + ",\n"
    f"map AS (SELECT replace(sym, '  ', '') AS word,\n"
    f"               len(string_split(sym, '  ')) AS nt FROM v{BPE_MERGES}),\n"
    "words AS (SELECT * FROM\n"
    "  (SELECT doc_id, unnest(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+')) AS word\n"
    "   FROM documents)\n"
    "  WHERE word <> '')\n"
    "SELECT w.doc_id,\n"
    "       COUNT(*) AS n_words,\n"
    "       CAST(SUM(m.nt) AS BIGINT) AS n_tokens,\n"
    "       ROUND(CAST(SUM(m.nt) AS DOUBLE) / COUNT(*), 6) AS tokens_per_word\n"
    "FROM words w JOIN map m USING (word)\n"
    "GROUP BY w.doc_id\nORDER BY w.doc_id"
)


def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (tokens per word) aggregated per language — the
    standard tokenizer-fairness metric: a BPE learned on a mixed corpus
    fragments under-represented languages into more tokens, inflating
    their training cost per word.

    Reuses the encode pipeline (merges learned once, token counts per
    DISTINCT word broadcast back), then one tiny groupBy on lang.  The
    corpus-sized work is identical to ``bpe_encode``; the per-language
    rollup rides the same shuffle.
    """
    per_doc = bpe_encode(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        per_doc.join(docs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_tokens").alias("n_tokens"),
            F.round(
                F.sum("n_tokens").cast("double") / F.sum("n_words"), 6
            ).alias("fertility"),
        )
        .orderBy("lang")
    )


BPE_FERTILITY_SQL = (
    "WITH per_doc AS (" + BPE_ENCODE_SQL.replace("ORDER BY w.doc_id", "") + ")\n"
    "SELECT d.lang, COUNT(*) AS n_docs,\n"
    "       CAST(SUM(p.n_words) AS BIGINT) AS n_words,\n"
    "       CAST(SUM(p.n_tokens) AS BIGINT) AS n_tokens,\n"
    "       ROUND(CAST(SUM(p.n_tokens) AS DOUBLE) / SUM(p.n_words), 6)\n"
    "           AS fertility\n"
    "FROM per_doc p JOIN documents d USING (doc_id)\n"
    "GROUP BY d.lang\nORDER BY d.lang"
)
