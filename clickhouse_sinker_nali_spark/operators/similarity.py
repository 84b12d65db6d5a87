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
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions import cosine, dot, lit_doubles
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


def ann_bruteforce_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`ann_bruteforce_topk` with the scoring loop vectorized through
    Arrow → NumPy (``mapInPandas``): one BLAS matmul per batch instead of
    per-row interpreted higher-order-function folds.

    Why: the HOF ``aggregate`` fold evaluates interpreted, ~µs per cosine —
    the dominant constant in every exact-scoring path at sf1 (the smoke's
    ann_pq 28×/10× ratio is this constant, not a plan defect).  Arrow moves
    each partition as a columnar batch; the d=64 float32 block is cast to
    float64 once, cosines for all queries come from ``E @ Q.T`` (SIMD,
    ~ns per cosine), and only (query_id, neighbor_id, cos) rows return.
    The rank tail is unchanged — still the only shuffle.

    Numeric note: BLAS pairwise summation differs from the index-order
    fold by ≤ a few ulp; the oracle compares at 6-dp canonicalization, so
    parity holds (and is swept at every SF).  When BIT-exact cross-engine
    scores matter, use :func:`ann_bruteforce_topk`; this is the throughput
    form.
    """
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    qrows = sorted(
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: int(r.vec_id),
    )
    qids = [int(r.vec_id) for r in qrows]
    qmat = [[float(x) for x in r.embedding] for r in qrows]

    def score(batches):
        import numpy as np
        import pandas as pd

        if not qmat:  # degenerate corpus: no query vectors -> no output
            return
        Q = np.asarray(qmat, dtype=np.float64)
        qn = np.sqrt((Q * Q).sum(axis=1))
        ids = np.asarray(qids, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.asarray(
                [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
            )
            en = np.sqrt((E * E).sum(axis=1))
            cos = (E @ Q.T) / np.outer(en, qn)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids.reshape(1, -1), n, axis=0).ravel(),
                    "neighbor_id": np.repeat(
                        pdf["neighbor_id"].to_numpy(np.int64), len(ids)
                    ),
                    "label": np.repeat(pdf["label"].to_numpy(np.int32), len(ids)),
                    "cos_sim": cos.ravel(),
                }
            )

    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), "embedding", "label"
    )
    scored = corpus.mapInPandas(
        score, "query_id bigint, neighbor_id bigint, label int, cos_sim double"
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


def _bucket_expr(emb_col: str):
    """Sign-bit LSH bucket id from the deterministic hyperplanes.

    Σ_b 2^b·[dot(v, plane_b) > 0] — planes enter the plan as literal
    arrays, the dot is a zip_with fold: all JVM-side, map-only.
    """
    bucket = F.lit(0)
    for b, plane in enumerate(PLANES):
        # one ArrayType literal, not 64 element literals: identical values,
        # much smaller expression tree for codegen (and parsed, not Py4J-built)
        parr = lit_doubles(plane)
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


# --------------------------------------------------------------------------
# IVF-bucketed ANN (inverted-file index: nearest-centroid partitioning)
# --------------------------------------------------------------------------

# The cell count is NOT fixed: K scales with the corpus so that the mean
# cell width stays ~IVF_CELL_TARGET vectors.  Within-cell work (SemDeDup's
# pairwise cosine, IVF probe scans) is quadratic in cell width, so constant
# width makes total cost K·(N/K)² = N·IVF_CELL_TARGET — linear in N.  A
# fixed K=8 was correct at sf0.01 but (N/8)² per cell at 100 TB; production
# SemDeDup runs use 10⁴–10⁵ clusters for the same reason (Abbas et al. 2023).
IVF_CELL_TARGET = 128  # target mean vectors per cell
K_CENTROIDS_MIN = 8    # floor: keeps tiny test corpora multi-cell
NPROBE = 2  # queries probe their 2 nearest cells


def ivf_k(n_corpus: int) -> int:
    """Cell count for a corpus of ``n_corpus`` vectors (≥ the floor)."""
    import math

    return max(K_CENTROIDS_MIN, math.ceil(n_corpus / IVF_CELL_TARGET))


# SQL twin of ``ivf_k`` + seed-centroid selection, spliced into every IVF
# oracle so DuckDB derives the identical K from the same corpus
_IVF_K_SQL = f"""
    SELECT GREATEST({K_CENTROIDS_MIN},
                    CAST(ceil(COUNT(*) / {IVF_CELL_TARGET}.0) AS BIGINT)) AS k
    FROM embeddings WHERE vec_id >= {N_QUERIES}
"""


def _dummy_vec() -> list[float]:
    """Deterministic placeholder vector for degenerate (empty) training
    windows: e₀, the unit vector — nonzero norm keeps every cosine
    well-defined.  Only ever used when the corpus side is empty, where
    results are empty whatever the index contains."""
    return [1.0] + [0.0] * (DIM - 1)


def _centroids(emb: DataFrame) -> list[tuple[int, list[float]]]:
    """Deterministic centroid seed pick: first ``ivf_k(N)`` corpus vectors,
    as (cid, vector) sorted by cid.  Tiny (K×d floats) — safe to collect.
    The corpus count is one map-side-combined COUNT job; at 100 TB you
    would pass a cached count instead, which only changes how K is fed in.
    """
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    k = ivf_k(corpus.count())
    rows = (
        corpus.filter(F.col("vec_id") < N_QUERIES + k)
        .select("vec_id", "embedding")
        .collect()
    )
    if not rows:
        # degenerate corpus (empty, or every row is a query): substitute one
        # deterministic dummy centroid so plan construction survives — the
        # corpus side is empty in exactly this case, so every downstream
        # join produces the correct empty result regardless of the value
        # (unit vector, not zeros: cosine against it stays NaN-free)
        return [(0, _dummy_vec())]
    return sorted(
        (int(r.vec_id) - N_QUERIES, [float(x) for x in r.embedding]) for r in rows
    )


def _cell_scores(cents: list[tuple[int, list[float]]], col: str):
    """array<struct<cos,cid>> of similarity to every centroid literal.

    The centroid matrix enters the plan as ONE nested-array literal
    (``F.lit(list[list[float]])`` → a single array<array<double>> Literal
    node) and the cosine is written ONCE inside a ``transform`` lambda
    whose index doubles as the cid (``_centroids`` returns consecutive
    cids 0..K-1 in order).  Two expression-size traps live here, both
    measured: K copies of an unrolled 64-dim fold bloat generated code K×
    (~1 s of small-SF wall), and K separate per-centroid ``F.lit``s put
    K×d Literal NODES in the tree — plan analysis + codegen then scale
    with K·d, which at K=32, d=64 cost ~2 s per query compile when the
    actual data math is microseconds.  One opaque Literal object makes
    compile time independent of K, which is what lets ivf_k() grow K with
    the corpus.
    """
    import math

    from ..functions import dot, norm

    x = F.col(col) if isinstance(col, str) else col
    # the lambda INDEX is the cid, so the collected cids must be exactly
    # 0..K-1 — true for _centroids over the dense test corpora; a corpus
    # with vec_id gaps in the seed window would silently diverge from the
    # oracle's (vec_id - N_QUERIES) cids, so fail loudly instead
    if [cid for cid, _ in cents] != list(range(len(cents))):
        raise ValueError(
            f"non-consecutive centroid cids {[c for c, _ in cents]!r}: "
            "positional cell ids require a dense seed window"
        )
    mat = [vec for _, vec in cents]
    # per-centroid L2 norms as literals, computed with EXACTLY the engine's
    # arithmetic (float32→double per element, index-order fold from 0.0,
    # IEEE sqrt) so cos values stay bit-identical to the full cosine() —
    # and the row's own norm is bound ONCE via the outer lambda instead of
    # being re-instantiated per centroid (HOF folds evaluate interpreted;
    # K×(dot+2·norm) per row was 3× the necessary work, the dominant cost
    # of cell assignment once ivf_k() raised K)
    norms = []
    for vec in mat:
        acc = 0.0
        for v in vec:
            acc += v * v
        norms.append(math.sqrt(acc))
    cent_arr = lit_doubles(mat)
    norm_arr = lit_doubles(norms)
    return F.transform(
        F.array(norm(x)),
        lambda nx: F.transform(
            cent_arr,
            lambda c, i: F.struct(
                (dot(x, c) / (nx * F.element_at(norm_arr, i + F.lit(1)))).alias("cos"),
                i.cast("int").alias("cid"),
            ),
        ),
    ).getItem(0)


def _probed_queries(emb: DataFrame, cents, extra_cols: list = ()) -> DataFrame:
    """Query vectors exploded to their NPROBE nearest cells.

    ``extra_cols``: additional Column expressions to carry through (e.g.
    the query's label for hard-negative mining) — keeps the probe
    selection/tie-break logic in exactly one place.
    """
    return emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        *extra_cols,
        F.explode(
            F.transform(
                F.slice(
                    F.reverse(F.array_sort(_cell_scores(cents, "embedding"))),
                    1,
                    NPROBE,
                ),
                lambda s: s.getField("cid"),
            )
        ).alias("cid"),
    )


def _rank_probed(corpus: DataFrame, queries: DataFrame) -> DataFrame:
    """Cell equi-join + exact cosine re-rank (shared IVF tail)."""
    from pyspark.sql.window import Window

    scored = corpus.join(broadcast(queries), "cid").select(
        "query_id", "neighbor_id", "cid", cosine("qe", "ce").alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "cid", "cos_sim")
        .orderBy("query_id", "rank")
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: nearest-centroid cells, query probes NPROBE cells, exact
    re-rank inside probed cells.

    Training is a deterministic seed pick (the first K corpus vectors serve
    as centroids) so the DuckDB oracle can rebuild the identical index; a
    production index would k-means these, which only changes the centroid
    values, not the plan shape.  Scale design: the centroid set is tiny
    (K×d floats), so it is collected once and enters the plan as literal
    arrays — cell assignment is then a map-side argmax with NO shuffle over
    the corpus (the LSH bucket expression's exact analogue).  The only
    shuffles are the cell equi-join and the per-query rank, both keyed on
    small keys.  At 100 TB with K=4096 cells the same plan holds: centroids
    broadcast, assignment map-side, candidates = |corpus|·nprobe/K.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _centroids(emb)
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        # argmax by (cos, cid): struct max compares cos first, cid breaks ties
        F.array_max(_cell_scores(cents, "embedding")).getField("cid").alias("cid"),
    )
    return _rank_probed(corpus, _probed_queries(emb, cents))


def _cos_pair(a: str, b: str) -> str:
    return (
        f"(list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"
        f" / (sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[]))"
        f" * sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[]))))"
    )


_COS_CT = _cos_pair("c.embedding", "t.embedding")
_COS_QT = _cos_pair("q.embedding", "t.embedding")
_COS_PC = _cos_pair("p.qe", "c.embedding")

ANN_IVF_SQL = f"""
WITH kk AS ({_IVF_K_SQL}),
cent AS (
    SELECT vec_id - {N_QUERIES} AS cid, embedding FROM embeddings, kk
    WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES} + kk.k
),
corpus AS (
    SELECT neighbor_id, embedding, cid FROM (
        SELECT c.vec_id AS neighbor_id, c.embedding, t.cid,
               ROW_NUMBER() OVER (PARTITION BY c.vec_id
                    ORDER BY {_COS_CT} DESC, t.cid DESC) AS rn
        FROM embeddings c, cent t
        WHERE c.vec_id >= {N_QUERIES}
    ) WHERE rn = 1
),
probes AS (
    SELECT query_id, qe, cid FROM (
        SELECT q.vec_id AS query_id, q.embedding AS qe, t.cid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                    ORDER BY {_COS_QT} DESC, t.cid DESC) AS rn
        FROM embeddings q, cent t
        WHERE q.vec_id < {N_QUERIES}
    ) WHERE rn <= {NPROBE}
)
SELECT query_id, rank, neighbor_id, cid, cos_sim
FROM (
    SELECT p.query_id, c.neighbor_id, c.cid,
           {_COS_PC} AS cos_sim,
           ROW_NUMBER() OVER (PARTITION BY p.query_id
                ORDER BY {_COS_PC} DESC, c.neighbor_id) AS rank
    FROM probes p JOIN corpus c ON p.cid = c.cid
)
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


def ann_ivf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`ann_ivf_topk` with FLAT cell assignment vectorized through
    Arrow → NumPy: one matmul of each batch against the full centroid
    matrix, argmax with the same tie rule (max cos, then max cid — taken
    as the LAST argmax over the score row).

    Complements :func:`ann_ivf_hier_topk` on the other axis: hier cuts the
    per-row cosine COUNT to O(√K) (the asymptotic win, K=10⁶ at 100 TB);
    this cuts the per-cosine COST from interpreted-fold µs to BLAS ns
    while keeping flat assignment's candidate-pruning SEMANTICS (every
    centroid considered).  At sf1 (K=782) the matmul form is the faster of
    the two; at web scale you want both — hier grouping with vectorized
    scoring inside each level.

    Numeric note: BLAS pairwise summation differs from the fold by ulp,
    and unlike the rounded cosine outputs the argmax is DISCRETE — a
    sub-ulp tie between two centroids could assign a different cell than
    the fold/oracle.  Distinct-centroid score gaps on real data are ~1e-2
    (flip probability ~1e-12/row), so parity is empirical, not bit-exact;
    the fold form remains the cross-engine reference (pinned by the
    membership-parity pytest and the oracle sweep at every SF).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _centroids(emb)
    corpus = assign_cells_arrow(
        emb.filter(F.col("vec_id") >= N_QUERIES).select(
            F.col("vec_id").alias("neighbor_id"), "embedding"
        ),
        cents,
    )
    return _rank_probed(corpus, _probed_queries(emb, cents))


def _require_dense_cids(cents) -> None:
    # positional matrix rows double as the cids, so the collected cids must
    # be exactly 0..K-1 — a gap in the seed window would silently diverge
    # from the oracle's (vec_id - N_QUERIES) cids (same guard as
    # _cell_scores; fail loudly, not wrong)
    if [cid for cid, _ in cents] != list(range(len(cents))):
        raise ValueError(
            f"non-consecutive centroid cids {[c for c, _ in cents]!r}: "
            "positional cell ids require a dense seed window"
        )


def _broadcast_centroids(df: DataFrame, cents):
    """Ship the K×d centroid matrix to executors as a SparkContext
    broadcast variable (torrent-distributed, one copy per executor).

    This — not a plan literal and not a task-closure capture — is the
    distribution mechanism with no K ceiling: a literal bloats plan
    compile/analysis and a closure is re-pickled into EVERY task, so both
    break around K≈10⁵ (a ~0.5 GB payload at d=64), exactly the regime a
    real 100 TB IVF needs (FAISS-style coarse quantizer over 10⁵–10⁶
    cells).  Broadcast cost is one-time per executor and independent of
    task count."""
    import numpy as np

    return df.sparkSession.sparkContext.broadcast(
        np.asarray([vec for _, vec in cents], dtype=np.float64)
    )


def _flat_assign_fn(bc, id_col: str, emb_out: str):
    """mapInPandas body for flat Arrow assignment.  Its only centroid
    state is the Broadcast handle ``bc`` (pinned by pytest): the matrix
    itself never rides the task closure."""

    def assign(batches):
        import numpy as np
        import pandas as pd

        C = bc.value
        cn = np.sqrt((C * C).sum(axis=1))
        k = C.shape[0]
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.asarray(
                [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
            )
            en = np.sqrt((E * E).sum(axis=1))
            cos = (E @ C.T) / np.outer(en, cn)
            cid = k - 1 - np.argmax(cos[:, ::-1], axis=1)
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(np.int64),
                    "cid": cid.astype(np.int32),
                }
            )
            out[emb_out] = pdf["embedding"]
            yield out[[id_col, emb_out, "cid"]]

    return assign


def assign_cells_arrow(
    df: DataFrame, cents, id_col: str = "neighbor_id", emb_out: str = "ce",
    bc=None,
) -> DataFrame:
    """Arrow/NumPy flat cell assignment over a (id, embedding) DataFrame:
    one matmul per batch against the broadcast centroid matrix, ties to
    the LARGER cid (struct-max rule, taken as the last argmax).  Shared by
    the batch ANN path, the cell-blocked dedup, and the streaming index
    twin.  Centroids travel via :func:`_broadcast_centroids`; a caller
    that assigns repeatedly against a FROZEN snapshot (the streaming
    index maintainer) passes its own ``bc`` so the matrix is broadcast
    once per stream, not once per epoch."""
    _require_dense_cids(cents)
    if bc is None:
        bc = _broadcast_centroids(df, cents)
    return df.mapInPandas(
        _flat_assign_fn(bc, id_col, emb_out),
        f"{id_col} bigint, {emb_out} array<float>, cid int",
    )


def _hier_assign_fn(bc, groups_idx, id_col: str, emb_out: str):
    """mapInPandas body for the composed hier×Arrow assignment: the
    two-level argmax (coarse representatives → winning group's fine
    centroids) runs INSIDE the NumPy stage, so each row costs O(√K)
    vectorized cosines instead of flat's O(K) — and the K×d matrix rides
    a Broadcast handle, not the closure (only the tiny group index list
    does: K int64s ≈ 8K bytes, plan-safe at any realistic K)."""

    def assign(batches):
        import numpy as np
        import pandas as pd

        C = bc.value
        cn = np.sqrt((C * C).sum(axis=1))
        k1 = len(groups_idx)
        R, rn = C[:k1], cn[:k1]
        groups = [np.asarray(g, dtype=np.int64) for g in groups_idx]
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.asarray(
                [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
            )
            en = np.sqrt((E * E).sum(axis=1))
            cosr = (E @ R.T) / np.outer(en, rn)
            # ties to the larger g (the fold/SQL rule): last argmax
            win_g = k1 - 1 - np.argmax(cosr[:, ::-1], axis=1)
            cid = np.empty(len(pdf), dtype=np.int64)
            for g in np.unique(win_g):
                rows = np.flatnonzero(win_g == g)
                gi = groups[g]
                cos = (E[rows] @ C[gi].T) / np.outer(en[rows], cn[gi])
                # gi is ascending, so last argmax == ties to the larger cid
                j = len(gi) - 1 - np.argmax(cos[:, ::-1], axis=1)
                cid[rows] = gi[j]
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(np.int64),
                    "cid": cid.astype(np.int32),
                }
            )
            out[emb_out] = pdf["embedding"]
            yield out[[id_col, emb_out, "cid"]]

    return assign


def _hier_groups_np(cents):
    """NumPy twin of :func:`_hier_groups` for the Arrow path — same
    structure and tie rules (each fine centroid joins its nearest of the
    first ceil(√K) representatives, ties to the larger g) via one K×K1
    matmul.

    Why it exists: the fold form runs O(K^1.5 · d) scalar Python on the
    DRIVER — measured 0.15 s at K=1.6 K (sf10), extrapolating to
    minutes of serialized driver time at the K≈10⁵ a real 100 TB index
    needs (vs. 7 ms / one matmul here; group sets verified identical at
    K=8/157/1563).  The fold form remains
    the oracle-replayable reference (DuckDB reproduces its arithmetic
    bit-for-bit); BLAS group membership can differ from it only on an
    ulp-level cosine tie between distinct reps — the same
    empirical-parity caveat as every Arrow scoring stage, pinned by the
    oracle sweep.  Same loud empty-group guard as the fold form."""
    import math

    import numpy as np

    C = np.asarray([vec for _, vec in cents], dtype=np.float64)
    k = C.shape[0]
    k1 = math.ceil(math.sqrt(k))
    cn = np.sqrt((C * C).sum(axis=1))
    cos = (C @ C[:k1].T) / np.outer(cn, cn[:k1])
    g = k1 - 1 - np.argmax(cos[:, ::-1], axis=1)  # ties → larger g
    groups = [[int(c) for c in np.flatnonzero(g == gi)] for gi in range(k1)]
    _check_no_empty_groups(groups)
    return k1, groups


def assign_cells_hier_arrow(
    df: DataFrame, cents, id_col: str = "neighbor_id", emb_out: str = "ce",
    bc=None,
) -> DataFrame:
    """Hierarchical Arrow/NumPy cell assignment: the two-level coarse
    structure with :func:`assign_cells_arrow`'s vectorized scoring
    — O(√K) BLAS cosines per row, broadcast-distributed centroids.

    This is the composition COVERAGE.md names as the asymptotic winner
    for web-scale index build (K≈10⁵–10⁶ at 100 TB, FAISS coarse-quantizer
    frame): hier removes the O(N·K) flat-assignment quadratic, Arrow
    removes the interpreted-fold constant, broadcast removes the
    plan-literal/closure K ceiling, and the group structure itself comes
    from :func:`_hier_groups_np` (one matmul; the fold ``_hier_groups``
    is O(K^1.5·d) serialized driver Python — minutes at K≈10⁵).  Tie rules replay
    the fold/SQL form exactly (max cos then larger g, then max cos then
    larger cid), so the same ``ANN_IVF_HIER_SQL`` oracle checks it;
    BLAS-vs-fold ulp caveat as in :func:`ann_ivf_arrow` (discrete argmax,
    empirical parity)."""
    _require_dense_cids(cents)
    _, groups = _hier_groups_np(cents)
    if bc is None:
        bc = _broadcast_centroids(df, cents)
    return df.mapInPandas(
        _hier_assign_fn(bc, groups, id_col, emb_out),
        f"{id_col} bigint, {emb_out} array<float>, cid int",
    )


def _probe_assign_fn(bc, nprobe: int):
    """mapInPandas body for the query-side NPROBE probe: per query, the
    NPROBE best cells by (cos desc, cid desc) — the exact tie order of
    ``_probed_queries``' reverse(array_sort) and the oracle's ``ORDER BY
    cos DESC, cid DESC``.  Like the corpus assigners, its only centroid
    state is the Broadcast handle."""

    def assign(batches):
        import numpy as np
        import pandas as pd

        C = bc.value
        cn = np.sqrt((C * C).sum(axis=1))
        k = C.shape[0]
        neg_cid = -np.arange(k)
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.asarray(
                [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
            )
            en = np.sqrt((E * E).sum(axis=1))
            cos = (E @ C.T) / np.outer(en, cn)
            ids, embs, cids = [], [], []
            n = min(nprobe, k)
            for r in range(len(pdf)):
                # lexsort: primary -cos (desc), secondary -cid (desc ties)
                order = np.lexsort((neg_cid, -cos[r]))[:n]
                ids.extend([int(pdf["query_id"].iloc[r])] * n)
                embs.extend([pdf["embedding"].iloc[r]] * n)
                cids.extend(int(c) for c in order)
            yield pd.DataFrame(
                {"query_id": ids, "qe": embs, "cid": np.asarray(cids, np.int32)}
            )

    return assign


def probed_queries_arrow(emb: DataFrame, cents, bc=None) -> DataFrame:
    """:func:`_probed_queries` with broadcast-distributed centroids and
    NumPy scoring — the query-side companion of the Arrow corpus
    assigners, removing the LAST plan-literal centroid site from the
    composed IVF path (``_cell_scores`` bakes K×d doubles into the plan;
    fine at K≈10³, plan-compile poison at K≈10⁵⁺)."""
    _require_dense_cids(cents)
    if bc is None:
        bc = _broadcast_centroids(emb, cents)
    return emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    ).mapInPandas(
        _probe_assign_fn(bc, NPROBE),
        "query_id bigint, qe array<float>, cid int",
    )


def ann_ivf_hier_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`ann_ivf_topk` with the composed hier×Arrow corpus assignment
    (:func:`assign_cells_hier_arrow`) — the 100 TB index-build shape on
    BOTH axes at once: O(N·√K) cosine count (vs flat's N·K quadratic once
    ``ivf_k`` scales K with N) AND BLAS-vectorized per-cosine cost, with
    centroids distributed as a broadcast variable rather than plan
    literals.  The query probe (:func:`probed_queries_arrow`) is also
    broadcast+NumPy, so NO stage of this path carries a K-sized plan
    literal or closure; the re-rank tail is the audited IVF tail
    unchanged.  Oracle: ``ANN_IVF_HIER_SQL`` (same assignment semantics
    as the fold form)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _centroids(emb)
    # ONE broadcast shared by the corpus and probe stages — two handles
    # would pin two executor-resident copies of the K×d matrix (~0.5 GB
    # each at the K≈10⁵ target) for no reason
    bc = _broadcast_centroids(emb, cents)
    corpus = assign_cells_hier_arrow(
        emb.filter(F.col("vec_id") >= N_QUERIES).select(
            F.col("vec_id").alias("neighbor_id"), "embedding"
        ),
        cents,
        bc=bc,
    )
    return _rank_probed(corpus, probed_queries_arrow(emb, cents, bc=bc))


def _check_no_empty_groups(groups) -> None:
    """A rep's self-cosine is dot/(sqrt*sqrt), which can land an ulp
    below 1.0 and let a near-parallel LATER rep steal it, leaving its
    group empty — downstream that renders an untyped array() literal or
    silently NULL-drops rows.  The oracle replays the same arithmetic,
    so raising (not reassigning) keeps parity: fail loudly instead of
    diverging."""
    empty = [g for g, members in enumerate(groups) if not members]
    if empty:
        raise ValueError(
            f"hier coarse groups {empty} are empty (rep stolen by a "
            "near-parallel rep): this centroid set cannot be hier-grouped "
            "deterministically — use the flat assigner for it"
        )


def _hier_groups(cents: list[tuple[int, list[float]]]):
    """Two-level index structure over the centroid list: the first
    K1=ceil(√K) centroids serve as COARSE representatives, and every fine
    centroid joins the group of its nearest representative (max cos, ties
    to the larger g — the exact ordering the SQL oracle replays).

    Driver-side cost is K·K1 cosines over K small vectors — trivial next
    to the corpus scan it saves.  All arithmetic is the engines' exact
    shape (index-order float64 folds, IEEE sqrt) so group membership is
    bit-reproducible in DuckDB.
    """
    import math

    mat = [vec for _, vec in cents]
    k = len(mat)
    k1 = math.ceil(math.sqrt(k))

    def _dot(a, b):
        acc = 0.0
        for xa, xb in zip(a, b):
            acc += xa * xb
        return acc

    norms = [math.sqrt(_dot(v, v)) for v in mat]
    groups: list[list[int]] = [[] for _ in range(k1)]
    for cid, vec in enumerate(mat):
        best_g, best_cos = 0, None
        for g in range(k1):
            c = _dot(vec, mat[g]) / (norms[cid] * norms[g])
            if best_cos is None or c >= best_cos:  # >= : larger g wins ties
                best_cos, best_g = c, g
        groups[best_g].append(cid)
    _check_no_empty_groups(groups)
    return k1, groups


def _hier_cell_expr(cents: list[tuple[int, list[float]]], col: str):
    """Two-level (nearest-coarse → fine) cell assignment: O(√K) cosines
    per row instead of the flat argmax's O(K).

    Why this exists: ``ivf_k`` grows K linearly with the corpus (constant
    cell width keeps within-cell work linear), which makes FLAT assignment
    cost N·K = N²/128 — the quadratic term the sf1 smoke surfaced, and at
    100 TB (K≈10⁶) the dominant cost of index build.  The standard fix is
    a hierarchical coarse quantizer (FAISS: an IVF over the centroids
    themselves, or HNSW); here the deterministic, oracle-replayable form:
    the first √K centroids act as coarse representatives, each fine
    centroid belongs to its NEAREST representative's group
    (:func:`_hier_groups` — geometry-aware, unlike naive contiguous
    chunking), and a row argmaxes over representatives then over the
    winning group.  ~2√K cosines per row — 14× fewer at sf1's K=782,
    ~500× at K=10⁶.  Approximation: the true nearest centroid can live in
    a losing group — the recall/cost dial every hierarchical ANN index
    exposes (measured hier-vs-flat cell agreement is pinned in pytest).
    """
    import math

    from ..functions import dot, norm

    x = F.col(col) if isinstance(col, str) else col
    mat = [vec for _, vec in cents]
    k1, groups = _hier_groups(cents)

    def _norms(vecs):
        out = []
        for vec in vecs:
            acc = 0.0
            for v in vec:
                acc += v * v
            out.append(math.sqrt(acc))
        return out

    reps = mat[:k1]
    coarse_arr, coarse_norm = lit_doubles(reps), lit_doubles(_norms(reps))
    group_vecs = [[mat[cid] for cid in g] for g in groups]
    chunks_arr = lit_doubles(group_vecs)
    chunk_norms = lit_doubles([_norms(gv) for gv in group_vecs])
    cids_arr = F.expr(
        "array(" + ",".join(
            "array(" + ",".join(str(cid) for cid in g) + ")" for g in groups
        ) + ")"
    )
    # outer transform binds the row norm once (same discipline as
    # _cell_scores); g/j are 0-based lambda indexes
    return F.transform(
        F.array(norm(x)),
        lambda nx: F.transform(
            F.array(
                F.array_max(
                    F.transform(
                        coarse_arr,
                        lambda c, g: F.struct(
                            (dot(x, c) / (nx * F.element_at(coarse_norm, g + F.lit(1))))
                            .alias("cos"),
                            g.cast("int").alias("g"),
                        ),
                    )
                ).getField("g")
            ),
            lambda g: F.array_max(
                F.transform(
                    F.element_at(chunks_arr, g + F.lit(1)),
                    lambda c, j: F.struct(
                        (
                            dot(x, c)
                            / (
                                nx
                                * F.element_at(
                                    F.element_at(chunk_norms, g + F.lit(1)),
                                    j + F.lit(1),
                                )
                            )
                        ).alias("cos"),
                        F.element_at(
                            F.element_at(cids_arr, g + F.lit(1)), j + F.lit(1)
                        ).cast("int").alias("cid"),
                    ),
                )
            ).getField("cid"),
        ),
    ).getItem(0).getItem(0)


def ann_ivf_hier_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`ann_ivf_topk` with HIERARCHICAL corpus cell assignment
    (:func:`_hier_cell_expr`): the O(N·K) flat argmax — quadratic in the
    corpus once ``ivf_k`` scales K with N — becomes O(N·√K).  Queries
    still probe flat (|queries| ≪ N, so their K cosines are immaterial);
    the probe/re-rank tail is the audited IVF tail unchanged.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _centroids(emb)
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        _hier_cell_expr(cents, "embedding").alias("cid"),
    )
    return _rank_probed(corpus, _probed_queries(emb, cents))


# K1 (rep count) = ceil(sqrt(K)); IEEE sqrt of a BIGINT is identical in
# both engines, so the derived coarse level matches the Python side exactly
_HIER_K1_SQL = "SELECT CAST(ceil(sqrt(k)) AS BIGINT) AS k1 FROM kk"
_COS_CGT = _cos_pair("c.embedding", "t.embedding")
_COS_FT = _cos_pair("f.embedding", "t.embedding")

ANN_IVF_HIER_SQL = f"""
WITH kk AS ({_IVF_K_SQL}),
kp AS ({_HIER_K1_SQL}),
cent AS (
    SELECT vec_id - {N_QUERIES} AS cid, embedding FROM embeddings, kk
    WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES} + kk.k
),
coarse AS (
    SELECT cid AS g, embedding FROM cent, kp WHERE cid < kp.k1
),
grp AS (
    SELECT cid, g FROM (
        SELECT f.cid, t.g,
               ROW_NUMBER() OVER (PARTITION BY f.cid
                    ORDER BY {_COS_FT} DESC, t.g DESC) AS rn
        FROM cent f, coarse t
    ) WHERE rn = 1
),
pickg AS (
    SELECT vec_id, g FROM (
        SELECT c.vec_id, t.g,
               ROW_NUMBER() OVER (PARTITION BY c.vec_id
                    ORDER BY {_COS_CGT} DESC, t.g DESC) AS rn
        FROM embeddings c, coarse t
        WHERE c.vec_id >= {N_QUERIES}
    ) WHERE rn = 1
),
corpus AS (
    SELECT neighbor_id, embedding, cid FROM (
        SELECT c.vec_id AS neighbor_id, c.embedding, t.cid,
               ROW_NUMBER() OVER (PARTITION BY c.vec_id
                    ORDER BY {_COS_CT} DESC, t.cid DESC) AS rn
        FROM embeddings c
        JOIN pickg p ON p.vec_id = c.vec_id
        JOIN grp ON grp.g = p.g
        JOIN cent t ON t.cid = grp.cid
    ) WHERE rn = 1
),
probes AS (
    SELECT query_id, qe, cid FROM (
        SELECT q.vec_id AS query_id, q.embedding AS qe, t.cid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                    ORDER BY {_COS_QT} DESC, t.cid DESC) AS rn
        FROM embeddings q, cent t
        WHERE q.vec_id < {N_QUERIES}
    ) WHERE rn <= {NPROBE}
)
SELECT query_id, rank, neighbor_id, cid, cos_sim
FROM (
    SELECT p.query_id, c.neighbor_id, c.cid,
           {_COS_PC} AS cos_sim,
           ROW_NUMBER() OVER (PARTITION BY p.query_id
                ORDER BY {_COS_PC} DESC, c.neighbor_id) AS rank
    FROM probes p JOIN corpus c ON p.cid = c.cid
)
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


# --------------------------------------------------------------------------
# IVF index persistence: the inverted file as a saved, partition-pruned table
# --------------------------------------------------------------------------

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
IVF_INDEX_BASE = os.path.join(_REPO_ROOT, "data", "ivf_index")


def build_ivf_index(spark: SparkSession, sf_dir: str, index_path: str) -> None:
    """Materialize the IVF index: centroid table + corpus partitioned by cell.

    ``corpus/`` is written ``partitionBy("cid")`` — the inverted file IS the
    directory layout, so probing nprobe cells at query time reads only
    nprobe/K of the data via static partition pruning (no Spark-side index
    structure needed; the filesystem listing is the posting-list lookup).
    At 100 TB with K=4096 cells this is the difference between scanning
    ~50 GB (2 probed cells) and scanning everything.  Cell files are
    written once and shared by every subsequent query — the index cost
    amortizes exactly like a FAISS IVF build.

    Assignment here is the fold ``_cell_scores`` so the persisted index
    is bit-identical to the DuckDB oracle's; at web scale build with the
    broadcast hier×Arrow assigner instead (:func:`assign_cells_hier_arrow`
    — the streaming maintainer already uses the Arrow form).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _centroids(emb)
    spark.createDataFrame(
        [(cid, vec) for cid, vec in cents], "cid int, embedding array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(index_path, "centroids"))
    (
        emb.filter(F.col("vec_id") >= N_QUERIES)
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("ce"),
            F.array_max(_cell_scores(cents, "embedding")).getField("cid").alias("cid"),
        )
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(os.path.join(index_path, "corpus"))
    )


def ann_ivf_query(
    spark: SparkSession, sf_dir: str, index_path: str
) -> DataFrame:
    """Top-k against a PERSISTED IVF index: probe cells → pruned scan → re-rank.

    The probe set enters the corpus scan as an ``isin`` literal filter on
    the partition column, so `.explain` shows PartitionFilters and only the
    probed cell directories are listed/read.
    """
    cent_rows = (
        spark.read.parquet(os.path.join(index_path, "centroids"))
        .orderBy("cid")
        .collect()
    )
    cents = [(int(r.cid), [float(x) for x in r.embedding]) for r in cent_rows]
    emb = load_table(spark, sf_dir, "embeddings")
    queries = _probed_queries(emb, cents)
    probe_cids = sorted({int(r.cid) for r in queries.select("cid").distinct().collect()})
    from pyspark.errors import AnalysisException

    corpus_path = os.path.join(index_path, "corpus")
    try:
        raw = spark.read.parquet(corpus_path)
    except AnalysisException:
        # Fall back ONLY for a legitimately-empty index: a degenerate
        # (empty) corpus writes no data files under corpus/, so schema
        # inference fails.  A missing/mistyped index path (build never
        # ran) must raise, not silently return 0 rows (r7 ADVICE).  The
        # empty frame's ce dtype is array<float> because build_ivf_index
        # writes ce as the raw embedding passthrough (parquet source is
        # list<float>; the ADVICE note guessed double — only centroids
        # are double).
        if not os.path.isdir(corpus_path):
            raise
        raw = spark.createDataFrame(
            [], "neighbor_id bigint, ce array<float>, cid int"
        )
    corpus = (
        raw.filter(F.col("cid").isin(probe_cids))
        # the streaming maintainer keys its idempotent-replay partitions on
        # (cid, __epoch); the batch build has no such column — no-op there
        .drop("__epoch")
    )
    return _rank_probed(corpus, queries)


def ann_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-then-query the persisted IVF index (driver-contract entry).

    Results are identical to ``ann_ivf_topk`` — same centroids, assignment,
    probes, and re-rank — so the same DuckDB oracle checks both; what
    changes is the physical plan (pruned index scan instead of a full-corpus
    map-side assignment per query).
    """
    index_path = os.path.join(
        IVF_INDEX_BASE, os.path.basename(os.path.normpath(sf_dir))
    )
    build_ivf_index(spark, sf_dir, index_path)
    return ann_ivf_query(spark, sf_dir, index_path)


# --------------------------------------------------------------------------
# int8 quantization (the ANN memory-scale path: 4 B -> 1 B per dimension)
# --------------------------------------------------------------------------

_QEPS = 1e-12  # scale floor: keeps the all-zero vector finite


def _quantize(e):
    """(scale, q) for a float-array column: symmetric per-vector int8.

    Rounding is ``floor(x + 0.5)`` in BOTH engines rather than ``round()``
    — Spark and DuckDB agree on it bit-for-bit, whereas round() half-case
    conventions are a classic cross-engine divergence.
    """
    d = F.transform(e, lambda x: x.cast("double"))
    scale = F.greatest(
        F.array_max(F.transform(d, F.abs)) / F.lit(127.0), F.lit(_QEPS)
    )
    q = F.transform(d, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int"))
    return scale, q


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector symmetric int8 quantization with reconstruction error.

    Map-side only (no shuffle but the presentation sort): at 100 TB this is
    the projection you write back out once, shrinking the ANN working set
    4× so corpus shards fit in executor memory for the re-rank stage.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    scale, q = _quantize(F.col("embedding"))
    d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    err = F.aggregate(
        F.zip_with(d, q, lambda x, qi: F.abs(x - qi.cast("double") * scale)),
        F.lit(0.0),
        lambda a, x: a + x,
    ) / F.size(q)
    # The int8 vector is emitted as a comma-joined STRING, not array<int>:
    # the driver's canonicalizer lexsorts output columns with pandas and
    # can't hash list values (r01 `err` row).  Same information, sortable.
    q_str = F.array_join(F.transform(q, lambda x: x.cast("string")), ",")
    return emb.select(
        "vec_id",
        scale.alias("scale"),
        q_str.alias("q"),
        err.alias("mean_abs_err"),
    ).orderBy("vec_id")


_D_SQL = "list_transform(embedding, x -> x::DOUBLE)"
_SCALE_SQL = f"greatest(list_max(list_transform({_D_SQL}, x -> abs(x))) / 127.0, {_QEPS})"

EMBEDDING_QUANTIZE_SQL = f"""
WITH base AS (
    SELECT vec_id, {_D_SQL} AS d, {_SCALE_SQL} AS scale FROM embeddings
)
SELECT vec_id, scale,
       array_to_string(list_transform(d, x -> floor(x / scale + 0.5)::INT), ',') AS q,
       list_sum(list_transform(d,
           x -> abs(x - floor(x / scale + 0.5)::INT * scale))) / len(d)
           AS mean_abs_err
FROM base
ORDER BY vec_id
"""


def ann_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-k on QUANTIZED vectors: integer dot products scaled
    by the two per-vector scales.

    Same join shape as the float brute force (broadcast queries, window
    rank) but the corpus side streams int8 — the arithmetic a GPU-free
    re-rank stage runs at scale.  The integer dot is exact in both engines,
    so the oracle reproduces the ranking bit-for-bit.
    """
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    scale, q = _quantize(F.col("embedding"))
    quant = emb.select("vec_id", scale.alias("scale"), q.alias("q"))
    queries = quant.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("scale").alias("qs"),
        F.col("q").alias("qq"),
    )
    corpus = quant.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("scale").alias("cs"),
        F.col("q").alias("cq"),
    )
    int_dot = F.aggregate(
        F.zip_with("qq", "cq", lambda a, b: (a * b).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    scored = corpus.join(broadcast(queries)).select(
        "query_id",
        "neighbor_id",
        (int_dot.cast("double") * F.col("qs") * F.col("cs")).alias("approx_dot"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dot").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "approx_dot")
        .orderBy("query_id", "rank")
    )


ANN_INT8_SQL = f"""
WITH quant AS (
    SELECT vec_id, scale, list_transform(d, x -> floor(x / scale + 0.5)::BIGINT) AS q
    FROM (SELECT vec_id, {_D_SQL} AS d, {_SCALE_SQL} AS scale FROM embeddings)
)
SELECT query_id, rank, neighbor_id, approx_dot
FROM (
    SELECT qs.vec_id AS query_id, cs.vec_id AS neighbor_id,
           list_sum(list_transform(range(1, len(qs.q) + 1),
                                   i -> qs.q[i] * cs.q[i]))::DOUBLE
               * qs.scale * cs.scale AS approx_dot,
           ROW_NUMBER() OVER (
               PARTITION BY qs.vec_id
               ORDER BY list_sum(list_transform(range(1, len(qs.q) + 1),
                                                i -> qs.q[i] * cs.q[i]))::DOUBLE
                        * qs.scale * cs.scale DESC,
                        cs.vec_id) AS rank
    FROM quant qs, quant cs
    WHERE qs.vec_id < {N_QUERIES} AND cs.vec_id >= {N_QUERIES}
)
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


# --------------------------------------------------------------------------
# IVF k-means refinement (Lloyd iterations over the seeded centroids)
# --------------------------------------------------------------------------


# Fixed-point scale for the Lloyd centroid update: per-dimension values are
# quantized to round(x * SCALE) BIGINTs before summation, so the cell sum is
# an exact integer — independent of partition/summation order — and the new
# centroid dimension is the IEEE double  s / (n * SCALE), identical in Spark,
# Python, and DuckDB.  This is the `approx_distinct_users` playbook (r6):
# reformulate the unstable float reduction as an integer one so the operator
# becomes oracle-checkable.  The ~5e-7 per-dim quantization is far below the
# float32 input precision, so cell quality is unaffected.
KMEANS_FP_SCALE = 1_000_000
KMEANS_ITERATIONS = 3


def kmeans_refine(
    emb: DataFrame,
    cents: list[tuple[int, list[float]]],
    iterations: int = KMEANS_ITERATIONS,
) -> tuple[list[tuple[int, list[float]]], list[float]]:
    """Refine IVF centroids with distributed Lloyd sweeps; returns the new
    centroids and the per-iteration inertia trace (sum of 1 - cos to the
    assigned centroid — monotonically non-increasing, the convergence
    certificate).

    Each sweep: (1) map-side assignment — the same argmax-cosine expression
    the IVF query uses, no shuffle; (2) centroid update — posexplode to
    (cid, dim, value), quantize each value to a KMEANS_FP_SCALE fixed-point
    BIGINT, and SUM exactly per (cid, dim) — shuffling only K×d aggregate
    cells; (3) the tiny K×d (sum, count) result returns to the driver where
    the new centroid dimension is computed as the exact-integer division
    s / (n·SCALE) (correctly-rounded IEEE double) and becomes the next
    sweep's literal (exactly how every production distributed k-means
    syncs — the data never leaves the cluster, the centroids always do).

    The integer sum makes every sweep bit-reproducible across engines and
    partitionings, so the full refinement chain has a DuckDB oracle
    (``ANN_IVF_KMEANS_SQL``) — a float ``avg`` here would be summation-order
    dependent, which Lloyd then amplifies through knife-edge assignment
    flips (the reason this query was rows-only through r6).
    """
    trace: list[float] = []
    for _ in range(iterations):
        assigned = emb.filter(F.col("vec_id") >= N_QUERIES).select(
            "vec_id",
            "embedding",
            F.array_max(_cell_scores(cents, "embedding")).alias("best"),
        )
        inertia = assigned.agg(
            F.sum(F.lit(1.0) - F.col("best").getField("cos"))
        ).collect()[0][0]
        # SUM over an empty assignment (degenerate corpus) is NULL → 0.0
        trace.append(float(inertia) if inertia is not None else 0.0)
        stats = assigned.select(
            F.col("best").getField("cid").alias("cid"),
            F.posexplode(F.col("embedding")),
        )
        cells = (
            stats.groupBy("cid", "pos")
            .agg(
                F.sum(
                    F.floor(
                        F.col("col").cast("double") * F.lit(float(KMEANS_FP_SCALE))
                        + F.lit(0.5)
                    ).cast("bigint")
                ).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in cells:
            # exact-int Python division: correctly-rounded IEEE double,
            # bit-identical to DuckDB's s::DOUBLE / (n * SCALE)
            by_cid.setdefault(int(r.cid), {})[int(r.pos)] = r.s / (
                r.n * KMEANS_FP_SCALE
            )
        # empty cells keep their previous centroid (standard Lloyd fallback)
        cents = sorted(
            (
                cid,
                [d[p] for p in sorted(d)] if (d := by_cid.get(cid)) else vec,
            )
            for cid, vec in cents
        )
    return cents, trace


def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over k-means-refined centroids: identical plan shape to
    ``ann_ivf_topk``, better-balanced cells (lower inertia ⇒ tighter
    candidate lists at the same nprobe).

    Oracle-checkable since r7: the fixed-point Lloyd update makes every
    refinement sweep bit-reproducible, so ``ANN_IVF_KMEANS_SQL`` replays
    the full 3-sweep chain (seed → assign → integer-sum update ×3 → probe
    → re-rank) inside DuckDB and the value hashes match.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cents, _ = kmeans_refine(emb, _centroids(emb))
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.array_max(_cell_scores(cents, "embedding")).getField("cid").alias("cid"),
    )
    return _rank_probed(corpus, _probed_queries(emb, cents))


def _kmeans_oracle_sql() -> str:
    """Build the DuckDB twin of ``ann_ivf_kmeans_topk``: the seeded
    centroids, ``KMEANS_ITERATIONS`` chained Lloyd sweeps (each one an
    argmax-cosine assignment + exact fixed-point integer-sum centroid
    update — the same arithmetic ``kmeans_refine`` runs, so the refined
    centroid doubles are bit-identical), then the standard IVF probe +
    exact re-rank tail over the final centroids."""
    fp = f"{KMEANS_FP_SCALE}.0"
    parts = [
        f"WITH kk AS ({_IVF_K_SQL}),",
        # one row per dimension index (1-based, DuckDB list indexing)
        "dims AS (",
        "    SELECT UNNEST(range(1, (SELECT MAX(len(embedding)) FROM embeddings)"
        " + 1)) AS pos",
        "),",
        "cent0 AS (",
        f"    SELECT vec_id - {N_QUERIES} AS cid,"
        " list_transform(embedding, x -> x::DOUBLE) AS ce",
        "    FROM embeddings, kk",
        f"    WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES} + kk.k",
        "),",
    ]
    for i in range(1, KMEANS_ITERATIONS + 1):
        cos_ct = _cos_pair("c.embedding", "t.ce")
        parts += [
            f"assign{i} AS (",
            "    SELECT vec_id, embedding, cid FROM (",
            "        SELECT c.vec_id, c.embedding, t.cid,",
            "               ROW_NUMBER() OVER (PARTITION BY c.vec_id",
            f"                    ORDER BY {cos_ct} DESC, t.cid DESC) AS rn",
            f"        FROM embeddings c, cent{i - 1} t",
            f"        WHERE c.vec_id >= {N_QUERIES}",
            "    ) WHERE rn = 1",
            "),",
            f"sums{i} AS (",
            "    SELECT a.cid, d.pos,",
            "           SUM(CAST(floor(a.embedding[d.pos]::DOUBLE * "
            f"{fp} + 0.5) AS BIGINT)) AS s,",
            "           COUNT(*) AS n",
            f"    FROM assign{i} a, dims d",
            "    GROUP BY a.cid, d.pos",
            "),",
            f"cent{i} AS (",
            # empty cells keep the previous centroid (Lloyd fallback)
            "    SELECT p.cid, COALESCE(nc.ce, p.ce) AS ce",
            f"    FROM cent{i - 1} p LEFT JOIN (",
            f"        SELECT cid, list(s::DOUBLE / (n * {fp}) ORDER BY pos) AS ce",
            f"        FROM sums{i} GROUP BY cid",
            "    ) nc ON p.cid = nc.cid",
            "),",
        ]
    last = f"cent{KMEANS_ITERATIONS}"
    cos_ct = _cos_pair("c.embedding", "t.ce")
    cos_qt = _cos_pair("q.embedding", "t.ce")
    parts += [
        "corpus AS (",
        "    SELECT neighbor_id, embedding, cid FROM (",
        "        SELECT c.vec_id AS neighbor_id, c.embedding, t.cid,",
        "               ROW_NUMBER() OVER (PARTITION BY c.vec_id",
        f"                    ORDER BY {cos_ct} DESC, t.cid DESC) AS rn",
        f"        FROM embeddings c, {last} t",
        f"        WHERE c.vec_id >= {N_QUERIES}",
        "    ) WHERE rn = 1",
        "),",
        "probes AS (",
        "    SELECT query_id, qe, cid FROM (",
        "        SELECT q.vec_id AS query_id, q.embedding AS qe, t.cid,",
        "               ROW_NUMBER() OVER (PARTITION BY q.vec_id",
        f"                    ORDER BY {cos_qt} DESC, t.cid DESC) AS rn",
        f"        FROM embeddings q, {last} t",
        f"        WHERE q.vec_id < {N_QUERIES}",
        "    ) WHERE rn <= {nprobe}".format(nprobe=NPROBE),
        ")",
        "SELECT query_id, rank, neighbor_id, cid, cos_sim",
        "FROM (",
        "    SELECT p.query_id, c.neighbor_id, c.cid,",
        f"           {_COS_PC} AS cos_sim,",
        "           ROW_NUMBER() OVER (PARTITION BY p.query_id",
        f"                ORDER BY {_COS_PC} DESC, c.neighbor_id) AS rank",
        "    FROM probes p JOIN corpus c ON p.cid = c.cid",
        ")",
        f"WHERE rank <= {TOP_K}",
        "ORDER BY query_id, rank",
    ]
    return "\n".join(parts)


ANN_IVF_KMEANS_SQL = _kmeans_oracle_sql()


# --------------------------------------------------------------------------
# SemDeDup: semantic dedup via cluster-blocked cosine (Abbas et al. 2023)
# --------------------------------------------------------------------------

SEMDEDUP_THRESHOLD = 0.4  # cosine above which two embeddings are "same meaning"


def semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup over the embedding corpus: assign every vector to its
    nearest centroid cell (the IVF coarse quantizer — map-side argmax, no
    shuffle), then within each cell drop any vector that has a
    higher-similarity-than-threshold neighbor with a smaller id.

    This is the SemDeDup recipe: the clustering bounds the quadratic
    cosine check to within-cell pairs (|cell| ≈ corpus/K), which is what
    makes semantic dedup feasible at 100 TB — the cell equi-self-join
    shuffles on the cell key only, never corpus × corpus.  Output is every
    corpus vector with its cell, a ``keep`` verdict, and the dominating
    duplicate (NULL when kept) — audit-friendly, like the Gopher filter.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _centroids(emb)
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        "vec_id",
        F.col("embedding").alias("ce"),
        F.array_max(_cell_scores(cents, "embedding")).getField("cid").alias("cid"),
    )
    a, b = corpus.alias("a"), corpus.alias("b")
    dominated = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("b.vec_id") < F.col("a.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("dup_id"),
            cosine(F.col("a.ce"), F.col("b.ce")).alias("sim"),
        )
        .filter(F.col("sim") >= SEMDEDUP_THRESHOLD)
        .groupBy("vec_id")
        .agg(F.min("dup_id").alias("dup_of"))
    )
    return (
        corpus.join(dominated, "vec_id", "left")
        .select(
            "vec_id",
            "cid",
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
        )
        .orderBy("vec_id")
    )


_COS_AB = _cos_pair("a.embedding", "b.embedding")

SEMDEDUP_SQL = f"""
WITH kk AS ({_IVF_K_SQL}),
cent AS (
    SELECT vec_id - {N_QUERIES} AS cid, embedding FROM embeddings, kk
    WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES} + kk.k
),
corpus AS (
    SELECT vec_id, embedding, cid FROM (
        SELECT c.vec_id, c.embedding, t.cid,
               ROW_NUMBER() OVER (PARTITION BY c.vec_id
                    ORDER BY {_COS_CT} DESC, t.cid DESC) AS rn
        FROM embeddings c, cent t
        WHERE c.vec_id >= {N_QUERIES}
    ) WHERE rn = 1
),
dominated AS (
    SELECT a.vec_id, MIN(b.vec_id) AS dup_of
    FROM corpus a JOIN corpus b
      ON a.cid = b.cid AND b.vec_id < a.vec_id
    WHERE {_COS_AB} >= {SEMDEDUP_THRESHOLD}
    GROUP BY a.vec_id
)
SELECT c.vec_id, c.cid, d.dup_of IS NULL AS keep, d.dup_of
FROM corpus c LEFT JOIN dominated d ON c.vec_id = d.vec_id
ORDER BY c.vec_id
"""


# --------------------------------------------------------------------------
# Matryoshka two-stage ANN: truncated-dim coarse scoring + full re-rank
# --------------------------------------------------------------------------

MRL_DIM = 16        # coarse stage scores on the first 16 of 64 dims
MRL_SHORTLIST = 20  # coarse candidates per query fed to the exact stage


def ann_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval in the Matryoshka style (Kusupati et al. 2022):
    score every corpus vector on a PREFIX of the embedding (MRL_DIM dims —
    4x less arithmetic and memory traffic), keep a per-query shortlist,
    then re-rank only the shortlist with the full-dimension cosine.

    Scale shape: the coarse pass is the same broadcast nested-loop as
    brute force but on a 4x narrower fold — at 100 TB this is the memory-
    bandwidth-bound stage and prefix scoring is a direct 4x wall-clock cut;
    the exact stage touches |queries| x SHORTLIST rows only.  Recall loss
    is bounded by how much mass the prefix carries (the Matryoshka training
    objective's whole point; with generic embeddings it is a tunable
    recall/cost knob).
    """
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    trunc = lambda c: F.slice(F.col(c), 1, MRL_DIM)  # noqa: E731
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        trunc("embedding").alias("qe_t"),
    )
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        trunc("embedding").alias("ce_t"),
    )
    coarse = corpus.join(broadcast(queries), how="cross").select(
        "query_id", "neighbor_id", "qe", "ce",
        cosine("qe_t", "ce_t").alias("coarse_sim"),
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("coarse_sim").desc(), F.col("neighbor_id")
    )
    shortlist = coarse.withColumn("crank", F.row_number().over(wc)).filter(
        F.col("crank") <= MRL_SHORTLIST
    )
    we = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        shortlist.select(
            "query_id", "neighbor_id", cosine("qe", "ce").alias("cos_sim")
        )
        .withColumn("rank", F.row_number().over(we))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"))
        .orderBy("query_id", "rank")
    )


_COS_QC_T = _cos_pair(
    f"list_slice(q.embedding, 1, {MRL_DIM})", f"list_slice(c.embedding, 1, {MRL_DIM})"
)
ANN_MATRYOSHKA_SQL = f"""
WITH coarse AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           q.embedding AS qe, c.embedding AS ce,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                ORDER BY {_COS_QC_T} DESC, c.vec_id) AS crank
    FROM embeddings q, embeddings c
    WHERE q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
),
exact AS (
    SELECT query_id, neighbor_id,
           {_cos_pair("qe", "ce")} AS cos_sim
    FROM coarse WHERE crank <= {MRL_SHORTLIST}
)
SELECT query_id, rank, neighbor_id, ROUND(cos_sim, 6) AS cos_sim
FROM (
    SELECT query_id, neighbor_id, cos_sim,
           ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cos_sim DESC, neighbor_id) AS rank
    FROM exact
)
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


# --------------------------------------------------------------------------
# k-NN label vote: classify query vectors by their neighbors' majority label
# --------------------------------------------------------------------------


def knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification over the embedding corpus: each query vector
    takes the majority ``label`` among its TOP_K exact-cosine neighbors
    (ties → smaller label) — the standard label-propagation/auto-labeling
    primitive of a training-data pipeline (e.g. quality-tier transfer from
    a labeled seed set to new data).

    Reuses the brute-force top-k plan (broadcast queries, one tiny rank
    shuffle) and adds one aggregation over k·|queries| rows — negligible
    at any scale; swap in the IVF candidate generator for 100 TB corpora
    (identical voting tail).
    """
    from pyspark.sql.window import Window

    topk = ann_bruteforce_topk(spark, sf_dir)
    votes = topk.groupBy("query_id", "label").agg(
        F.count(F.lit(1)).alias("n_votes"),
        F.max("cos_sim").alias("best_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("label").asc()
    )
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.col("label").alias("pred_label"),
            "n_votes",
            F.round("best_sim", 6).alias("best_sim"),
        )
        .orderBy("query_id")
    )


KNN_LABEL_VOTE_SQL = f"""
WITH topk AS ({ANN_BRUTEFORCE_SQL.replace(';', '')}),
votes AS (
    SELECT query_id, label, COUNT(*) AS n_votes, MAX(cos_sim) AS best_sim
    FROM topk GROUP BY query_id, label
)
SELECT query_id, label AS pred_label, n_votes, ROUND(best_sim, 6) AS best_sim
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY n_votes DESC, label ASC) AS rn
    FROM votes
)
WHERE rn = 1
ORDER BY query_id
"""


# --------------------------------------------------------------------------
# Contrastive pair mining: nearest positive + hardest negative per query
# --------------------------------------------------------------------------


def contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mine (anchor, positive, hard-negative) training triplets: for each
    query vector, the most-similar corpus vector sharing its ``label``
    (positive) and the most-similar one with a different label (the hard
    negative) — the batch-mining step behind contrastive/embedding-model
    training (InfoNCE, triplet loss).

    One broadcast score pass (the brute-force plan) feeds two windowed
    picks partitioned by (query, same-label flag); the shuffle carries
    only query-keyed score rows.  At corpus scale the scorer swaps for
    the IVF candidate generator — the mining tail is unchanged.
    """
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("query_label"),
    )
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.col("label").alias("n_label"),
    )
    scored = corpus.join(broadcast(queries)).select(
        "query_id",
        "query_label",
        "neighbor_id",
        (F.col("n_label") == F.col("query_label")).alias("same"),
        cosine("qe", "ce").alias("cos_sim"),
    )
    w = Window.partitionBy("query_id", "same").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    best = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    pos = best.filter(F.col("same")).select(
        "query_id",
        "query_label",
        F.col("neighbor_id").alias("pos_id"),
        F.round("cos_sim", 6).alias("pos_sim"),
    )
    neg = best.filter(~F.col("same")).select(
        "query_id",
        F.col("neighbor_id").alias("neg_id"),
        F.round("cos_sim", 6).alias("neg_sim"),
    )
    return pos.join(neg, "query_id").orderBy("query_id")


CONTRASTIVE_SQL = f"""
WITH scored AS (
    SELECT q.vec_id AS query_id, q.label AS query_label,
           c.vec_id AS neighbor_id, c.label = q.label AS same,
           {_COS} AS cos_sim
    FROM embeddings q, embeddings c
    WHERE q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
), best AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id, same
                  ORDER BY cos_sim DESC, neighbor_id) AS rn
    FROM scored
)
SELECT p.query_id, p.query_label,
       p.neighbor_id AS pos_id, ROUND(p.cos_sim, 6) AS pos_sim,
       n.neighbor_id AS neg_id, ROUND(n.cos_sim, 6) AS neg_sim
FROM best p JOIN best n ON p.query_id = n.query_id
WHERE p.rn = 1 AND p.same AND n.rn = 1 AND NOT n.same
ORDER BY p.query_id
"""


# --------------------------------------------------------------------------
# ANN recall audit: how much of the exact top-k does the IVF probe recover?
# --------------------------------------------------------------------------


def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@k of IVF ANN against the exact brute-force top-k —
    the similarity-family analog of :func:`dedup.dedup_lsh_recall`.

    This is the number a production ANN deployment monitors when tuning
    (K cells, NPROBE): recall drops → probes miss the true neighbors'
    cells; raise NPROBE or retrain centroids.  Both inputs are top-k
    RESULT sets (N_QUERIES × TOP_K rows — tiny regardless of corpus
    size), so the audit itself adds only a broadcast-scale join; the cost
    is the two ANN queries it reuses, which carry their own 100 TB story.
    """
    brute = ann_bruteforce_topk(spark, sf_dir).select("query_id", "neighbor_id")
    ivf = ann_ivf_topk(spark, sf_dir).select("query_id", "neighbor_id")
    hits = (
        brute.join(ivf, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        brute.select("query_id").distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
            F.round(
                F.coalesce(F.col("n_overlap"), F.lit(0)).cast("double") / TOP_K, 6
            ).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


ANN_RECALL_SQL = f"""
WITH brute AS ({ANN_BRUTEFORCE_SQL}),
ivf AS ({ANN_IVF_SQL}),
hits AS (
    SELECT b.query_id, COUNT(*) AS n_overlap
    FROM brute b JOIN ivf i
      ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
    GROUP BY 1
)
SELECT q.query_id,
       COALESCE(h.n_overlap, 0) AS n_overlap,
       ROUND(COALESCE(h.n_overlap, 0) * 1.0 / {TOP_K}, 6) AS recall_at_k
FROM (SELECT DISTINCT query_id FROM brute) q
LEFT JOIN hits h USING (query_id)
ORDER BY query_id
"""


# --------------------------------------------------------------------------
# Product quantization (PQ): subspace codes + ADC scan
# --------------------------------------------------------------------------

PQ_M = 16           # subspaces per vector (4 dims each at DIM=64)
PQ_KSUB = 16        # codes per subspace (4-bit)
PQ_SD = DIM // PQ_M  # dims per subspace


def _pq_codebooks(emb: DataFrame) -> list[list[list[float]]]:
    """Deterministic PQ codebooks: the first PQ_KSUB corpus vectors, sliced
    into PQ_M subspaces — ``codebooks[s][j]`` is seed vector j's s-th slice.

    Same seed-pick discipline as the IVF centroids (deterministic so the
    DuckDB oracle rebuilds the identical index); a production index would
    k-means each subspace, which changes the code VALUES but nothing about
    the plan.  Tiny (M×KSUB×SD = one vector's worth of floats per code),
    safe to collect and inline as literals.
    """
    rows = (
        emb.filter(
            (F.col("vec_id") >= N_QUERIES)
            & (F.col("vec_id") < N_QUERIES + PQ_KSUB)
        )
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = [
        [float(x) for x in r.embedding]
        for r in sorted(rows, key=lambda r: int(r.vec_id))
    ]
    if len(vecs) > PQ_KSUB:
        # the seed window is a half-open vec_id range of width PQ_KSUB, so
        # more rows than that means duplicate vec_ids (corrupt input) —
        # raise rather than silently emit an oversized codebook (r7 ADVICE)
        raise ValueError(
            f"PQ seed window returned {len(vecs)} vectors for "
            f"{PQ_KSUB} distinct vec_ids — duplicate vec_ids in source"
        )
    if len(vecs) < PQ_KSUB:
        # degenerate corpus (fewer corpus vectors than the seed window —
        # in practice empty/one-row inputs): pad with the deterministic
        # dummy so plan construction survives.  Duplicate codes are
        # harmless (argmin ties break toward the smaller code) and the
        # oracle never runs at corpora this small; at every oracle scale
        # the window is full and the codebooks are exactly the seed pick.
        vecs = vecs + [_dummy_vec()] * (PQ_KSUB - len(vecs))
    return [
        [v[s * PQ_SD:(s + 1) * PQ_SD] for v in vecs] for s in range(PQ_M)
    ]


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed ANN: encode the corpus to M×4-bit codes, rank every
    query against the RECONSTRUCTED vectors (asymmetric distance, ADC).

    This is the memory-bound scale path the IVF/LSH family lacks: at 100 TB
    the raw float32 corpus (d=64 → 256 B/vector) shrinks to M=4 bytes of
    codes + a broadcast codebook, so the ADC scan reads 64× less than
    brute force while remaining exhaustive (recall loss comes only from
    quantization error, not candidate pruning — composable with IVF cells
    for the classic IVF-PQ).  Plan shape: encoding is a map-side argmin
    against codebook LITERALS (zero shuffle, same trick as the IVF cell
    assignment); the ADC scan is broadcast-queries × corpus with the rank
    window as the only shuffle.

    Code assignment minimizes true per-subspace L2², folded as
    ``‖c‖² − 2·x·c`` (the ‖x‖² term is constant per (vector, subspace) and
    cannot move the argmin) — ‖c‖² is precomputed driver-side with the
    engines' exact index-order double arithmetic, so the oracle's
    ``list_dot_product`` replays it bit-for-bit.  Ties break toward the
    smaller code, both engines.

    Expression-size discipline (the `_cell_scores` lesson): the whole
    M-subspace encoding is ONE nested transform over a single 3-level
    codebook literal — M separate per-subspace argmin trees made plan
    compile time scale with M (~3 s fixed at M=16), where the data math
    itself is microseconds; one opaque literal makes compile time
    independent of M.
    """
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    cbs = _pq_codebooks(emb)
    cc = _pq_cc(cbs)
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        _pq_codes_expr(cbs, cc).alias("codes"),
    )
    recon = corpus.select(
        "neighbor_id",
        F.array_join(
            F.transform(F.col("codes"), lambda c: c.cast("string")), "-"
        ).alias("pq_code"),
        _pq_recon_expr(cbs).alias("recon"),
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    scored = recon.join(broadcast(queries)).select(
        "query_id",
        "neighbor_id",
        "pq_code",
        cosine("qe", "recon").alias("adc_cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "pq_code", "adc_cos")
        .orderBy("query_id", "rank")
    )


_PQ_XS = f"list_slice(x.embedding, cb.s * {PQ_SD} + 1, cb.s * {PQ_SD} + {PQ_SD})"
_PQ_DIST = (
    f"(list_dot_product(cb.c::DOUBLE[], cb.c::DOUBLE[])"
    f" - 2.0 * list_dot_product(({_PQ_XS})::DOUBLE[], cb.c::DOUBLE[]))"
)
_PQ_ADC = (
    "(list_dot_product(q.embedding::DOUBLE[], r.recon)"
    " / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(r.recon, r.recon))))"
)

ANN_PQ_SQL = f"""
WITH cb AS (
    SELECT s.range AS s, e.vec_id - {N_QUERIES} AS j,
           list_slice(e.embedding, s.range * {PQ_SD} + 1,
                      s.range * {PQ_SD} + {PQ_SD}) AS c
    FROM embeddings e, range({PQ_M}) s
    WHERE e.vec_id >= {N_QUERIES} AND e.vec_id < {N_QUERIES} + {PQ_KSUB}
),
codes AS (
    SELECT vec_id, s, j AS code FROM (
        SELECT x.vec_id, cb.s, cb.j,
               ROW_NUMBER() OVER (PARTITION BY x.vec_id, cb.s
                    ORDER BY {_PQ_DIST} ASC, cb.j ASC) AS rn
        FROM embeddings x, cb
        WHERE x.vec_id >= {N_QUERIES}
    ) WHERE rn = 1
),
recon AS (
    SELECT codes.vec_id,
           string_agg(codes.code::VARCHAR, '-' ORDER BY codes.s) AS pq_code,
           flatten(list(cb.c::DOUBLE[] ORDER BY codes.s)) AS recon
    FROM codes JOIN cb ON cb.s = codes.s AND cb.j = codes.code
    GROUP BY codes.vec_id
)
SELECT query_id, rank, neighbor_id, pq_code, adc_cos
FROM (
    SELECT q.vec_id AS query_id, r.vec_id AS neighbor_id, r.pq_code,
           {_PQ_ADC} AS adc_cos,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                ORDER BY {_PQ_ADC} DESC, r.vec_id) AS rank
    FROM embeddings q, recon r
    WHERE q.vec_id < {N_QUERIES}
)
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


def ann_pq_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`ann_pq_topk` with encode + ADC vectorized through Arrow →
    NumPy (``mapInPandas``) — the PQ family's throughput form.

    The interpreted-HOF constant dominates the fold-based PQ path (M·KSUB
    subspace distances + reconstruction + per-query ADC cosine per row,
    all as interpreted lambdas — the sf1 smoke's 65 s).  Here each Arrow
    batch computes codes via one ``einsum`` (distances to every codebook
    entry), reconstructs via fancy indexing, and ADCs all queries with one
    matmul.  Same argmin rule (d = ‖c‖² − 2·x·c, ties to the SMALLER code
    — NumPy argmin's first-occurrence rule) and the same oracle; BLAS
    summation differs from the fold by ulp, absorbed by the oracle's 6-dp
    canonicalization and essentially never able to flip an argmin (code
    distances on distinct entries differ at ~1e-2).
    """
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    cbs = _pq_codebooks(emb)
    qrows = sorted(
        emb.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding").collect(),
        key=lambda r: int(r.vec_id),
    )
    qids = [int(r.vec_id) for r in qrows]
    qmat = [[float(x) for x in r.embedding] for r in qrows]

    def score(batches):
        import numpy as np
        import pandas as pd

        if not qmat:  # degenerate corpus: no query vectors -> no output
            return
        CB = np.asarray(cbs, dtype=np.float64)          # M × KSUB × SD
        cc = (CB * CB).sum(axis=-1)                      # M × KSUB
        Q = np.asarray(qmat, dtype=np.float64)
        qn = np.sqrt((Q * Q).sum(axis=1))
        ids = np.asarray(qids, dtype=np.int64)
        m = CB.shape[0]
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.asarray(
                [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
            )
            n = len(pdf)
            X = E.reshape(n, m, -1)                      # n × M × SD
            dots = np.einsum("nms,mks->nmk", X, CB)      # n × M × KSUB
            codes = (cc[None, :, :] - 2.0 * dots).argmin(axis=-1)  # n × M
            recon = CB[np.arange(m)[None, :], codes].reshape(n, -1)
            rn = np.sqrt((recon * recon).sum(axis=1))
            adc = (recon @ Q.T) / np.outer(rn, qn)       # n × |Q|
            pq_code = np.array(["-".join(map(str, row)) for row in codes])
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids.reshape(1, -1), n, axis=0).ravel(),
                    "neighbor_id": np.repeat(
                        pdf["neighbor_id"].to_numpy(np.int64), len(ids)
                    ),
                    "pq_code": np.repeat(pq_code, len(ids)),
                    "adc_cos": adc.ravel(),
                }
            )

    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), "embedding"
    )
    scored = corpus.mapInPandas(
        score, "query_id bigint, neighbor_id bigint, pq_code string, adc_cos double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "pq_code", "adc_cos")
        .orderBy("query_id", "rank")
    )


# --------------------------------------------------------------------------
# IVF-PQ: cell-pruned candidate generation + PQ-compressed ADC re-rank
# --------------------------------------------------------------------------


def _pq_cc(cbs: list[list[list[float]]]) -> list[list[float]]:
    """‖c‖² per (s, j) with the engines' exact index-order double fold."""
    out = []
    for sub in cbs:
        row = []
        for vec in sub:
            acc = 0.0
            for v in vec:
                acc += v * v
            row.append(acc)
        out.append(row)
    return out


def _pq_codes_expr(cbs, cc) -> "F.Column":
    """array<int> of per-subspace PQ codes for the ``embedding`` column —
    one nested transform over a single 3-level codebook literal (see
    :func:`ann_pq_topk` for the expression-size rationale)."""
    cb3 = lit_doubles(cbs)
    cc2 = lit_doubles(cc)
    return F.transform(
        cb3,
        lambda cb_s, s: F.array_min(
            F.transform(
                cb_s,
                lambda c, j: F.struct(
                    (
                        F.element_at(F.element_at(cc2, s + F.lit(1)), j + F.lit(1))
                        - F.lit(2.0)
                        * dot(
                            F.slice(
                                "embedding", s * F.lit(PQ_SD) + F.lit(1), F.lit(PQ_SD)
                            ),
                            c,
                        )
                    ).alias("d"),
                    j.cast("int").alias("j"),
                ),
            )
        ).getField("j"),
    )


def _pq_recon_expr(cbs) -> "F.Column":
    """Reconstructed (decoded) vector from a ``codes`` array column."""
    cb3 = lit_doubles(cbs)
    return F.flatten(
        F.transform(
            F.col("codes"),
            lambda c, s: F.element_at(F.element_at(cb3, s + F.lit(1)), c + F.lit(1)),
        )
    )


def _pq_corpus_arrow(
    emb: DataFrame, cents, cbs, extra_cols: dict | None = None
) -> DataFrame:
    """Arrow-vectorized IVF-PQ corpus stage: per batch, one matmul for
    cell assignment (last-argmax tie rule), one einsum for PQ codes
    (first-argmin tie rule), reconstruction by fancy indexing — the
    combined form of the ``ann_ivf_arrow`` and ``ann_pq_arrow`` encoders
    used by the composed IVF-PQ queries.  ``recon`` values are codebook
    rows COPIED (no arithmetic), so downstream ADC folds see bit-identical
    inputs to the literal-expression path; only the discrete argmax/argmin
    carry the empirical-ulp caveat documented on the single-stage forms.

    ``extra_cols``: {source_col: output_name} passthrough (e.g. label).
    """
    extra = dict(extra_cols or {})
    cmat = [vec for _, vec in cents]

    def encode(batches):
        import numpy as np
        import pandas as pd

        C = np.asarray(cmat, dtype=np.float64)
        cn = np.sqrt((C * C).sum(axis=1))
        k = C.shape[0]
        CB = np.asarray(cbs, dtype=np.float64)
        cc = (CB * CB).sum(axis=-1)
        m = CB.shape[0]
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.asarray(
                [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
            )
            n = len(pdf)
            en = np.sqrt((E * E).sum(axis=1))
            cos = (E @ C.T) / np.outer(en, cn)
            cid = (k - 1 - np.argmax(cos[:, ::-1], axis=1)).astype(np.int32)
            X = E.reshape(n, m, -1)
            dots = np.einsum("nms,mks->nmk", X, CB)
            codes = (cc[None, :, :] - 2.0 * dots).argmin(axis=-1)
            recon = CB[np.arange(m)[None, :], codes].reshape(n, -1)
            out = pd.DataFrame(
                {
                    "neighbor_id": pdf["neighbor_id"].to_numpy(np.int64),
                    "cid": cid,
                    "pq_code": ["-".join(map(str, row)) for row in codes],
                }
            )
            out["recon"] = list(recon)
            for name in extra.values():
                out[name] = pdf[name]
            yield out[["neighbor_id", "cid", "pq_code", "recon", *extra.values()]]

    extra_schema = "".join(f", {v} int" for v in extra.values())
    src = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        "embedding",
        *[F.col(s).alias(d) for s, d in extra.items()],
    )
    return src.mapInPandas(
        encode,
        "neighbor_id bigint, cid int, pq_code string, recon array<double>"
        + extra_schema,
    )


def ann_ivfpq_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`ann_ivfpq_topk` with the corpus stage vectorized via
    :func:`_pq_corpus_arrow` — the throughput form of the production
    IVF-PQ composition (same oracle; probe + ADC-rank tail unchanged,
    and the ADC fold reads bit-identical recon values)."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    cents = _centroids(emb)
    cbs = _pq_codebooks(emb)
    recon = _pq_corpus_arrow(emb, cents, cbs)
    scored = recon.join(broadcast(_probed_queries(emb, cents)), "cid").select(
        "query_id",
        "neighbor_id",
        "cid",
        "pq_code",
        cosine("qe", "recon").alias("adc_cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "cid", "pq_code", "adc_cos")
        .orderBy("query_id", "rank")
    )


def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: the production ANN shape — IVF cells prune candidates
    (read |corpus|·nprobe/K instead of everything), PQ codes compress what
    is read (8-byte codes instead of 256-byte floats), ADC ranks inside
    the probed cells.  FAISS's default large-corpus index is exactly this
    composition; at 100 TB it is the only family whose scan cost is
    sub-linear in BOTH rows and bytes.

    Pure reuse of the two audited pieces: cell assignment and probing from
    the IVF path (centroid literals, map-side argmax), encoding from the
    PQ path (codebook literal, map-side argmin) — so the corpus scan stays
    shuffle-free until the cell equi-join, and the only other exchange is
    the per-query rank window.  The oracle replays both constructions and
    their composition exactly.
    """
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    cents = _centroids(emb)
    cbs = _pq_codebooks(emb)
    cc = _pq_cc(cbs)
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.array_max(_cell_scores(cents, "embedding")).getField("cid").alias("cid"),
        _pq_codes_expr(cbs, cc).alias("codes"),
    )
    recon = corpus.select(
        "neighbor_id",
        "cid",
        F.array_join(
            F.transform(F.col("codes"), lambda c: c.cast("string")), "-"
        ).alias("pq_code"),
        _pq_recon_expr(cbs).alias("recon"),
    )
    scored = recon.join(broadcast(_probed_queries(emb, cents)), "cid").select(
        "query_id",
        "neighbor_id",
        "cid",
        "pq_code",
        cosine("qe", "recon").alias("adc_cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "cid", "pq_code", "adc_cos")
        .orderBy("query_id", "rank")
    )


_ADC_PR = (
    "(list_dot_product(p.qe::DOUBLE[], r.recon)"
    " / (sqrt(list_dot_product(p.qe::DOUBLE[], p.qe::DOUBLE[]))"
    " * sqrt(list_dot_product(r.recon, r.recon))))"
)

ANN_IVFPQ_SQL = f"""
WITH kk AS ({_IVF_K_SQL}),
cent AS (
    SELECT vec_id - {N_QUERIES} AS cid, embedding FROM embeddings, kk
    WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES} + kk.k
),
cell AS (
    SELECT neighbor_id, cid FROM (
        SELECT c.vec_id AS neighbor_id, t.cid,
               ROW_NUMBER() OVER (PARTITION BY c.vec_id
                    ORDER BY {_COS_CT} DESC, t.cid DESC) AS rn
        FROM embeddings c, cent t
        WHERE c.vec_id >= {N_QUERIES}
    ) WHERE rn = 1
),
cb AS (
    SELECT s.range AS s, e.vec_id - {N_QUERIES} AS j,
           list_slice(e.embedding, s.range * {PQ_SD} + 1,
                      s.range * {PQ_SD} + {PQ_SD}) AS c
    FROM embeddings e, range({PQ_M}) s
    WHERE e.vec_id >= {N_QUERIES} AND e.vec_id < {N_QUERIES} + {PQ_KSUB}
),
codes AS (
    SELECT vec_id, s, j AS code FROM (
        SELECT x.vec_id, cb.s, cb.j,
               ROW_NUMBER() OVER (PARTITION BY x.vec_id, cb.s
                    ORDER BY {_PQ_DIST} ASC, cb.j ASC) AS rn
        FROM embeddings x, cb
        WHERE x.vec_id >= {N_QUERIES}
    ) WHERE rn = 1
),
recon AS (
    SELECT codes.vec_id, cell.cid,
           string_agg(codes.code::VARCHAR, '-' ORDER BY codes.s) AS pq_code,
           flatten(list(cb.c::DOUBLE[] ORDER BY codes.s)) AS recon
    FROM codes
    JOIN cb ON cb.s = codes.s AND cb.j = codes.code
    JOIN cell ON cell.neighbor_id = codes.vec_id
    GROUP BY codes.vec_id, cell.cid
),
probes AS (
    SELECT query_id, qe, cid FROM (
        SELECT q.vec_id AS query_id, q.embedding AS qe, t.cid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                    ORDER BY {_COS_QT} DESC, t.cid DESC) AS rn
        FROM embeddings q, cent t
        WHERE q.vec_id < {N_QUERIES}
    ) WHERE rn <= {NPROBE}
)
SELECT query_id, rank, neighbor_id, cid, pq_code, adc_cos
FROM (
    SELECT p.query_id, r.vec_id AS neighbor_id, p.cid, r.pq_code,
           {_ADC_PR} AS adc_cos,
           ROW_NUMBER() OVER (PARTITION BY p.query_id
                ORDER BY {_ADC_PR} DESC, r.vec_id) AS rank
    FROM probes p JOIN recon r ON p.cid = r.cid
)
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


# --------------------------------------------------------------------------
# Coreset selection: k-center greedy (Gonzalez) over the embedding corpus
# --------------------------------------------------------------------------

KCENTER_K = 8


def coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset over cosine distance: start from the lowest
    vec_id, then repeatedly add the point FARTHEST from every chosen
    center — the 2-approximation (Gonzalez 1985) behind embedding-based
    data selection ("pick the k most mutually-diverse examples"), and the
    seeding half of k-center/k-means++ style pipelines.

    Iterative driver-synced loop in the BPE/k-means discipline: each of
    the k rounds is ONE map-side aggregate (argmax of running min-distance,
    ties to the smaller id) collecting a single row; the chosen vectors
    re-enter the plan as literals, so the corpus never shuffles at all —
    k scans, zero exchanges.  ``radius`` is the selected point's distance
    to the previous centers (the coverage radius the pick improves); it
    decreases monotonically, pinned in tests.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select("vec_id", "embedding")
    seed = corpus.orderBy("vec_id").limit(1).collect()
    if not seed:
        # degenerate corpus: no points to cover → empty coreset, same schema
        return spark.createDataFrame(
            [], "center_rank int, center_id bigint, radius double"
        )
    first = seed[0]
    centers = [(int(first.vec_id), [float(x) for x in first.embedding])]
    picks = [(1, centers[0][0], None)]
    for _ in range(KCENTER_K - 1):
        mind = None
        for _, cvec in centers:
            dcol = F.lit(1.0) - cosine("embedding", lit_doubles(cvec))
            mind = dcol if mind is None else F.least(mind, dcol)
        top = (
            corpus.select("vec_id", mind.alias("d"))
            .orderBy(F.col("d").desc(), "vec_id")
            .limit(1)
            .collect()[0]
        )
        row = (
            corpus.filter(F.col("vec_id") == int(top.vec_id))
            .select("embedding")
            .collect()[0]
        )
        centers.append((int(top.vec_id), [float(x) for x in row.embedding]))
        picks.append((len(centers), int(top.vec_id), float(top.d)))
    return spark.createDataFrame(
        [
            (rank, cid, round(r, 6) if r is not None else None)
            for rank, cid, r in picks
        ],
        "center_rank int, center_id bigint, radius double",
    ).orderBy("center_rank")


def _kcenter_ctes() -> str:
    """Chained CTEs replaying the identical greedy in DuckDB."""
    cos = (
        "(list_dot_product(x.embedding::DOUBLE[], c{i}.embedding::DOUBLE[])"
        " / (sqrt(list_dot_product(x.embedding::DOUBLE[], x.embedding::DOUBLE[]))"
        " * sqrt(list_dot_product(c{i}.embedding::DOUBLE[], c{i}.embedding::DOUBLE[]))))"
    )
    parts = [
        f"corpus AS (SELECT vec_id, embedding FROM embeddings"
        f" WHERE vec_id >= {N_QUERIES})",
        "c1 AS (SELECT vec_id, embedding FROM corpus ORDER BY vec_id LIMIT 1)",
    ]
    for t in range(2, KCENTER_K + 1):
        dist_terms = ", ".join(
            f"(1.0 - {cos.format(i=i)})" for i in range(1, t)
        )
        joins = " ".join(f"CROSS JOIN c{i}" for i in range(1, t))
        parts.append(
            f"d{t} AS (SELECT x.vec_id, LEAST({dist_terms}) AS d"
            f" FROM corpus x {joins})"
        )
        parts.append(
            f"c{t} AS (SELECT c.vec_id, c.embedding, d.d FROM corpus c"
            f" JOIN (SELECT vec_id, d FROM d{t} ORDER BY d DESC, vec_id"
            f" LIMIT 1) d ON c.vec_id = d.vec_id)"
        )
    return ",\n".join(parts)


CORESET_KCENTER_SQL = (
    "WITH " + _kcenter_ctes() + "\n"
    "SELECT * FROM (\n"
    "    SELECT 1 AS center_rank, vec_id AS center_id,"
    " CAST(NULL AS DOUBLE) AS radius FROM c1\n"
    + "".join(
        f"    UNION ALL SELECT {t}, vec_id, ROUND(d, 6) FROM c{t}\n"
        for t in range(2, KCENTER_K + 1)
    )
    + ")\nORDER BY center_rank"
)


# --------------------------------------------------------------------------
# Hard-negative mining (contrastive training's other data op)
# --------------------------------------------------------------------------

HARDNEG_K = 3


def hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k hard negatives per query: the most-similar corpus vectors
    with a DIFFERENT label — the mining step contrastive training feeds on
    (near-misses teach the margin; random negatives are too easy to carry
    gradient).  ``contrastive_pairs`` (curation) builds the positives;
    this is the negatives side.

    SCALE REDIRECT: this brute form scores the FULL corpus per query —
    it exists as the oracle-parity reference.  At scale use
    :func:`hard_negatives_ivfpq` (probe → PQ-ADC shortlist with the label
    predicate applied before ranking → exact re-rank of a fixed
    shortlist), whose per-query cost is independent of corpus size —
    exactly as ``dedup_embedding_cosine`` redirects to its cells form.

    Same plan shape as brute-force ANN (broadcast queries, map-side
    cosine, per-query rank) plus one label-inequality predicate pushed
    into the join — the label filter prunes BEFORE the rank, so k hard
    negatives survive per query no matter how label-skewed the
    neighborhood.
    """
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("q_label"),
    )
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neg_id"), F.col("embedding").alias("ce"),
        F.col("label").alias("n_label"),
    )
    scored = (
        corpus.join(broadcast(queries), F.col("n_label") != F.col("q_label"))
        .select("query_id", "q_label", "neg_id", "n_label",
                cosine("qe", "ce").alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neg_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= HARDNEG_K)
        .select("query_id", "q_label", "rank", "neg_id", "n_label", "cos_sim")
        .orderBy("query_id", "rank")
    )


HARD_NEGATIVES_SQL = f"""
SELECT query_id, q_label, rank, neg_id, n_label, cos_sim
FROM (
    SELECT q.vec_id AS query_id, q.label AS q_label,
           c.vec_id AS neg_id, c.label AS n_label,
           {_COS} AS cos_sim,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                ORDER BY {_COS} DESC, c.vec_id) AS rank
    FROM embeddings q, embeddings c
    WHERE q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
      AND c.label <> q.label
)
WHERE rank <= {HARDNEG_K}
ORDER BY query_id, rank
"""


HARDNEG_SHORTLIST = 4 * HARDNEG_K  # ADC candidates per query before exact re-rank


def hard_negatives_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`hard_negatives` with the IVF-PQ scale path instead of the
    brute cross product: probe the query's NPROBE nearest cells, shortlist
    by PQ asymmetric distance WITH the label-inequality predicate applied
    before ranking, then exact-cosine re-rank only the shortlist against
    the TRUE embeddings.

    This is the composition the brute miner's docstring promises: at 100 TB
    the candidate scan touches |corpus|·nprobe/K PQ codes (4 bits/subspace)
    rather than every float vector, and the exact re-rank reads
    HARDNEG_SHORTLIST true vectors per query — cost independent of corpus
    size.  The label predicate prunes BEFORE both ranks, so k hard
    negatives survive per query regardless of label skew in the probed
    cells.  All pieces are the audited IVF (cell literals, map-side argmax)
    and PQ (codebook literal, map-side argmin) constructions; the only
    shuffles are the cell equi-join and the two per-query rank windows
    (over ≤ cells·cellsize and ≤ SHORTLIST rows respectively).

    Recall vs the brute miner is pinned by pytest; the oracle replays the
    full two-stage composition, so membership AND ordering of the final
    triples must match bit-for-bit.
    """
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    cents = _centroids(emb)
    cbs = _pq_codebooks(emb)
    recon = _pq_corpus_arrow(
        emb, cents, cbs, extra_cols={"label": "n_label"}
    ).withColumnRenamed("neighbor_id", "neg_id")
    probes = _probed_queries(
        emb, cents, extra_cols=[F.col("label").alias("q_label")]
    )
    shortlisted = (
        recon.join(broadcast(probes), "cid")
        .filter(F.col("n_label") != F.col("q_label"))
        .select(
            "query_id", "q_label", "qe", "neg_id", "n_label",
            cosine("qe", "recon").alias("adc_cos"),
        )
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc_cos").desc(), F.col("neg_id")
    )
    cand = shortlisted.withColumn("adc_rank", F.row_number().over(w_adc)).filter(
        F.col("adc_rank") <= HARDNEG_SHORTLIST
    )
    exact = cand.join(
        emb.select(F.col("vec_id").alias("neg_id"), F.col("embedding").alias("ce")),
        "neg_id",
    ).select(
        "query_id", "q_label", "neg_id", "n_label",
        cosine("qe", "ce").alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neg_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= HARDNEG_K)
        .select("query_id", "q_label", "rank", "neg_id", "n_label", "cos_sim")
        .orderBy("query_id", "rank")
    )


_ADC_PR2 = (
    "(list_dot_product(p.qe::DOUBLE[], r.recon)"
    " / (sqrt(list_dot_product(p.qe::DOUBLE[], p.qe::DOUBLE[]))"
    " * sqrt(list_dot_product(r.recon, r.recon))))"
)
_COS_PE = _cos_pair("cand.qe", "e.embedding")

HARD_NEGATIVES_IVFPQ_SQL = f"""
WITH kk AS ({_IVF_K_SQL}),
cent AS (
    SELECT vec_id - {N_QUERIES} AS cid, embedding FROM embeddings, kk
    WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES} + kk.k
),
cell AS (
    SELECT neighbor_id, cid FROM (
        SELECT c.vec_id AS neighbor_id, t.cid,
               ROW_NUMBER() OVER (PARTITION BY c.vec_id
                    ORDER BY {_COS_CT} DESC, t.cid DESC) AS rn
        FROM embeddings c, cent t
        WHERE c.vec_id >= {N_QUERIES}
    ) WHERE rn = 1
),
cb AS (
    SELECT s.range AS s, e.vec_id - {N_QUERIES} AS j,
           list_slice(e.embedding, s.range * {PQ_SD} + 1,
                      s.range * {PQ_SD} + {PQ_SD}) AS c
    FROM embeddings e, range({PQ_M}) s
    WHERE e.vec_id >= {N_QUERIES} AND e.vec_id < {N_QUERIES} + {PQ_KSUB}
),
codes AS (
    SELECT vec_id, s, j AS code FROM (
        SELECT x.vec_id, cb.s, cb.j,
               ROW_NUMBER() OVER (PARTITION BY x.vec_id, cb.s
                    ORDER BY {_PQ_DIST} ASC, cb.j ASC) AS rn
        FROM embeddings x, cb
        WHERE x.vec_id >= {N_QUERIES}
    ) WHERE rn = 1
),
recon AS (
    SELECT codes.vec_id, cell.cid, e.label AS n_label,
           flatten(list(cb.c::DOUBLE[] ORDER BY codes.s)) AS recon
    FROM codes
    JOIN cb ON cb.s = codes.s AND cb.j = codes.code
    JOIN cell ON cell.neighbor_id = codes.vec_id
    JOIN embeddings e ON e.vec_id = codes.vec_id
    GROUP BY codes.vec_id, cell.cid, e.label
),
probes AS (
    SELECT query_id, qe, q_label, cid FROM (
        SELECT q.vec_id AS query_id, q.embedding AS qe, q.label AS q_label,
               t.cid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                    ORDER BY {_COS_QT} DESC, t.cid DESC) AS rn
        FROM embeddings q, cent t
        WHERE q.vec_id < {N_QUERIES}
    ) WHERE rn <= {NPROBE}
),
cand AS (
    SELECT query_id, q_label, qe, neg_id, n_label FROM (
        SELECT p.query_id, p.q_label, p.qe, r.vec_id AS neg_id, r.n_label,
               ROW_NUMBER() OVER (PARTITION BY p.query_id
                    ORDER BY {_ADC_PR2} DESC, r.vec_id) AS adc_rank
        FROM probes p JOIN recon r ON p.cid = r.cid
        WHERE r.n_label <> p.q_label
    ) WHERE adc_rank <= {HARDNEG_SHORTLIST}
)
SELECT query_id, q_label, rank, neg_id, n_label, cos_sim
FROM (
    SELECT cand.query_id, cand.q_label, cand.neg_id, cand.n_label,
           {_COS_PE} AS cos_sim,
           ROW_NUMBER() OVER (PARTITION BY cand.query_id
                ORDER BY {_COS_PE} DESC, cand.neg_id) AS rank
    FROM cand JOIN embeddings e ON e.vec_id = cand.neg_id
)
WHERE rank <= {HARDNEG_K}
ORDER BY query_id, rank
"""
