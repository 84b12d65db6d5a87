"""Graph analytics over document-similarity graphs.

The dedup layer already resolves near-dup PAIRS into components
(``dedup.connected_components``); this module adds iterative SCORING on the
same graph — PageRank over the MinHash-LSH pair graph ranks each document's
centrality inside its duplicate neighborhood (the canonical-pick signal a
curation pipeline uses when "keep lowest doc_id" is too crude: keep the
most-connected template instead).

The reference engine has no graph surface at all (SURVEY §2.3: its only
joins are two broadcast lookups and an anti-join dedup); this is free
capability on Spark.

Numeric determinism: PageRank uses only +, *, / on doubles — IEEE-exact and
identical across engines (unlike transcendentals) — so a fixed-iteration
run is reproducible bit-for-bit modulo group-sum ordering, which round(6)
absorbs.  The DuckDB oracle chains one CTE per iteration with the same
formula order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import _MINHASH_PAIR_CTES, dedup_minhash_lsh

PR_ITERATIONS = 3
PR_DAMPING = 0.85


def _symmetrize(edges: DataFrame) -> DataFrame:
    """Both directions of an undirected (src, dst) edge list in ONE pass:
    explode each pair into its two orientations.  A self-union
    (edges ∪ swap(edges)) reads the edge-producing DAG twice, and when
    edges come from an expensive subquery (doc_pagerank's LSH pair build)
    that doubles the dominant cost — measured 138.8 s → 70.2 s for
    doc_pagerank at sf1 (238 K-pair graph)."""
    return edges.select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("src"), F.col("dst").alias("dst")),
                F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")


def pagerank(edges: DataFrame, iterations: int = PR_ITERATIONS,
             damping: float = PR_DAMPING) -> DataFrame:
    """Fixed-iteration PageRank on an undirected edge list (``src``/``dst``,
    one row per pair), over the nodes that have at least one edge.

    Per sweep: contributions = one equi-join of edges⋈ranks shuffled on
    ``src`` plus a groupBy on ``dst``; rank update is a broadcast-free left
    join back onto the (small) degree table.  ``localCheckpoint`` truncates
    lineage each sweep — without it iteration k replays all k-1 prior joins
    (the iterative-plan trap; same hygiene as ``connected_components``).

    At 100 TB the dup-pair graph is ~orders of magnitude smaller than the
    corpus (only docs sharing an LSH bucket appear), so three sweeps are
    three small shuffles; for a web-scale link graph the identical plan
    holds with edges pre-partitioned by ``src`` so every sweep reuses one
    exchange.
    """
    sym = _symmetrize(edges)
    # ONE eager checkpoint cuts the (possibly expensive) edge-producing DAG
    # out of every sweep; the per-sweep state is then cached LAZILY —
    # each ranks_k is consumed twice by sweep k+1 (contribution join +
    # rank update), and persist() makes the second use a cache hit while
    # CacheManager substitution keeps downstream plans shallow, without
    # paying one eager materialization job per sweep.
    #
    # Per-sweep edge exchange+sort: measured, and deliberately KEPT (r6
    # VERDICT task 6 adjudicated by A/B at sf1).  Under AQE the
    # checkpointed LogicalRDD surfaces UnknownPartitioning, so each
    # sweep's SMJ re-exchanges and re-sorts the edge side; the fix —
    # localCheckpoint → repartition+sortWithinPartitions → persist, whose
    # InMemoryRelation DOES advertise partitioning and ordering — removes
    # both from every sweep's plan, but measured SLOWER on the 475 K-edge
    # sf1 dup graph (2.59 s vs 2.13 s for the 3-sweep tail): the cache
    # fill + count + in-memory scan overhead exceeds three sorts of a
    # narrow edge list.  The dup-pair graph is orders of magnitude
    # smaller than its corpus by construction, so this holds at 100 TB
    # too; a genuinely edge-dominant graph (web links) would instead read
    # edges from a bucketed table — pre-partitioned at write time, no
    # per-query fix at all.
    sym = sym.repartition("src").localCheckpoint(eager=True)
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("degree"))
    n1 = deg.agg(F.count(F.lit(1)).cast("double").alias("n"))
    ranks = deg.crossJoin(F.broadcast(n1)).select(
        "id", "degree", (F.lit(1.0) / F.col("n")).alias("pr"), "n"
    ).persist()
    for _ in range(iterations):
        contrib = (
            sym.join(ranks, sym.src == ranks.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("pr") / F.col("degree")).alias("m"))
        )
        ranks = (
            ranks.drop("pr")
            .join(contrib, "id", "left")
            .select(
                "id",
                "degree",
                (
                    F.lit(1.0 - damping) / F.col("n")
                    + F.lit(damping) * F.coalesce("m", F.lit(0.0))
                ).alias("pr"),
                "n",
            )
            .persist()
        )
    # the per-sweep caches are |nodes|-row relations (a few MB at any
    # realistic dup-graph size); they age out with the session rather than
    # being unpersisted here, because unpersisting before the caller's
    # action would un-cache state the final plan still references twice
    return ranks.select("id", "degree", "pr")


def doc_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank of every document inside the MinHash-LSH near-dup graph.

    High-degree/high-rank docs are duplicate-cluster hubs (template pages,
    boilerplate ancestors) — the keep-or-drop signal complementing
    ``dedup_clusters``'s component ids.
    """
    pairs = dedup_minhash_lsh(spark, sf_dir)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    return (
        pagerank(edges)
        .select(
            F.col("id").alias("doc_id"),
            "degree",
            F.round("pr", 6).alias("pagerank"),
        )
        .orderBy("doc_id")
    )


def _iter_ctes(iterations: int, damping: float) -> str:
    """One chained CTE pair (contrib, rank) per PageRank sweep."""
    out = []
    for i in range(1, iterations + 1):
        out.append(
            f"c{i} AS (SELECT e.dst AS id, SUM(r{i-1}.pr / d.degree) AS m\n"
            f"    FROM edges e JOIN r{i-1} ON e.src = r{i-1}.id\n"
            f"    JOIN deg d ON e.src = d.id GROUP BY e.dst),\n"
            f"r{i} AS (SELECT d.id, {1.0 - damping} / (SELECT n FROM nn)\n"
            f"    + {damping} * COALESCE(c{i}.m, 0.0) AS pr\n"
            f"    FROM deg d LEFT JOIN c{i} ON d.id = c{i}.id)"
        )
    return ",\n".join(out)


DOC_PAGERANK_SQL = (
    "WITH " + _MINHASH_PAIR_CTES + ",\n"
    "edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs\n"
    "          UNION ALL SELECT doc_b, doc_a FROM pairs),\n"
    "deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS degree"
    " FROM edges GROUP BY src),\n"
    "nn AS (SELECT COUNT(*)::DOUBLE AS n FROM deg),\n"
    "r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS pr FROM deg),\n"
    + _iter_ctes(PR_ITERATIONS, PR_DAMPING)
    + f"""
SELECT d.id AS doc_id, d.degree, ROUND(r{PR_ITERATIONS}.pr, 6) AS pagerank
FROM deg d JOIN r{PR_ITERATIONS} ON d.id = r{PR_ITERATIONS}.id
ORDER BY doc_id
"""
)


# --------------------------------------------------------------------------
# Triangle enumeration (near-dup clique signal)
# --------------------------------------------------------------------------


def triangles(edges: DataFrame) -> DataFrame:
    """Enumerate triangles in an undirected edge list (``src < dst`` pair
    rows) — each triangle once, as (a, b, c) with a < b < c.

    The classic two-join enumeration over the ORIENTED edge list: because
    every edge is stored low→high, joining e1(a,b)⋈e2(b,c) then probing
    for (a,c) finds each triangle exactly once, no post-dedup.  Both joins
    are equi-joins shuffled on a node key — at 100 TB-corpus scale the
    dup-pair graph is small, and for genuinely heavy graphs the standard
    refinement (orient by degree) drops into the same plan.
    """
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = edges.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = edges.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return e1.join(e2, "b").join(e3, ["a", "c"]).select("a", "b", "c")


def doc_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the MinHash-LSH near-dup graph: mutually-similar doc
    triples (the strong-clique signal — a template family, vs a chain of
    pairwise-only matches) with their mean pairwise Jaccard."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b", "jaccard")
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    tri = triangles(edges)
    jc = pairs
    j_ab = jc.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"), F.col("jaccard").alias("j_ab"))
    j_bc = jc.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"), F.col("jaccard").alias("j_bc"))
    j_ac = jc.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"), F.col("jaccard").alias("j_ac"))
    return (
        tri.join(j_ab, ["a", "b"]).join(j_bc, ["b", "c"]).join(j_ac, ["a", "c"])
        .select(
            F.col("a").alias("doc_a"),
            F.col("b").alias("doc_b"),
            F.col("c").alias("doc_c"),
            F.round((F.col("j_ab") + F.col("j_bc") + F.col("j_ac")) / 3.0, 6).alias("mean_jaccard"),
        )
        .orderBy("doc_a", "doc_b", "doc_c")
    )


DOC_TRIANGLES_SQL = (
    "WITH " + _MINHASH_PAIR_CTES + ",\n"
    "tri AS (SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c\n"
    "        FROM pairs e1\n"
    "        JOIN pairs e2 ON e1.doc_b = e2.doc_a\n"
    "        JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b)\n"
    "SELECT t.a AS doc_a, t.b AS doc_b, t.c AS doc_c,\n"
    "       ROUND((jab.jaccard + jbc.jaccard + jac.jaccard) / 3.0, 6)\n"
    "           AS mean_jaccard\n"
    "FROM tri t\n"
    "JOIN pairs jab ON jab.doc_a = t.a AND jab.doc_b = t.b\n"
    "JOIN pairs jbc ON jbc.doc_a = t.b AND jbc.doc_b = t.c\n"
    "JOIN pairs jac ON jac.doc_a = t.a AND jac.doc_b = t.c\n"
    "ORDER BY doc_a, doc_b, doc_c"
)


# --------------------------------------------------------------------------
# Local clustering coefficient (how clique-like each dup neighborhood is)
# --------------------------------------------------------------------------


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """Per-node local clustering coefficient over an undirected
    (src < dst) edge list: 2·T(v) / (deg(v)·(deg(v)−1)), NULL where
    degree < 2.  T(v) comes from the oriented triangle enumeration
    (each triangle counted once, then exploded to its three corners);
    degree from the symmetrized edge list.  Three aggregates and the two
    triangle equi-joins — no new plan shapes beyond :func:`triangles`.
    """
    tri = triangles(edges)
    tri_counts = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    sym = _symmetrize(edges)
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    coeff = F.when(
        F.col("degree") >= 2,
        2.0
        * F.coalesce(F.col("n_triangles"), F.lit(0)).cast("double")
        / (F.col("degree").cast("double") * (F.col("degree").cast("double") - 1.0)),
    )
    return (
        deg.join(tri_counts, "id", "left")
        .select(
            "id",
            "degree",
            F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
            F.round(coeff, 6).alias("clustering"),
        )
    )


def doc_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering coefficient of every document in the near-dup graph —
    1.0 marks members of clean template cliques (safe to collapse to one
    survivor), low values mark chain-like neighborhoods where pairwise
    similarity does NOT imply group similarity and cluster-resolution
    (``dedup_clusters``) over-merges; the standard diagnostic read next
    to PageRank's hub scores."""
    pairs = dedup_minhash_lsh(spark, sf_dir)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    return (
        clustering_coefficients(edges)
        .select(F.col("id").alias("doc_id"), "degree", "n_triangles", "clustering")
        .orderBy("doc_id")
    )


DOC_CLUSTERING_SQL = (
    "WITH " + _MINHASH_PAIR_CTES + ",\n"
    "tri AS (SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c\n"
    "        FROM pairs e1\n"
    "        JOIN pairs e2 ON e1.doc_b = e2.doc_a\n"
    "        JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),\n"
    "tc AS (SELECT id, COUNT(*) AS n_triangles FROM (\n"
    "           SELECT a AS id FROM tri UNION ALL\n"
    "           SELECT b FROM tri UNION ALL SELECT c FROM tri)\n"
    "       GROUP BY id),\n"
    "deg AS (SELECT id, COUNT(*) AS degree FROM (\n"
    "           SELECT doc_a AS id FROM pairs UNION ALL\n"
    "           SELECT doc_b FROM pairs)\n"
    "        GROUP BY id)\n"
    "SELECT deg.id AS doc_id, deg.degree,\n"
    "       COALESCE(tc.n_triangles, 0) AS n_triangles,\n"
    "       ROUND(CASE WHEN deg.degree >= 2 THEN\n"
    "           2.0 * COALESCE(tc.n_triangles, 0)\n"
    "           / (CAST(deg.degree AS DOUBLE) * (CAST(deg.degree AS DOUBLE) - 1.0))\n"
    "           END, 6) AS clustering\n"
    "FROM deg LEFT JOIN tc ON deg.id = tc.id\n"
    "ORDER BY doc_id"
)
