"""Degenerate-corpus robustness: every registered query must return a
well-typed (possibly empty) result on an EMPTY corpus and a ONE-ROW
corpus — never raise.

At 100 TB an empty input is routine, not hypothetical: an incremental
run whose date filter matches nothing, a new tenant with no history, a
partition emptied by an upstream filter.  The r7 sweep found the whole
centroid/codebook-training ANN family crashing here (VOID array
literals from empty collects, numpy axis errors on empty query
matrices, ``collect()[0]`` on empty seeds) — all guarded now; these
tests keep it that way.
"""

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from scripts.degenerate_sweep import TABLES  # noqa: E402

# one representative per guarded trainer/closure (the r7 crash classes):
# flat IVF centroids, PQ codebooks, kmeans refinement, brute-force Arrow
# qmat, hier-Arrow broadcast assignment, greedy coreset seed, and the
# embedding-dedup composition sharing the cell assigners
FAST_SUBSET = [
    "ann_ivf_topk",
    "ann_pq_topk",
    "ann_ivf_kmeans_topk",
    "ann_bruteforce_arrow",
    "ann_ivf_hier_arrow",
    "coreset_kcenter",
    "dedup_embedding_cosine_cells_hier",
]


def _build(tmp_path_factory, kind: str) -> str:
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp(f"degen_{kind}"))
    for t in TABLES:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        out = tbl.slice(0, 0) if kind == "empty" else tbl.slice(0, 1)
        pq.write_table(out, f"{dst}/{t}.parquet")
    return dst


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    return _build(tmp_path_factory, "empty")


@pytest.fixture(scope="module")
def onerow_dir(tmp_path_factory):
    return _build(tmp_path_factory, "onerow")


@pytest.mark.parametrize("name", FAST_SUBSET)
def test_guarded_family_survives_empty_corpus(spark, empty_dir, name):
    import __spark_entry__ as mod

    df = mod.queries()[name](spark, empty_dir)
    assert df.count() == 0
    assert df.columns  # schema intact


@pytest.mark.slow
def test_all_queries_survive_degenerate_corpora(spark, empty_dir, onerow_dir):
    import __spark_entry__ as mod

    failures = []
    for kind, sf_dir in (("empty", empty_dir), ("onerow", onerow_dir)):
        for name, fn in mod.queries().items():
            try:
                fn(spark, sf_dir).count()
            except Exception as e:  # noqa: BLE001 - collecting all failures
                failures.append(f"{kind}:{name}: {e}")
    assert not failures, failures
