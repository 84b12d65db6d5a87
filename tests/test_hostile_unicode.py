"""Hostile-unicode content gate: the text-analysis family must neither
crash nor diverge from its DuckDB oracle on adversarial STRING content —
the degenerate-corpus sweep covers hostile structure (empty/one-row);
this covers hostile bytes: combining marks vs precomposed, ZWJ emoji,
RTL scripts, CJK without spaces, zero-width spaces, astral-plane
letters (UTF-16 surrogate pairs — a code-unit length would double-count
them), control whitespace, 100 KB single words, and empty/whitespace
texts.

Engine seams this pins: Spark `length`/`substring` count CODE POINTS
(as DuckDB does), the canonical whitespace class splits identically,
and md5/fingerprint hashing sees identical UTF-8 bytes.
"""

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from scripts.check_oracle import pandas_rows, value_hash  # noqa: E402

HOSTILE_TEXTS = [
    "café résumé naïve précomposed.",
    "café résumé combining marks here.",
    "\U0001f469‍\U0001f469‍\U0001f467 zwj family \U0001f468\U0001f3fd‍\U0001f680 astronaut \U0001f1fa\U0001f1e6 flag.",
    "مرحبا بالعالم rtl arabic text.",
    "שלום עולם rtl hebrew text.",
    "日本語のテキストです。cjk no spaces.",
    "a\tb\x0bc\fd here are control whitespace words.",
    "x" * 100_000,
    ("word " * 20_000).strip() + ".",
    "line one ends well.\n\n\n\nline five also ends well.",
    "​zero​width​spaces glue words together.",
    "ﬁﬂ ligatures ＦＵＬＬＷＩＤＴＨ compat.",
    "\U0001d518\U0001d52b\U0001d526\U0001d520\U0001d52c\U0001d521\U0001d522 astral plane letters.",
    "mixed ascii برمجة 中文 emoji \U0001f389 done.",
    "",
    " ",
    "\n\n\n",
]

# text-family queries whose Spark/DuckDB pair must agree on this corpus
TEXT_QUERIES = [
    "token_stats",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "normalize_text",
    "char_coverage",
    "ngram_repetition",
    "gopher_quality_filter",
    "c4_filters",
    "boilerplate_lines",
    "vocab_topk",
    "pii_redact",
    "length_histogram",
    "dedup_exact",
    # dedup/fingerprint family: shingling + portable-hash parity over
    # multi-byte content (CJK, emoji, astral plane) is exactly what a
    # real crawl feeds these
    "minhash_signatures",
    "simhash_signatures",
    "dedup_ngram_jaccard",
    "tfidf_top_terms",
    "decontaminate",
    "lang_segments",
    # r8: within-doc line dedup — line split + trim + string_agg
    # reassembly over multi-byte/zero-width content
    "intradoc_line_dedup",
]


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory):
    import pandas as pd

    dst = str(tmp_path_factory.mktemp("hostile"))
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(HOSTILE_TEXTS)),
            "text": HOSTILE_TEXTS,
            "lang": ["xx"] * len(HOSTILE_TEXTS),
            "source": ["hostile"] * len(HOSTILE_TEXTS),
            "n_chars": [len(t) for t in HOSTILE_TEXTS],
        }
    )
    pdf.to_parquet(f"{dst}/documents.parquet", index=False)
    return dst


# fast-suite subset: one per seam class (ratio rules, line rules, word
# split + portable hash, shingling); the full list runs slow-marked
FAST_HOSTILE = ["gopher_quality_filter", "c4_filters", "token_stats",
                "minhash_signatures"]


@pytest.mark.parametrize(
    "name",
    [
        n if n in FAST_HOSTILE else pytest.param(n, marks=pytest.mark.slow)
        for n in TEXT_QUERIES
    ],
)
def test_text_family_matches_oracle_on_hostile_unicode(spark, hostile_dir, name):
    import duckdb

    import __spark_entry__ as mod

    sdf = mod.queries()[name](spark, hostile_dir)
    scols, srows = pandas_rows(sdf.toPandas())

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{hostile_dir}/documents.parquet')"
    )
    res = con.execute(mod.oracle_sql()[name])
    ocols, orows = pandas_rows(res.fetchdf())

    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)} rows"
    assert sorted(scols) == sorted(ocols)
    assert value_hash(scols, srows) == value_hash(ocols, orows), name
