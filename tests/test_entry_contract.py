"""Driver-contract invariants for __spark_entry__.

The external correctness gate checks EXACTLY the first 50 entries of
``queries()`` (verified in rounds 1-3: the CORRECTNESS_r{N}.json keys
equal the dict's first 50 keys).  Keeping that window byte-stable is
what makes correctness comparable round over round — new queries must
APPEND, never reorder.
"""

from __future__ import annotations

import json
import os

import pytest

import __spark_entry__ as entry

R02 = "/root/repo/CORRECTNESS_r02.json"


@pytest.mark.skipif(not os.path.exists(R02), reason="no recorded round file")
def test_first_50_queries_are_the_r8_rotation_window():
    # r8 deliberately ROTATES the window (r7 verdict task #3): the first
    # 50 names must be the declared rotation list, every one of them
    # previously unseen by the r1-r7 driver gates, and the rotation must
    # only reorder — never add/drop — registry entries.
    import glob

    current = list(entry.queries().keys())
    assert current[:50] == entry._R8_WINDOW
    seen: set[str] = set()
    for p in sorted(glob.glob("/root/repo/CORRECTNESS_r0[1-7].json")):
        seen |= set(json.load(open(p)))
    assert not (set(current[:50]) & seen), "window reuses driver-seen names"
    assert sorted(current) == sorted(entry._all_queries())


def test_every_query_key_has_matching_oracle_or_is_documented_rows_only():
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert o <= q, f"orphan oracles: {o - q}"
    rows_only = q - o
    # zero rows-only queries since r7: ann_ivf_kmeans_topk (the last one)
    # flipped to a full oracle via the fixed-point Lloyd reformulation, the
    # same playbook that fixed approx_distinct_users in r6
    assert rows_only == set()


def test_oracle_sql_strings_are_self_contained():
    r"""No leftover template placeholders (every oracle must be directly
    executable); regex quantifiers and \p{..} classes are fine."""
    import re

    # the substitution tokens this codebase splices into oracle templates
    placeholder = re.compile(
        r"\{(quality|tokens|unigram|budget|clusters|lsh|decon|hash|sf_dir)\}"
    )
    for name, sql in entry.oracle_sql().items():
        m = placeholder.search(sql)
        assert m is None, f"{name} carries unsubstituted {m.group(0)!r}"
