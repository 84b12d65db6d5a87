"""Analytics-layer operators.

The reference engine has no relational surface (SURVEY.md §2.3-2.7 lists the
absences); Spark provides joins/aggregations/windows/sorts/set-ops natively.
This package exposes them as engine operators, plus the LLM-data-pipeline
layer (dedup, similarity search, text analysis, multimodal) that a 100 TB
training-data pipeline needs.

Modules:
- ``asof``        as-of / range joins (composition of existing DataFrame ops)
- ``dedup``       exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding near-dup
- ``similarity``  brute-force + LSH/IVF-bucketed cosine top-k
- ``textops``     language-ID, quality scoring, token counts, fingerprinting
- ``multimodal``  binary-column decode/feature plumbing (decode stubbed)
"""
