"""Query/data-processing operators.

- ``analytics``: relational analytics (joins/aggregations/windows/sorts/
  set-ops) over the star schema — the capabilities the verification
  harness exercises (SURVEY.md §2.3) and the extension surface beyond the
  reference's pure-ETL core.
- ``dedup``: exact + near-duplicate detection (MinHash-LSH, SimHash,
  n-gram Jaccard, embedding cosine).
- ``similarity``: approximate nearest neighbor over embeddings.
- ``textstats``: language-ID, quality scoring, token counting,
  fingerprinting.
- ``multimodal``: binary-column plumbing (decode/feature-extract stubs).
"""
