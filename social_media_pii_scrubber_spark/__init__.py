"""PySpark-native language-ID + quality-filter + PII/toxicity-scrub engine.

A from-scratch, Spark-first re-expression of the dataflow semantics of
``petiesmo/social-media-PII-scrubber`` (reference at /root/reference,
surveyed in SURVEY.md), generalized to Common-Crawl-style web-page tables
at large scale:

- relational core (filters / joins / pivots / windows / unions) as pure
  DataFrame column ops compiled by Catalyst,
- PII scrub as a regex bank: native ``regexp_replace`` chain for the
  Catalyst-optimizable part, a compiled-once-per-executor pandas UDF for
  the reference-fidelity part,
- langid / perplexity / quality heuristics as column expressions plus
  vectorized Arrow-batched pandas UDFs (no per-row Python anywhere),
- dedup (exact / MinHash-LSH / SimHash), similarity search, text
  analysis as first-class operators,
- url-hash partitioning with salting for skew, per-partition checkpoint
  manifest, and an audit/lineage table via ``observe()``.
"""

__version__ = "0.1.0"
