"""Operators beyond plain relational algebra.

- dedup: exact + MinHash-LSH + SimHash + n-gram Jaccard near-dup,
  chunk/line-level dedup with reassembly, corpus overlap
- similarity: cosine top-k / threshold search over embedding columns
- cluster: Lloyd k-means + SemDeDup semantic dedup
- bloom: bloom-filter build/probe and bloom-pruned exact semi join
- text: language-ID, quality scoring, token counting, fingerprinting,
  TF-IDF/BM25, repetition gates, the Gopher composite rule gate and
  the C4 cleaning rules, LM perplexity, LLR importance,
  domain caps, quantile gates/buckets, PII audit/redaction
- history: SCD2 validity ranges, point-in-time views, snapshot CDC diff
- layout: Z-order keys and join-key skew diagnostics
- graph: iterative BFS / tree walk (reference graph.pql parity)
- asof: time-ordered as-of join
- rangejoin / skew: interval join, salted join
- multimodal: binary-column plumbing with feature-gated decoders

All built from JVM-side DataFrame primitives; Python appears only at
the multimodal decode boundary (Arrow Pandas-UDF).
"""
