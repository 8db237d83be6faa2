"""Operators beyond plain relational algebra.

- dedup: exact + MinHash-LSH + SimHash + n-gram Jaccard near-dup
- similarity: cosine top-k / threshold search over embedding columns
- text: language-ID, quality scoring, token counting, fingerprinting
- graph: iterative BFS / tree walk (reference graph.pql parity)
- asof: time-ordered as-of join
- multimodal: binary-column plumbing with stubbed decoders

All built from JVM-side DataFrame primitives; Python appears only in
the multimodal decode stubs (Pandas-UDF boundary).
"""
