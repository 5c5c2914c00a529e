"""Scalar-function library + LLM-data-pipeline extension operators.

- :mod:`scalar`     — string/date/math/json/array function parity
  (SURVEY §2.3 function rows).
- :mod:`text`       — text analysis: language-ID, quality scoring,
  token stats, fingerprinting.
- :mod:`dedup`      — exact, minhash-LSH, simhash, n-gram-Jaccard
  deduplication.
- :mod:`similarity` — embedding similarity search (brute-force top-k +
  LSH-bucketed scale path).
- :mod:`multimodal` — opaque binary columns with typed metadata;
  decode/feature steps are stubbed (no image/audio libs in-container),
  Spark plumbing is real.
"""
