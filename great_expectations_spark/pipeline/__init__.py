"""Large-scale training-data pipeline operators.

Beyond the reference's expectation surface, a 100 TB web-text validation
engine needs the data-curation operators that feed it: deduplication
(exact + near-dup), similarity search over embeddings, text quality
analysis, and multimodal (binary-column) plumbing. Everything here is
expressed with native ``pyspark.sql.functions`` (JVM-side, whole-stage
codegen) except the explicitly-Arrow multimodal UDFs.

Cross-engine determinism contract (so DuckDB oracles can replay every op):
  * tokenization  = split on a single space
  * hashing       = lowercase hex md5 of UTF-8 bytes; int form = first 15
    hex chars parsed base-16 (a 60-bit non-negative int)
  * minhash       = min over shingles of (a_i*h + b_i) mod 2^31-1, one md5
    per shingle; (a_i, b_i) derived from md5 driver-side
  * simhash bit j = bit j of the 60-bit token hash, majority vote
  * LSH planes    = literal weights derived from md5 driver-side
"""
