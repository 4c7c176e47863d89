"""Large-scale training-data pipeline operators.

Beyond the reference's expectation surface, a 100 TB web-text validation
engine needs the data-curation operators that feed it: deduplication
(exact + near-dup), similarity search over embeddings, text quality
analysis, and multimodal (binary-column) plumbing. Everything here is
expressed with native ``pyspark.sql.functions`` (JVM-side, whole-stage
codegen) except the explicitly-Arrow multimodal UDFs.

Cross-engine determinism contract (so DuckDB oracles can replay every op):
  * tokenization  = split on a single space
  * hashing       = lowercase hex md5 of UTF-8 bytes
  * minhash       = lexicographic MIN of salted md5 hex strings
  * simhash bit j = parity of the value of hex digit j+1 of md5(token)
"""
