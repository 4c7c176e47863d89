"""PII scrubbing for web-text corpora: detect and redact personally
identifiable substrings before training.

Standard pre-training hygiene (the C4/Dolma/RefinedWeb pipelines all apply
a regex-based PII pass): emails, IPv4 addresses, and phone/ID number shapes
are replaced with typed placeholder tokens so downstream dedup/packing see
stable text. The reference has no PII operators; this belongs to the
training-data addendum.

Scale: every detector is a single ``regexp_replace``/``regexp_count`` —
whole-stage codegen, one scan, zero shuffle, zero Python. Patterns use the
portable common subset of Java regex and RE2 (no lookaround, no backrefs),
so the DuckDB oracle replays redaction byte-for-byte and the same patterns
run unchanged on any Spark cluster.

These patterns are deliberately high-precision shapes, not a compliance
guarantee: real deployments layer NER models on top (that step would be a
``mapInPandas`` stage like pipeline/multimodal.py's decode stub).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "redact_pii", "pii_counts", "pii_stats"]

# name -> (pattern, replacement). Order matters: emails first (an email
# contains dot-separated digits a loose IP shape could nibble at),
# then IPs, then phone shapes.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}(\.\d{1,3}){3}\b", "<IP>"),
    "phone": (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    "id_number": (r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
}


def _selected(patterns: list[str] | None) -> dict[str, tuple[str, str]]:
    if patterns is None:
        return PII_PATTERNS
    unknown = set(patterns) - set(PII_PATTERNS)
    if unknown:
        raise ValueError(f"unknown PII patterns: {sorted(unknown)}")
    # preserve canonical order — redaction order is part of the contract
    return {k: v for k, v in PII_PATTERNS.items() if k in set(patterns)}


def redact_pii(text: Column, patterns: list[str] | None = None) -> Column:
    """Text with every selected PII shape replaced by its placeholder.
    NULL stays NULL. Applied in canonical order (see PII_PATTERNS)."""
    out = text
    for pat, repl in _selected(patterns).values():
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(text: Column, patterns: list[str] | None = None) -> dict[str, Column]:
    """{name: per-row match count} — counts are computed on the ORIGINAL
    text, each pattern independently (an email's host is not double-counted
    as an IP because counting precedes any replacement only per-pattern;
    overlapping shapes are a documented over-count, same as the oracle)."""
    return {
        name: F.regexp_count(text, F.lit(pat))
        for name, (pat, _) in _selected(patterns).items()
    }


def pii_stats(
    df: DataFrame, text_col: str = "text", patterns: list[str] | None = None
) -> DataFrame:
    """ONE fused corpus aggregate: per pattern, total matches and number of
    documents containing at least one match, plus doc totals."""
    t = F.col(text_col)
    counts = pii_counts(t, patterns)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(t.isNotNull().cast("int")).cast("long").alias("n_text_docs"),
    ]
    for name, c in counts.items():
        aggs.append(F.sum(c).cast("long").alias(f"{name}_matches"))
        aggs.append(F.sum((c > 0).cast("int")).cast("long").alias(f"{name}_docs"))
    return df.agg(*aggs)
