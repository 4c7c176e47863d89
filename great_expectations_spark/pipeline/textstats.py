"""Text analysis operators: token counts, quality scoring, language-ID
heuristic, document fingerprinting.

All pure Column expressions (whole-stage codegen); deterministic and
engine-portable (same results from DuckDB SQL for the oracle gate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from great_expectations_spark.pipeline.dedup import _md5, tokens

# Filler vocabulary for the quality heuristic: high-frequency, low-content
# tokens of the corpus domain (for web text this would be classic stopwords).
FILLER_WORDS = ["table", "row", "value", "scan", "hash", "key", "part"]

# Language marker profiles for the n-gram/common-word language-ID heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "to"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "los", "y", "es", "que"],
}


def token_count(text: Column) -> Column:
    """Number of single-space tokens; NULL for NULL text."""
    return F.when(text.isNull(), F.lit(None).cast("int")).otherwise(F.size(tokens(text)))


# GPT-2-style pre-tokenization regex (the split step every BPE vocabulary
# applies before merges): contraction suffixes, letter runs, digit runs,
# punctuation runs — each optionally preceded by one space — then leftover
# whitespace. Restricted to RE2-compatible syntax (no lookahead) so the
# exact same pattern runs in Spark (Java regex) and any RE2 engine.
BPE_SPLIT_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count: occurrences of the GPT-2 pre-tokenizer pattern.

    A training-data pipeline budgeting a tokenizer's context windows needs
    a cheap per-doc token estimate; pre-tokenizer piece count is the
    standard proxy (actual BPE merges only split pieces further, never
    across pieces). Pure ``regexp_count`` codegen — no UDF.  For exact
    counts from a vocabulary trained on the corpus itself, see
    ``pipeline.bpe`` (train_bpe / bpe_token_count)."""
    return F.when(
        text.isNull(), F.lit(None).cast("int")
    ).otherwise(F.regexp_count(text, F.lit(BPE_SPLIT_PATTERN)).cast("int"))


def filler_ratio(text: Column, fillers: list[str] | None = None) -> Column:
    """Fraction of tokens (with multiplicity) that are filler words.
    ``fillers=[]`` explicitly disables the check (ratio 0); only None
    falls back to the default vocabulary."""
    f = FILLER_WORDS if fillers is None else list(fillers)
    t = tokens(text)
    if not f:
        return F.lit(0.0)
    in_set = F.size(F.filter(t, lambda x: x.isin(*f)))
    return F.round(in_set / F.size(t), 6)


def quality_score(text: Column, fillers: list[str] | None = None) -> Column:
    """Deterministic [0,1] quality heuristic: length saturation minus
    filler-domination penalty. (Web-text version would add punctuation /
    casing / boilerplate ratios — same shape.)"""
    n = F.size(tokens(text))
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    fr = filler_ratio(text, fillers)
    return F.round(F.greatest(len_score * (F.lit(1.0) - fr), F.lit(0.0)), 6)


def lang_id_guess(text: Column) -> Column:
    """Common-word language-ID heuristic: argmax of marker hits per
    language (ties broken by language-code order); 'und' when no marker
    appears. Real web-text deployments extend the marker lists / switch to
    char n-gram profiles — the plan shape is identical."""
    t = tokens(text)

    def hits(markers):
        return lambda x: x.isin(*markers)

    scores = {
        lang: F.size(F.filter(t, hits(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[scores[l] for l in langs])
    out = F.lit("und")
    for lang in reversed(langs):  # earlier lang wins ties → apply in reverse
        out = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


def fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    token set. Two docs with the same bag of words collide — a cheap
    canonicalization step upstream of exact dedup."""
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text))))
    return _md5(canon)


def doc_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document text statistics frame."""
    t = F.col(text_col)
    return df.where(t.isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        token_count(t).cast("long").alias("n_tokens"),
        F.length(t).cast("long").alias("n_chars"),
        filler_ratio(t).alias("filler_ratio"),
        quality_score(t).alias("quality"),
        lang_id_guess(t).alias("lang_guess"),
        fingerprint(t).alias("fp"),
    )


def corpus_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One-row corpus aggregate over doc_stats (single fused agg)."""
    d = doc_stats(df, id_col, text_col)
    return d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
        F.count_distinct(F.col("fp")).cast("long").alias("distinct_fingerprints"),
    )
