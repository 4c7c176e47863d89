"""Web-text quality signals: Gopher-style repetition/heuristic filters and
C4-style line cleaning, as first-class corpus operators.

The reference has no document-quality operators (its closest analogue is
``expect_column_value_lengths_to_be_between`` / regex checks); these are the
standard training-data filters every web-scale pipeline applies before
dedup — the Gopher rules (Rae et al. 2021, "Scaling Language Models",
table A1) and the C4 heuristics (Raffel et al. 2020, §2.2) — re-expressed
on this engine so they compose with the suite-as-filter cleaner
(``pipeline/filtering.py``): ``quality_signals`` annotates, ``gopher_suite``
turns thresholds into ordinary expectations, ``split_by_suite`` filters.

Scale notes (100 TB / 10^12 docs):
  * Every word/line heuristic is a pure Column expression — ONE
    whole-stage-codegen scan, zero shuffle, zero Python.
  * The n-gram repetition signals (top-n-gram and duplicated-n-gram
    character fractions) need per-document n-gram frequency maps, which
    Spark's higher-order functions can only express quadratically —
    they run in ONE Arrow-batched pandas UDF returning a struct
    (per-doc cost O(9·len); no shuffle, no driver data). This is the
    industry-standard cost of Gopher filtering; everything stays inside
    the same projection so Catalyst still prunes and pushes down around
    it.
  * The whole signal frame is a projection: filtering on it afterwards
    (``split_by_suite``) adds no extra pass.

Determinism / oracle contract (what the DuckDB oracle replays):
  * words  = non-empty pieces of splitting text on ASCII whitespace
    ``[ \\t\\n\\x0b\\f\\r]+``; word_chars = sum of word lengths (spaces
    excluded).
  * lines  = space-trimmed non-empty pieces of splitting text on
    ``\\n``; paragraphs = same with ``\\n\\n``.
  * top_{n}gram_char_fraction (n=2,3,4): over all word n-grams occurring
    ≥ 2 times, max of occurrences·gram_word_chars / word_chars (0.0 when
    none repeat; NULL when no words).
  * dup_{n}gram_char_fraction (n=5..10): fraction of word characters
    covered by at least one occurrence of an n-gram that occurs ≥ 2
    times (positions marked, no double counting).
  * Fractions are raw doubles (exact integer ratios) — round only at
    aggregation time so any engine reproduces them bit-for-bit.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from great_expectations_spark.core.suite import ExpectationSuite

__all__ = [
    "GOPHER_STOP_WORDS",
    "word_array",
    "line_array",
    "repetition_signals",
    "quality_signals",
    "compression_ratio",
    "compression_ratio_col",
    "gopher_suite",
    "gopher_filter",
    "c4_clean_lines",
    "c4_suite",
]

# Gopher's "must contain ≥2 of" stop-word list (Rae et al. A1.1); override
# per-corpus via the stop_words= parameter.
GOPHER_STOP_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# ASCII whitespace as an EXPLICIT class: Java \s and Python re.ASCII \s
# include \x0b but RE2/DuckDB \s does not, so the shorthand is not
# cross-engine — the explicit class below is, and all three engines use it.
_WS_CLASS = r"[ \t\n\x0b\f\r]+"
_WS = re.compile(_WS_CLASS)

_BULLETS = ("•", "‣", "▶", "-", "*")
_ELLIPSES = ("...", "…")
# C4 keeps lines that end in terminal punctuation.
_TERMINAL_RE = r'[.!?"]$'


def word_array(text: Column) -> Column:
    """Non-empty ASCII-whitespace-split words (the cross-engine contract)."""
    return F.array_remove(F.split(text, _WS_CLASS), "")


def line_array(text: Column, sep: str = "\n") -> Column:
    """Space-trimmed non-empty lines (``sep='\\n\\n'`` → paragraphs).
    ``sep`` is a literal separator string, regex-escaped before splitting."""
    return F.array_remove(F.transform(F.split(text, re.escape(sep)), F.trim), "")


def _frac(num: Column, den: Column) -> Column:
    """num/den as double, NULL when den is 0 (matches SQL NULLIF)."""
    return num / F.nullif(den.cast("double"), F.lit(0.0))


_REP_FIELDS = (
    ["top_%dgram_char_fraction" % n for n in (2, 3, 4)]
    + ["dup_%dgram_char_fraction" % n for n in range(5, 11)]
    + ["duplicate_line_char_fraction"]
)
_REP_TYPE = T.StructType([T.StructField(f, T.DoubleType()) for f in _REP_FIELDS])


def _repetition_one_py(text):
    """Reference implementation (tuple n-grams + Counter) — kept as the
    parity oracle for the vectorized kernel; not on the hot path."""
    if text is None:
        return [None] * len(_REP_FIELDS)
    words = [w for w in _WS.split(text) if w]
    lens = [len(w) for w in words]
    chars = sum(lens)
    out = []
    for n in (2, 3, 4):
        if chars == 0:
            out.append(None)
            continue
        best = 0
        if len(words) >= n:
            grams = Counter()
            gchars = {}
            for i in range(len(words) - n + 1):
                g = tuple(words[i : i + n])
                grams[g] += 1
                if g not in gchars:
                    gchars[g] = sum(lens[i : i + n])
            for g, c in grams.items():
                if c >= 2:
                    v = c * gchars[g]
                    if v > best:
                        best = v
        out.append(best / chars)
    for n in range(5, 11):
        if chars == 0:
            out.append(None)
            continue
        frac = 0.0
        if len(words) >= n:
            grams = [tuple(words[i : i + n]) for i in range(len(words) - n + 1)]
            cnt = Counter(grams)
            covered = bytearray(len(words))
            for i, g in enumerate(grams):
                if cnt[g] >= 2:
                    covered[i : i + n] = b"\x01" * n
            frac = sum(l for l, c in zip(lens, covered) if c) / chars
        out.append(frac)
    lines = [ln.strip(" ") for ln in text.split("\n")]
    lines = [ln for ln in lines if ln]
    lchars = sum(len(ln) for ln in lines)
    if lchars == 0:
        out.append(None)
    else:
        lcnt = Counter(lines)
        out.append(sum(len(ln) for ln in lines if lcnt[ln] >= 2) / lchars)
    return out


def _repetition_one(text):
    """Vectorized n-gram repetition signals. Words map to integer codes
    once; n-gram identities build INCREMENTALLY (rank-doubling style):
    the id array for n comes from ONE 1-D ``np.unique`` over
    ``prev_id * (W+1) + next_word_code`` — exact (each composition step
    is injective; both factors < W+1 so the product fits int64 for any
    realistic document), no hash collisions, no row-wise lexsort. Char
    weights come from a cumulative sum and dup-span coverage from a
    difference-array range update. Identical values to the tuple/Counter
    reference (``_repetition_one_py``, parity-tested); the 9 Counter
    passes collapse to 9 vectorized 1-D sorts, which at 10^12 docs is
    the whole cost of this operator."""
    import numpy as np

    if text is None:
        return [None] * len(_REP_FIELDS)
    words = _WS.split(text)
    words = [w for w in words if w]
    W = len(words)
    out_top: list = [None, None, None]
    out_dup: list = [None] * 6
    if W:
        vocab: dict = {}
        codes = np.fromiter(
            (vocab.setdefault(w, len(vocab)) for w in words),
            dtype=np.int64, count=W)
        lens = np.fromiter((len(w) for w in words), dtype=np.int64, count=W)
        cs = np.concatenate((np.zeros(1, dtype=np.int64), np.cumsum(lens)))
        chars = int(cs[-1])
    else:
        chars = 0
    if chars > 0:
        out_top = [0.0, 0.0, 0.0]
        out_dup = [0.0] * 6
        base = np.int64(W + 1)
        g = codes  # n=1 gram ids at positions 0..W-1
        for n in range(2, 11):
            if W < n:
                break
            combined = g[: W - n + 1] * base + codes[n - 1:]
            _, inv, cnt = np.unique(
                combined, return_inverse=True, return_counts=True)
            if n <= 4:
                # top-gram score: max over duplicated grams of
                # occurrences x gram char total (all occurrences of a
                # gram share the same char total -> last-write scatter)
                dup = cnt >= 2
                if dup.any():
                    gchars = np.zeros(len(cnt), dtype=np.int64)
                    gchars[inv] = cs[n:] - cs[:-n]
                    out_top[n - 2] = int((cnt[dup] * gchars[dup]).max()) / chars
            else:
                dup_pos = np.flatnonzero(cnt[inv] >= 2)
                if dup_pos.size:
                    add = np.zeros(W + 1, dtype=np.int64)
                    np.add.at(add, dup_pos, 1)
                    np.add.at(add, dup_pos + n, -1)
                    covered = np.cumsum(add[:W]) > 0
                    out_dup[n - 5] = float(lens[covered].sum()) / chars
            g = inv
    out = out_top + out_dup
    lines = [ln.strip(" ") for ln in text.split("\n")]
    lines = [ln for ln in lines if ln]
    lchars = sum(len(ln) for ln in lines)
    if lchars == 0:
        out.append(None)
    else:
        lcnt = Counter(lines)
        out.append(sum(len(ln) for ln in lines if lcnt[ln] >= 2) / lchars)
    return out


@F.pandas_udf(_REP_TYPE)
def repetition_signals(s: pd.Series) -> pd.DataFrame:
    """Arrow-batched struct of the 10 repetition signals (see module doc)."""
    rows = [_repetition_one(v) for v in s]
    return pd.DataFrame(rows, columns=_REP_FIELDS, dtype="object")


def quality_signals(
    df: DataFrame,
    text_col: str = "text",
    include_repetition: bool = True,
    stop_words: list[str] | None = None,
) -> DataFrame:
    """Annotate each document with its quality-signal columns.

    Adds (per doc; NULL for NULL text, fractions NULL when the denominator
    is 0): word_count, word_chars, mean_word_length, alpha_word_fraction,
    stop_word_count, symbol_to_word_ratio, line_count,
    duplicate_line_fraction, duplicate_paragraph_fraction,
    bullet_line_fraction, ellipsis_line_fraction,
    terminal_punct_line_fraction, has_lorem_ipsum, has_curly_brace, and —
    with ``include_repetition`` — the 10 pandas-UDF repetition fractions.

    One codegen scan + one Arrow batch per partition; no shuffle.
    """
    sw = [w.lower() for w in (GOPHER_STOP_WORDS if stop_words is None else stop_words)]
    t = F.col(text_col)
    words = word_array(t)
    lines = line_array(t)
    paras = line_array(t, sep="\n\n")
    n_words = F.size(words).cast("long")
    word_chars = F.length(F.concat_ws("", words)).cast("long")
    n_lines = F.size(lines).cast("long")
    symbols = (
        F.regexp_count(t, F.lit("#"))
        + F.regexp_count(t, F.lit(r"\.\.\."))
        + F.regexp_count(t, F.lit("…"))
    )
    bullet = F.size(F.filter(lines, lambda x: F.substring(x, 1, 1).isin(*_BULLETS)))
    ellipsis = F.size(
        F.filter(lines, lambda x: F.endswith(x, F.lit(_ELLIPSES[0]))
                 | F.endswith(x, F.lit(_ELLIPSES[1])))
    )
    terminal = F.size(F.filter(lines, lambda x: x.rlike(_TERMINAL_RE)))
    alpha = F.size(F.filter(words, lambda x: x.rlike("[A-Za-z]")))
    stops = F.size(F.filter(words, lambda x: F.lower(x).isin(*sw))).cast("long")

    cols = {
        "word_count": n_words,
        "word_chars": word_chars,
        "mean_word_length": _frac(word_chars, n_words),
        "alpha_word_fraction": _frac(alpha, n_words),
        "stop_word_count": stops,
        "symbol_to_word_ratio": _frac(symbols, n_words),
        "line_count": n_lines,
        "duplicate_line_fraction": _frac(n_lines - F.size(F.array_distinct(lines)), n_lines),
        "duplicate_paragraph_fraction": _frac(
            F.size(paras) - F.size(F.array_distinct(paras)), F.size(paras)
        ),
        "bullet_line_fraction": _frac(bullet, n_lines),
        "ellipsis_line_fraction": _frac(ellipsis, n_lines),
        "terminal_punct_line_fraction": _frac(terminal, n_lines),
        "has_lorem_ipsum": F.contains(F.lower(t), F.lit("lorem ipsum")),
        "has_curly_brace": F.contains(t, F.lit("{")),
    }
    out = df
    for name, col in cols.items():
        out = out.withColumn(name, F.when(t.isNull(), F.lit(None)).otherwise(col))
    if include_repetition:
        rep = repetition_signals(t).alias("__rep")
        out = out.withColumn("__rep", rep).select("*", "__rep.*").drop("__rep")
    return out


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    *,
    out_col: str = "compression_ratio",
    level: int = 6,
) -> DataFrame:
    """Annotate each document with ``len(zlib(text)) / len(utf8(text))``
    — the compression-ratio repetition proxy the Dolma/RedPajama-style
    pipelines threshold on (a whole-document signal the per-n-gram
    Gopher fractions can't see: templated pages compress far below
    natural prose, near-random gibberish barely compresses at all).

    Lower = more redundant.  NULL text → NULL ratio; empty text → NULL
    (no bytes to measure).  One Arrow-batched pandas UDF (stdlib zlib,
    fixed ``level``), row-local — zero shuffles, composable as a
    ``predicate_stage`` threshold in a cleaning recipe.

    Determinism: exact byte counts from one zlib build are stable; the
    compressed SIZE may drift a byte or two across zlib versions, so —
    unlike the word/line signals — this column is pinned by unit tests
    (ordering + bounds), not by a DuckDB oracle.
    """
    return df.withColumn(out_col, compression_ratio_col(F.col(text_col),
                                                        level=level))


def compression_ratio_col(text: Column, *, level: int = 6) -> Column:
    """Column form of :func:`compression_ratio` — composes directly as a
    cleaning-recipe keep-predicate operand, e.g.
    ``predicate_stage("compressible", lambda df:
    compression_ratio_col(F.col("text")) >= 0.25)``."""
    if not 0 <= level <= 9:
        raise ValueError(f"level must be in [0, 9], got {level}")

    @F.pandas_udf(T.DoubleType())
    def _ratio(s: pd.Series) -> pd.Series:
        import zlib

        out = []
        for v in s:
            if v is None or len(v) == 0:
                out.append(None)
                continue
            raw = v.encode("utf-8")
            out.append(len(zlib.compress(raw, level)) / len(raw))
        return pd.Series(out, dtype="float64")

    return _ratio(text)


# Gopher A1 thresholds (top-/dup-n-gram entries keyed by n).
GOPHER_DEFAULTS = {
    "min_word_count": 50,
    "max_word_count": 100_000,
    "min_mean_word_length": 3.0,
    "max_mean_word_length": 10.0,
    "max_symbol_to_word_ratio": 0.1,
    "max_bullet_line_fraction": 0.9,
    "max_ellipsis_line_fraction": 0.3,
    "min_alpha_word_fraction": 0.8,
    "min_stop_word_count": 2,
    "max_duplicate_line_fraction": 0.3,
    "max_duplicate_paragraph_fraction": 0.3,
    "max_duplicate_line_char_fraction": 0.2,
    "max_top_ngram_char_fraction": {2: 0.20, 3: 0.18, 4: 0.16},
    "max_dup_ngram_char_fraction": {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10},
}


def gopher_suite(
    include_repetition: bool = True,
    require_text: bool = True,
    **overrides,
) -> ExpectationSuite:
    """The Gopher rule set as an ordinary ExpectationSuite over the
    ``quality_signals`` columns — so corpus cleaning IS suite filtering
    (``split_by_suite``/``rejection_stats``) and the same suite can be
    VALIDATED (mostly=...) to monitor a corpus instead of filtering it.

    Any ``GOPHER_DEFAULTS`` key can be overridden; pass ``None`` to drop
    that rule.
    """
    cfg = dict(GOPHER_DEFAULTS)
    for k, v in overrides.items():
        if k not in GOPHER_DEFAULTS:
            raise ValueError(f"unknown gopher threshold: {k}")
        cfg[k] = v
    s = ExpectationSuite(name="gopher_quality")
    if require_text:
        s.add("expect_column_values_to_not_be_null", column="text")
    if cfg["min_word_count"] is not None or cfg["max_word_count"] is not None:
        s.add("expect_column_values_to_be_between", column="word_count",
              min_value=cfg["min_word_count"], max_value=cfg["max_word_count"])
    if cfg["min_mean_word_length"] is not None or cfg["max_mean_word_length"] is not None:
        s.add("expect_column_values_to_be_between", column="mean_word_length",
              min_value=cfg["min_mean_word_length"],
              max_value=cfg["max_mean_word_length"])
    if cfg["max_symbol_to_word_ratio"] is not None:
        s.add("expect_column_values_to_be_between", column="symbol_to_word_ratio",
              max_value=cfg["max_symbol_to_word_ratio"])
    if cfg["max_bullet_line_fraction"] is not None:
        s.add("expect_column_values_to_be_between", column="bullet_line_fraction",
              max_value=cfg["max_bullet_line_fraction"])
    if cfg["max_ellipsis_line_fraction"] is not None:
        s.add("expect_column_values_to_be_between", column="ellipsis_line_fraction",
              max_value=cfg["max_ellipsis_line_fraction"])
    if cfg["min_alpha_word_fraction"] is not None:
        s.add("expect_column_values_to_be_between", column="alpha_word_fraction",
              min_value=cfg["min_alpha_word_fraction"])
    if cfg["min_stop_word_count"] is not None:
        s.add("expect_column_values_to_be_between", column="stop_word_count",
              min_value=cfg["min_stop_word_count"])
    if cfg["max_duplicate_line_fraction"] is not None:
        s.add("expect_column_values_to_be_between", column="duplicate_line_fraction",
              max_value=cfg["max_duplicate_line_fraction"])
    if cfg["max_duplicate_paragraph_fraction"] is not None:
        s.add("expect_column_values_to_be_between",
              column="duplicate_paragraph_fraction",
              max_value=cfg["max_duplicate_paragraph_fraction"])
    if include_repetition:
        if cfg["max_duplicate_line_char_fraction"] is not None:
            s.add("expect_column_values_to_be_between",
                  column="duplicate_line_char_fraction",
                  max_value=cfg["max_duplicate_line_char_fraction"])
        for n, thr in (cfg["max_top_ngram_char_fraction"] or {}).items():
            s.add("expect_column_values_to_be_between",
                  column=f"top_{n}gram_char_fraction", max_value=thr)
        for n, thr in (cfg["max_dup_ngram_char_fraction"] or {}).items():
            s.add("expect_column_values_to_be_between",
                  column=f"dup_{n}gram_char_fraction", max_value=thr)
    return s


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    include_repetition: bool = True,
    stop_words: list[str] | None = None,
    **overrides,
) -> tuple[DataFrame, DataFrame]:
    """(kept, rejected) under the Gopher rules: ``quality_signals`` →
    ``split_by_suite``. One scan; ``rejected`` carries the
    ``failed_expectations`` reason array for triage.
    """
    from great_expectations_spark.pipeline.filtering import split_by_suite

    ann = quality_signals(df, text_col=text_col,
                          include_repetition=include_repetition,
                          stop_words=stop_words)
    suite = gopher_suite(include_repetition=include_repetition, **overrides)
    return split_by_suite(ann, suite)


def c4_clean_lines(text: Column, min_words: int = 3,
                   require_terminal_punct: bool = True) -> Column:
    """C4's line-level cleaning (Raffel et al. §2.2) as a pure Column
    rewrite: keep only space-trimmed lines with ≥ ``min_words`` words
    (and, by default, ending in terminal punctuation ``[.!?"]``), joined
    back with ``\\n``. NULL text stays NULL; a doc with no surviving
    lines becomes the empty string (filter it with ``c4_suite``)."""
    lines = line_array(text)

    def keep(ln):
        ok = F.size(word_array(ln)) >= min_words
        if require_terminal_punct:
            ok = ok & ln.rlike(_TERMINAL_RE)
        return ok

    return F.when(text.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat_ws("\n", F.filter(lines, keep))
    )


def c4_suite(min_lines: int = 3) -> ExpectationSuite:
    """C4's document-level drop rules over ``quality_signals`` columns:
    no 'lorem ipsum', no '{', and ≥ ``min_lines`` surviving lines."""
    return (
        ExpectationSuite(name="c4_quality")
        .add("expect_column_values_to_be_in_set", column="has_lorem_ipsum",
             value_set=[False])
        .add("expect_column_values_to_be_in_set", column="has_curly_brace",
             value_set=[False])
        .add("expect_column_values_to_be_between", column="line_count",
             min_value=min_lines)
    )
