"""Corpus-trained byte-pair-encoding tokenizer (Sennrich et al. 2016,
arXiv:1508.07909) — train the merge table ON the corpus with one Spark
scan, encode any batch with an Arrow-vectorized merge kernel.

A training-data pipeline budgets context windows, packs sequences, and
prices storage in TOKENS, not characters; ``textstats.token_count_bpe``
is the cheap pre-tokenizer proxy, this module is the real thing: the
token count (and token stream) of a BPE vocabulary learned from the
corpus itself.  No external model files — the merge table is a small
persistable DataFrame, the same state-table contract as
``lm.unigram_lm`` and the incremental-dedup signature tables.

Pipeline shape
--------------
* ``piece_counts`` — the BPE training input is the *piece-frequency
  dict* (word types x counts), not the corpus: ONE scan
  (``regexp_extract_all`` with the GPT-2-style pre-tokenizer pattern →
  explode → map-combinable groupBy), then a bounded
  ``orderBy(cnt desc, piece).limit(max_pieces)`` TakeOrdered cut.  At
  crawl scale the distinct-piece table is millions of rows while the
  corpus is 10^12 — the dict is the only thing that ever leaves Spark.
* ``train_bpe`` — classic Sennrich merge learning over the collected
  dict on the driver (same driver-bound pattern as the k-means
  codebook: ``max_pieces`` rows x avg piece length chars).  Incremental
  pair-statistics updates (only words containing the merged pair are
  rescanned), so cost is proportional to affected words per merge, not
  dict size x merges.  Deterministic: the best pair maximizes
  ``(count, -lexicographic(left, right))`` — count ties break toward
  the lexicographically smaller pair — so the same corpus always yields
  the same merge table on any engine.
* ``bpe_encode`` / ``bpe_token_count`` — pre-tokenization stays in
  whole-stage codegen (``regexp_extract_all``); only the merge
  application crosses into Python, as ONE Arrow-batched pandas UDF over
  the piece array with a per-worker memo: each distinct piece is
  encoded once per worker lifetime, so boilerplate-heavy web text pays
  the Python loop per piece TYPE, not per occurrence.  Zero shuffles —
  encoding is row-local.

Encoding rule (deterministic, engine-replayable)
------------------------------------------------
``encode(piece)``: start from the character sequence and apply the
learned merges IN RANK ORDER — for each merge, in training order,
greedily collapse all of its occurrences left-to-right.  This is the
original Sennrich ``apply_bpe`` semantics (each training step replayed
verbatim), implemented efficiently as a lowest-rank-present loop with a
monotone rank cursor (a pair whose rank the cursor has passed is never
revisited, exactly as sequential application would skip it).  It
differs from the GPT-2 re-select loop only when merging a pair creates
a strictly-lower-rank pair — which requires the same symbol string to
be derivable from two different learned merge splits ("abc" via both
("a","bc") and ("ab","c")); ``tests/test_bpe.py`` checks agreement with
the GPT-2 variant over randomized corpora.  Rank-order application is
chosen because it makes encoding a pure replay of training: the DuckDB
oracle (`pipeline_bpe_encode`) unrolls the training stages as CTEs
(each stage a recursive leftmost-merge loop) and reads the final
word-state as the encoding — the tokenizer is verified end-to-end,
digit-exact, not just its plumbing.

Scale notes: training reads the corpus once and collects only the
bounded dict; encoding is embarrassingly parallel with the merge table
shipped in the UDF closure (``num_merges`` short strings — the same
size class as a broadcast codebook).  No operation here shuffles the
text.

The reference repo has no tokenizer surface; this module extends the
training-data-pipeline addendum (SURVEY.md §2 "token counting") from a
pre-tokenizer estimate to a trained vocabulary.
"""

from __future__ import annotations

import hashlib
import heapq
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from great_expectations_spark.pipeline.textstats import BPE_SPLIT_PATTERN

MERGES_SCHEMA = "rank INT NOT NULL, left STRING NOT NULL, right STRING NOT NULL"

# Per-process piece->tokens memo, keyed by a fingerprint of the merge
# table (see bpe_encode): survives across tasks within one python worker.
# Bounded two ways: only ONE model's memo is retained (a new fingerprint
# evicts the old — a retraining/parameter-sweep session must not
# accumulate one memo per historical model), and a memo that outgrows
# the cap is cleared wholesale (the cache is an optimization, never a
# correctness dependency).
_PIECE_CACHE: dict[str, dict[str, list[str]]] = {}
_PIECE_CACHE_MAX = 1_000_000


def _piece_memo(model_key: str) -> dict[str, list[str]]:
    memo = _PIECE_CACHE.get(model_key)
    if memo is None:
        _PIECE_CACHE.clear()
        memo = _PIECE_CACHE[model_key] = {}
    return memo


def piece_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    pattern: str = BPE_SPLIT_PATTERN,
    min_count: int = 1,
    max_pieces: int | None = None,
) -> DataFrame:
    """Piece-frequency dict ``(piece, cnt)`` — the BPE training input.

    ONE scan: pre-tokenize every document with ``pattern`` (full-match
    extraction, the same GPT-2-style pattern ``textstats.
    token_count_bpe`` counts), explode, and count per piece with a
    map-combinable groupBy.  ``max_pieces`` applies a bounded
    ``(cnt desc, piece asc)`` TakeOrdered cut — k rows per partition,
    never a global sort — so the returned dict is driver-collectable by
    construction.  NULL ids/texts contribute nothing.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if max_pieces is not None and max_pieces < 1:
        raise ValueError(f"max_pieces must be >= 1 or None, got {max_pieces}")
    pieces = (
        df.where(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
        .select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))
            ).alias("piece")
        )
        .groupBy("piece")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    if min_count > 1:
        pieces = pieces.where(F.col("cnt") >= min_count)
    if max_pieces is not None:
        pieces = pieces.orderBy(F.col("cnt").desc(), F.col("piece")).limit(max_pieces)
    return pieces


def _merge_first(sym: list[str], left: str, right: str) -> list[str] | None:
    """Merge the leftmost (left, right) occurrence; None if absent."""
    for i in range(len(sym) - 1):
        if sym[i] == left and sym[i + 1] == right:
            return sym[:i] + [left + right] + sym[i + 2 :]
    return None


def _merge_all(sym: list[str], left: str, right: str) -> list[str]:
    """Greedily collapse every (left, right) occurrence left-to-right —
    the single merge-application rule shared by the trainer and the
    encoder (the 'encoding replays training' invariant the SQL oracle
    depends on lives here, in one place)."""
    while True:
        nxt = _merge_first(sym, left, right)
        if nxt is None:
            return sym
        sym = nxt


def _pair_stats(
    words: list[tuple[list[str], int]],
) -> tuple[Counter, dict[tuple[str, str], set[int]]]:
    counts: Counter = Counter()
    where: dict[tuple[str, str], set[int]] = {}
    for wi, (sym, cnt) in enumerate(words):
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            counts[p] += cnt
            where.setdefault(p, set()).add(wi)
    return counts, where


def train_bpe(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_merges: int = 4000,
    pattern: str = BPE_SPLIT_PATTERN,
    min_count: int = 1,
    min_pair_count: int = 2,
    max_pieces: int = 200_000,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    persistable merge table ``(rank, left, right)`` (rank 0 first).

    The corpus is read ONCE (``piece_counts``); the merge loop runs on
    the driver over the bounded dict with incremental pair statistics —
    the textbook Sennrich trainer, the same driver-bound shape as the
    k-means codebook.  Training stops early when the best remaining
    pair's weighted count drops below ``min_pair_count`` (a pair seen
    once cannot generalize), so the table may hold fewer than
    ``num_merges`` rows.

    Determinism: best pair = max count, ties toward the
    lexicographically smaller ``(left, right)``; the same corpus yields
    the same table regardless of partitioning (``piece_counts`` is an
    exact aggregate).
    """
    if num_merges < 0:
        raise ValueError(f"num_merges must be >= 0, got {num_merges}")
    if min_pair_count < 1:
        raise ValueError(f"min_pair_count must be >= 1, got {min_pair_count}")
    spark = df.sparkSession
    dict_rows = piece_counts(
        df, id_col, text_col,
        pattern=pattern, min_count=min_count, max_pieces=max_pieces,
    ).collect()
    words: list[tuple[list[str], int]] = [
        (list(r["piece"]), int(r["cnt"])) for r in dict_rows
    ]
    merges = _learn_merges(words, num_merges, min_pair_count)
    return spark.createDataFrame(merges, MERGES_SCHEMA)


def _learn_merges(
    words: list[tuple[list[str], int]],
    num_merges: int,
    min_pair_count: int,
) -> list[tuple[int, str, str]]:
    """The driver-side merge loop of :func:`train_bpe`, factored out so
    the incremental bookkeeping is testable against a brute-force
    reference without a SparkSession.  Mutates ``words`` in place."""
    counts, where = _pair_stats(words)

    # Lazy max-heap over (count desc, pair asc): every count update pushes
    # a fresh entry; stale entries are discarded at pop time by checking
    # against the live Counter. Selection is O(log n) per merge instead of
    # a full dict scan (which would dominate training at the default
    # 200k-piece dict x 4000 merges).
    heap: list[tuple[int, str, str]] = [
        (-c, p[0], p[1]) for p, c in counts.items()
    ]
    heapq.heapify(heap)

    def _pop_best() -> tuple[tuple[str, str], int] | None:
        while heap:
            negc, l, r = heap[0]
            if counts.get((l, r)) == -negc:
                return (l, r), -negc
            heapq.heappop(heap)
        return None

    merges: list[tuple[int, str, str]] = []
    for rank in range(num_merges):
        top = _pop_best()
        if top is None or top[1] < min_pair_count:
            break
        best = top[0]
        merges.append((rank, best[0], best[1]))
        # Incremental update: rescan only the words containing the pair,
        # then re-push every touched pair's fresh count (decrements too —
        # a pair whose only heap entries are stale would otherwise become
        # unselectable).
        touched: set[tuple[str, str]] = set()
        for wi in list(where.get(best, ())):
            sym, cnt = words[wi]
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] -= cnt
                touched.add(p)
                if counts[p] <= 0:
                    del counts[p]
                s = where.get(p)
                if s is not None:
                    s.discard(wi)
                    if not s:
                        del where[p]
            new = _merge_all(sym, best[0], best[1])
            words[wi] = (new, cnt)
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                counts[p] += cnt
                touched.add(p)
                where.setdefault(p, set()).add(wi)
        for p in touched:
            c = counts.get(p)
            if c is not None:
                heapq.heappush(heap, (-c, p[0], p[1]))
    return merges


def _encode_piece(piece: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Rank-order merge application (module docstring): lowest-rank
    present pair with a monotone cursor, each selected pair collapsed
    greedily left-to-right — sequential ``apply_bpe`` replayed without
    iterating over unused merges."""
    sym = list(piece)
    cursor = 0
    while len(sym) > 1:
        best_rank: int | None = None
        best_pair: tuple[str, str] | None = None
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            r = ranks.get(p)
            if r is not None and r >= cursor and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_rank is None or best_pair is None:
            break
        sym = _merge_all(sym, best_pair[0], best_pair[1])
        cursor = best_rank + 1
    return sym


def bpe_encode(
    df: DataFrame,
    merges: DataFrame,
    id_col: str,
    text_col: str,
    *,
    pattern: str = BPE_SPLIT_PATTERN,
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize every document with a trained merge table.

    Returns ``(id_col, out_col: array<string>, n_bpe: int)``; NULL text
    (or NULL id) rows pass through with NULL tokens/count — the same
    passthrough contract as ``classifier.classify_docs``.
    ``concat_ws("", out_col) == text`` for every non-null document (the
    tokenizer is lossless by construction; pinned by the oracle and
    tests).

    Plan shape: pre-tokenization is codegen (``regexp_extract_all``);
    merges apply in ONE Arrow-batched pandas UDF over the piece array
    with a per-worker piece memo (each distinct piece encoded once per
    worker).  Row-local — zero shuffles.  The merge table is collected
    (bounded: ``num_merges`` rows) and shipped in the UDF closure like
    a broadcast codebook.
    """
    rank_rows = merges.select("rank", "left", "right").collect()
    ranks = {(r["left"], r["right"]): int(r["rank"]) for r in rank_rows}
    # Per-PROCESS memo key: the UDF closure is re-deserialized per task, so
    # a closure-local dict would reset every partition; the module-level
    # cache (keyed by a fingerprint of the merge table) survives for the
    # executor's python-worker lifetime, so each distinct piece is encoded
    # once per worker process, not once per partition.
    model_key = hashlib.md5(
        repr(sorted(ranks.items())).encode()).hexdigest()

    @F.pandas_udf(ArrayType(StringType(), containsNull=False))
    def _apply(pieces: pd.Series) -> pd.Series:
        memo = _piece_memo(model_key)
        out = []
        for ps in pieces:
            if ps is None:
                out.append(None)
                continue
            toks: list[str] = []
            for p in ps:
                enc = memo.get(p)
                if enc is None:
                    if len(memo) >= _PIECE_CACHE_MAX:
                        memo.clear()
                    enc = _encode_piece(p, ranks)
                    memo[p] = enc
                toks.extend(enc)
            out.append(toks)
        return pd.Series(out)

    text = F.col(text_col)
    ok = F.col(id_col).isNotNull() & text.isNotNull()
    pieces = F.when(ok, F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))
    encoded = df.select(F.col(id_col), _apply(pieces).alias(out_col))
    t = F.col(out_col)
    return encoded.select(
        F.col(id_col),
        t,
        F.when(t.isNotNull(), F.size(t)).cast("int").alias("n_bpe"),
    )


def bpe_token_count(
    df: DataFrame,
    merges: DataFrame,
    id_col: str,
    text_col: str,
    *,
    pattern: str = BPE_SPLIT_PATTERN,
) -> DataFrame:
    """Per-document trained-BPE token counts ``(id_col, n_bpe)`` —
    :func:`bpe_encode` without materializing the token arrays in the
    result (the arrays still exist transiently inside the projection;
    Spark prunes the column after ``F.size``)."""
    return bpe_encode(
        df, merges, id_col, text_col, pattern=pattern
    ).select(id_col, "n_bpe")
