"""Document chunking: split documents into fixed token windows with
overlap — the retrieval/embedding counterpart of `pipeline/packing.py`
(packing assembles docs into training sequences; chunking splits docs
into indexable passages).

RAG-style corpora index fixed-size overlapping passages, not whole
documents; the chunk table this produces feeds `pipeline/retrieval.py`
(BM25 over chunks) and `pipeline/similarity.py` (ANN over chunk
embeddings) directly. The reference has no chunking operator — this is
training-data addendum surface, like packing and dedup.

Chunk rule (deterministic, engine-portable integer arithmetic):

    stride      = window - overlap
    starts      = 0, stride, 2*stride, ...
    chunk count = 1                                   if n <= window
                  1 + ceil((n - window) / stride)     otherwise

i.e. every chunk after the first must add at least one new token — no
trailing chunk that is a pure suffix of its predecessor. The last chunk
may be shorter than ``window``.

Scale design: chunking is embarrassingly row-local — ONE projection +
explode, no shuffle, no UDF. The token array is materialized as a real
column before slicing (higher-order-function lambdas re-evaluate
``split`` per element otherwise). Chunk counts are data-derived, so a
10^12-doc corpus explodes in place with whatever parallelism the scan
has; nothing aggregates.

Tokens are single-space tokens (the corpus-wide convention shared with
`pipeline/retrieval.py` and `textstats.token_count`). ``reassemble``
with ``overlap=0`` restores each document's token stream exactly
(token-lossless, NOT byte-lossless — runs of whitespace collapse; the
byte-lossless splitter is `pipeline/paragraph.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from great_expectations_spark.pipeline.dedup import nonempty_tokens

__all__ = ["chunk_documents", "reassemble_chunks"]


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    window: int = 256,
    overlap: int = 0,
    min_tokens: int = 1,
) -> DataFrame:
    """Split each document into token windows → ``(id, chunk_idx,
    start_token, n_tokens, chunk_text)``.

    ``window`` tokens per chunk, consecutive chunks sharing ``overlap``
    tokens. Rows with NULL id/text, or fewer than ``min_tokens`` tokens,
    produce no chunks.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if not 0 <= overlap < window:
        raise ValueError(
            f"overlap must be in [0, window), got {overlap} for window "
            f"{window}")
    if min_tokens < 1:
        raise ValueError(f"min_tokens must be >= 1, got {min_tokens}")
    stride = window - overlap

    toked = (
        df.where(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias(id_col),
            nonempty_tokens(F.col(text_col)).alias("__toks"),
        )
        .withColumn("__n", F.size("__toks"))
        .where(F.col("__n") >= min_tokens)
    )
    num = F.when(F.col("__n") <= window, F.lit(1)).otherwise(
        1 + F.floor((F.col("__n") - window + stride - 1) / stride)
    )
    return (
        toked.select(
            id_col, "__toks", "__n",
            F.explode(F.sequence(F.lit(0), (num - 1).cast("int")))
            .alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            (F.col("chunk_idx").cast("long") * stride).alias("start_token"),
            F.least(
                F.lit(window).cast("long"),
                F.col("__n") - F.col("chunk_idx").cast("long") * stride,
            ).alias("n_tokens"),
            F.array_join(
                F.slice(F.col("__toks"),
                        (F.col("chunk_idx") * stride + 1).cast("int"),
                        window),
                " ",
            ).alias("chunk_text"),
        )
    )


def reassemble_chunks(
    chunks: DataFrame, id_col: str, *, overlap: int = 0
) -> DataFrame:
    """Rebuild ``(id, text)`` from a chunk table — the audit inverse of
    :func:`chunk_documents` (token-lossless for any ``overlap``; pass the
    value chunking used so shared prefixes are trimmed).

    One map-side-combinable groupBy: chunks collect as (idx, text)
    structs, ``sort_array`` orders them in place — no window, no global
    sort."""
    if overlap < 0:
        raise ValueError(f"overlap must be >= 0, got {overlap}")
    trimmed = F.when(
        F.col("chunk_idx") == 0, F.col("chunk_text")
    ).otherwise(
        # drop the first `overlap` tokens: they repeat the previous chunk
        F.array_join(
            F.slice(F.split(F.col("chunk_text"), " "), overlap + 1,
                    2147483647),
            " ",
        )
    )
    return (
        chunks.select(
            F.col(id_col).alias(id_col),
            F.struct(F.col("chunk_idx"), trimmed.alias("t")).alias("__c"),
        )
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("__c")),
                    lambda s: s["t"],
                ),
                " ",
            ).alias("text")
        )
    )
