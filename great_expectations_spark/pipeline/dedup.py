"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale notes (100 TB / 10^12 docs):
  * exact dedup hashes each doc to 16 bytes BEFORE the shuffle — the
    groupBy moves md5 digests, not document bodies, and map-side partial
    aggregation (Catalyst HashAggregate) collapses per-partition dups first.
  * MinHash+LSH shuffles (band_id, bucket, doc_id) triples only — k hex
    signatures never leave the map stage; bucket join is a shuffle on a
    16-byte bucket key with AQE skew splitting.
  * SimHash emits one 64-bit int per doc; exact-bucket grouping is a
    map-side-combinable count.
  * n-gram Jaccard is quadratic and is only ever run on an LSH candidate
    set (or an explicitly sampled sub-corpus), never the full corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def _md5(col: Column) -> Column:
    return F.md5(F.encode(col, "UTF-8"))


def tokens(text: Column) -> Column:
    """Single-space tokenization (the cross-engine contract)."""
    return F.split(text, " ")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams joined by a single space; NULL-safe.

    Docs with fewer than ``n`` tokens yield an empty array.
    """
    t = tokens(text)
    # sequence(0, -1) would DESCEND in Spark — guard short docs with an
    # explicit empty array instead
    idx = F.when(
        F.size(t) >= n, F.sequence(F.lit(0), F.size(t) - n)
    ).otherwise(F.array().cast("array<int>"))
    gram = lambda i: F.concat_ws(" ", *[F.element_at(t, i + j + 1) for j in range(n)])
    return F.array_distinct(F.transform(idx, gram))


# --------------------------------------------------------------------- exact


def exact_dedup_stats(df: DataFrame, col: str) -> DataFrame:
    """One-row summary of exact duplication by md5(col).

    Returns (n_rows, n_null, n_distinct, dup_rows, dup_groups) where
    dup_rows counts every row beyond the first of each duplicate group.
    """
    h = df.where(F.col(col).isNotNull()).select(_md5(F.col(col)).alias("__h"))
    grouped = h.groupBy("__h").agg(F.count(F.lit(1)).alias("n"))
    stats = grouped.agg(
        F.sum("n").alias("nn"),
        F.count(F.lit(1)).alias("nd"),
        F.sum(F.col("n") - 1).alias("dup_rows"),
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).alias("dup_groups"),
    )
    nulls = df.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias("n_null"),
    )
    return nulls.crossJoin(stats).select(
        F.col("total").cast("long").alias("n_rows"),
        F.col("n_null").cast("long").alias("n_null"),
        F.col("nd").cast("long").alias("n_distinct"),
        F.col("dup_rows").cast("long").alias("dup_rows"),
        F.col("dup_groups").cast("long").alias("dup_groups"),
    )


def exact_dedup(df: DataFrame, col: str, keep_order_col: str | None = None) -> DataFrame:
    """Keep one row per distinct value of ``col`` (first by ``keep_order_col``).

    At scale this is a single hash-shuffle on the 16-byte digest; the
    row_number window runs inside each post-shuffle partition.
    """
    order = F.col(keep_order_col) if keep_order_col else F.monotonically_increasing_id()
    w = Window.partitionBy(_md5(F.col(col))).orderBy(order)
    return (
        df.where(F.col(col).isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


# ------------------------------------------------------------- MinHash + LSH


def minhash_signature(text: Column, k: int = 12, shingle_n: int = 3) -> Column:
    """Array of k minhash values: lexicographic min of salted md5 hex.

    Pure Column expression — computed map-side, never shuffled.
    """
    sh = word_shingles(text, shingle_n)

    def salted(i):
        return lambda s: _md5(F.concat(F.lit(f"{i}:"), s))

    return F.array(*[F.array_min(F.transform(sh, salted(i))) for i in range(k)])


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-duplicate candidate pairs (id_a < id_b) sharing any LSH bucket.

    Signature → ``bands`` bands of ``k/bands`` rows each; band bucket =
    md5 of the concatenated rows. Only (band, bucket, id) triples shuffle.
    """
    r = k // bands
    sig = minhash_signature(F.col(text_col), k, shingle_n)
    base = (
        df.where(F.col(text_col).isNotNull() & (F.size(tokens(F.col(text_col))) >= shingle_n))
        .select(F.col(id_col).alias("__id"), sig.alias("__sig"))
    )
    band_cols = [
        _md5(F.concat_ws("|", *[F.col("__sig")[b * r + j] for j in range(r)])).alias("__bucket")
        for b in range(bands)
    ]
    exploded = base.select(
        "__id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), band_cols[b]) for b in range(bands)
            ])
        ).alias("bb"),
    ).select("__id", F.col("bb.band").alias("band"), F.col("bb.__bucket").alias("bucket"))

    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(b, on=["band", "bucket"])
        .where(F.col("a.__id") < F.col("b.__id"))
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )


# ------------------------------------------------------------------- SimHash


def simhash(text: Column, bits: int = 16) -> Column:
    """SimHash over distinct tokens.

    Bit j of token-hash = parity of the value of hex digit j+1 of
    md5(token) (portable to any SQL engine via instr arithmetic). The
    simhash sets bit j iff strictly more tokens vote 1 than 0.
    """
    toks = F.array_distinct(tokens(text))
    hashes = F.transform(toks, lambda t: _md5(t))
    def voter(j):
        # vote per token: +1 if hex digit j+1 of md5(token) is odd, else -1
        return lambda acc, h: acc + F.when(
            (F.instr(F.lit(HEX), F.substring(h, j + 1, 1)) - 1) % 2 == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for j in range(bits):
        vote_sum = F.aggregate(hashes, F.lit(0), voter(j))
        out = out + F.when(vote_sum > 0, F.lit(2 ** j)).otherwise(0)
    return out


def simhash_dedup_stats(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """Group docs by exact simhash; return per-bucket collision counts > 1."""
    h = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("__id"), simhash(F.col(text_col), bits).alias("sh"))
    )
    return (
        h.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") > 1)
        .select(F.col("sh").cast("long").alias("simhash"), F.col("n_docs").cast("long").alias("n_docs"))
    )


# ------------------------------------------------------- n-gram Jaccard


def ngram_jaccard_pairs(
    left: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact Jaccard similarity over word-n-gram sets for all pairs in
    ``left`` (id_a < id_b). Quadratic — run on LSH candidates or samples.

    Implemented as shingle-explode + equi-join on the shingle (shuffle on
    shingle hash), counting intersections; set sizes broadcast back in.
    """
    sh = (
        left.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("__id"),
            F.explode(word_shingles(F.col(text_col), n)).alias("s"),
        )
    )
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, on="s")
        .where(F.col("a.__id") < F.col("b.__id"))
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("__id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("__id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# ------------------------------------------- embedding cosine near-dup


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float = 0.99,
) -> DataFrame:
    """Near-duplicate embedding pairs within a blocking key (e.g. label or
    an LSH bucket): cosine >= threshold, id_a < id_b.

    Blocking keeps the join from being a full cross product; at corpus
    scale ``block_col`` is an LSH bucket from random-hyperplane signs.
    """
    from great_expectations_spark.pipeline.similarity import cosine_sim

    v = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        F.col(block_col).alias("__blk"),
    )
    a, b = v.alias("a"), v.alias("b")
    sim = cosine_sim(F.col("a.__v"), F.col("b.__v"))
    return (
        a.join(b, on="__blk")
        .where(F.col("a.__id") < F.col("b.__id"))
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.round(sim, 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
