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

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from great_expectations_spark.pipeline._lineage import fused_checkpoint

HEX = "0123456789abcdef"

# Mersenne prime 2^31-1: universal-hash modulus. Token/shingle hashes are
# 60-bit ints (first 15 hex chars of md5), folded to [0, P) before the
# per-permutation affine map — (a*x + b) never overflows int64.
MINHASH_P = 2_147_483_647


def _md5(col: Column) -> Column:
    return F.md5(F.encode(col, "UTF-8"))


def _md5_int(col: Column) -> Column:
    """60-bit integer hash: first 15 hex chars of md5, base-16 parsed.
    Engine-portable: DuckDB ``('0x' || substr(md5(s),1,15))::BIGINT``."""
    return F.conv(F.substring(_md5(col), 1, 15), 16, 10).cast("long")


def minhash_params(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) affine-permutation params, derived driver-side
    from md5 so any engine can replay them as literals."""
    out = []
    for i in range(k):
        a = int(hashlib.md5(f"mh:a:{i}".encode()).hexdigest()[:8], 16) % (MINHASH_P - 1) + 1
        b = int(hashlib.md5(f"mh:b:{i}".encode()).hexdigest()[:8], 16) % MINHASH_P
        out.append((a, b))
    return out


def tokens(text: Column) -> Column:
    """Single-space tokenization (the cross-engine contract)."""
    return F.split(text, " ")


def nonempty_tokens(text: Column) -> Column:
    """:func:`tokens` with empty strings dropped — the shared contract
    for every module that counts or windows tokens (retrieval, chunking,
    lm): adjacent/leading/trailing spaces contribute no tokens."""
    return F.filter(tokens(text), lambda t: t != F.lit(""))


def _shingle_index(t: Column, n: int) -> Column:
    # sequence(0, -1) would DESCEND in Spark — guard short docs with an
    # explicit empty array instead
    return F.when(
        F.size(t) >= n, F.sequence(F.lit(0), F.size(t) - n)
    ).otherwise(F.array().cast("array<int>"))


def word_shingles(tok_col: Column, n: int = 3) -> Column:
    """Distinct word n-grams joined by a single space.

    ``tok_col`` MUST be a materialized token-array column (see
    ``hashed_tokens``'s performance note): ``element_at`` inside a lambda
    re-evaluates its child expression per access, so shingling over an
    inline ``split(...)`` is quadratic in document length.

    Docs with fewer than ``n`` tokens yield an empty array.
    """
    gram = lambda i: F.concat_ws(" ", *[F.element_at(tok_col, i + j + 1) for j in range(n)])
    return F.array_distinct(F.transform(_shingle_index(tok_col, n), gram))


# multiplier for the rolling shingle-hash combine; (P-1)*C + (P-1) < 2^63
SHINGLE_C = 65_599


def hashed_tokens(tok_col: Column) -> Column:
    """Token-hash ints in [0, P): ONE md5 per token.

    Project the result into its own column (``.select``/``.withColumn``)
    before building shingles or signatures from it — referencing a
    materialized column keeps downstream ``element_at`` calls O(1) and
    stops Catalyst duplicating the hash subtree.
    """
    return F.transform(tok_col, lambda t: _md5_int(t) % MINHASH_P)


def hashed_shingles(th_col: Column, n: int = 3) -> Column:
    """Distinct shingle hashes from a token-hash array column: rolling
    combine s := (s * C + h[i+j]) mod P — integer codegen only, no string
    concatenation. Engine-portable (same arithmetic in the DuckDB oracle).
    """

    def gram(i):
        s = F.element_at(th_col, i + 1)
        for j in range(1, n):
            s = (s * SHINGLE_C + F.element_at(th_col, i + j + 1)) % MINHASH_P
        return s

    return F.array_distinct(F.transform(_shingle_index(th_col, n), gram))


# --------------------------------------------------------------------- exact


def exact_dedup_stats(df: DataFrame, col: str) -> DataFrame:
    """One-row summary of exact duplication by md5(col).

    Returns (n_rows, n_null, n_distinct, dup_rows, dup_groups) where
    dup_rows counts every row beyond the first of each duplicate group.
    """
    h = df.where(F.col(col).isNotNull()).select(_md5(F.col(col)).alias("__h"))
    grouped = h.groupBy("__h").agg(F.count(F.lit(1)).alias("n"))
    # coalesce: on an empty/all-NULL input the sums are NULL, not 0
    stats = grouped.agg(
        F.count(F.lit(1)).alias("nd"),
        F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("dup_rows"),
        F.coalesce(F.sum(F.when(F.col("n") > 1, 1).otherwise(0)), F.lit(0)).alias("dup_groups"),
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
    """Keep one row per distinct non-NULL value of ``col`` (first by
    ``keep_order_col``); rows where ``col`` IS NULL carry no dedup signal
    and pass through UNCHANGED (they are not data to be dropped).

    At scale this is a single hash-shuffle on the 16-byte digest; the
    row_number window runs inside each post-shuffle partition.
    """
    order = F.col(keep_order_col) if keep_order_col else F.monotonically_increasing_id()
    w = Window.partitionBy(_md5(F.col(col))).orderBy(order)
    deduped = (
        df.where(F.col(col).isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    return deduped.unionByName(df.where(F.col(col).isNull()))


# ------------------------------------------------------------- MinHash + LSH


def minhash_from_hashes(hashes: Column, k: int = 12) -> Column:
    """Signature from an already-materialized shingle-hash array column:
    min of k affine permutations (a*x + b) mod P — cheap integer codegen,
    no additional hashing.

    Prefer projecting the hash array into its own column first
    (``.withColumn``): referencing one column keeps Catalyst from
    duplicating the tokenize+shingle+md5 subtree k times in the plan.
    """

    def perm(a, b):
        return lambda x: (x * F.lit(a) + F.lit(b)) % MINHASH_P

    return F.array(*[F.array_min(F.transform(hashes, perm(a, b))) for a, b in minhash_params(k)])


def lsh_plan(
    threshold: float,
    k: int = 128,
    *,
    false_negative_weight: float = 1.0,
) -> dict:
    """Split a ``k``-permutation signature budget into ``(bands, rows)``
    for a target Jaccard ``threshold``.

    The banding S-curve gives P(candidate | jaccard=s) = 1-(1-s^r)^b with
    inflection near (1/b)^(1/r) (Leskovec/Rajaraman/Ullman, MMDS ch. 3 —
    public textbook construction; same objective as datasketch's
    ``_optimal_param``). Enumerates every exact split b*r = k and
    minimizes the integrated error: the area under the S-curve below the
    threshold (false positives — wasted verification work) plus
    ``false_negative_weight`` × the area ABOVE threshold where the curve
    falls short of 1 (missed near-dups). Weight > 1 biases toward recall,
    the usual dedup preference; k itself is the caller's compute/storage
    budget (signature width), not something to optimize here.

    Returns ``{"k", "bands", "rows", "threshold_at_inflection",
    "p_at_threshold"}`` — feed ``k``/``bands`` straight into
    ``minhash_lsh_candidates`` (which requires exact divisibility, hence
    exact splits only). Pure driver math, no Spark."""
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    steps = 500
    best = None
    for b in range(1, k + 1):
        if k % b != 0:
            continue
        r = k // b
        fp = fn = 0.0
        for i in range(steps):
            s = (i + 0.5) / steps
            p = 1.0 - (1.0 - s ** r) ** b
            if s < threshold:
                fp += p
            else:
                fn += 1.0 - p
        err = (fp + false_negative_weight * fn) / steps
        if best is None or err < best[0]:
            best = (err, b, r)
    _, b, r = best
    return {
        "k": k,
        "bands": b,
        "rows": r,
        "threshold_at_inflection": round((1.0 / b) ** (1.0 / r), 4),
        "p_at_threshold": round(1.0 - (1.0 - threshold ** r) ** b, 4),
    }


def _validate_banding(k: int, bands: int) -> int:
    """Validate a (k, bands) split and return rows-per-band."""
    if bands <= 0 or k % bands != 0:
        # bands > k would give r=0 — every doc in ONE bucket per band (a
        # full N^2 self-join); k % bands != 0 would silently drop the last
        # signature rows and change precision/recall behind the caller's back
        raise ValueError(
            f"bands must evenly divide the signature size (k={k}, bands={bands})")
    return k // bands


def _explode_banded(sig_df: DataFrame, k: int, bands: int) -> DataFrame:
    """``(__id, __sig)`` → ``(__id, band, bucket)`` — THE banding
    definition. Bucket values are cross-path join keys (history state
    tables vs new-batch probes), so every producer of banded buckets must
    come through here: a drift in salt, separator, or slice between two
    copies would silently make incremental dedup find zero candidates."""
    r = _validate_banding(k, bands)
    band_cols = [
        _md5(F.concat_ws("|", *[F.col("__sig")[b * r + j] for j in range(r)])).alias("__bucket")
        for b in range(bands)
    ]
    return sig_df.select(
        "__id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), band_cols[b]) for b in range(bands)
            ])
        ).alias("bb"),
    ).select("__id", F.col("bb.band").alias("band"), F.col("bb.__bucket").alias("bucket"))


def _band_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    bands: int,
    shingle_n: int,
) -> DataFrame:
    """(__id, band, bucket) triples of the MinHash-LSH banding pipeline —
    the single definition candidate pairing AND hot-bucket reporting share,
    so the reported buckets are exactly the ones the pairing saw."""
    _validate_banding(k, bands)
    base = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("__id"), tokens(F.col(text_col)).alias("__t"))
        .where(F.size("__t") >= shingle_n)
        .select("__id", hashed_tokens(F.col("__t")).alias("__th"))
        .select("__id", hashed_shingles(F.col("__th"), shingle_n).alias("__h"))
        .select("__id", minhash_from_hashes(F.col("__h"), k).alias("__sig"))
    )
    return _explode_banded(base, k, bands)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket_size: int | None = 10_000,
    threshold: float | None = None,
    false_negative_weight: float = 1.0,
) -> DataFrame:
    """Near-duplicate candidate pairs (id_a < id_b) sharing any LSH bucket.

    Signature → ``bands`` bands of ``k/bands`` rows each; band bucket =
    md5 of the concatenated rows. Only (band, bucket, id) triples shuffle.

    ``threshold`` (target Jaccard) overrides ``bands`` with the
    ``lsh_plan`` S-curve split of the same ``k`` budget — pass it instead
    of hand-picking the banding. ``false_negative_weight`` is forwarded to
    ``lsh_plan`` (>1 biases the banding toward recall); it only applies
    when ``threshold`` is given.

    ``max_bucket_size`` is the hot-bucket guard for boilerplate-heavy
    corpora: a bucket of B members emits B*(B-1)/2 pairs, so one degenerate
    bucket (cookie banners, license headers) turns the self-join quadratic.
    Buckets larger than the cap are dropped from pairing — their members
    are near-identical to ENOUGH other docs that any dedup policy treats
    them as one group anyway; enumerate them with ``lsh_hot_buckets`` and
    handle the group wholesale instead of pairwise. The cap is ON by
    default (10_000: one hot bucket is then bounded at ~5·10^7 pairs, a
    single task's worth of work, instead of unbounded); pass ``None`` to
    opt out on corpora known to be boilerplate-free.
    """
    if threshold is not None:
        bands = lsh_plan(
            threshold, k, false_negative_weight=false_negative_weight)["bands"]
    # The triples feed up to three plan branches (the cap's size aggregate
    # plus BOTH self-join sides) and Catalyst does not reuse the exchange
    # across them — without a lineage cut the tokenize+shingle+minhash scan
    # (the expensive part) re-runs once per branch. Materializing the small
    # (id, band, bucket) triples guarantees ONE text scan per call
    # (measured 1.3x warm-cache at sf0.1; at crawl scale it removes two
    # full corpus reads). Like pair_jaccard's cut, the blocks are an
    # evictable persist (see _lineage.fused_checkpoint) — repeated
    # per-batch calls do not accumulate pinned storage.
    exploded = _band_buckets(df, id_col, text_col, k, bands, shingle_n)
    exploded = exploded.transform(fused_checkpoint)
    return _pairs_from_triples(exploded, max_bucket_size)


def _pairs_from_triples(
    exploded: DataFrame, max_bucket_size: int | None
) -> DataFrame:
    """Candidate pairs (id_a < id_b) from (__id, band, bucket) triples:
    optional hot-bucket cap, then the bucket self-join. The caller owns
    materializing ``exploded`` (it feeds all three branches here)."""
    if max_bucket_size is not None:
        sizes = exploded.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("__bsz"))
        exploded = (
            exploded.join(sizes, on=["band", "bucket"])
            .where(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )

    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(b, on=["band", "bucket"])
        .where(F.col("a.__id") < F.col("b.__id"))
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )


def digest_and_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """ONE text scan → ``(digests, triples)`` for pipelines that need both
    exact and near-dup state (``dedup_cluster_assignments``): ``digests``
    is ``(__id, __h)`` for every non-NULL-text doc (the
    ``exact_digest_table`` shape), ``triples`` is the same ``(__id, band,
    bucket)`` frame ``_band_buckets`` emits for docs with at least
    ``shingle_n`` tokens.

    Separately computed, the exact digest and the MinHash signature each
    read the corpus text once — two full scans of a 100 TB table. Here the
    md5 digest rides the signature scan; the per-doc feature row (id +
    16-byte digest + k longs) is checkpointed once (eager fused_checkpoint), and both outputs
    read the materialized blocks.
    """
    _validate_banding(k, bands)
    feat = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("__id"), _md5(F.col(text_col)).alias("__h"),
                tokens(F.col(text_col)).alias("__t"))
        .select("__id", "__h", F.size("__t").alias("__nt"),
                hashed_tokens(F.col("__t")).alias("__th"))
        .select(
            "__id", "__h", "__nt",
            # CASE short-circuits in codegen: short docs (excluded from
            # banding below, exactly like _band_buckets' filter) pay no
            # shingle/minhash work
            F.when(
                F.col("__nt") >= shingle_n,
                minhash_from_hashes(
                    hashed_shingles(F.col("__th"), shingle_n), k),
            ).alias("__sig"),
        )
    ).transform(fused_checkpoint)
    digests = feat.select("__id", "__h")
    triples = _explode_banded(
        feat.where(F.col("__nt") >= shingle_n).select("__id", "__sig"), k, bands)
    return digests, triples


def lsh_hot_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_bucket_size: int,
    k: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Report of LSH buckets at/above ``min_bucket_size``: (band, bucket,
    n_docs). The companion to ``minhash_lsh_candidates(max_bucket_size=...)``
    — what the cap dropped, so a pipeline can log it or dedup those groups
    wholesale (keep-one-per-bucket) instead of pairwise. Shares
    ``_band_buckets`` with the pairing, so the buckets line up exactly
    (call with the same k/bands/shingle_n)."""
    return (
        _band_buckets(df, id_col, text_col, k, bands, shingle_n)
        .groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .where(F.col("n_docs") >= min_bucket_size)
    )


# ------------------------------------------------- incremental (cross-batch)


def exact_digest_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, digest) — the persistable exact-dedup state of a corpus. Write
    it once per ingested batch (16 bytes + id per doc); future batches
    anti-join against the union of these tables instead of re-reading the
    corpus text."""
    return df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"), _md5(F.col(text_col)).alias("digest"))


def lsh_bucket_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, band, bucket) — the persistable near-dup state of a corpus: the
    same banded MinHash buckets ``minhash_lsh_candidates`` pairs on,
    ``bands`` rows per doc. New batches bucket themselves with the SAME
    (k, bands, shingle_n) and equi-join on (band, bucket) — near-dup
    detection against a 10^12-doc history without touching its text."""
    return _band_buckets(df, id_col, text_col, k, bands, shingle_n).select(
        F.col("__id").alias("id"), "band", "bucket")


def signature_tables(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """ONE text scan → ``(digest_table, bucket_table)``: the two
    persistable incremental-dedup state tables ``exact_digest_table`` and
    ``lsh_bucket_table`` produce — same schemas, same values — without
    reading the batch text twice at ingest (each table is written once per
    ingested batch; separately computed they each scan the text).

    Built on ``digest_and_buckets``'s checkpointed per-doc feature scan;
    write both outputs in the same ingest job and the corpus text is read
    exactly once."""
    digests, triples = digest_and_buckets(
        df, id_col, text_col, k=k, bands=bands, shingle_n=shingle_n)
    return (
        digests.select(F.col("__id").alias("id"),
                       F.col("__h").alias("digest")),
        triples.select(F.col("__id").alias("id"), "band", "bucket"),
    )


def compact_state_table(
    state: DataFrame,
    id_col: str = "id",
    order_col: str | None = None,
    tombstones: DataFrame | None = None,
) -> DataFrame:
    """Compact an incremental-dedup state table (``exact_digest_table`` /
    ``lsh_bucket_table`` unions, one slice per ingested batch) so state
    row count stays bounded under re-ingestion instead of growing
    forever.

    Three stale-row classes, in order:

    * **supersede** (needs ``order_col`` — a batch timestamp/sequence the
      caller stamps on each slice, e.g. ``withColumn("batch_ts",
      lit(...))``): a re-crawled doc id keeps only its LATEST batch's
      rows; the old crawl's digest/bucket rows — content no longer in the
      corpus — are dropped, so a future doc matching the SUPERSEDED
      content is no longer falsely rejected. Rows whose ``order_col`` is
      NULL count as oldest (dropped when any ordered row exists for the
      id); ids with only NULL orders keep their rows. NULL-id rows have
      no identity to supersede and pass through.
    * **exact re-ingests**: ``distinct()`` collapses byte-identical rows
      from repeated ingestion of the same content — the invariant the
      bounded-state test pins: re-ingesting the same corpus N times
      compacts back to one slice's row count.
    * **tombstones** (optional DataFrame, first column = deleted doc
      ids): every state row of a deleted doc is dropped (left_anti), so
      its content can re-enter the corpus later.

    Plan shape at 10^12 docs: one hash-partitioned window max per id
    (per-id row count is tiny — bands × batches — so no skew), one
    distinct (map-side combinable), one anti-join on the id. All
    shuffles carry state rows (16-byte digests / bucket triples + ids),
    never corpus text. The output schema equals the input schema, so a
    compacted table IS a valid state table for future batches and future
    compactions — run it periodically as the state-table twin of Iceberg
    snapshot expiration.

    Oracle: pipeline_state_compaction (planted re-crawls + tombstones).
    """
    out = state
    if order_col is not None:
        with_id = out.where(F.col(id_col).isNotNull())
        null_id = out.where(F.col(id_col).isNull())
        w = Window.partitionBy(id_col)
        kept = (
            with_id.withColumn("__mx", F.max(order_col).over(w))
            .where(F.col(order_col).eqNullSafe(F.col("__mx")))
            .drop("__mx")
        )
        out = kept.unionByName(null_id)
    out = out.distinct()
    if tombstones is not None:
        tomb = (tombstones.select(
            F.col(tombstones.columns[0]).alias(id_col)).distinct())
        out = out.join(tomb, id_col, "left_anti")
    return out


def incremental_exact_dedup(
    new: DataFrame,
    seen_digests: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Rows of ``new`` that survive exact dedup against BOTH the already-
    ingested corpus (``seen_digests`` from ``exact_digest_table``) and the
    new batch itself (keep EXACTLY ONE row per digest — min id first,
    NULL ids last, matching ``exact_dedup``'s keep-first policy; like
    ``exact_dedup``, equal-id ties break by physical order). NULL-text
    rows pass through (nothing to hash — same contract as
    ``exact_dedup``); NULL-ID rows are still data and still dedup by
    digest, never silently dropped.

    Plan: one row_number window partitioned by the 16-byte digest over
    the new batch (the same shape as ``exact_dedup``) + one anti-join on
    the digest; the seen side is a column-pruned scan of the signature
    table, never the corpus text."""
    d = new.where(F.col(text_col).isNotNull()).withColumn(
        "__h", _md5(F.col(text_col)))
    w = Window.partitionBy("__h").orderBy(
        F.col(id_col).asc_nulls_last(), F.monotonically_increasing_id())
    in_batch = (
        d.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    survivors = (
        in_batch.join(
            seen_digests.select(F.col("digest").alias("__h")).distinct(),
            "__h", "left_anti")
        .drop("__h")
    )
    return survivors.unionByName(new.where(F.col(text_col).isNull()))


def incremental_lsh_candidates(
    new: DataFrame,
    seen_buckets: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """(id_new, id_seen) near-dup candidate pairs between a new batch and
    the ingested history's ``lsh_bucket_table`` (same k/bands/shingle_n or
    the buckets don't line up — the caller owns that contract).

    Only the new batch is shingled/hashed; the history contributes its
    stored (band, bucket, id) triples. ``max_bucket_size`` caps degenerate
    HISTORY buckets (boilerplate) exactly like ``minhash_lsh_candidates``
    does for self-joins."""
    nb = _band_buckets(new, id_col, text_col, k, bands, shingle_n)
    sb = seen_buckets.select("id", "band", "bucket")
    if max_bucket_size is not None:
        sizes = sb.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("__bsz"))
        sb = (sb.join(sizes, ["band", "bucket"])
              .where(F.col("__bsz") <= max_bucket_size).drop("__bsz"))
    return (
        nb.join(sb, ["band", "bucket"])
        .select(F.col("__id").alias("id_new"), F.col("id").alias("id_seen"))
        .distinct()
    )


# ------------------------------------------------------------------- SimHash


def token_hashes(text: Column) -> Column:
    """Distinct tokens, each md5-hashed ONCE to a 60-bit int."""
    return F.transform(F.array_distinct(tokens(text)), lambda t: _md5_int(t))


def simhash_from_hashes(hashes: Column, bits: int = 16) -> Column:
    """SimHash from a token-hash int array: bit j of a token's vote is bit
    j of its 60-bit hash (cheap shift/mask codegen — the md5 already ran).
    The simhash sets bit j iff strictly more tokens vote 1 than 0.
    """

    def voter(j):
        return lambda acc, h: acc + F.when(F.shiftright(h, j).bitwiseAND(1) == 1, 1).otherwise(-1)

    out = F.lit(0).cast("long")
    for j in range(bits):
        vote_sum = F.aggregate(hashes, F.lit(0), voter(j))
        out = out + F.when(vote_sum > 0, F.lit(2 ** j)).otherwise(0)
    return out


def simhash(text: Column, bits: int = 16) -> Column:
    """SimHash over distinct tokens (see simhash_from_hashes)."""
    return simhash_from_hashes(token_hashes(text), bits)


def simhash_dedup_stats(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """Group docs by exact simhash; return per-bucket collision counts > 1.

    The hash array is projected to its own column so the md5 transform
    appears once in the plan, not ``bits`` times.
    """
    h = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("__id"), token_hashes(F.col(text_col)).alias("__h"))
        .select("__id", simhash_from_hashes(F.col("__h"), bits).alias("sh"))
    )
    return (
        h.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") > 1)
        .select(F.col("sh").cast("long").alias("simhash"), F.col("n_docs").cast("long").alias("n_docs"))
    )


# ------------------------------------------------------- n-gram Jaccard


def lsh_audit(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """ONE-row audit of an LSH banding against exact Jaccard on the same
    corpus — the measurement loop for tuning ``(k, bands)`` before a
    production dedup run:

    * ``n_candidates`` / ``n_true_pairs`` — candidate pairs emitted by the
      banding, and how many are REAL near-dups (exact shingle Jaccard ≥
      ``threshold``); ``precision`` = true/candidates (NULL when no
      candidates).  Low precision means wasted verification work: fewer
      bands / more rows.
    * ``mean_candidate_jaccard`` — where the candidate mass actually sits.
    * ``mean_detect_prob_true_pairs`` — average S-curve detection
      probability ``1-(1-s^r)^b`` over the true pairs' OBSERVED
      similarities.  Near 1.0 = the banding finds pairs like these
      comfortably; near the threshold's own ``p_at_threshold`` = the
      corpus' near-dups sit at the banding's edge and recall is fragile.
      (Computed over candidate-DISCOVERED true pairs, so it reads as an
      upper bound on recall — pairs the banding already missed can't be
      sampled without a quadratic scan.)
    * ``p_at_threshold`` — the banding's analytic detection probability
      exactly AT ``threshold`` (the ``lsh_plan`` S-curve).

    Cost: one candidate generation + ``cluster.pair_jaccard`` (exact
    Jaccard for EXACTLY the candidate pairs — linear in |pairs|, never
    the corpus-wide shared-shingle join) + a one-row aggregate.  Run it
    on a deterministic document sample for a cheap audit of a 10^12-doc
    corpus — both inputs scale down together.  The one-row result is
    collected and every intermediate cache is unpersisted before
    returning (``scoped_fused_caches``), so a (k, bands) parameter sweep
    leaves nothing behind in storage.  Per-pair detect probabilities
    round to 8 decimals before averaging so the result is
    engine-replayable (libm ``pow`` is not correctly rounded; the
    rounding absorbs last-ulp divergence).
    """
    from great_expectations_spark.pipeline._lineage import scoped_fused_caches
    from great_expectations_spark.pipeline.cluster import pair_jaccard

    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    r = _validate_banding(k, bands)
    spark = df.sparkSession
    is_true = F.col("jaccard") >= threshold
    detect = F.round(
        F.lit(1.0) - F.pow(F.lit(1.0) - F.pow(F.col("jaccard"), F.lit(float(r))),
                           F.lit(float(bands))), 8)
    p_at_t = round(1.0 - (1.0 - threshold ** r) ** bands, 6)
    with scoped_fused_caches() as frames:
        cands = minhash_lsh_candidates(
            df, id_col, text_col, k=k, bands=bands, shingle_n=shingle_n,
            max_bucket_size=max_bucket_size)
        j = pair_jaccard(df, cands, id_col, text_col, shingle_n).select(
            F.coalesce(F.col("jaccard"), F.lit(0.0)).alias("jaccard"))
        agg = j.agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.coalesce(F.sum(is_true.cast("long")), F.lit(0)).cast("long")
            .alias("n_true_pairs"),
            F.round(F.avg(is_true.cast("double")), 6).alias("precision"),
            F.round(F.avg("jaccard"), 6).alias("mean_candidate_jaccard"),
            F.round(F.avg(F.when(is_true, detect)), 6)
            .alias("mean_detect_prob_true_pairs"),
            F.lit(p_at_t).alias("p_at_threshold"),
        )
        rows = agg.collect()
        out = spark.createDataFrame(rows, agg.schema)
    for f in frames:
        f.unpersist()
    return out


def ngram_jaccard_pairs(
    left: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact Jaccard similarity over word-n-gram sets for pairs in
    ``left`` WITH AT LEAST ONE SHARED SHINGLE (id_a < id_b) — zero-overlap
    pairs (jaccard 0) and docs shorter than ``n`` tokens never appear,
    by construction of the intersection equi-join (emitting them would be
    the full cross product this design exists to avoid). Quadratic in
    bucket overlap — run on LSH candidates or samples.

    Implemented as shingle-hash-explode + equi-join on the hash (8-byte
    join keys, not strings), counting intersections; set sizes broadcast
    back in.
    """
    sh = (
        left.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("__id"), tokens(F.col(text_col)).alias("__t"))
        .select("__id", hashed_tokens(F.col("__t")).alias("__th"))
        .select("__id", F.explode(hashed_shingles(F.col("__th"), n)).alias("s"))
    )
    # four plan branches consume `sh` (both join sides + both size lookups)
    # with no exchange reuse between them — materialize the shingle scan
    # once (same cut pair_jaccard applies to its shingle subtree)
    sh = sh.transform(fused_checkpoint)
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
