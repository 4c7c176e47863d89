"""Tests for the training-data pipeline operators (dedup / similarity /
textstats / multimodal) on the sf0.001 tables."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()

@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


# ------------------------------------------------------------------ dedup


def test_exact_dedup_stats_planted(spark, docs):
    from great_expectations_spark.pipeline.dedup import exact_dedup_stats

    n = docs.count()
    extra = docs.where(F.col("doc_id") % 10 == 0)
    k = extra.count()
    row = exact_dedup_stats(docs.union(extra), "text").first()
    assert row.n_rows == n + k
    assert row.n_distinct == n  # originals were all distinct
    assert row.dup_rows == k
    assert row.dup_groups == k


def test_exact_dedup_keeps_one_per_value(spark, docs):
    from great_expectations_spark.pipeline.dedup import exact_dedup

    doubled = docs.union(docs)
    out = exact_dedup(doubled, "text", keep_order_col="doc_id")
    assert out.count() == docs.count()


def test_minhash_matches_true_jaccard_neardups(spark, docs):
    """LSH candidates == true near-dup pairs (jaccard>=0.5) on this corpus."""
    from great_expectations_spark.pipeline.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    cand = {(r.id_a, r.id_b) for r in minhash_lsh_candidates(docs, "doc_id", "text").collect()}
    truth = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert truth  # the synthetic corpus plants near-duplicates
    # full recall on planted near-dups; precision may admit a few extras
    assert truth <= cand
    assert len(cand) <= len(truth) + 5


def test_lsh_audit_planted_dups(spark, docs):
    """The one-row audit agrees with the candidate/truth sets computed
    directly: counts, precision, and the analytic S-curve columns."""
    from great_expectations_spark.pipeline.dedup import (
        lsh_audit,
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    row = lsh_audit(docs, "doc_id", "text").collect()[0]
    n_cand = minhash_lsh_candidates(docs, "doc_id", "text").count()
    truth = {(r.id_a, r.id_b) for r in
             ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()}
    assert row["n_candidates"] == n_cand
    assert row["n_true_pairs"] == len(truth) > 0
    assert abs(row["precision"] - len(truth) / n_cand) < 1e-6
    assert 0.0 < row["mean_candidate_jaccard"] <= 1.0
    # k=12, bands=4, r=3 at threshold 0.5
    assert abs(row["p_at_threshold"] - (1 - (1 - 0.5**3) ** 4)) < 1e-6
    # true pairs sit well above the threshold on this corpus
    assert row["mean_detect_prob_true_pairs"] >= row["p_at_threshold"]


def test_lsh_audit_exact_dup_detect_prob_one(spark):
    """A planted EXACT duplicate (jaccard 1.0) has S-curve detection
    probability exactly 1; precision 1 when it is the only pair."""
    from great_expectations_spark.pipeline.dedup import lsh_audit

    body = " ".join(f"w{i}" for i in range(30))
    other = " ".join(f"z{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, body), (2, body), (3, other)], "doc_id long, text string")
    row = lsh_audit(df, "doc_id", "text").collect()[0]
    assert row["n_candidates"] == row["n_true_pairs"] == 1
    assert row["precision"] == 1.0
    assert row["mean_detect_prob_true_pairs"] == 1.0


def test_lsh_audit_empty_and_validation(spark):
    from great_expectations_spark.pipeline.dedup import lsh_audit

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
        "doc_id long, text string")
    row = lsh_audit(df, "doc_id", "text").collect()[0]
    assert row["n_candidates"] == 0 and row["n_true_pairs"] == 0
    assert row["precision"] is None  # no candidates: undefined, not 0
    import pytest as _pytest
    with _pytest.raises(ValueError, match="threshold"):
        lsh_audit(df, "doc_id", "text", threshold=1.0)
    with _pytest.raises(ValueError):
        lsh_audit(df, "doc_id", "text", k=12, bands=5)  # non-divisor


def test_lsh_audit_leaves_no_registered_caches(spark, docs):
    """The audit collects its one-row result and unpersists every
    intermediate (scoped_fused_caches) — a (k, bands) parameter sweep
    must not accumulate per-call caches. Set containment, not count
    equality (async ContextCleaner may shrink the before-set)."""
    from great_expectations_spark.pipeline.dedup import lsh_audit

    sc = spark.sparkContext

    def persistent_ids():
        return {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}

    before = persistent_ids()
    for bands in (4, 6):
        assert lsh_audit(docs, "doc_id", "text", k=12,
                         bands=bands).collect()[0]["n_candidates"] >= 0
    assert persistent_ids() <= before


def test_simhash_is_deterministic_and_int(spark, docs):
    from great_expectations_spark.pipeline.dedup import simhash

    rows = (
        docs.where(F.col("text").isNotNull())
        .select(simhash(F.col("text")).alias("sh"))
        .limit(20)
        .collect()
    )
    assert all(0 <= r.sh < 2 ** 16 for r in rows)


def test_shingle_guard_short_docs(spark):
    from great_expectations_spark.pipeline.dedup import hashed_shingles, hashed_tokens, tokens

    df = spark.createDataFrame([("a b",), ("a b c d",), ("x",)], "text string")
    out = (
        df.select(tokens(F.col("text")).alias("t"))
        .select(hashed_tokens(F.col("t")).alias("th"))
        .select(F.size(hashed_shingles(F.col("th"), 3)).alias("n"))
        .collect()
    )
    assert [r.n for r in out] == [0, 2, 0]


# ------------------------------------------------------------- similarity


def test_cosine_topk_self_similarity(spark, emb):
    from great_expectations_spark.pipeline.similarity import cosine_topk

    q = emb.limit(3).select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    out = cosine_topk(emb, q, k=5, exclude_self=False)
    top1 = {r.q_id: r.vec_id for r in out.where(F.col("rank") == 1).collect()}
    # each query's nearest neighbour (self included) is itself
    assert all(q_id == v for q_id, v in top1.items())


def test_ann_lsh_recall_vs_exact(spark, emb):
    from great_expectations_spark.pipeline.similarity import ann_topk_lsh, cosine_topk

    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    exact = cosine_topk(emb, q, k=5).collect()
    approx = ann_topk_lsh(emb, q, dims=64, k=5, planes=4).collect()
    exact_set = {(r.q_id, r.vec_id) for r in exact}
    approx_set = {(r.q_id, r.vec_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.3  # 4 planes / random embeddings: modest but nonzero


def test_ann_ivf_full_probe_equals_exact(spark, emb):
    """Probing every IVF cell degenerates to the exact scan, so the
    result must equal brute-force top-k bit-for-bit (same rounding and
    tiebreak)."""
    from great_expectations_spark.pipeline.similarity import ann_topk_ivf, cosine_topk

    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    exact = {tuple(r) for r in cosine_topk(emb, q, k=5).collect()}
    full = {tuple(r) for r in
            ann_topk_ivf(emb, q, dims=64, k=5, n_centroids=4, n_probe=4).collect()}
    assert full == exact


def test_ann_ivf_partial_probe_recall(spark, emb):
    from great_expectations_spark.pipeline.similarity import ann_topk_ivf, cosine_topk

    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    exact = {(r.q_id, r.vec_id) for r in cosine_topk(emb, q, k=5).collect()}
    approx = ann_topk_ivf(emb, q, dims=64, k=5, n_centroids=8, n_probe=3).collect()
    # every query still produces k candidates (probed cells are non-empty)
    assert all(r.rank <= 5 for r in approx)
    recall = len(exact & {(r.q_id, r.vec_id) for r in approx}) / len(exact)
    assert recall >= 0.3  # random embeddings; 3/8 cells probed


def test_embedding_neardup_blocked(spark, emb):
    from great_expectations_spark.pipeline.dedup import embedding_neardup_pairs

    out = embedding_neardup_pairs(emb, "vec_id", "embedding", "label", threshold=0.8)
    for r in out.collect():
        assert r.id_a < r.id_b and r.cosine >= 0.8


# --------------------------------------------------------------- textstats


def test_doc_stats_matches_python(spark, docs):
    from great_expectations_spark.pipeline.textstats import FILLER_WORDS, doc_stats

    sample = {r.doc_id: r.text for r in docs.where(F.col("text").isNotNull()).limit(5).collect()}
    out = {r.doc_id: r for r in doc_stats(docs, "doc_id", "text").collect() if r.doc_id in sample}
    for doc_id, text in sample.items():
        toks = text.split(" ")
        r = out[doc_id]
        assert r.n_tokens == len(toks)
        assert r.n_chars == len(text)
        assert r.filler_ratio == pytest.approx(
            round(sum(t in FILLER_WORDS for t in toks) / len(toks), 6), abs=1e-6)
        fp = hashlib.md5(" ".join(sorted(set(toks))).encode()).hexdigest()
        assert r.fp == fp


def test_corpus_stats_shape(spark, docs):
    from great_expectations_spark.pipeline.textstats import corpus_stats

    row = corpus_stats(docs, "doc_id", "text").first()
    assert row.n_docs > 0 and row.total_tokens > row.n_docs
    assert 0 <= row.avg_quality <= 1
    assert row.distinct_fingerprints <= row.n_docs


# --------------------------------------------------------------- multimodal


def test_extract_features_matches_python(spark, docs):
    from great_expectations_spark.pipeline.multimodal import extract_features, with_fake_payload

    pay = with_fake_payload(docs, "doc_id", "text")
    sample = {r.doc_id: r.text for r in docs.where(F.col("text").isNotNull()).limit(5).collect()}
    out = {r.doc_id: r for r in extract_features(pay, "doc_id", "payload").collect()}
    for doc_id, text in sample.items():
        r = out[doc_id]
        data = text.encode()
        assert r.n_bytes == len(data)
        assert r.content_md5 == hashlib.md5(data).hexdigest()
        assert r.width == len(data) % 640 + 1
        assert r.height == (len(data) * 7) % 480 + 1
        assert r.format == "fake"


def test_frame_sample_offsets(spark, docs):
    from great_expectations_spark.pipeline.multimodal import frame_sample, with_fake_payload

    pay = with_fake_payload(docs.limit(10), "doc_id", "text")
    rows = frame_sample(pay, "doc_id", "payload", k=4).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, frames in by_doc.items():
        assert sorted(f.frame_idx for f in frames) == [0, 1, 2, 3]
        offs = [f.frame_offset for f in sorted(frames, key=lambda f: f.frame_idx)]
        assert offs == sorted(offs) and offs[0] == 0


# ------------------------------------------------------------- heavy hitters


def test_heavy_hitters_exact_vs_groupby(spark):
    """MG candidates + exact verify must equal the full groupBy answer on a
    skewed (Zipf-ish) column, across multiple partitions and batches."""
    from great_expectations_spark.pipeline.heavyhitters import heavy_hitters

    rows = (
        [(i, "val_1") for i in range(1200)]
        + [(1200 + i, "val_2") for i in range(600)]
        + [(1800 + i, "val_3") for i in range(300)]
        + [(2100 + i, f"tail_{i}") for i in range(1900)]  # 1900 singletons
    )
    df = spark.createDataFrame(rows, "id long, v string").repartition(8)
    n = df.count()
    got = {r.value: (r.cnt, r.fraction) for r in heavy_hitters(df, "v", 0.05).collect()}
    import math
    exact = {
        r["v"]: r["cnt"]
        for r in df.groupBy("v").agg(F.count(F.lit(1)).alias("cnt")).collect()
        if r["cnt"] >= math.ceil(0.05 * n)
    }
    assert set(got) == set(exact) and got
    for v, c in exact.items():
        assert got[v][0] == c
        assert abs(got[v][1] - round(c / n, 6)) < 1e-12


def test_heavy_hitters_null_and_empty(spark):
    from great_expectations_spark.pipeline.heavyhitters import heavy_hitters

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "a"), (4, "a"), (5, "b")], "id long, v string"
    )
    got = {r.value: r.cnt for r in heavy_hitters(df, "v", 0.4).collect()}
    assert got == {"a": 2}  # threshold ceil(0.4*5)=2; nulls never candidates
    empty = spark.createDataFrame([], "id long, v string")
    assert heavy_hitters(empty, "v", 0.5).count() == 0


def test_count_min_sketch_bounds(spark):
    """CM estimates upper-bound true counts; a wide sketch over few
    distincts is exact; the table is a monoid (row-0 sums to total)."""
    from great_expectations_spark.pipeline.heavyhitters import count_min_build

    data = [("en",)] * 50 + [("de",)] * 30 + [("fr",)] * 20 + [(None,)] * 5
    df = spark.createDataFrame(data, "lang string").repartition(4)
    cms = count_min_build(df, "lang", depth=4, width=512)
    assert cms.total == 100
    est = cms.estimate(spark, ["en", "de", "fr", "xx"])
    assert est["en"] >= 50 and est["de"] >= 30 and est["fr"] >= 20
    # wide sketch, 3 distincts: collisions virtually impossible -> exact
    assert (est["en"], est["de"], est["fr"]) == (50, 30, 20)
    assert est["xx"] <= 100  # never exceeds total mass


def test_count_min_md5_mode_matches_xxhash_semantics(spark):
    """md5 hash mode (the DuckDB-replayable one) gives the same estimates
    on a collision-free sketch and the same total."""
    from great_expectations_spark.pipeline.heavyhitters import count_min_build

    data = [("a",)] * 7 + [("b",)] * 3
    df = spark.createDataFrame(data, "v string")
    cms = count_min_build(df, "v", depth=3, width=64, hash_mode="md5")
    assert cms.total == 10
    assert cms.estimate(spark, ["a", "b"]) == {"a": 7, "b": 3}


def test_heavy_hitters_broadcast_candidate_path(spark):
    """>1000 candidates routes through the broadcast semi-join, result
    still exact."""
    from great_expectations_spark.pipeline.heavyhitters import heavy_hitters

    rows = [(i, f"tail_{i}") for i in range(3000)] + [
        (3000 + i, "big") for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "id long, v string").repartition(4)
    got = heavy_hitters(df, "v", 0.001).collect()  # k=2000 -> huge candidate set
    # threshold = ceil(0.001 * 4000) = 4: only 'big' survives
    heavy = {r.value: r.cnt for r in got if r.cnt >= 1000}
    assert heavy == {"big": 1000}
    for r in got:
        assert r.cnt >= 4


def test_heavy_hitters_candidate_cap_raises(spark):
    """The overflow guard must actually fire (the null total row may not
    consume a candidate slot)."""
    from great_expectations_spark.pipeline.heavyhitters import heavy_hitters

    rows = [(i, f"v{i % 10}") for i in range(1000)]  # 10 values, 100 each
    df = spark.createDataFrame(rows, "id long, v string")
    with pytest.raises(ValueError, match="candidate set exceeds cap"):
        heavy_hitters(df, "v", 0.001, candidate_cap=5)


# ------------------------------------------- incremental (cross-batch) dedup


def _ingest_frames(spark):
    seen = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
         (2, "one two three four five six seven eight nine ten eleven twelve"),
         (3, "unique seen document about watermarks and late arriving data")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # exact dup of 1
         (11, "fresh document describing adaptive query execution plans"),
         (12, "fresh document describing adaptive query execution plans"),  # in-batch dup of 11
         (13, "one two three four five six seven eight nine ten eleven TWELVE"),  # near-dup of 2
         (14, None)],
        "doc_id long, text string")
    return seen, new


def test_incremental_exact_dedup(spark):
    from great_expectations_spark.pipeline.dedup import (
        exact_digest_table,
        incremental_exact_dedup,
    )

    seen, new = _ingest_frames(spark)
    sig = exact_digest_table(seen, "doc_id", "text")
    assert sig.columns == ["id", "digest"]
    out = incremental_exact_dedup(new, sig, "doc_id", "text")
    # 10 dropped (seen), 12 dropped (in-batch, 11 kept as min id), 14 null passes
    assert sorted(r["doc_id"] for r in out.collect()) == [11, 13, 14]
    assert out.columns == new.columns


def test_incremental_exact_dedup_null_and_tied_ids(spark):
    """NULL-id rows are data (kept when unseen, deduped by digest), and
    equal-id duplicates keep exactly one row — exact_dedup parity."""
    from great_expectations_spark.pipeline.dedup import (
        exact_digest_table,
        incremental_exact_dedup,
    )

    seen = spark.createDataFrame(
        [(1, "already ingested")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(None, "only null id has this text"),  # NULL id, unseen, unique -> kept
         (None, "already ingested"),            # NULL id, seen -> dropped
         (None, "brand new shared doc"),        # NULL id loses to id 9 (NULLs last)
         (7, "another fresh doc"),
         (7, "another fresh doc"),              # same-id in-batch dup -> one kept
         (9, "brand new shared doc")],
        "doc_id long, text string")
    sig = exact_digest_table(seen, "doc_id", "text")
    out = incremental_exact_dedup(new, sig, "doc_id", "text").collect()
    assert sorted(r["doc_id"] for r in out if r["doc_id"] is not None) == [7, 9]
    null_rows = [r for r in out if r["doc_id"] is None]
    assert [r["text"] for r in null_rows] == ["only null id has this text"]
    assert len(out) == 3


def test_incremental_lsh_candidates(spark):
    from great_expectations_spark.pipeline.dedup import (
        incremental_lsh_candidates,
        lsh_bucket_table,
    )

    seen, new = _ingest_frames(spark)
    buckets = lsh_bucket_table(seen, "doc_id", "text")
    assert buckets.columns == ["id", "band", "bucket"]
    pairs = {(r["id_new"], r["id_seen"]) for r in
             incremental_lsh_candidates(new, buckets, "doc_id", "text").collect()}
    # the exact copy always collides; the one-token edit of doc 2 should too
    assert (10, 1) in pairs
    assert (13, 2) in pairs
    # fresh docs never pair with history
    assert not any(n in (11, 12) for n, _ in pairs)


def test_incremental_lsh_bucket_cap_drops_hot_history_bucket(spark):
    from great_expectations_spark.pipeline.dedup import (
        incremental_lsh_candidates,
        lsh_bucket_table,
    )

    boiler = "cookie banner accept terms privacy policy copyright footer nav"
    seen = spark.createDataFrame(
        [(i, boiler) for i in range(20)], "doc_id long, text string")
    new = spark.createDataFrame([(100, boiler)], "doc_id long, text string")
    buckets = lsh_bucket_table(seen, "doc_id", "text")
    uncapped = incremental_lsh_candidates(new, buckets, "doc_id", "text")
    capped = incremental_lsh_candidates(new, buckets, "doc_id", "text",
                                        max_bucket_size=5)
    assert uncapped.count() == 20
    assert capped.count() == 0


def test_compact_state_bounded_under_reingestion(spark):
    """Re-ingesting the SAME corpus N times must compact back to one
    slice's row count — for both state tables — and compacted-state
    dedup must equal full-history dedup (identical-content re-crawls
    leave semantics unchanged)."""
    from great_expectations_spark.pipeline.dedup import (
        compact_state_table,
        exact_digest_table,
        incremental_exact_dedup,
        incremental_lsh_candidates,
        lsh_bucket_table,
    )

    seen, new = _ingest_frames(spark)
    one_d = exact_digest_table(seen, "doc_id", "text")
    one_b = lsh_bucket_table(seen, "doc_id", "text")
    stacked_d = one_d.unionByName(one_d).unionByName(one_d)
    stacked_b = one_b.unionByName(one_b).unionByName(one_b)
    comp_d = compact_state_table(stacked_d)
    comp_b = compact_state_table(stacked_b)
    assert comp_d.count() == one_d.count()
    assert comp_b.count() == one_b.count()

    full = incremental_exact_dedup(new, stacked_d, "doc_id", "text")
    comp = incremental_exact_dedup(new, comp_d, "doc_id", "text")
    key = lambda df: sorted((r["doc_id"], r["text"]) for r in df.collect())
    assert key(comp) == key(full)
    pairs = lambda df: sorted((r["id_new"], r["id_seen"]) for r in df.collect())
    assert pairs(incremental_lsh_candidates(new, comp_b, "doc_id", "text")) == \
        pairs(incremental_lsh_candidates(new, one_b, "doc_id", "text"))


def test_compact_state_supersede_and_tombstones(spark):
    """A re-crawl with CHANGED content supersedes the old digest (its
    content may re-enter); tombstoned ids drop out entirely; NULL-id rows
    pass through; NULL order_col counts as oldest."""
    from great_expectations_spark.pipeline.dedup import (
        compact_state_table,
        exact_digest_table,
        incremental_exact_dedup,
    )

    b1 = spark.createDataFrame(
        [(1, "old content v1"), (2, "steady content"), (3, "deleted doc"),
         (None, "null id row")],
        "doc_id long, text string")
    b2 = spark.createDataFrame(
        [(1, "new content v2")], "doc_id long, text string")
    s1 = exact_digest_table(b1, "doc_id", "text").withColumn(
        "batch_ts", F.lit(1))
    # NULL batch_ts on a fresh id: kept (no ordered rows to lose to)
    s1 = s1.withColumn(
        "batch_ts",
        F.when(F.col("id").isNotNull(), F.col("batch_ts")))
    s2 = exact_digest_table(b2, "doc_id", "text").withColumn(
        "batch_ts", F.lit(2))
    tomb = spark.createDataFrame([(3,)], "doc_id long")
    comp = compact_state_table(
        s1.unionByName(s2), order_col="batch_ts", tombstones=tomb)
    rows = comp.collect()
    # id 1 keeps ONLY the batch-2 digest; id 3 gone; NULL-id row kept
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    assert len(by_id.get(1, [])) == 1 and by_id[1][0]["batch_ts"] == 2
    assert 3 not in by_id
    assert None in by_id and 2 in by_id
    assert len(rows) == 3

    new = spark.createDataFrame(
        [(10, "old content v1"),   # superseded -> re-enters
         (11, "new content v2"),   # current -> rejected
         (12, "deleted doc"),      # tombstoned -> re-enters
         (13, "steady content")],  # current -> rejected
        "doc_id long, text string")
    out = sorted(r["doc_id"] for r in
                 incremental_exact_dedup(new, comp, "doc_id", "text").collect())
    assert out == [10, 12]


# ------------------------------------------------------------- GEMM top-k


def test_cosine_topk_gemm_matches_zipwith_exact(spark, emb):
    from great_expectations_spark.pipeline.similarity import cosine_topk, cosine_topk_gemm

    q = emb.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    a = sorted(tuple(r) for r in cosine_topk(emb, q, k=7).collect())
    b = sorted(tuple(r) for r in cosine_topk_gemm(emb, q, k=7).collect())
    assert a == b


def test_cosine_topk_gemm_partitioning_independent(spark, emb):
    from great_expectations_spark.pipeline.similarity import cosine_topk_gemm

    q = emb.limit(3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    one = sorted(tuple(r) for r in cosine_topk_gemm(emb.coalesce(1), q, k=5).collect())
    many = sorted(tuple(r) for r in cosine_topk_gemm(emb.repartition(13), q, k=5).collect())
    assert one == many


def test_cosine_topk_gemm_null_and_self(spark):
    from great_expectations_spark.pipeline.similarity import cosine_topk_gemm

    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, None), (4, [0.0, 1.0])]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = spark.createDataFrame([(1, [1.0, 0.0])], "q_id long, q_vec array<float>")
    got = {(r.vec_id, r.rank) for r in cosine_topk_gemm(corpus, q, k=10).collect()}
    # NULL embedding excluded, self excluded, rest ranked by cosine
    assert got == {(2, 1), (4, 2)}
    with_self = cosine_topk_gemm(corpus, q, k=10, exclude_self=False)
    assert with_self.where(F.col("rank") == 1).collect()[0].vec_id == 1


def test_cosine_topk_gemm_dim_mismatch_and_empty_queries(spark, emb):
    from great_expectations_spark.pipeline.similarity import cosine_topk_gemm

    bad_q = spark.createDataFrame([(1, [1.0, 0.0])], "q_id long, q_vec array<float>")
    with pytest.raises(Exception):
        cosine_topk_gemm(emb, bad_q, k=3).collect()
    empty_q = spark.createDataFrame([], "q_id long, q_vec array<float>")
    with pytest.raises(ValueError):
        cosine_topk_gemm(emb, empty_q, k=3)


# ------------------------------------------------------------- lsh_plan


def test_minhash_threshold_forwards_false_negative_weight(spark):
    """ADVICE r2: the threshold= convenience path forwards
    false_negative_weight to lsh_plan, so recall-biased planning is
    reachable without hand-calling the planner."""
    from unittest import mock

    from great_expectations_spark.pipeline import dedup

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string")
    with mock.patch.object(dedup, "lsh_plan",
                           wraps=dedup.lsh_plan) as planned:
        dedup.minhash_lsh_candidates(
            df, "doc_id", "text", k=12, threshold=0.7,
            false_negative_weight=8.0)
        planned.assert_called_once_with(0.7, 12, false_negative_weight=8.0)


def test_lsh_plan_matches_textbook_shape():
    from great_expectations_spark.pipeline.dedup import lsh_plan

    p = lsh_plan(0.5, 128)
    assert p["bands"] * p["rows"] == 128
    # inflection lands near the requested threshold
    assert abs(p["threshold_at_inflection"] - 0.5) < 0.15
    # recall bias moves the curve left (more bands, fewer rows)
    recall = lsh_plan(0.5, 128, false_negative_weight=10.0)
    assert recall["bands"] >= p["bands"]
    assert recall["threshold_at_inflection"] <= p["threshold_at_inflection"]
    # exact divisibility contract of minhash_lsh_candidates
    q = lsh_plan(0.8, 12)
    assert 12 % q["bands"] == 0
    import pytest as _pt
    with _pt.raises(ValueError):
        lsh_plan(0.0)
    with _pt.raises(ValueError):
        lsh_plan(0.5, 1)


def test_minhash_threshold_autoplan(spark):
    """threshold= picks the banding via lsh_plan while keeping the exact-
    divisor contract; the resulting pairs equal the hand-banded call."""
    from great_expectations_spark.pipeline.dedup import (
        lsh_plan, minhash_lsh_candidates)

    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"),
         (3, "z y x w v u t s")],
        "doc_id long, text string")
    p = lsh_plan(0.5, 12)
    auto = sorted(map(tuple, minhash_lsh_candidates(
        df, "doc_id", "text", k=12, threshold=0.5).collect()))
    manual = sorted(map(tuple, minhash_lsh_candidates(
        df, "doc_id", "text", k=12, bands=p["bands"]).collect()))
    assert auto == manual and (1, 2) in auto


def test_signature_tables_one_scan_matches_separate(spark):
    """signature_tables = exact_digest_table + lsh_bucket_table from ONE
    text scan: schemas and values identical to the separate paths."""
    from great_expectations_spark.pipeline.dedup import (
        exact_digest_table,
        lsh_bucket_table,
        signature_tables,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "x y"), (4, None)],
        "doc_id long, text string")
    dig, buck = signature_tables(docs, "doc_id", "text", k=4, bands=2)
    dig_sep = exact_digest_table(docs, "doc_id", "text")
    buck_sep = lsh_bucket_table(docs, "doc_id", "text", k=4, bands=2)
    assert dig.columns == dig_sep.columns == ["id", "digest"]
    assert buck.columns == buck_sep.columns == ["id", "band", "bucket"]
    assert sorted(map(tuple, dig.collect())) == sorted(
        map(tuple, dig_sep.collect()))
    assert sorted(map(tuple, buck.collect())) == sorted(
        map(tuple, buck_sep.collect()))
    # NULL-text row carries no state in either table (same contract)
    assert all(r["id"] != 4 for r in dig.collect())
    # the short doc (< shingle_n tokens) has a digest but no buckets
    assert any(r["id"] == 3 for r in dig.collect())
    assert all(r["id"] != 3 for r in buck.collect())


def test_tracked_checkpoint_scoped_to_own_frame(spark):
    """A concurrently-persisted RDD registered during the checkpoint call
    must NOT be captured (and later unpersisted) — the id comes off the
    returned frame's own plan, not a global registry diff."""
    from pyspark.sql import DataFrame

    from great_expectations_spark.pipeline._lineage import (
        tracked_checkpoint, unpersist_ids,
    )

    interloper = spark.range(5).persist()
    try:
        sc = spark.sparkContext
        real = DataFrame.localCheckpoint
        victim = spark.range(7).selectExpr("id", "id * 3 as v")

        def racy(self, eager=True):
            # simulate another thread persisting inside the call window
            interloper.count()
            return real(self, eager=eager)

        DataFrame.localCheckpoint = racy
        try:
            out, ids = tracked_checkpoint(victim)
        finally:
            DataFrame.localCheckpoint = real
        persistent = {int(i) for i in
                      sc._jsc.getPersistentRDDs().keySet().toArray()}
        assert len(ids) == 1 and ids <= persistent
        assert out.count() == 7  # before the cleanup: freed blocks are
        # unrecoverable by design (truncated lineage)
        unpersist_ids(out, ids)
        # interloper's blocks survive the cleanup
        assert interloper.count() == 5
        remaining = {int(i) for i in
                     sc._jsc.getPersistentRDDs().keySet().toArray()}
        assert not (ids & remaining)
    finally:
        interloper.unpersist()
