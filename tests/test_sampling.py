"""Deterministic sampling / mixture construction (pipeline/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from great_expectations_spark.pipeline.sampling import (
    build_mixture,
    deterministic_sample,
    mixture_fractions,
    stratified_sample,
    train_holdout_split,
    uniform_from_key,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, ["en", "de", "fr"][i % 3], 10 + (i % 5)) for i in range(900)]
    return spark.createDataFrame(rows, "doc_id int, lang string, tokens int")


def test_uniform_range_and_determinism(spark, corpus):
    u = corpus.select(uniform_from_key(F.col("doc_id"), seed=7).alias("u"))
    mn, mx = u.agg(F.min("u"), F.max("u")).first()
    assert 0.0 <= mn and mx < 1.0
    # independent of partition layout
    a = sorted(r["u"] for r in u.collect())
    b = sorted(
        r["u"]
        for r in corpus.repartition(13)
        .select(uniform_from_key(F.col("doc_id"), seed=7).alias("u"))
        .collect()
    )
    assert a == b


def test_deterministic_sample_stable_and_sized(spark, corpus):
    s1 = {r["doc_id"] for r in deterministic_sample(corpus, 0.3, "doc_id", seed=1).collect()}
    s2 = {r["doc_id"] for r in deterministic_sample(corpus, 0.3, "doc_id", seed=1).collect()}
    assert s1 == s2
    assert 0.2 < len(s1) / 900 < 0.4
    # nested property: a smaller fraction is a subset of a larger one
    s_small = {r["doc_id"] for r in deterministic_sample(corpus, 0.1, "doc_id", seed=1).collect()}
    assert s_small <= s1


def test_train_holdout_disjoint_exhaustive(spark, corpus):
    train, hold = train_holdout_split(corpus, "doc_id", 0.2, seed=3)
    t = {r["doc_id"] for r in train.collect()}
    h = {r["doc_id"] for r in hold.collect()}
    assert t.isdisjoint(h)
    assert len(t) + len(h) == 900
    assert 0.1 < len(h) / 900 < 0.3


def test_stratified_sample_per_stratum(spark, corpus):
    out = stratified_sample(
        corpus, "lang", {"en": 1.0, "de": 0.0}, "doc_id", default_fraction=0.5
    )
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["en"] == 300
    assert "de" not in counts
    assert 100 < counts["fr"] < 200


def test_mixture_fractions_math(spark, corpus):
    # availability: 300 docs per lang; ask for 300 total at 2:1 en:de
    fr, report = mixture_fractions(corpus, "lang", {"en": 2, "de": 1}, target=300)
    assert fr["en"] == pytest.approx(200 / 300)
    assert fr["de"] == pytest.approx(100 / 300)
    assert not any(r["undersupplied"] for r in report)


def test_mixture_fractions_undersupplied_caps_at_one(spark, corpus):
    fr, report = mixture_fractions(corpus, "lang", {"en": 1}, target=5000)
    assert fr["en"] == 1.0
    (r,) = report
    assert r["undersupplied"] and r["available"] == 300


def test_mixture_fractions_token_weighted(spark, corpus):
    # size_col: target expressed in tokens, not rows
    total_en = corpus.where(F.col("lang") == "en").agg(F.sum("tokens")).first()[0]
    fr, _ = mixture_fractions(
        corpus, "lang", {"en": 1}, target=total_en / 2, size_col="tokens"
    )
    assert fr["en"] == pytest.approx(0.5)


def test_build_mixture_drops_unlisted_strata(spark, corpus):
    out = build_mixture(corpus, "lang", {"en": 1, "de": 1}, target=200, key_col="doc_id")
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs <= {"en", "de"}
    n = out.count()
    assert 140 < n < 260  # expected 200, binomial spread


def test_mixture_validation_errors(spark, corpus):
    with pytest.raises(ValueError):
        mixture_fractions(corpus, "lang", {}, target=10)
    with pytest.raises(ValueError):
        mixture_fractions(corpus, "lang", {"en": -1, "de": 1}, target=10)


def test_null_key_rows_deterministic_and_together(spark):
    df = spark.createDataFrame(
        [(None, "x"), (None, "y"), ("k1", "z")], "key string, v string"
    )
    u = df.select(uniform_from_key(F.col("key"), seed=7).alias("u")).collect()
    nulls = [r["u"] for r in u[:2]]
    # NULL keys share one u (kept/dropped together), contract = md5('7|')
    import hashlib
    expect = (int(hashlib.md5(b"7|").hexdigest()[:15], 16) % 1_000_000) / 1_000_000
    assert nulls[0] == nulls[1] == pytest.approx(expect)


def test_shard_shuffle_partition_and_layout_invariant(spark):
    from great_expectations_spark.pipeline.sampling import shard_shuffle

    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    a = sorted(shard_shuffle(df.repartition(7), "doc_id", shards=8).collect())
    b = sorted(shard_shuffle(df.repartition(2), "doc_id", shards=8).collect())
    assert a == b
    # every shard's positions are exactly 0..n_s-1
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(8))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))


def test_shard_shuffle_decorrelates_order_from_key(spark):
    from great_expectations_spark.pipeline.sampling import shard_shuffle

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    out = shard_shuffle(df, "doc_id", shards=1)
    order = [r["doc_id"] for r in sorted(out.collect(),
                                         key=lambda r: r["pos"])]
    assert order != sorted(order)  # permuted, not ingest order
    # and a different seed gives a different permutation
    out2 = shard_shuffle(df, "doc_id", shards=1, seed=99)
    order2 = [r["doc_id"] for r in sorted(out2.collect(),
                                          key=lambda r: r["pos"])]
    assert order2 != order


def test_shard_shuffle_matches_reference_hash_contract(spark):
    import hashlib

    from great_expectations_spark.pipeline.sampling import shard_shuffle

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    got = {r["doc_id"]: (r["shard"], r["pos"]) for r in
           shard_shuffle(df, "doc_id", shards=4, seed=3).collect()}
    exp_shard = {i: h(f"3|{i}") % 4 for i in range(50)}
    assert {k: v[0] for k, v in got.items()} == exp_shard
    for s in range(4):
        members = sorted((h(f"4|{i}"), i) for i in range(50)
                         if exp_shard[i] == s)
        for pos, (_, i) in enumerate(members):
            assert got[i][1] == pos


def test_shard_shuffle_validates_shards(spark):
    from great_expectations_spark.pipeline.sampling import shard_shuffle

    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="shards"):
        shard_shuffle(df, "doc_id", shards=0)


def test_shard_shuffle_rejects_column_collisions(spark):
    from great_expectations_spark.pipeline.sampling import shard_shuffle

    df = spark.createDataFrame([(1, 0)], "doc_id long, pos long")
    with pytest.raises(ValueError, match="collide"):
        shard_shuffle(df, "doc_id", shards=2)
    # custom names route around the collision
    out = shard_shuffle(df, "doc_id", shards=2, pos_col="__pp")
    assert {"shard", "__pp", "pos"} <= set(out.columns)
