"""Sequence packing (pipeline/packing.py): deterministic bucketed greedy
packing — contract checks against a hand-simulated single bucket."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from great_expectations_spark.pipeline.packing import pack_sequences, pack_stats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, 100 + (i * 37) % 900) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id int, tokens int")


def test_single_bucket_matches_hand_simulation(spark, docs):
    # buckets=1 -> one stream ordered by doc_id; replay the contract in
    # plain Python: pack = floor(exclusive_cumsum / budget)
    budget = 1000
    out = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"])
        for r in pack_sequences(docs, "tokens", budget, "doc_id", buckets=1).collect()
    }
    cum = 0
    for i in range(200):
        size = 100 + (i * 37) % 900
        assert out[i] == (cum // budget, cum % budget), f"doc {i}"
        cum += size


def test_deterministic_across_partitioning(spark, docs):
    a = sorted(map(tuple, pack_sequences(docs, "tokens", 1000, "doc_id").collect()))
    b = sorted(
        map(tuple, pack_sequences(docs.repartition(17), "tokens", 1000, "doc_id").collect())
    )
    assert a == b


def test_soft_cap_overflow_bounded(spark, docs):
    budget = 1000
    packed = pack_sequences(docs, "tokens", budget, "doc_id", buckets=8)
    stats = pack_stats(packed, "tokens", budget).collect()
    max_doc = 100 + max((i * 37) % 900 for i in range(200))
    for r in stats:
        # soft cap: total < budget + largest doc
        assert r["total_tokens"] < budget + max_doc
        assert r["fill_ratio"] == pytest.approx(r["total_tokens"] / budget)
    # every doc assigned exactly once
    assert packed.count() == 200
    assert sum(r["n_docs"] for r in stats) == 200


def test_oversized_doc_gets_own_span(spark):
    df = spark.createDataFrame(
        [(1, 50), (2, 2500), (3, 60)], "doc_id int, tokens int"
    )
    out = {r["doc_id"]: r["pack_id"] for r in
           pack_sequences(df, "tokens", 1000, "doc_id", buckets=1).collect()}
    # doc2 starts in pack 0 (offset 50); doc3 starts at cum 2550 -> pack 2
    assert out[1] == 0 and out[2] == 0 and out[3] == 2


def test_validation_rejects_bad_sizes(spark):
    df = spark.createDataFrame([(1, None)], "doc_id int, tokens int")
    # inline raise_error guard: fails the JOB on the first bad row, no
    # extra validation scan
    with pytest.raises(Exception, match="positive and non-null"):
        pack_sequences(df, "tokens", 1000, "doc_id").collect()
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, "tokens", 0, "doc_id")
    with pytest.raises(ValueError, match="buckets"):
        pack_sequences(df, "tokens", 1000, "doc_id", buckets=2**24)
    # validate=False skips the guard; NULL sizes pack as zero-width
    assert pack_sequences(df, "tokens", 1000, "doc_id", validate=False).count() == 1


def test_bucket_isolation(spark, docs):
    # pack ids from different buckets never collide (stride arithmetic)
    packed = pack_sequences(docs, "tokens", 1000, "doc_id", buckets=16)
    n_buckets = packed.select((F.col("pack_id") / (1 << 40)).cast("long")).distinct().count()
    assert 1 < n_buckets <= 16
