"""PII redaction (pipeline/redact.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from great_expectations_spark.pipeline.redact import (
    PII_PATTERNS,
    pii_stats,
    redact_pii,
)

DOCS = [
    (1, "write to jane.doe+x@ex-ample.org or bob@corp.io today"),
    (2, "server at 192.168.0.1 and 10.0.0.255 responded"),
    (3, "call 555-123-4567 or 555 987 6543 now"),
    (4, "ssn 123-45-6789 on file"),
    (5, None),
    (6, "clean text with no identifiers at all"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


@pytest.fixture(scope="module")
def redacted(docs):
    return {
        r["doc_id"]: r["red"]
        for r in docs.select("doc_id", redact_pii(F.col("text")).alias("red")).collect()
    }


def test_email_redaction(redacted):
    assert redacted[1] == "write to <EMAIL> or <EMAIL> today"


def test_ip_redaction(redacted):
    assert redacted[2] == "server at <IP> and <IP> responded"


def test_phone_redaction(redacted):
    assert redacted[3] == "call <PHONE> or <PHONE> now"


def test_id_number_beats_phone_order(spark):
    # 123-45-6789 is an ID shape, not a phone shape (3-2-4 digits)
    out = spark.createDataFrame([("ssn 123-45-6789 x",)], "text string").select(
        redact_pii(F.col("text")).alias("r")
    ).first()["r"]
    assert out == "ssn <ID> x"


def test_null_and_clean_text(redacted):
    assert redacted[5] is None
    assert redacted[6] == DOCS[5][1]


def test_pattern_subset_and_unknown(spark, docs):
    only_email = docs.select(redact_pii(F.col("text"), ["email"]).alias("r"))
    r2 = {i + 1: r["r"] for i, r in enumerate(only_email.collect())}
    assert "<EMAIL>" in r2[1] and "192.168.0.1" in r2[2]
    with pytest.raises(ValueError, match="unknown"):
        redact_pii(F.col("text"), ["emial"])


def test_pii_stats_fused(docs):
    row = pii_stats(docs).first()
    assert row["n_docs"] == 6 and row["n_text_docs"] == 5
    assert row["email_matches"] == 2 and row["email_docs"] == 1
    assert row["ipv4_matches"] == 2 and row["ipv4_docs"] == 1
    assert row["phone_matches"] == 2 and row["phone_docs"] == 1
    # the ID shape also matches the phone-less id pattern only
    assert row["id_number_matches"] == 1 and row["id_number_docs"] == 1


def test_canonical_order_is_stable():
    assert list(PII_PATTERNS) == ["email", "ipv4", "phone", "id_number"]
