"""Property-based tests (hypothesis) — randomized semantics checks the
reference's own suite lacks (SURVEY §5: "No property-based/randomized
testing" there).

Driver-side properties run hundreds of examples; Spark round-trip
properties are capped at a handful of examples each (session round-trips
are ~0.5 s) and assert against brute-force Python over the same rows.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from great_expectations_spark.core.evaluation_parameters import (
    parse_evaluation_parameter,
)
from great_expectations_spark.plans.compiler import _between_success

SPARK_EXAMPLES = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture])


class TestDriverSideProperties:
    @given(
        a=st.integers(-1000, 1000),
        b=st.integers(-1000, 1000),
        c=st.integers(1, 50),
        op=st.sampled_from(["+", "-", "*"]),
    )
    def test_eval_param_arithmetic_matches_python(self, a, b, c, op):
        expr = f"({a} {op} {b}) * {c} + x"
        expected = eval(f"({a} {op} {b}) * {c}") + 7  # noqa: S307 - test oracle
        assert parse_evaluation_parameter(expr, {"x": 7}) == expected

    @given(
        value=st.one_of(st.none(), st.integers(-100, 100),
                        st.floats(-100, 100, allow_nan=False)),
        lo=st.one_of(st.none(), st.integers(-100, 100)),
        hi=st.one_of(st.none(), st.integers(-100, 100)),
        strict_min=st.booleans(),
        strict_max=st.booleans(),
    )
    def test_between_success_matches_bruteforce(self, value, lo, hi, strict_min, strict_max):
        kwargs = {"min_value": lo, "max_value": hi,
                  "strict_min": strict_min, "strict_max": strict_max}
        got = _between_success(value, kwargs)
        if value is None:
            assert got is False
            return
        ok = True
        if lo is not None:
            ok = ok and (value > lo if strict_min else value >= lo)
        if hi is not None:
            ok = ok and (value < hi if strict_max else value <= hi)
        assert got == ok

    @given(st.integers(0, 10_000), st.integers(0, 10_000), st.floats(0, 1))
    def test_mostly_ratio_monotone(self, nonmissing, unexpected, mostly):
        # the mostly verdict is monotone: fewer unexpected can never flip
        # success -> failure
        unexpected = min(unexpected, nonmissing)

        def verdict(u):
            if nonmissing <= 0:
                return True
            return (nonmissing - u) / nonmissing >= mostly

        assert (not verdict(unexpected)) or verdict(max(unexpected - 1, 0))


class TestSparkProperties:
    @SPARK_EXAMPLES
    @given(
        rows=st.lists(st.one_of(st.none(), st.integers(-50, 50)),
                      min_size=1, max_size=60),
        lo=st.integers(-30, 0),
        hi=st.integers(1, 30),
    )
    def test_between_counts_match_bruteforce(self, spark, rows, lo, hi):
        from great_expectations_spark import ExpectationSuite, validate

        df = spark.createDataFrame([(v,) for v in rows], "x int")
        suite = ExpectationSuite("p").add(
            "expect_column_values_to_be_between", column="x",
            min_value=lo, max_value=hi)
        res = validate(df, suite)
        r = res.results[0].result
        nonnull = [v for v in rows if v is not None]
        expected_unexp = sum(1 for v in nonnull if not (lo <= v <= hi))
        assert r["element_count"] == len(rows)
        assert r["missing_count"] == len(rows) - len(nonnull)
        assert r["unexpected_count"] == expected_unexp

    @SPARK_EXAMPLES
    @given(rows=st.lists(st.integers(-20, 20), min_size=2, max_size=50))
    def test_increasing_matches_adjacent_pairs(self, spark, rows):
        from great_expectations_spark import ExpectationSuite, validate

        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(rows)], "k int, v int"
        ).repartition(4)
        suite = ExpectationSuite("p").add(
            "expect_column_values_to_be_increasing", column="v", order_by="k")
        res = validate(df, suite, result_format="BOOLEAN_ONLY")
        expected = sum(1 for a, b in zip(rows, rows[1:]) if b < a)
        assert res.results[0].result["unexpected_count"] == expected

    @SPARK_EXAMPLES
    @given(rows=st.lists(st.integers(0, 8), min_size=1, max_size=60))
    def test_uniqueness_matches_bruteforce(self, spark, rows):
        from collections import Counter

        from great_expectations_spark import ExpectationSuite, validate

        df = spark.createDataFrame([(v,) for v in rows], "x int").repartition(4)
        suite = ExpectationSuite("p").add(
            "expect_column_values_to_be_unique", column="x")
        res = validate(df, suite, result_format="BOOLEAN_ONLY")
        expected = sum(n for n in Counter(rows).values() if n > 1)
        assert res.results[0].result["unexpected_count"] == expected

    @SPARK_EXAMPLES
    @given(
        rows=st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
            min_size=1, max_size=50),
    )
    def test_mean_sum_match_math(self, spark, rows):
        from great_expectations_spark import ExpectationSuite, validate

        df = spark.createDataFrame([(float(v),) for v in rows], "x double")
        suite = (
            ExpectationSuite("p")
            .add("expect_column_mean_to_be_between", column="x")
            .add("expect_column_sum_to_be_between", column="x")
        )
        res = validate(df, suite)
        got_mean = res.results[0].result["observed_value"]
        got_sum = res.results[1].result["observed_value"]
        assert math.isclose(got_mean, sum(rows) / len(rows),
                            rel_tol=1e-9, abs_tol=1e-6)
        assert math.isclose(got_sum, sum(rows), rel_tol=1e-9, abs_tol=1e-6)


class TestFusedPathProperties:
    """Round-3 single-scan fusions: the fused forms must equal the
    separate-pass forms on arbitrary corpora (including empty strings,
    repeated docs, and single-token docs)."""

    @given(texts=st.lists(
        st.text(alphabet="ab x", min_size=0, max_size=24), min_size=0,
        max_size=10))
    @SPARK_EXAMPLES
    def test_digest_and_buckets_matches_separate_paths(self, spark, texts):
        from pyspark.sql import functions as F

        from great_expectations_spark.pipeline.dedup import (
            _band_buckets, digest_and_buckets, exact_digest_table)

        rows = [(i, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, "doc_id long, text string") \
            if rows else spark.createDataFrame([], "doc_id long, text string")
        dig, tri = digest_and_buckets(df, "doc_id", "text", k=4, bands=2)
        old_tri = _band_buckets(df, "doc_id", "text", 4, 2, 3)
        old_dig = exact_digest_table(df, "doc_id", "text").select(
            F.col("id").alias("__id"), F.col("digest").alias("__h"))
        assert sorted(map(tuple, tri.collect())) == sorted(
            map(tuple, old_tri.collect()))
        assert sorted(map(tuple, dig.collect())) == sorted(
            map(tuple, old_dig.collect()))

    @given(texts=st.lists(
        st.text(alphabet="abc ", min_size=0, max_size=30), min_size=1,
        max_size=8))
    @SPARK_EXAMPLES
    def test_lm_fused_matches_two_pass(self, spark, texts):
        from great_expectations_spark.pipeline.lm import (
            doc_logprob, lm_train_and_score, unigram_lm)

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
        model2, scores2 = lm_train_and_score(
            df, "doc_id", "text", vocab_size=3, alpha=0.5)
        model1 = unigram_lm(df, "doc_id", "text", vocab_size=3, alpha=0.5)
        key = lambda t: (t[0] is None, t[0], t[1])
        assert sorted(map(tuple, model2.collect()), key=key) == sorted(
            map(tuple, model1.collect()), key=key)
        s1 = {r["doc_id"]: r for r in
              doc_logprob(df, model1, "doc_id", "text").collect()}
        s2 = {r["doc_id"]: r for r in scores2.collect()}
        assert set(s1) == set(s2)
        for k in s1:
            assert s2[k]["n_tokens"] == s1[k]["n_tokens"]
            a, b = s1[k]["avg_neg_logp"], s2[k]["avg_neg_logp"]
            assert (a is None) == (b is None)
            if a is not None:
                assert b == pytest.approx(a, abs=2e-6)


class TestConditionGrammar:
    """rule_profiler condition grammar: '&' and '|' share ONE
    left-associative precedence level (the reference's single
    infixNotation tier) — pinned against a brute-force left fold over
    randomly generated boolean expressions with parentheses."""

    @given(st.data())
    @settings(max_examples=200, deadline=None)
    def test_single_precedence_matches_left_fold(self, data):
        from great_expectations_spark.rule_profiler import _eval_condition

        def operand(depth):
            # an operand inside a chain must be an atom or parenthesized
            # — an unparenthesized sub-chain would flatten into the outer
            # chain and change the tree the reference value was folded on
            kind = data.draw(st.sampled_from(
                ["atom", "paren"] if depth < 4 else ["atom"]))
            if kind == "atom":
                b = data.draw(st.booleans())
                return (f"$variables.{'t' if b else 'f'} == 1", b)
            s, v = gen(depth + 1)
            return (f"({s})", v)

        def gen(depth):
            n = data.draw(st.integers(min_value=0, max_value=4))
            s, v = operand(depth)
            for _ in range(n):
                op = data.draw(st.sampled_from(["&", "|"]))
                s2, v2 = operand(depth)
                s = f"{s} {op} {s2}"
                v = (v and v2) if op == "&" else (v or v2)  # left fold
            return (s, v)

        cond, want = gen(0)
        got = _eval_condition(cond, {"t": 1, "f": 0}, None, {})
        assert got == want, cond
