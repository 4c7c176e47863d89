"""Pluggable store backends: CRUD across the three backends, key↔path
reversibility, typed-store round-trips, action integration.

All driver-side — no SparkSession needed.
"""

import json
import os
import threading

import pytest

from great_expectations_spark.actions import (
    StoreEvaluationParametersAction,
    StoreValidationResultAction,
)
from great_expectations_spark.core.result import (
    ExpectationValidationResult,
    SuiteValidationResult,
)
from great_expectations_spark.core.suite import ExpectationConfiguration, ExpectationSuite
from great_expectations_spark.stores import (
    DatabaseStoreBackend,
    EvaluationParameterStore,
    ExpectationSuiteStore,
    InMemoryStoreBackend,
    InvalidKeyError,
    MetricStore,
    StoreBackendError,
    TupleFilesystemStoreBackend,
    ValidationResultStore,
)


def _backends(tmp_path, key_length=1):
    return {
        "memory": InMemoryStoreBackend(),
        "filesystem": TupleFilesystemStoreBackend(
            str(tmp_path / f"fs{key_length}"), key_length=key_length),
        "sqlite": DatabaseStoreBackend(str(tmp_path / f"kv{key_length}.db")),
    }


def _suite_result(suite_name="s", n=2):
    evrs = []
    for i in range(n):
        cfg = ExpectationConfiguration(
            expectation_type="expect_column_mean_to_be_between",
            kwargs={"column": f"c{i}", "min_value": 0, "max_value": 10},
        )
        evrs.append(ExpectationValidationResult(
            success=(i % 2 == 0), expectation_config=cfg,
            result={"observed_value": float(i), "element_count": 100}))
    return SuiteValidationResult.from_results(evrs, suite_name=suite_name)


@pytest.mark.parametrize("kind", ["memory", "filesystem", "sqlite"])
def test_backend_crud(tmp_path, kind):
    b = _backends(tmp_path)[kind]
    assert not b.has_key(("a",))
    b.set(("a",), "v1")
    assert b.has_key(("a",)) and ("a",) in b
    assert b.get(("a",)) == "v1"
    b.set(("a",), "v2")  # overwrite
    assert b.get(("a",)) == "v2"
    b.set(("b",), "w")
    assert b.list_keys() == [("a",), ("b",)]
    b.move(("a",), ("c",))
    assert b.get(("c",)) == "v2" and not b.has_key(("a",))
    b.remove_key(("b",))
    assert b.list_keys() == [("c",)]
    with pytest.raises(InvalidKeyError):
        b.get(("zzz",))
    with pytest.raises(InvalidKeyError):
        b.remove_key(("zzz",))


@pytest.mark.parametrize("kind", ["memory", "filesystem", "sqlite"])
def test_backend_composite_keys_and_prefix(tmp_path, kind):
    b = _backends(tmp_path, key_length=2)[kind]
    b.set(("suite_a", "run1"), "1")
    b.set(("suite_a", "run2"), "2")
    b.set(("suite_b", "run1"), "3")
    assert b.list_keys(("suite_a",)) == [("suite_a", "run1"), ("suite_a", "run2")]
    assert b.list_keys() == [
        ("suite_a", "run1"), ("suite_a", "run2"), ("suite_b", "run1")]
    # exact-key prefix matches only itself
    assert b.list_keys(("suite_a", "run1")) == [("suite_a", "run1")]


@pytest.mark.parametrize("kind", ["memory", "filesystem", "sqlite"])
def test_backend_key_validation(tmp_path, kind):
    b = _backends(tmp_path)[kind]
    for bad in ((), ("",), (None,), (1,), ["a"]):
        with pytest.raises(InvalidKeyError):
            b.set(bad, "v")
    with pytest.raises(StoreBackendError):
        b.set(("k",), {"not": "a string"})


def test_sqlite_prefix_is_component_wise(tmp_path):
    """LIKE-prefix listing must not treat 'ab' as a prefix of key ('abc',)."""
    b = DatabaseStoreBackend(str(tmp_path / "p.db"))
    b.set(("ab", "x"), "1")
    b.set(("abc", "x"), "2")
    assert b.list_keys(("ab",)) == [("ab", "x")]
    with pytest.raises(InvalidKeyError):
        b.set(("bad\x1fpart",), "v")


def test_filesystem_template_roundtrip(tmp_path):
    b = TupleFilesystemStoreBackend(
        str(tmp_path / "t"), key_length=2, filepath_template="{0}/run-{1}.json")
    b.set(("suite", "20260819T120000"), "{}")
    assert os.path.isfile(tmp_path / "t" / "suite" / "run-20260819T120000.json")
    assert b.list_keys() == [("suite", "20260819T120000")]
    # stray files that don't parse back are ignored, not crashed on
    (tmp_path / "t" / "README.txt").write_text("not a key")
    assert b.list_keys() == [("suite", "20260819T120000")]


def test_filesystem_template_validation(tmp_path):
    with pytest.raises(StoreBackendError):  # {1} missing
        TupleFilesystemStoreBackend(str(tmp_path), key_length=2, filepath_template="{0}.json")
    with pytest.raises(StoreBackendError):  # irreversible: no separator
        TupleFilesystemStoreBackend(str(tmp_path), key_length=2, filepath_template="{0}{1}.json")
    b = TupleFilesystemStoreBackend(str(tmp_path / "ok"), key_length=1)
    for evil in ("a/b", ".", ".."):
        with pytest.raises(InvalidKeyError):
            b.set((evil,), "v")


def test_filesystem_write_is_atomic(tmp_path):
    b = TupleFilesystemStoreBackend(str(tmp_path / "a"), key_length=1)
    b.set(("k",), "x" * 1000)
    # no .tmp residue after replace
    names = os.listdir(tmp_path / "a")
    assert names == ["k.json"]


def test_expectation_suite_store_roundtrip(tmp_path):
    suite = ExpectationSuite(name="webpages").add(
        "expect_column_values_to_not_be_null", column="url").add(
        "expect_column_values_to_match_regex", column="url", regex="^https?://")
    for b in _backends(tmp_path).values():
        store = ExpectationSuiteStore(b)
        store.save(suite)
        back = store.get("webpages")
        assert back.to_json() == suite.to_json()
    # type guard
    with pytest.raises(StoreBackendError):
        ExpectationSuiteStore().set(("x",), {"raw": "dict"})


def test_validation_result_store_roundtrip(tmp_path):
    res = _suite_result("webpages", n=3)
    for b in _backends(tmp_path, key_length=2).values():
        store = ValidationResultStore(b)
        store.set(("webpages", "r1"), res)
        store.set(("webpages", "r2"), res)
        store.set(("other", "r1"), _suite_result("other"))
        back = store.get(("webpages", "r1"))
        assert back.to_json() == res.to_json()  # byte-identical round-trip
        assert back.results[1].success is False
        assert store.runs_for_suite("webpages") == ["r1", "r2"]


def test_store_add_update_semantics():
    store = MetricStore()
    store.add(("r1", "m", "__"), 5)
    with pytest.raises(StoreBackendError):
        store.add(("r1", "m", "__"), 6)
    store.update(("r1", "m", "__"), 7)
    assert store.get(("r1", "m", "__")) == 7
    with pytest.raises(InvalidKeyError):
        store.update(("r1", "nope", "__"), 1)
    with pytest.raises(InvalidKeyError):  # wrong arity for this store
        store.set(("r1", "m"), 1)


def test_evaluation_parameter_store_binds_same_urns_as_action(tmp_path):
    """EvaluationParameterStore.bind_params must produce exactly the URN→
    value map StoreEvaluationParametersAction builds in memory — the store
    is its durable twin."""
    res = _suite_result("upstream", n=2)
    action = StoreEvaluationParametersAction()
    action.run(res, run_id="r9")

    store = EvaluationParameterStore(
        DatabaseStoreBackend(str(tmp_path / "ep.db")))
    n = store.store_suite_result(res, run_id="r9")
    assert n == 2
    assert store.bind_params("r9") == action.params
    assert store.bind_params("missing-run") == {}


def test_store_validation_result_action_with_store():
    store = ValidationResultStore(InMemoryStoreBackend())
    res = _suite_result("s1")
    receipt = StoreValidationResultAction(store=store).run(res, run_id="rA")
    assert receipt["key"] == ["s1", "rA"]
    assert store.get(("s1", "rA")).to_json() == res.to_json()
    with pytest.raises(ValueError):
        StoreValidationResultAction().run(res, run_id="rB")


def test_result_from_dict_preserves_exception_info():
    cfg = ExpectationConfiguration("expect_table_row_count_to_equal", {"value": 1})
    evr = ExpectationValidationResult.exception(cfg, "boom", "tb")
    res = SuiteValidationResult.from_results([evr], suite_name="x")
    back = SuiteValidationResult.from_json(res.to_json())
    assert back.results[0].exception_info["raised_exception"] is True
    assert back.results[0].exception_info["exception_message"] == "boom"
    assert back.statistics == res.statistics


def test_concurrent_writers_memory_and_sqlite(tmp_path):
    for b in (InMemoryStoreBackend(),
              DatabaseStoreBackend(str(tmp_path / "c.db"))):
        def worker(i, b=b):
            for j in range(25):
                b.set((f"k{i}", str(j)), f"{i}:{j}")
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        [t.start() for t in threads]
        [t.join() for t in threads]
        assert len(b.list_keys()) == 100
        assert b.get(("k3", "24")) == "3:24"


def test_build_docs_site(tmp_path):
    from great_expectations_spark.actions import build_docs_site

    store = ValidationResultStore(
        TupleFilesystemStoreBackend(str(tmp_path / "vstore"), key_length=2))
    store.set(("alpha", "r1"), _suite_result("alpha", n=2))
    store.set(("alpha", "r2"), _suite_result("alpha", n=3))
    store.set(("beta", "r1"), _suite_result("beta", n=1))
    idx = build_docs_site(store, str(tmp_path / "docs"))
    html = open(idx).read()
    assert html.count("<section>") == 2
    assert "alpha__r1.html" in html and "alpha__r2.html" in html
    assert os.path.isfile(tmp_path / "docs" / "beta__r1.html")
    # per-run pages carry the expectation sections
    page = open(tmp_path / "docs" / "alpha__r2.html").read()
    assert page.count("<section>") == 3
    # deterministic: second build byte-identical
    assert open(build_docs_site(store, str(tmp_path / "docs"))).read() == html


def test_sqlite_prefix_listing_escapes_like_wildcards(tmp_path):
    """'_'/'%' in key parts are literal characters, not LIKE wildcards —
    without ESCAPE, listing ('suite_a',) also returned 'suiteXa' keys."""
    b = DatabaseStoreBackend(str(tmp_path / "esc.db"))
    b.set(("suite_a", "r1"), "1")
    b.set(("suiteXa", "r1"), "2")
    b.set(("suite%a", "r2"), "3")
    b.set(("suite_a_extra", "r3"), "4")
    assert set(b.list_keys(("suite_a",))) == {("suite_a", "r1")}
    assert set(b.list_keys(("suite%a",))) == {("suite%a", "r2")}
    assert set(b.list_keys(("suiteXa",))) == {("suiteXa", "r1")}


def test_eval_param_store_latest_view(tmp_path):
    """store_suite_result maintains an O(params) latest-value view keyed
    by PUBLICATION order, and rejects the reserved run id."""
    from great_expectations_spark.core.result import (
        ExpectationValidationResult as EVR,
    )

    def _result(n):
        return SuiteValidationResult(
            suite_name="up", success=True,
            results=[EVR(
                success=True,
                expectation_config=ExpectationConfiguration(
                    expectation_type="expect_table_row_count_to_be_between",
                    kwargs={"min_value": 1}),
                result={"observed_value": n})])

    s = EvaluationParameterStore(DatabaseStoreBackend(str(tmp_path / "ep.db")))
    # lexicographically DESCENDING run ids: run-9 > run-10 as strings
    s.store_suite_result(_result(10), "run-9")
    s.store_suite_result(_result(50), "run-10")
    urn = ("urn:great_expectations:validations:up:"
           "expect_table_row_count_to_be_between.result.observed_value")
    assert s.bind_latest_params()[urn] == 50
    with pytest.raises(InvalidKeyError):
        s.store_suite_result(_result(1), s.LATEST_RUN)


# ----------------------------------------------- Hadoop FileSystem backend
# (VERDICT r4 task 5: the reference's cloud Tuple stores
# tuple_store_backend.py:433/715/938 re-expressed as ONE backend over
# Hadoop's FileSystem API via the Spark JVM — contract-tested against
# file:// URIs through the exact code path s3a://gs://abfs:// would take)


def _hadoop_backend(spark, tmp_path, key_length=1, **kw):
    from great_expectations_spark.stores import (
        TupleHadoopFilesystemStoreBackend,
    )

    return TupleHadoopFilesystemStoreBackend(
        f"file://{tmp_path}/hfs{key_length}", key_length=key_length,
        spark=spark, **kw)


def test_hadoop_backend_crud(spark, tmp_path):
    b = _hadoop_backend(spark, tmp_path)
    assert not b.has_key(("a",))
    b.set(("a",), "v1")
    assert b.has_key(("a",)) and ("a",) in b
    assert b.get(("a",)) == "v1"
    b.set(("a",), "v2")  # overwrite through the tmp+rename path
    assert b.get(("a",)) == "v2"
    b.set(("b",), "w")
    assert b.list_keys() == [("a",), ("b",)]
    b.move(("a",), ("c",))
    assert b.get(("c",)) == "v2" and not b.has_key(("a",))
    b.remove_key(("b",))
    assert b.list_keys() == [("c",)]
    with pytest.raises(InvalidKeyError):
        b.get(("zzz",))
    with pytest.raises(InvalidKeyError):
        b.remove_key(("zzz",))


def test_hadoop_backend_composite_keys_prefix_and_escaping(spark, tmp_path):
    b = _hadoop_backend(spark, tmp_path, key_length=2,
                        filepath_template="{0}/{1}.json")
    b.set(("suite_a", "run1"), "1")
    b.set(("suite_a", "run2"), "2")
    b.set(("suite_b", "run1"), "3")
    assert b.list_keys(("suite_a",)) == [
        ("suite_a", "run1"), ("suite_a", "run2")]
    assert b.list_keys(("suite_a", "run1")) == [("suite_a", "run1")]
    # characters hostile to Hadoop Path parsing round-trip via the
    # percent-encoding: colon (URI scheme), slash, percent, space
    hostile = ("s:uite/100%", "run id:2024/01")
    b.set(hostile, "payload")
    assert b.get(hostile) == "payload"
    assert hostile in b.list_keys()
    b.remove_key(hostile)
    assert hostile not in b.list_keys()


def test_hadoop_backend_unicode_and_large_values(spark, tmp_path):
    b = _hadoop_backend(spark, tmp_path)
    big = "χ² " * 50_000  # multi-byte utf-8, > one 64 KiB copy buffer
    b.set(("big",), big)
    assert b.get(("big",)) == big


def test_hadoop_backend_template_validation_shared(spark, tmp_path):
    from great_expectations_spark.stores import (
        TupleHadoopFilesystemStoreBackend,
    )

    with pytest.raises(StoreBackendError):
        TupleHadoopFilesystemStoreBackend(
            f"file://{tmp_path}/bad", key_length=2,
            filepath_template="{0}{1}.json", spark=spark)


def test_data_context_uri_root_end_to_end(spark, tmp_path):
    """DataContext accepts a URI root: suites, validations, metrics and
    evaluation parameters all land under the Hadoop-backed stores and
    read back identically."""
    from great_expectations_spark.context import DataContext

    ctx = DataContext(f"file://{tmp_path}/ctx")
    suite = ExpectationSuite(name="web").add(
        "expect_column_values_to_not_be_null", column="url")
    ctx.add_suite(suite)
    assert ctx.list_suite_names() == ["web"]
    assert ctx.get_suite("web").to_json() == suite.to_json()

    res = _suite_result("web")
    ctx.validations.set(("web", "run-1"), res)
    assert ctx.validations.runs_for_suite("web") == ["run-1"]
    assert ctx.validations.get(("web", "run-1")).to_json() == res.to_json()

    stored = ctx.evaluation_parameters.store_suite_result(res, "run-1")
    assert stored == 2
    urns = ctx.evaluation_parameters.bind_latest_params()
    assert any("web:expect_column_mean_to_be_between" in u for u in urns)

    # the store layout is plain files a plain reader can see
    assert (tmp_path / "ctx" / "expectations" / "web.json").is_file()


def test_hadoop_backend_overwrite_is_atomic_filecontext(spark, tmp_path):
    """Review fix (r5): overwrite goes through FileContext's
    rename-with-OVERWRITE (the PUBLIC atomic replace), not
    delete-then-rename — no missing-key window, and no stray .tmp
    siblings remain."""
    import os

    b = _hadoop_backend(spark, tmp_path)
    assert b._fctx is not None and b._rename_overwrite is not None
    b.set(("k",), "v1")
    b.set(("k",), "v2")
    assert b.get(("k",)) == "v2"
    leftovers = [f for _, _, fs in os.walk(tmp_path) for f in fs
                 if f.endswith(".tmp")]
    assert leftovers == []


def test_data_context_uri_root_builds_docs_remotely(spark, tmp_path):
    """Review fix (r5): build_data_docs under a URI root renders into a
    local staging dir and uploads through the Hadoop FileSystem instead
    of writing a bogus local path named after the URI."""
    from great_expectations_spark.context import DataContext

    ctx = DataContext(f"file://{tmp_path}/ctx")
    ctx.add_suite(ExpectationSuite(name="web").add(
        "expect_column_values_to_not_be_null", column="u"))
    res = _suite_result("web")
    ctx.validations.set(("web", "run-1"), res)
    site = ctx.build_data_docs()
    assert site == f"file://{tmp_path}/ctx/data_docs"
    assert (tmp_path / "ctx" / "data_docs" / "index.html").is_file()
    assert (tmp_path / "ctx" / "data_docs" / "suite__web.html").is_file()
    # and no URI-named local junk directory appeared in the CWD
    import os
    assert not os.path.exists("file:")
