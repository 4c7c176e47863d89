"""DataContext — the front-door facade tying stores, suites, validation,
checkpoints, and data docs together.

The reference's primary entry point is ``ge.get_context()`` returning a
DataContext that owns the store registry and routes every operation
through it (reference ``util.py:1735`` ``get_context``,
``data_context/data_context/abstract_data_context.py`` — suites CRUD,
``run_checkpoint``, ``build_data_docs``, evaluation-parameter plumbing).
This module is the engine-sized equivalent: a thin driver-side object over
``stores.py`` backends — it owns NO Spark state and adds NO Spark jobs
beyond the ``validate``/``run_checkpoint`` calls it forwards to.

Two modes:

* ``DataContext()`` — ephemeral, in-memory stores (the reference's
  EphemeralDataContext).
* ``DataContext(root_dir=...)`` — filesystem-backed layout (the
  reference's FileDataContext ``great_expectations/`` scaffold)::

      <root_dir>/expectations/<suite>.json
      <root_dir>/validations/<suite>/<run_id>.json
      <root_dir>/metrics.db            (SQLite: metrics + eval params)
      <root_dir>/data_docs/            (static HTML site)

Any store can be swapped by passing a constructed store instance —
backends are pluggable per ``stores.py``.
"""

from __future__ import annotations

import itertools
import os
import time
from typing import Any

from great_expectations_spark.actions import build_docs_site, run_actions
from great_expectations_spark.core.result import SuiteValidationResult
from great_expectations_spark.core.suite import ExpectationSuite
from great_expectations_spark.stores import (
    DatabaseStoreBackend,
    EvaluationParameterStore,
    ExpectationSuiteStore,
    InMemoryStoreBackend,
    MetricStore,
    TupleFilesystemStoreBackend,
    ValidationResultStore,
    metric_kwargs_id,
)
from great_expectations_spark.validator import validate as _validate


_RUN_SEQ = itertools.count()


def _default_run_id() -> str:
    # Second-granularity time alone collides for back-to-back validate()
    # calls (the store would silently upsert-overwrite the earlier run);
    # the pid + per-process sequence number make the id unique however
    # fast runs arrive.
    return (time.strftime("%Y%m%dT%H%M%S", time.gmtime())
            + f".{os.getpid()}.{next(_RUN_SEQ)}")


class DataContext:
    def __init__(
        self,
        root_dir: str | None = None,
        suites: ExpectationSuiteStore | None = None,
        validations: ValidationResultStore | None = None,
        metrics: MetricStore | None = None,
        evaluation_parameters: EvaluationParameterStore | None = None,
    ) -> None:
        self.root_dir = root_dir
        if root_dir is not None and "://" in root_dir:
            # URI root (file://, hdfs://, s3a://, gs://, abfs://...):
            # every store rides the Hadoop FileSystem backend through the
            # active SparkSession's JVM — the engine's answer to the
            # reference's cloud store backends (tuple_store_backend.py:
            # 433/715/938) with zero Python cloud SDKs. Metrics and
            # evaluation parameters use key→path JSON files here (SQLite
            # cannot live on a remote URI).
            from great_expectations_spark.stores import (
                TupleHadoopFilesystemStoreBackend,
            )

            def hd(sub: str, key_length: int, template: str | None = None):
                return TupleHadoopFilesystemStoreBackend(
                    root_dir.rstrip("/") + "/" + sub, key_length=key_length,
                    filepath_template=template)

            self.suites = suites or ExpectationSuiteStore(
                hd("expectations", 1))
            self.validations = validations or ValidationResultStore(
                hd("validations", 2, "{0}/{1}.json"))
            self.metrics = metrics or MetricStore(
                hd("metrics", 3, "{0}/{1}/{2}.json"))
            self.evaluation_parameters = evaluation_parameters or (
                EvaluationParameterStore(
                    hd("evaluation_parameters", 3, "{0}/{1}/{2}.json")))
        elif root_dir is not None:
            os.makedirs(root_dir, exist_ok=True)
            self.suites = suites or ExpectationSuiteStore(
                TupleFilesystemStoreBackend(
                    os.path.join(root_dir, "expectations"), key_length=1))
            self.validations = validations or ValidationResultStore(
                TupleFilesystemStoreBackend(
                    os.path.join(root_dir, "validations"), key_length=2,
                    filepath_template="{0}/{1}.json"))
            self.metrics = metrics or MetricStore(
                DatabaseStoreBackend(
                    os.path.join(root_dir, "metrics.db"), table="metrics"))
            self.evaluation_parameters = evaluation_parameters or (
                EvaluationParameterStore(DatabaseStoreBackend(
                    os.path.join(root_dir, "metrics.db"))))
        else:
            self.suites = suites or ExpectationSuiteStore(InMemoryStoreBackend())
            self.validations = validations or ValidationResultStore(
                InMemoryStoreBackend())
            self.metrics = metrics or MetricStore(InMemoryStoreBackend())
            self.evaluation_parameters = evaluation_parameters or (
                EvaluationParameterStore(InMemoryStoreBackend()))

    # ---- suites CRUD (reference abstract_data_context add/get/list) ----

    def add_suite(self, suite: ExpectationSuite) -> ExpectationSuite:
        self.suites.save(suite)
        return suite

    def get_suite(self, name: str) -> ExpectationSuite:
        return self.suites.get(name)

    def list_suite_names(self) -> list[str]:
        return [k[0] for k in self.suites.list_keys()]

    def delete_suite(self, name: str) -> None:
        self.suites.remove_key(name)

    # ---- validation ----

    def validate(
        self,
        df: Any,
        suite: ExpectationSuite | str,
        run_id: str | None = None,
        result_format: Any = "BASIC",
        tables: dict[str, Any] | None = None,
        actions: list[Any] | None = None,
        **validate_kwargs: Any,
    ) -> SuiteValidationResult:
        """Validate ``df``, persist the result under (suite, run_id),
        publish each EVR's observed_value to the evaluation-parameter
        store (so a downstream suite can bind validations URNs), then run
        any extra actions. ``suite`` may be a stored suite's name.

        Bound evaluation parameters from PRIOR runs in this context are
        injected automatically: `$PARAMETER` URNs referencing an upstream
        suite resolve against the most recently PUBLISHED value (insertion
        order — caller-supplied run ids need not sort chronologically)."""
        if isinstance(suite, str):
            suite = self.get_suite(suite)
        run_id = run_id or _default_run_id()
        params = dict(validate_kwargs.pop("evaluation_parameters", None) or {})
        # latest-published-wins URN binding: one O(params) prefix scan of
        # the store's latest-value view, regardless of run-history depth
        # (explicit evaluation_parameters= always beat stored ones)
        for urn, v in self.evaluation_parameters.bind_latest_params().items():
            params.setdefault(urn, v)
        result = _validate(
            df, suite, result_format=result_format, tables=tables,
            evaluation_parameters=params or None, **validate_kwargs)
        self.validations.set((result.suite_name, run_id), result)
        self.evaluation_parameters.store_suite_result(result, run_id)
        for evr in result.results:
            res = evr.result or {}
            if "observed_value" in res:
                self.metrics.set(
                    (run_id, evr.expectation_config.expectation_type,
                     metric_kwargs_id(evr.expectation_config.kwargs)),
                    res["observed_value"])
        if actions:
            run_actions(result, actions, run_id=run_id)
        return result

    def run_checkpoint(self, *args: Any, **kwargs: Any) -> Any:
        """Forward to ``checkpoint.run_checkpoint`` (chunked, resumable,
        results-table-backed). The per-chunk EVR data belongs in the
        parquet/Iceberg/Delta results table, not in these JSON stores —
        use ``CheckpointResult.rollup()`` for the suite-level verdict."""
        from great_expectations_spark.checkpoint import run_checkpoint

        return run_checkpoint(*args, **kwargs)

    # ---- docs ----

    def build_data_docs(self, docs_dir: str | None = None) -> str:
        """Build the static docs site. Under a URI root (the renderers
        write through ``os`` APIs, which would treat ``hdfs://...`` as a
        bogus relative local path) the site is rendered into a local
        staging directory and uploaded file-by-file through the same
        Hadoop FileSystem the stores use; returns the URI of the site
        root. An explicit LOCAL ``docs_dir`` always renders locally."""
        if docs_dir is None:
            if self.root_dir is None:
                raise ValueError("ephemeral context: pass docs_dir explicitly")
            docs_dir = self.root_dir.rstrip("/") + "/data_docs" \
                if "://" in self.root_dir \
                else os.path.join(self.root_dir, "data_docs")
        if "://" not in docs_dir:
            return build_docs_site(self.validations, docs_dir,
                                   suite_store=self.suites)

        import shutil
        import tempfile

        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise ValueError(
                "building docs at a URI needs an active SparkSession "
                "(the JVM hosts the Hadoop FileSystem client)")
        staging = tempfile.mkdtemp(prefix="ges_docs_")
        try:
            build_docs_site(self.validations, staging,
                            suite_store=self.suites)
            jvm = spark._jvm
            Path = jvm.org.apache.hadoop.fs.Path
            root = Path(docs_dir)
            fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
            fs.mkdirs(root)
            for dirpath, _dirs, files in os.walk(staging):
                for name in files:
                    local = os.path.join(dirpath, name)
                    rel = os.path.relpath(local, staging).replace(
                        os.sep, "/")
                    fs.copyFromLocalFile(
                        False, True, Path(local), Path(root, rel))
        finally:
            shutil.rmtree(staging, ignore_errors=True)
        return docs_dir


def get_context(root_dir: str | None = None, **kwargs: Any) -> DataContext:
    """Module-level constructor matching the reference's ``get_context``
    ergonomics (util.py:1735): no args → ephemeral; ``root_dir`` → file-
    backed."""
    return DataContext(root_dir=root_dir, **kwargs)
