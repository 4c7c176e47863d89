"""Pluggable store backends for suites, validation results, and metrics.

Re-expresses the engine-sized subset of the reference's store layer
(``data_context/store/``): a ``StoreBackend`` key/value protocol over
fixed-length string-tuple keys (reference ``_store_backend.py:13`` —
get/set/has_key/list_keys/remove_key/move/build_key), three concrete
backends, and typed stores that own (de)serialization on top of a backend
(reference ``store.py:34`` with ``serialize``/``deserialize`` hooks,
``expectations_store.py:25``, ``validations_store.py:27``,
``metric_store.py:18,67``).

Backends:

* ``InMemoryStoreBackend`` — dict-backed, for tests and ephemeral
  pipelines (reference ``in_memory_store_backend.py:13``).
* ``TupleFilesystemStoreBackend`` — one file per key under a base
  directory, key tuple ↔ relative path via a reversible
  ``filepath_template`` (reference ``tuple_store_backend.py:221``; the
  template grammar ``{0}/{1}.json`` and its reversibility check follow
  ``tuple_store_backend.py:101-208``). The same key→path mapping is what
  the reference's S3/GCS/Azure backends reuse with a bucket prefix
  (``tuple_store_backend.py:433,715,938``) — those need cloud SDKs absent
  from this sandbox, so the filesystem backend is the tuple-backend
  representative here and the mapping is the portable part.
* ``DatabaseStoreBackend`` — a two-column key/value table in SQLite
  (stdlib ``sqlite3``; the reference uses SQLAlchemy against any DB —
  ``database_store_backend.py:29``). Keys are the tuple joined with an
  ASCII unit separator, so composite keys stay ordered and listable by
  prefix with a single range scan.

Everything here is driver-side bookkeeping — no Spark jobs. The
checkpoint's RESULTS table (per-chunk metrics, violation rows, resume
lineage) stays in parquet/Iceberg/Delta via ``checkpoint.py``: that data
is big and belongs to the cluster. These stores hold the small control
plane: suite definitions, suite-level result JSON, cross-run metric
scalars.
"""

from __future__ import annotations

import json
import os
import re
import sqlite3
import threading
from typing import Any, Iterator

from great_expectations_spark.core.result import SuiteValidationResult
from great_expectations_spark.core.suite import ExpectationSuite

_UNIT_SEP = "\x1f"


class StoreBackendError(Exception):
    pass


class InvalidKeyError(StoreBackendError, KeyError):
    pass


def _validate_key(key: tuple[str, ...]) -> tuple[str, ...]:
    """Keys are non-empty tuples of non-empty strings (reference
    ``_store_backend.py:175`` ``_validate_key``)."""
    if isinstance(key, str):
        key = (key,)
    if not isinstance(key, tuple) or not key:
        raise InvalidKeyError(f"store key must be a non-empty tuple, got {key!r}")
    for part in key:
        if not isinstance(part, str) or not part:
            raise InvalidKeyError(f"store key parts must be non-empty strings, got {key!r}")
    return key


class StoreBackend:
    """Key/value protocol over string-tuple keys. Subclasses implement
    ``_get/_set/_has_key/_list_keys/_remove_key``; the public surface adds
    validation, ``move``, and dict-style sugar."""

    def get(self, key: tuple[str, ...]) -> str:
        key = _validate_key(key)
        if not self._has_key(key):
            raise InvalidKeyError(f"key {key!r} not found in {type(self).__name__}")
        return self._get(key)

    def set(self, key: tuple[str, ...], value: str) -> None:
        key = _validate_key(key)
        if not isinstance(value, str):
            raise StoreBackendError(
                f"backend values are strings (serialize first), got {type(value).__name__}")
        self._set(key, value)

    def has_key(self, key: tuple[str, ...]) -> bool:
        return self._has_key(_validate_key(key))

    def list_keys(self, prefix: tuple[str, ...] = ()) -> list[tuple[str, ...]]:
        return sorted(self._list_keys(tuple(prefix)))

    def remove_key(self, key: tuple[str, ...]) -> None:
        key = _validate_key(key)
        if not self._has_key(key):
            raise InvalidKeyError(f"key {key!r} not found in {type(self).__name__}")
        self._remove_key(key)

    def move(self, source_key: tuple[str, ...], dest_key: tuple[str, ...]) -> None:
        self.set(dest_key, self.get(source_key))
        self.remove_key(_validate_key(source_key))

    # dict-style sugar
    def __contains__(self, key: tuple[str, ...]) -> bool:
        return self.has_key(key)

    def __getitem__(self, key: tuple[str, ...]) -> str:
        return self.get(key)

    def __setitem__(self, key: tuple[str, ...], value: str) -> None:
        self.set(key, value)

    # subclass surface
    def _get(self, key: tuple[str, ...]) -> str:
        raise NotImplementedError

    def _set(self, key: tuple[str, ...], value: str) -> None:
        raise NotImplementedError

    def _has_key(self, key: tuple[str, ...]) -> bool:
        raise NotImplementedError

    def _list_keys(self, prefix: tuple[str, ...]) -> Iterator[tuple[str, ...]]:
        raise NotImplementedError

    def _remove_key(self, key: tuple[str, ...]) -> None:
        raise NotImplementedError


class InMemoryStoreBackend(StoreBackend):
    def __init__(self) -> None:
        self._store: dict[tuple[str, ...], str] = {}
        self._lock = threading.Lock()

    def _get(self, key: tuple[str, ...]) -> str:
        return self._store[key]

    def _set(self, key: tuple[str, ...], value: str) -> None:
        with self._lock:
            self._store[key] = value

    def _has_key(self, key: tuple[str, ...]) -> bool:
        return key in self._store

    def _list_keys(self, prefix: tuple[str, ...]) -> Iterator[tuple[str, ...]]:
        return (k for k in list(self._store) if k[: len(prefix)] == prefix)

    def _remove_key(self, key: tuple[str, ...]) -> None:
        with self._lock:
            del self._store[key]


def _compile_template(key_length: int, filepath_template: str | None,
                      filepath_suffix: str) -> tuple[str, "re.Pattern"]:
    """Validate + compile a key→relative-path template: every key index
    exactly once, placeholders separated by non-empty literals (otherwise
    ``list_keys`` could not parse paths back into tuples — same
    constraint the reference enforces in ``tuple_store_backend.py:
    157-208``). Returns (template, regex with one group per index)."""
    if filepath_template is None:
        filepath_template = "/".join(
            f"{{{i}}}" for i in range(key_length)) + filepath_suffix
    indices = [int(m) for m in re.findall(r"\{(\d+)\}", filepath_template)]
    if sorted(indices) != list(range(key_length)):
        raise StoreBackendError(
            f"filepath_template {filepath_template!r} must use each of "
            f"{{0}}..{{{key_length - 1}}} exactly once")
    # reversibility: non-empty literal text between adjacent placeholders
    if re.search(r"\}\{", filepath_template):
        raise StoreBackendError(
            f"filepath_template {filepath_template!r} is not reversible: "
            "adjacent placeholders with no separator")
    pattern = re.escape(filepath_template)
    for i in range(key_length):
        pattern = pattern.replace(re.escape(f"{{{i}}}"), f"(?P<k{i}>[^/]+)")
    return filepath_template, re.compile("^" + pattern + "$")


class TupleFilesystemStoreBackend(StoreBackend):
    """One file per key under ``base_directory``.

    ``filepath_template`` maps the key tuple to a relative path with
    ``{i}`` placeholders, e.g. ``"{0}/{1}.json"`` for
    ``(suite_name, run_id)``; see :func:`_compile_template` for the
    reversibility rules. Default template:
    ``"{0}/{1}/.../{n}" + filepath_suffix``.
    """

    def __init__(
        self,
        base_directory: str,
        key_length: int = 1,
        filepath_template: str | None = None,
        filepath_suffix: str = ".json",
    ) -> None:
        self.base_directory = base_directory
        self.key_length = key_length
        self.filepath_template, self._path_re = _compile_template(
            key_length, filepath_template, filepath_suffix)
        os.makedirs(base_directory, exist_ok=True)

    def _key_to_path(self, key: tuple[str, ...]) -> str:
        if len(key) != self.key_length:
            raise InvalidKeyError(
                f"key {key!r} has length {len(key)}, backend expects {self.key_length}")
        for part in key:
            if "/" in part or part in (".", ".."):
                raise InvalidKeyError(f"key part {part!r} is not a safe path segment")
        rel = self.filepath_template.format(*key)
        return os.path.join(self.base_directory, *rel.split("/"))

    def _path_to_key(self, rel: str) -> tuple[str, ...] | None:
        m = self._path_re.match(rel)
        if not m:
            return None
        return tuple(m.group(f"k{i}") for i in range(self.key_length))

    def _get(self, key: tuple[str, ...]) -> str:
        with open(self._key_to_path(key), "r") as f:
            return f.read()

    def _set(self, key: tuple[str, ...], value: str) -> None:
        path = self._key_to_path(key)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(value)
        os.replace(tmp, path)  # atomic on POSIX — no torn reads

    def _has_key(self, key: tuple[str, ...]) -> bool:
        return os.path.isfile(self._key_to_path(key))

    def _list_keys(self, prefix: tuple[str, ...]) -> Iterator[tuple[str, ...]]:
        for dirpath, _dirs, files in os.walk(self.base_directory):
            for name in files:
                full = os.path.join(dirpath, name)
                rel = os.path.relpath(full, self.base_directory).replace(os.sep, "/")
                key = self._path_to_key(rel)
                if key is not None and key[: len(prefix)] == prefix:
                    yield key

    def _remove_key(self, key: tuple[str, ...]) -> None:
        os.remove(self._key_to_path(key))


class TupleHadoopFilesystemStoreBackend(StoreBackend):
    """Key→path store over Hadoop's FileSystem API, reached through the
    SparkSession's JVM — ONE backend covering every URI scheme the
    cluster's Hadoop client supports (``file://``, ``hdfs://``,
    ``s3a://``, ``gs://``, ``abfs://``, ...) with zero Python cloud
    SDKs. The engine twin of the reference's per-cloud Tuple stores
    (tuple_store_backend.py:433 TupleS3StoreBackend, :715
    TupleGCSStoreBackend, :938 TupleAzureBlobStoreBackend), whose
    key→object-path mapping this reproduces; contract-tested against
    ``file://`` URIs through the same code path (tests/test_stores.py).

    Key parts are percent-encoded into path segments (a ``:`` or ``%``
    in a run id must not break Hadoop's ``Path`` parsing) and decoded on
    ``list_keys`` — the escaping round-trips, so keys come back exactly.
    Writes go to a ``.tmp`` sibling then an OVERWRITE rename through
    ``FileContext`` — atomic on HDFS and file:// even when the key
    already exists (no delete-then-rename window where a concurrent
    reader sees the key missing). Where ``FileContext`` cannot serve the
    scheme the backend falls back to delete+rename, which still never
    exposes a TORN value but does open a brief missing-key window on
    overwrite — the same semantics the reference's cloud stores have on
    non-atomic object stores.

    Driver-side only (py4j): stores hold suite/result JSON, not data —
    the same placement the reference gives its store backends."""

    def __init__(
        self,
        root_uri: str,
        key_length: int = 1,
        filepath_template: str | None = None,
        filepath_suffix: str = ".json",
        spark: Any = None,
    ) -> None:
        from pyspark.sql import SparkSession

        spark = spark or SparkSession.getActiveSession()
        if spark is None:
            raise StoreBackendError(
                "TupleHadoopFilesystemStoreBackend needs an active "
                "SparkSession — the JVM hosts the Hadoop FileSystem client")
        self.key_length = key_length
        self.filepath_template, self._path_re = _compile_template(
            key_length, filepath_template, filepath_suffix)
        self._jvm = spark._jvm
        self._gateway = spark.sparkContext._gateway
        self._Path = self._jvm.org.apache.hadoop.fs.Path
        root = self._Path(root_uri)
        self._conf = spark._jsc.hadoopConfiguration()
        self._fs = root.getFileSystem(self._conf)
        self._root = self._fs.makeQualified(root)
        self._fs.mkdirs(self._root)
        # FileContext gives the PUBLIC rename-with-OVERWRITE the
        # FileSystem API hides — atomic replace on HDFS/local; absent
        # for some schemes, in which case _set falls back
        try:
            self._fctx = self._jvm.org.apache.hadoop.fs.FileContext \
                .getFileContext(self._root.toUri(), self._conf)
            rename_cls = getattr(self._jvm.org.apache.hadoop.fs,
                                 "Options$Rename")
            arr = self._gateway.new_array(rename_cls, 1)
            arr[0] = rename_cls.OVERWRITE
            self._rename_overwrite = arr
        except Exception:
            self._fctx = None
            self._rename_overwrite = None

    # -- key <-> path -------------------------------------------------
    def _rel(self, key: tuple[str, ...]) -> str:
        from urllib.parse import quote

        if len(key) != self.key_length:
            raise InvalidKeyError(
                f"key {key!r} has length {len(key)}, backend expects "
                f"{self.key_length}")
        return self.filepath_template.format(
            *[quote(part, safe="") for part in key])

    def _path(self, key: tuple[str, ...]):
        return self._Path(self._root, self._rel(key))

    def _path_to_key(self, rel: str) -> tuple[str, ...] | None:
        from urllib.parse import unquote

        m = self._path_re.match(rel)
        if not m:
            return None
        return tuple(unquote(m.group(f"k{i}"))
                     for i in range(self.key_length))

    # -- backend protocol ---------------------------------------------
    def _get(self, key: tuple[str, ...]) -> str:
        stream = self._fs.open(self._path(key))
        try:
            baos = self._jvm.java.io.ByteArrayOutputStream()
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(
                stream, baos, 65536, False)
            return bytes(baos.toByteArray()).decode("utf-8")
        finally:
            stream.close()

    def _set(self, key: tuple[str, ...], value: str) -> None:
        dest = self._path(key)
        tmp = self._Path(self._root, self._rel(key) + ".tmp")
        out = self._fs.create(tmp, True)  # creates parent dirs
        try:
            out.write(bytearray(value.encode("utf-8")))
        finally:
            out.close()
        if self._fctx is not None:
            # atomic replace: concurrent readers see old value or new
            # value, never a missing key (class docstring)
            self._fctx.rename(tmp, dest, self._rename_overwrite)
            return
        if self._fs.exists(dest):
            self._fs.delete(dest, False)
        if not self._fs.rename(tmp, dest):
            raise StoreBackendError(
                f"rename {tmp} -> {dest} failed on "
                f"{self._fs.getScheme()} filesystem")

    def _has_key(self, key: tuple[str, ...]) -> bool:
        p = self._path(key)
        return bool(self._fs.exists(p)
                    and self._fs.getFileStatus(p).isFile())

    def _list_keys(self, prefix: tuple[str, ...]) -> Iterator[tuple[str, ...]]:
        if not self._fs.exists(self._root):
            return
        root_s = self._root.toString()
        it = self._fs.listFiles(self._root, True)
        while it.hasNext():
            p = it.next().getPath().toString()
            if not p.startswith(root_s + "/"):
                continue
            key = self._path_to_key(p[len(root_s) + 1:])
            if key is not None and key[: len(prefix)] == prefix:
                yield key

    def _remove_key(self, key: tuple[str, ...]) -> None:
        self._fs.delete(self._path(key), False)


class DatabaseStoreBackend(StoreBackend):
    """SQLite key/value table. ``db_path=":memory:"`` works for tests.

    The reference's backend targets any SQLAlchemy engine with one column
    per key field (``database_store_backend.py:29``); this sandbox has no
    SQLAlchemy, so the stdlib driver with a packed key column is the
    equivalent: composite keys serialize with an ASCII unit separator,
    which sorts component-wise, so prefix listing is a single indexed
    ``LIKE prefix%`` range scan.
    """

    def __init__(self, db_path: str, table: str = "ges_store") -> None:
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", table):
            raise StoreBackendError(f"invalid table name {table!r}")
        self._table = table
        self._conn = sqlite3.connect(db_path, check_same_thread=False)
        self._lock = threading.Lock()
        with self._lock, self._conn:
            self._conn.execute(
                f"CREATE TABLE IF NOT EXISTS {table} "
                "(key TEXT PRIMARY KEY, value TEXT NOT NULL)")

    @staticmethod
    def _pack(key: tuple[str, ...]) -> str:
        for part in key:
            if _UNIT_SEP in part:
                raise InvalidKeyError(f"key part {part!r} contains the separator byte")
        return _UNIT_SEP.join(key)

    def _get(self, key: tuple[str, ...]) -> str:
        row = self._conn.execute(
            f"SELECT value FROM {self._table} WHERE key = ?", (self._pack(key),)
        ).fetchone()
        if row is None:  # raced remove between has_key and get
            raise InvalidKeyError(f"key {key!r} not found")
        return row[0]

    def _set(self, key: tuple[str, ...], value: str) -> None:
        with self._lock, self._conn:
            self._conn.execute(
                f"INSERT INTO {self._table}(key, value) VALUES (?, ?) "
                "ON CONFLICT(key) DO UPDATE SET value = excluded.value",
                (self._pack(key), value))

    def _has_key(self, key: tuple[str, ...]) -> bool:
        return self._conn.execute(
            f"SELECT 1 FROM {self._table} WHERE key = ?", (self._pack(key),)
        ).fetchone() is not None

    def _list_keys(self, prefix: tuple[str, ...]) -> Iterator[tuple[str, ...]]:
        if prefix:
            packed = self._pack(prefix)
            # escape LIKE wildcards: '_'/'%' are ordinary characters in key
            # parts (suite names, run ids), not match-any operators
            escaped = (packed.replace("\\", "\\\\")
                       .replace("%", "\\%").replace("_", "\\_"))
            rows = self._conn.execute(
                f"SELECT key FROM {self._table} WHERE key = ? "
                "OR key LIKE ? ESCAPE '\\'",
                (packed, escaped + _UNIT_SEP + "%"))
        else:
            rows = self._conn.execute(f"SELECT key FROM {self._table}")
        return (tuple(r[0].split(_UNIT_SEP)) for r in rows.fetchall())

    def _remove_key(self, key: tuple[str, ...]) -> None:
        with self._lock, self._conn:
            self._conn.execute(
                f"DELETE FROM {self._table} WHERE key = ?", (self._pack(key),))

    def close(self) -> None:
        self._conn.close()


class Store:
    """Typed layer over a backend: owns serialize/deserialize (reference
    ``store.py:147,164``). Subclasses fix the key length and value type."""

    key_length: int = 1

    def __init__(self, backend: StoreBackend | None = None) -> None:
        self.backend = backend if backend is not None else InMemoryStoreBackend()

    def serialize(self, value: Any) -> str:
        return json.dumps(value, sort_keys=True, default=str)

    def deserialize(self, raw: str) -> Any:
        return json.loads(raw)

    def _key(self, key: str | tuple[str, ...]) -> tuple[str, ...]:
        key = (key,) if isinstance(key, str) else tuple(key)
        if len(key) != self.key_length:
            raise InvalidKeyError(
                f"{type(self).__name__} keys have {self.key_length} parts, got {key!r}")
        return key

    def get(self, key: str | tuple[str, ...]) -> Any:
        return self.deserialize(self.backend.get(self._key(key)))

    def set(self, key: str | tuple[str, ...], value: Any) -> None:
        self.backend.set(self._key(key), self.serialize(value))

    def add(self, key: str | tuple[str, ...], value: Any) -> None:
        """Create-only set (reference ``_store_backend.py:133``)."""
        k = self._key(key)
        if self.backend.has_key(k):
            raise StoreBackendError(f"key {k!r} already exists; use set/update")
        self.backend.set(k, self.serialize(value))

    def update(self, key: str | tuple[str, ...], value: Any) -> None:
        """Must-exist set (reference ``_store_backend.py:141``)."""
        k = self._key(key)
        if not self.backend.has_key(k):
            raise InvalidKeyError(f"key {k!r} does not exist; use set/add")
        self.backend.set(k, self.serialize(value))

    def has_key(self, key: str | tuple[str, ...]) -> bool:
        return self.backend.has_key(self._key(key))

    def list_keys(self, prefix: tuple[str, ...] = ()) -> list[tuple[str, ...]]:
        return self.backend.list_keys(prefix)

    def remove_key(self, key: str | tuple[str, ...]) -> None:
        self.backend.remove_key(self._key(key))


class ExpectationSuiteStore(Store):
    """Keyed by (suite_name,); values are ``ExpectationSuite`` (reference
    ``expectations_store.py:25``)."""

    key_length = 1

    def serialize(self, value: Any) -> str:
        if not isinstance(value, ExpectationSuite):
            raise StoreBackendError(
                f"ExpectationSuiteStore stores ExpectationSuite, got {type(value).__name__}")
        return value.to_json()

    def deserialize(self, raw: str) -> ExpectationSuite:
        return ExpectationSuite.from_json(raw)

    def save(self, suite: ExpectationSuite) -> None:
        self.set((suite.name,), suite)


class ValidationResultStore(Store):
    """Keyed by (suite_name, run_id); values are ``SuiteValidationResult``
    (reference ``validations_store.py:27`` keyed by
    ValidationResultIdentifier = suite/run_id/batch)."""

    key_length = 2

    def serialize(self, value: Any) -> str:
        if not isinstance(value, SuiteValidationResult):
            raise StoreBackendError(
                "ValidationResultStore stores SuiteValidationResult, "
                f"got {type(value).__name__}")
        return value.to_json()

    def deserialize(self, raw: str) -> SuiteValidationResult:
        return SuiteValidationResult.from_json(raw)

    def runs_for_suite(self, suite_name: str) -> list[str]:
        return [k[1] for k in self.list_keys((suite_name,))]


def metric_kwargs_id(kwargs: dict) -> str:
    """Deterministic, human-readable discriminator for a metric key —
    the reference's ``metric_kwargs_id`` concept (its ``metric_store``
    keys carry the full kwargs identity, not just the column): sorted
    ``k=v`` pairs of every value-bearing kwarg, so two same-type
    expectations on the same column (e.g. two ``between`` ranges) get
    DISTINCT keys instead of silently overwriting each other.
    ``"__"`` for table-level metrics with no kwargs."""
    from urllib.parse import quote

    items = []
    for k in sorted(kwargs):
        if k in ("result_format", "meta"):
            continue
        v = kwargs[k]
        if isinstance(v, (set, frozenset)):
            v = json.dumps(sorted(v, key=repr), default=str)
        elif isinstance(v, (list, dict, tuple)):
            v = json.dumps(v, sort_keys=True, default=str)
        # Percent-escape so regex/url-valued kwargs ('/', '%') can never
        # crash a filesystem store backend's key-to-path mapping; plain
        # identifiers and numbers pass through unchanged.
        items.append(f"{k}={quote(str(v), safe='')}")
    return "&".join(items) if items else "__"


class MetricStore(Store):
    """Keyed by (run_id, metric_name, metric_kwargs_id); values are JSON
    scalars/structs (reference ``metric_store.py:18``). Build the third
    key part with :func:`metric_kwargs_id` — it must carry the full
    kwargs identity or same-type-same-column expectations collide."""

    key_length = 3


class EvaluationParameterStore(MetricStore):
    """Same shape as MetricStore (reference ``metric_store.py:67``), plus a
    flat URN view consumable by ``validate(evaluation_parameters=...)``.

    ``LATEST_RUN`` is a reserved run id: every ``store_suite_result`` call
    also upserts its params under it, so "the most recently PUBLISHED value
    of each URN" is one O(params) prefix scan — publication order, not the
    lexicographic order of caller-supplied run-id strings, and independent
    of how many historical runs the store holds."""

    LATEST_RUN = "__latest__"

    def store_suite_result(self, result: SuiteValidationResult, run_id: str) -> int:
        """Persist each EVR's observed_value under its validations URN —
        the durable twin of ``StoreEvaluationParametersAction``.

        Keys here use the URN's own ``column=<c>`` identity (NOT the full
        :func:`metric_kwargs_id`) because ``bind_params`` must reconstruct
        resolvable URNs: the URN grammar itself cannot distinguish two
        same-type expectations on one column, so for that (rare) suite
        shape the LAST such EVR's observed_value wins — the same
        ambiguity the reference's URN system has."""
        if run_id == self.LATEST_RUN:
            raise InvalidKeyError(
                f"run_id {run_id!r} is reserved for the latest-value view")
        stored = 0
        for evr in result.results:
            res = evr.result or {}
            if "observed_value" not in res:
                continue
            et = evr.expectation_config.expectation_type
            col = evr.expectation_config.kwargs.get("column")
            kid = f"column={col}" if col is not None else "__"
            self.set((run_id, f"{result.suite_name}:{et}", kid), res["observed_value"])
            self.set((self.LATEST_RUN, f"{result.suite_name}:{et}", kid),
                     res["observed_value"])
            stored += 1
        return stored

    def bind_latest_params(self) -> dict[str, Any]:
        """URN → most-recently-published value, O(distinct params)."""
        return self.bind_params(self.LATEST_RUN)

    def bind_params(self, run_id: str) -> dict[str, Any]:
        """URN → value map for a run, in the exact key format
        ``core/evaluation_parameters.py`` resolves."""
        out: dict[str, Any] = {}
        for key in self.list_keys((run_id,)):
            _run, suite_metric, kid = key
            suite_name, et = suite_metric.split(":", 1)
            urn = (f"urn:great_expectations:validations:{suite_name}:"
                   f"{et}.result.observed_value")
            if kid != "__":
                urn = f"{urn}:{kid}"
            out[urn] = self.get(key)
        return out
