"""Inferred filesystem data assets: regex over directory listings →
(asset, batch_identifiers, path) without per-asset configuration.

Mirrors the reference's InferredAssetFilesystemDataConnector
(datasource/data_connector/inferred_asset_filesystem_data_connector.py:19
plus the regex machinery in datasource/data_connector/util.py:149
``convert_data_reference_string_to_batch_identifiers_using_regex``):

* files one level under ``base_directory`` (selected by
  ``glob_directive``) are matched against ``pattern``;
* a named group ``(?P<data_asset_name>...)`` — or the group listed as
  ``data_asset_name`` in ``group_names`` — decides which asset the file
  belongs to (files with no such group all land in ``DEFAULT_ASSET``,
  the reference's behavior);
* the remaining groups become the batch identifiers;
* non-matching paths are reported, not silently dropped (the reference
  surfaces them as ``unmatched_data_references``).

Engine deviations, both deliberate and documented:

* ``read_asset`` hands the FULL path list for an asset to one
  ``spark.read`` call — at 10^5 files-per-asset scale Spark's own
  multi-path listing and partition planning beat a per-file loop, and
  batch identifiers can be rematerialized from
  ``F.input_file_name()`` when needed;
* sorters are the compact ``["+year", "-month"]`` string form covering
  the reference's lexicographic/numeric asc+desc Sorter classes; numeric
  comparison applies automatically when every value of a key parses as
  an int (NumericSorter), else lexicographic (LexicographicSorter).
"""

from __future__ import annotations

import glob as _glob
import os
import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .readers import read_any

DEFAULT_ASSET = "DEFAULT_ASSET_NAME"  # reference util.py DEFAULT_DATA_ASSET_NAME


@dataclass(frozen=True)
class BatchDefinition:
    """One discovered file: which asset it belongs to, the identifiers its
    path encodes, and the absolute path to read."""

    asset: str
    identifiers: dict[str, str] = field(default_factory=dict)
    path: str = ""


def _identifiers_from_match(
    m: "re.Match[str]", group_names: list[str] | None,
    *, keep_asset_group: bool = False,
) -> tuple[str, dict[str, str]]:
    named = m.groupdict()
    if named:
        # named-group syntax wins; group_names (when given) filters it —
        # exactly _determine_batch_identifiers_using_named_groups
        ids = {k: v for k, v in named.items()
               if group_names is None or k in group_names}
    else:
        ids = dict(zip(group_names or [], m.groups()))
    asset = ids.get("data_asset_name", DEFAULT_ASSET)
    if not keep_asset_group:
        # inferred connectors route the group into the asset name;
        # configured assets are named by dict key, so the group stays a
        # plain batch identifier
        ids.pop("data_asset_name", None)
    return asset, ids


def _sort_key(sorters: list[str] | None):
    """``["+year", "-month"]`` → a stable sort over identifier dicts.
    Descending keys are applied as separate stable passes (Python sorts
    are stable, so sorting by the LAST key first composes correctly)."""

    def parse(s: str) -> tuple[str, bool]:
        if s[:1] in "+-":
            return s[1:], s[0] == "-"
        return s, False

    return [parse(s) for s in (sorters or [])]


class InferredFilesystemAssets:
    """Discover data assets from a directory by regex; read them via the
    engine's reader surface. Listing happens once at construction (call
    :meth:`refresh` after new files land)."""

    def __init__(
        self,
        base_directory: str,
        pattern: str,
        group_names: list[str] | None = None,
        glob_directive: str = "*",
        sorters: list[str] | None = None,
    ) -> None:
        self.base_directory = os.path.abspath(base_directory)
        self.pattern = re.compile(pattern)
        self.group_names = list(group_names) if group_names else None
        self.glob_directive = glob_directive
        self.sorters = sorters or []
        self._batches: list[BatchDefinition] = []
        self._unmatched: list[str] = []
        self.refresh()

    def refresh(self) -> None:
        self._batches, self._unmatched = [], []
        root = self.base_directory
        paths = sorted(
            p for p in _glob.glob(os.path.join(root, self.glob_directive))
            if os.path.isfile(p)
        )
        for p in paths:
            rel = os.path.relpath(p, root)
            m = self.pattern.match(rel)
            if m is None:
                self._unmatched.append(rel)
                continue
            asset, ids = _identifiers_from_match(m, self.group_names)
            self._batches.append(BatchDefinition(asset, ids, p))

    # -- discovery surface -------------------------------------------------
    def asset_names(self) -> list[str]:
        return sorted({b.asset for b in self._batches})

    def unmatched(self) -> list[str]:
        """Relative paths that matched the glob but not the regex — the
        reference's unmatched_data_references."""
        return list(self._unmatched)

    def batch_definitions(
        self, asset: str | None = None, **identifier_filters: str
    ) -> list[BatchDefinition]:
        out = [
            b for b in self._batches
            if (asset is None or b.asset == asset)
            and all(b.identifiers.get(k) == str(v)
                    for k, v in identifier_filters.items())
        ]
        for key, desc in reversed(_sort_key(self.sorters)):
            vals = [b.identifiers.get(key) for b in out]
            numeric = all(
                v is not None and re.fullmatch(r"-?\d+", v) for v in vals
            ) and bool(vals)

            def k(b: BatchDefinition):
                v = b.identifiers.get(key)
                # missing keys sort first, as None < everything
                return (v is not None, int(v) if numeric and v is not None
                        else v or "")

            out.sort(key=k, reverse=desc)
        return out

    # -- read surface -------------------------------------------------------
    def read_batch(
        self,
        spark: SparkSession,
        asset: str,
        reader_method: str | None = None,
        reader_options: dict[str, Any] | None = None,
        **identifier_filters: str,
    ) -> DataFrame:
        """Read the single batch the filters select (ambiguity is an
        error, matching the reference's one-batch batch_request)."""
        found = self.batch_definitions(asset, **identifier_filters)
        if len(found) != 1:
            raise ValueError(
                f"expected exactly 1 batch for asset {asset!r} with "
                f"{identifier_filters!r}, found {len(found)}")
        return read_any(spark, found[0].path, reader_method,
                        **(reader_options or {}))

    def read_asset(
        self,
        spark: SparkSession,
        asset: str,
        reader_method: str | None = None,
        reader_options: dict[str, Any] | None = None,
        **identifier_filters: str,
    ) -> DataFrame:
        """All of an asset's (filtered) files in ONE spark.read call —
        the scale path (see module docstring)."""
        found = self.batch_definitions(asset, **identifier_filters)
        if not found:
            raise ValueError(
                f"no batches for asset {asset!r} with {identifier_filters!r}")
        paths = [b.path for b in found]
        exts = {os.path.splitext(p)[1] for p in paths}
        if reader_method is None and len(exts) > 1:
            raise ValueError(
                f"asset {asset!r} mixes file types {sorted(exts)}; pass an "
                "explicit reader_method")
        return read_any(spark, paths, reader_method,
                        **(reader_options or {}))


@dataclass
class AssetSpec:
    """Per-asset configuration for :class:`ConfiguredFilesystemAssets` —
    the engine form of the reference's Asset block
    (datasource/data_connector/asset/asset.py:7): each asset may carry its
    own regex, group names, directory, and glob."""

    pattern: str
    group_names: list[str] | None = None
    base_directory: str | None = None  # defaults to the connector's base
    glob_directive: str | None = None  # defaults to the connector's glob


class ConfiguredFilesystemAssets(InferredFilesystemAssets):
    """Explicitly configured data assets — the twin of
    :class:`InferredFilesystemAssets` where the asset list is declared
    instead of regex-inferred (reference
    datasource/data_connector/configured_asset_filesystem_data_connector.py:20,38:
    ``assets`` is a dict of per-asset configs, each with its own regex
    and directory, overriding connector-level defaults).

    The asset name is the dict KEY; every regex group is a batch
    identifier (no ``data_asset_name`` group needed — if present it is
    treated as a plain identifier, matching the reference, where
    configured assets ignore asset-name extraction). Discovery, sorting,
    and the one-``spark.read``-per-asset read path are shared with the
    inferred connector.
    """

    def __init__(
        self,
        base_directory: str,
        assets: dict[str, AssetSpec | dict | str],
        glob_directive: str = "*",
        sorters: list[str] | None = None,
    ) -> None:
        specs: dict[str, AssetSpec] = {}
        for name, spec in assets.items():
            if isinstance(spec, str):
                spec = AssetSpec(pattern=spec)
            elif isinstance(spec, dict):
                spec = AssetSpec(**spec)
            specs[name] = spec
        self.assets = specs
        # parent __init__ calls refresh(), which uses self.assets
        super().__init__(
            base_directory, pattern=".*", glob_directive=glob_directive,
            sorters=sorters)

    def refresh(self) -> None:
        self._batches, self._unmatched = [], []
        for name in sorted(self.assets):
            spec = self.assets[name]
            root = os.path.abspath(spec.base_directory or self.base_directory)
            rx = re.compile(spec.pattern)
            glob_d = spec.glob_directive or self.glob_directive
            for p in sorted(
                q for q in _glob.glob(os.path.join(root, glob_d))
                if os.path.isfile(q)
            ):
                rel = os.path.relpath(p, root)
                m = rx.match(rel)
                if m is None:
                    self._unmatched.append(f"{name}:{rel}")
                    continue
                _, ids = _identifiers_from_match(
                    m, spec.group_names, keep_asset_group=True)
                self._batches.append(BatchDefinition(name, ids, p))

    def asset_names(self) -> list[str]:
        """Configured assets exist even before any file matches."""
        return sorted(self.assets)
