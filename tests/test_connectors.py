"""Inferred filesystem assets (sources/connectors.py) vs the reference's
InferredAssetFilesystemDataConnector semantics
(datasource/data_connector/inferred_asset_filesystem_data_connector.py:19,
util.py:149)."""

from __future__ import annotations

import os

import pytest

from great_expectations_spark.sources.connectors import (
    DEFAULT_ASSET,
    InferredFilesystemAssets,
)

PATTERN = r"(?P<data_asset_name>[a-z]+)_(?P<year>\d{4})-(?P<month>\d{2})\.csv"


@pytest.fixture()
def tree(tmp_path):
    names = [
        "alpha_2020-01.csv", "alpha_2020-02.csv", "alpha_2019-12.csv",
        "beta_2021-07.csv",
        "notes.txt",            # matches glob *, not the regex -> unmatched
        "beta_2021.csv",        # wrong shape -> unmatched
    ]
    for n in names:
        (tmp_path / n).write_text("id,v\n1,a\n2,b\n")
    (tmp_path / "subdir").mkdir()  # directories are never data references
    return str(tmp_path)


def test_assets_inferred_from_named_group(tree):
    c = InferredFilesystemAssets(tree, PATTERN)
    assert c.asset_names() == ["alpha", "beta"]
    assert sorted(c.unmatched()) == ["beta_2021.csv", "notes.txt"]


def test_batch_identifiers_and_filters(tree):
    c = InferredFilesystemAssets(tree, PATTERN)
    alpha = c.batch_definitions("alpha")
    assert len(alpha) == 3
    assert all(set(b.identifiers) == {"year", "month"} for b in alpha)
    jan = c.batch_definitions("alpha", year="2020", month="01")
    assert len(jan) == 1 and jan[0].path.endswith("alpha_2020-01.csv")
    # int filter values are stringified before comparison
    assert len(c.batch_definitions("alpha", year=2020)) == 2


def test_sorters_numeric_desc_then_asc(tree):
    c = InferredFilesystemAssets(tree, PATTERN, sorters=["-year", "+month"])
    got = [(b.identifiers["year"], b.identifiers["month"])
           for b in c.batch_definitions("alpha")]
    assert got == [("2020", "01"), ("2020", "02"), ("2019", "12")]


def test_positional_groups_with_group_names(tree):
    c = InferredFilesystemAssets(
        tree, r"([a-z]+)_(\d{4})-(\d{2})\.csv",
        group_names=["data_asset_name", "year", "month"])
    assert c.asset_names() == ["alpha", "beta"]
    b = c.batch_definitions("beta")[0]
    assert b.identifiers == {"year": "2021", "month": "07"}


def test_no_asset_group_lands_in_default_asset(tree):
    c = InferredFilesystemAssets(tree, r"(?P<stem>[a-z]+)_.*\.csv")
    assert c.asset_names() == [DEFAULT_ASSET]
    # the loose pattern also matches beta_2021.csv -> 5 files
    assert len(c.batch_definitions(DEFAULT_ASSET)) == 5


def test_group_names_filters_named_groups(tree):
    # a named group omitted from group_names is NOT a batch identifier
    # (_determine_batch_identifiers_using_named_groups)
    c = InferredFilesystemAssets(
        tree, PATTERN, group_names=["data_asset_name", "year"])
    b = c.batch_definitions("alpha", year="2019")[0]
    assert b.identifiers == {"year": "2019"}


def test_refresh_sees_new_files(tree):
    c = InferredFilesystemAssets(tree, PATTERN)
    with open(os.path.join(tree, "gamma_2022-01.csv"), "w") as fh:
        fh.write("id,v\n9,z\n")
    assert "gamma" not in c.asset_names()
    c.refresh()
    assert "gamma" in c.asset_names()


def test_read_batch_and_read_asset(tree, spark):
    c = InferredFilesystemAssets(tree, PATTERN)
    one = c.read_batch(spark, "alpha", year="2020", month="01",
                       reader_options={"infer_schema": False})
    assert one.count() == 2 and one.columns == ["id", "v"]
    both = c.read_asset(spark, "alpha", year="2020",
                        reader_options={"infer_schema": False})
    assert both.count() == 4  # 2 files x 2 rows in ONE spark.read


def test_read_batch_ambiguity_is_an_error(tree, spark):
    c = InferredFilesystemAssets(tree, PATTERN)
    with pytest.raises(ValueError, match="found 3"):
        c.read_batch(spark, "alpha")
    with pytest.raises(ValueError, match="no batches"):
        c.read_asset(spark, "alpha", year="1999")


def test_mixed_file_types_require_explicit_reader(tree, spark):
    with open(os.path.join(tree, "alpha_2020-03.parquet"), "w") as fh:
        fh.write("")
    c = InferredFilesystemAssets(
        tree, r"(?P<data_asset_name>[a-z]+)_(?P<year>\d{4})-(?P<month>\d{2})\.\w+")
    with pytest.raises(ValueError, match="mixes file types"):
        c.read_asset(spark, "alpha")


# ---- configured-asset twin (ConfiguredAssetFilesystemDataConnector) ----

from great_expectations_spark.sources.connectors import (  # noqa: E402
    AssetSpec,
    ConfiguredFilesystemAssets,
)


@pytest.fixture()
def cfg_tree(tmp_path):
    (tmp_path / "alpha_2020-01.csv").write_text("id,v\n1,a\n")
    (tmp_path / "alpha_2020-02.csv").write_text("id,v\n2,b\n")
    (tmp_path / "stray.csv").write_text("id,v\n9,z\n")
    sub = tmp_path / "deep"
    sub.mkdir()
    (sub / "beta-7.csv").write_text("id,v\n3,c\n")
    return tmp_path


def test_configured_assets_exist_without_files(cfg_tree):
    c = ConfiguredFilesystemAssets(
        str(cfg_tree),
        assets={"empty": r"never_matches_(?P<x>\d+)\.csv",
                "alpha": r"alpha_(?P<year>\d{4})-(?P<month>\d{2})\.csv"})
    assert c.asset_names() == ["alpha", "empty"]
    assert c.batch_definitions("empty") == []
    assert len(c.batch_definitions("alpha")) == 2


def test_configured_per_asset_directory_and_shorthand(cfg_tree):
    c = ConfiguredFilesystemAssets(
        str(cfg_tree),
        assets={
            # plain-string shorthand = AssetSpec(pattern=...)
            "alpha": r"alpha_(?P<year>\d{4})-(?P<month>\d{2})\.csv",
            "beta": AssetSpec(
                pattern=r"beta-(\d+)\.csv", group_names=["n"],
                base_directory=str(cfg_tree / "deep")),
        })
    beta = c.batch_definitions("beta")
    assert [b.identifiers for b in beta] == [{"n": "7"}]
    # stray.csv matched alpha's glob but not its regex -> unmatched, tagged
    assert any(u.startswith("alpha:") for u in c.unmatched())


def test_configured_asset_name_group_is_plain_identifier(cfg_tree):
    c = ConfiguredFilesystemAssets(
        str(cfg_tree),
        assets={"a": r"(?P<data_asset_name>alpha)_(?P<year>\d{4})-02\.csv"})
    (b,) = c.batch_definitions("a")
    assert b.asset == "a"                       # dict key wins
    assert b.identifiers["data_asset_name"] == "alpha"  # group kept as id


def test_configured_sorters_and_read(cfg_tree, spark):
    c = ConfiguredFilesystemAssets(
        str(cfg_tree),
        assets={"alpha": r"alpha_(?P<year>\d{4})-(?P<month>\d{2})\.csv"},
        sorters=["-month"])
    months = [b.identifiers["month"] for b in c.batch_definitions("alpha")]
    assert months == ["02", "01"]
    df = c.read_asset(spark, "alpha", reader_options={"header": True})
    assert df.count() == 2
    one = c.read_batch(spark, "alpha", month="02",
                       reader_options={"header": True})
    assert one.count() == 1
