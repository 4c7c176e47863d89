from great_expectations_spark.core.result_format import ResultFormat
from great_expectations_spark.core.suite import ExpectationConfiguration, ExpectationSuite


def test_suite_json_roundtrip():
    s = ExpectationSuite(name="s1")
    s.add("expect_column_values_to_not_be_null", column="text", mostly=0.95)
    s.add("expect_column_values_to_be_in_set", column="lang", value_set=["en", "de"])
    s2 = ExpectationSuite.from_json(s.to_json())
    assert s2.name == "s1"
    assert len(s2.expectations) == 2
    assert s2.expectations[0].kwargs["mostly"] == 0.95
    assert s2.expectations[0].id == s.expectations[0].id


def test_config_id_stable_under_key_order():
    a = ExpectationConfiguration("t", {"x": 1, "y": 2})
    b = ExpectationConfiguration("t", {"y": 2, "x": 1})
    assert a.id == b.id


def test_result_format_parse():
    assert ResultFormat.parse(None).tier == "BASIC"
    assert ResultFormat.parse("COMPLETE").tier == "COMPLETE"
    rf = ResultFormat.parse({"result_format": "SUMMARY", "partial_unexpected_count": 5})
    assert rf.tier == "SUMMARY" and rf.partial_unexpected_count == 5
    assert rf.at_least("BASIC") and not rf.at_least("COMPLETE")
