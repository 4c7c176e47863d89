"""Checkpoint actions (reference checkpoint/actions.py:168-1185 surface):
result store, evaluation-parameter publication (URN chaining), data docs,
notification payloads."""

from __future__ import annotations

import json
import os

from great_expectations_spark import ExpectationSuite, validate
from great_expectations_spark.actions import (
    SlackNotificationAction,
    StoreEvaluationParametersAction,
    StoreValidationResultAction,
    UpdateDataDocsAction,
    run_actions,
)


def _result(spark, n=10, suite_name="s"):
    df = spark.range(n).toDF("id")
    suite = ExpectationSuite(suite_name).add(
        "expect_table_row_count_to_be_between", min_value=1, max_value=10**6)
    return validate(df, suite)


def test_store_validation_result(spark, tmp_path):
    res = _result(spark)
    receipts = run_actions(res, [StoreValidationResultAction(str(tmp_path))], run_id="r1")
    path = receipts[0]["path"]
    assert os.path.exists(path)
    loaded = json.load(open(path))
    assert loaded["success"] is True
    assert loaded["results"][0]["result"]["observed_value"] == 10


def test_store_evaluation_parameters_chains_downstream(spark):
    upstream = _result(spark, n=42, suite_name="upstream")
    action = StoreEvaluationParametersAction()
    run_actions(upstream, [action], run_id="r1")
    urn = ("urn:great_expectations:validations:upstream:"
           "expect_table_row_count_to_be_between.result.observed_value")
    assert action.params[urn] == 42

    # bind into a downstream suite two ways: flat params and lazy results
    df = spark.range(42).toDF("id")
    down = ExpectationSuite("down").add(
        "expect_table_row_count_to_equal", value={"$PARAMETER": urn})
    assert validate(df, down, evaluation_parameters=action.params).success
    assert validate(df, down, validation_results=action.results).success


def test_update_data_docs(spark, tmp_path):
    res = _result(spark)
    receipts = run_actions(res, [UpdateDataDocsAction(str(tmp_path))], run_id="r1")
    html = open(receipts[0]["path"]).read()
    assert "expect_table_row_count_to_be_between" in html
    assert "PASS" in html


def test_slack_payload_and_notify_on(spark):
    ok = _result(spark)
    a_all = SlackNotificationAction(notify_on="all")
    r = a_all.run(ok, "r1")
    assert r["notified"] and "Success" in json.dumps(r["payload"])

    a_fail_only = SlackNotificationAction(notify_on="failure")
    assert a_fail_only.run(ok, "r1")["notified"] is False


def test_failing_action_does_not_abort_list(spark, tmp_path):
    res = _result(spark)
    receipts = run_actions(
        res,
        [StoreValidationResultAction("/proc/definitely/not/writable"),
         UpdateDataDocsAction(str(tmp_path))],
        run_id="r1")
    assert "error" in receipts[0]
    assert os.path.exists(receipts[1]["path"])
