"""Checkpoint actions: what happens to a suite result after validation.

Re-expresses the reference's action list (checkpoint/actions.py:
StoreValidationResultAction :828, StoreEvaluationParametersAction :978,
UpdateDataDocsAction :1072, SlackNotificationAction :168) against this
engine's SuiteValidationResult. Everything here is driver-side bookkeeping
— no Spark jobs — so a checkpoint can run actions after every chunk
without touching the cluster.

Network delivery (Slack/Teams/Email/SNS) is deliberately payload-only in
this sandbox: ``SlackNotificationAction.render_payload`` builds the exact
message dict and the caller owns the HTTP POST. Nothing here imports a
network client.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Protocol

from great_expectations_spark.core.result import SuiteValidationResult


class ValidationAction(Protocol):
    def run(self, result: SuiteValidationResult, run_id: str) -> dict[str, Any]:
        """Consume a suite result; return a small JSON-able receipt."""
        ...


@dataclass
class StoreValidationResultAction:
    """Append the full suite result JSON to a local store directory, keyed
    (suite_name, run_id) — the filesystem analogue of the reference's
    validations store (checkpoint/actions.py:828)."""

    store_dir: str

    def run(self, result: SuiteValidationResult, run_id: str) -> dict[str, Any]:
        os.makedirs(self.store_dir, exist_ok=True)
        path = os.path.join(self.store_dir, f"{result.suite_name}__{run_id}.json")
        with open(path, "w") as f:
            f.write(result.to_json())
        return {"action": "store_validation_result", "path": path}


@dataclass
class StoreEvaluationParametersAction:
    """Publish this result's metrics under their validations-URN names so a
    DOWNSTREAM suite can bind them as $PARAMETERs — the engine-native form
    of the reference's evaluation-parameter store chaining
    (checkpoint/actions.py:978 + data_context get_bind_params).

    ``params`` accumulates ``urn:great_expectations:validations:<suite>:
    <expectation_type>.result.observed_value[:column=<c>]`` → value; pass it
    as ``evaluation_parameters=`` to the next validate() call, or pass the
    collected ``results`` dict as ``validation_results=`` for lazy get_metric
    resolution.
    """

    params: dict[str, Any] = field(default_factory=dict)
    results: dict[str, SuiteValidationResult] = field(default_factory=dict)

    def run(self, result: SuiteValidationResult, run_id: str) -> dict[str, Any]:
        self.results[result.suite_name] = result
        published = 0
        base = f"urn:great_expectations:validations:{result.suite_name}"
        for evr in result.results:
            res = evr.result or {}
            if "observed_value" not in res:
                continue
            et = evr.expectation_config.expectation_type
            urn = f"{base}:{et}.result.observed_value"
            col = evr.expectation_config.kwargs.get("column")
            if col is not None:
                urn = f"{urn}:column={col}"
            self.params[urn] = res["observed_value"]
            published += 1
        return {"action": "store_evaluation_parameters", "published": published}


@dataclass
class UpdateDataDocsAction:
    """Render a static per-run HTML summary — the minimal data-docs sink
    (reference checkpoint/actions.py:1072 + render pipeline, without the
    site builder)."""

    docs_dir: str

    def run(self, result: SuiteValidationResult, run_id: str) -> dict[str, Any]:
        import html as _html

        os.makedirs(self.docs_dir, exist_ok=True)
        rows = []
        for evr in result.results:
            res = evr.result or {}
            status = "EXC" if evr.exception_info.get("raised_exception") else (
                "PASS" if evr.success else "FAIL")
            obs = res.get("observed_value", res.get("unexpected_count"))
            kw = _html.escape(json.dumps(evr.expectation_config.kwargs, default=str))
            rows.append(
                f"<tr class={status.lower()!r}><td>{status}</td>"
                f"<td>{_html.escape(evr.expectation_config.expectation_type)}</td>"
                f"<td><code>{kw}</code></td>"
                f"<td>{_html.escape(json.dumps(obs, default=str))}</td></tr>")
        stats = result.statistics
        html = (
            "<!doctype html><meta charset='utf-8'>"
            f"<title>{_html.escape(result.suite_name)} — {_html.escape(run_id)}</title>"
            "<style>body{font-family:sans-serif;margin:2em}"
            "table{border-collapse:collapse}td{border:1px solid #ccc;padding:4px 8px}"
            ".pass td:first-child{color:green}.fail td:first-child{color:red}"
            ".exc td:first-child{color:orange}</style>"
            f"<h1>{_html.escape(result.suite_name)}</h1>"
            f"<p>run_id={run_id} · success={result.success} · "
            f"{stats.get('successful_expectations')}/{stats.get('evaluated_expectations')} "
            f"passed ({stats.get('success_percent')}%)</p>"
            "<table><tr><th></th><th>expectation</th><th>kwargs</th>"
            "<th>observed</th></tr>" + "".join(rows) + "</table>")
        path = os.path.join(self.docs_dir, f"{result.suite_name}__{run_id}.html")
        with open(path, "w") as f:
            f.write(html)
        return {"action": "update_data_docs", "path": path}


@dataclass
class SlackNotificationAction:
    """Builds the Slack message payload (reference checkpoint/actions.py:168
    + slack renderer shape). ``notify_on``: all | success | failure.
    This sandbox never POSTs: the receipt carries the payload and the
    caller delivers it (or a webhook_url-owning wrapper does)."""

    notify_on: str = "all"

    def render_payload(self, result: SuiteValidationResult, run_id: str) -> dict[str, Any]:
        stats = result.statistics
        status = ":white_check_mark: Success" if result.success else ":x: Failed"
        text = (
            f"*Validation {status}*\n"
            f"Suite: {result.suite_name}\nRun: {run_id}\n"
            f"Expectations: {stats.get('successful_expectations')}/"
            f"{stats.get('evaluated_expectations')} passed")
        return {"blocks": [
            {"type": "section", "text": {"type": "mrkdwn", "text": text}}]}

    def run(self, result: SuiteValidationResult, run_id: str) -> dict[str, Any]:
        should = (
            self.notify_on == "all"
            or (self.notify_on == "success" and result.success)
            or (self.notify_on == "failure" and not result.success))
        receipt: dict[str, Any] = {"action": "slack_notification", "notified": should}
        if should:
            receipt["payload"] = self.render_payload(result, run_id)
        return receipt


def run_actions(
    result: SuiteValidationResult,
    actions: list[ValidationAction],
    run_id: str | None = None,
) -> list[dict[str, Any]]:
    """Run an action list over a suite result (reference
    ActionListValidationOperator, checkpoint/checkpoint.py:117-255): each
    action gets the result; failures are captured per-action, never abort
    the list."""
    rid = run_id or time.strftime("%Y%m%dT%H%M%S")
    receipts = []
    for action in actions:
        try:
            receipts.append(action.run(result, rid))
        except Exception as e:  # one failing sink must not lose the others
            receipts.append({"action": type(action).__name__, "error": str(e)})
    return receipts


def render_history_docs(
    results_df,
    docs_dir: str,
    z_threshold: float = 3.0,
    min_history: int = 3,
) -> str:
    """Static cross-run history page over a checkpoint results table.

    Renders ``history.run_summary`` (one row per run) and the
    ``metric_series``/``flag_drift`` output (one row per run x expectation,
    drifted runs highlighted) as a single HTML file — the run-history
    counterpart of ``UpdateDataDocsAction``'s per-run page. The reference
    data-docs site rebuilds one page per stored validation JSON; it has no
    cross-run metric view at all. Driver transfer is bounded by
    runs x expectations.
    """
    import html as _html

    from great_expectations_spark.history import (
        flag_drift,
        metric_series,
        run_summary,
    )

    os.makedirs(docs_dir, exist_ok=True)
    summary = run_summary(results_df).collect()
    drift = (
        flag_drift(metric_series(results_df), z_threshold=z_threshold,
                   min_history=min_history)
        .orderBy("expectation_index", "run_ts", "run_id")
        .collect()
    )

    srows = [
        f"<tr class={'pass' if r.success else 'fail'!r}>"
        f"<td>{_html.escape(str(r.run_id))}</td><td>{r.n_chunks}</td>"
        f"<td>{r.n_evaluations}</td><td>{'PASS' if r.success else 'FAIL'}</td>"
        f"<td>{r.rows_scanned}</td><td>{round(r.wall_time_s or 0, 2)}</td></tr>"
        for r in summary
    ]
    mrows = []
    for r in drift:
        cls = "drift" if r.drifted else ("pass" if r.success else "fail")
        z = "" if r.zscore is None else f"{r.zscore:+.2f}"
        v = "" if r.value is None else f"{r.value:.6g}"
        mrows.append(
            f"<tr class={cls!r}><td>{r.expectation_index}</td>"
            f"<td>{_html.escape(r.expectation_type)}</td>"
            f"<td>{_html.escape(str(r.metric_name))}</td>"
            f"<td>{_html.escape(str(r.run_id))}</td><td>{v}</td><td>{z}</td>"
            f"<td>{'DRIFT' if r.drifted else ('PASS' if r.success else 'FAIL')}"
            "</td></tr>")
    html = (
        "<!doctype html><meta charset='utf-8'><title>validation history</title>"
        "<style>body{font-family:sans-serif;margin:2em}"
        "table{border-collapse:collapse;margin-bottom:2em}"
        "td,th{border:1px solid #ccc;padding:4px 8px}"
        ".fail td:last-child{color:red}.drift td:last-child{color:#c60;font-weight:bold}"
        "</style><h1>Run history</h1>"
        "<table><tr><th>run</th><th>chunks</th><th>evals</th><th>success</th>"
        "<th>rows</th><th>wall s</th></tr>" + "".join(srows) + "</table>"
        "<h2>Metric series (trailing-window drift)</h2>"
        "<table><tr><th>#</th><th>expectation</th><th>metric</th><th>run</th>"
        "<th>value</th><th>z</th><th></th></tr>" + "".join(mrows) + "</table>")
    path = os.path.join(docs_dir, "history.html")
    with open(path, "w") as f:
        f.write(html)
    return path
