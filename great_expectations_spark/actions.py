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
    """Persist the full suite result keyed (suite_name, run_id) — the
    reference's validations-store action (checkpoint/actions.py:828).

    Two modes: ``store_dir`` (legacy flat ``<suite>__<run>.json`` files)
    or ``store=`` a ``stores.ValidationResultStore``, which routes through
    any pluggable backend (in-memory / tuple-filesystem / SQLite)."""

    store_dir: str | None = None
    store: Any = None  # stores.ValidationResultStore

    def run(self, result: SuiteValidationResult, run_id: str) -> dict[str, Any]:
        if self.store is not None:
            self.store.set((result.suite_name, run_id), result)
            return {"action": "store_validation_result",
                    "store": type(self.store.backend).__name__,
                    "key": [result.suite_name, run_id]}
        if self.store_dir is None:
            raise ValueError("StoreValidationResultAction needs store_dir or store")
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
        path = render_validation_docs(result, self.docs_dir, run_id)
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


_DOCS_CSS = (
    "body{font-family:sans-serif;margin:2em;max-width:70em}"
    "table{border-collapse:collapse;margin:.5em 0}"
    "td,th{border:1px solid #ccc;padding:4px 8px;text-align:left}"
    "th{background:#f5f5f5}"
    ".pass{color:green}.fail{color:red}.exc{color:orange}"
    "section{border:1px solid #ddd;border-radius:6px;padding:.5em 1em;"
    "margin:1em 0}code{background:#f5f5f5;padding:1px 4px}"
    ".badge{font-weight:bold;margin-right:.5em}"
)


def _fmt(v: Any) -> str:
    import html as _html

    return _html.escape(json.dumps(v, default=str))


def _j(v: Any) -> str:
    return json.dumps(v, default=str)


def _set_words(values: Any, cap: int = 10) -> str:
    vals = list(values) if values is not None else []
    shown = ", ".join(_j(v) for v in vals[:cap])
    return shown + (f", … ({len(vals)} values)" if len(vals) > cap else "")


def _between_words(k: dict, lo: str = "min_value", hi: str = "max_value") -> str:
    mn, mx = k.get(lo), k.get(hi)
    ge = "greater than" if k.get("strict_min") else "greater than or equal to"
    le = "less than" if k.get("strict_max") else "less than or equal to"
    if mn is not None and mx is not None:
        return f"{ge} {_j(mn)} and {le} {_j(mx)}"
    if mn is not None:
        return f"{ge} {_j(mn)}"
    if mx is not None:
        return f"{le} {_j(mx)}"
    return "any value"


# core verb phrase per expectation type; {col}/{colA}/{colB}/{cols} are
# filled by expectation_prose. Everything not listed falls back to a
# humanized type name, so new expectations degrade gracefully.
_PROSE: dict[str, Any] = {
    "expect_column_values_to_not_be_null": lambda k: "{col} values must never be null",
    "expect_column_values_to_be_null": lambda k: "{col} values must always be null",
    "expect_column_values_to_be_unique": lambda k: "{col} values must be unique",
    "expect_column_values_to_be_between":
        lambda k: "{col} values must be " + _between_words(k),
    "expect_column_values_to_be_in_set":
        lambda k: "{col} values must belong to the set [" + _set_words(k.get("value_set")) + "]",
    "expect_column_values_to_not_be_in_set":
        lambda k: "{col} values must not belong to the set [" + _set_words(k.get("value_set")) + "]",
    "expect_column_values_to_match_regex":
        lambda k: "{col} values must match the regular expression " + _j(k.get("regex")),
    "expect_column_values_to_not_match_regex":
        lambda k: "{col} values must not match the regular expression " + _j(k.get("regex")),
    "expect_column_values_to_match_regex_list":
        lambda k: "{col} values must match "
        + ("all" if str(k.get("match_on", "any")) == "all" else "any")
        + " of the regular expressions [" + _set_words(k.get("regex_list")) + "]",
    "expect_column_values_to_not_match_regex_list":
        lambda k: "{col} values must not match any of the regular expressions ["
        + _set_words(k.get("regex_list")) + "]",
    "expect_column_values_to_match_like_pattern":
        lambda k: "{col} values must match the LIKE pattern " + _j(k.get("like_pattern")),
    "expect_column_values_to_not_match_like_pattern":
        lambda k: "{col} values must not match the LIKE pattern " + _j(k.get("like_pattern")),
    "expect_column_values_to_match_like_pattern_list":
        lambda k: "{col} values must match "
        + ("all" if str(k.get("match_on", "any")) == "all" else "any")
        + " of the LIKE patterns [" + _set_words(k.get("like_pattern_list")) + "]",
    "expect_column_values_to_not_match_like_pattern_list":
        lambda k: "{col} values must not match any of the LIKE patterns ["
        + _set_words(k.get("like_pattern_list")) + "]",
    "expect_column_value_lengths_to_be_between":
        lambda k: "{col} value lengths must be " + _between_words(k),
    "expect_column_value_lengths_to_equal":
        lambda k: "{col} value lengths must equal " + _j(k.get("value")),
    "expect_column_values_to_match_strftime_format":
        lambda k: "{col} values must match the strftime format " + _j(k.get("strftime_format")),
    "expect_column_values_to_be_dateutil_parseable":
        lambda k: "{col} values must be parseable as dates",
    "expect_column_values_to_be_json_parseable":
        lambda k: "{col} values must be parseable as JSON",
    "expect_column_values_to_match_json_schema":
        lambda k: "{col} values must conform to the given JSON schema",
    "expect_column_values_to_be_of_type":
        lambda k: "{col} values must be of type " + _j(k.get("type_")),
    "expect_column_values_to_be_in_type_list":
        lambda k: "{col} values must be of one of the types [" + _set_words(k.get("type_list")) + "]",
    "expect_column_values_to_be_increasing":
        lambda k: "{col} values must be " + ("strictly " if k.get("strictly") else "") + "increasing",
    "expect_column_values_to_be_decreasing":
        lambda k: "{col} values must be " + ("strictly " if k.get("strictly") else "") + "decreasing",
    "expect_column_value_z_scores_to_be_less_than":
        lambda k: "{col} value z-scores must be less than " + _j(k.get("threshold"))
        + (" in absolute value" if k.get("double_sided") else ""),
    # aggregates -----------------------------------------------------------
    "expect_column_mean_to_be_between":
        lambda k: "{col} mean must be " + _between_words(k),
    "expect_column_median_to_be_between":
        lambda k: "{col} median must be " + _between_words(k),
    "expect_column_min_to_be_between":
        lambda k: "{col} minimum must be " + _between_words(k),
    "expect_column_max_to_be_between":
        lambda k: "{col} maximum must be " + _between_words(k),
    "expect_column_sum_to_be_between":
        lambda k: "{col} sum must be " + _between_words(k),
    "expect_column_stdev_to_be_between":
        lambda k: "{col} standard deviation must be " + _between_words(k),
    "expect_column_quantile_values_to_be_between":
        lambda k: "{col} quantiles "
        + _set_words((k.get("quantile_ranges") or {}).get("quantiles", []))
        + " must fall within their value ranges",
    "expect_column_unique_value_count_to_be_between":
        lambda k: "{col} distinct-value count must be " + _between_words(k),
    "expect_column_proportion_of_unique_values_to_be_between":
        lambda k: "{col} proportion of unique values must be " + _between_words(k),
    "expect_column_distinct_values_to_be_in_set":
        lambda k: "{col} distinct values must belong to the set ["
        + _set_words(k.get("value_set")) + "]",
    "expect_column_distinct_values_to_contain_set":
        lambda k: "{col} distinct values must contain the set ["
        + _set_words(k.get("value_set")) + "]",
    "expect_column_distinct_values_to_equal_set":
        lambda k: "{col} distinct values must equal the set ["
        + _set_words(k.get("value_set")) + "]",
    "expect_column_most_common_value_to_be_in_set":
        lambda k: "{col} most common value must belong to the set ["
        + _set_words(k.get("value_set")) + "]",
    "expect_column_kl_divergence_to_be_less_than":
        lambda k: "{col} Kullback-Leibler divergence from the expected "
        "distribution must be less than " + _j(k.get("threshold")),
    # table ----------------------------------------------------------------
    "expect_table_row_count_to_be_between":
        lambda k: "table row count must be " + _between_words(k),
    "expect_table_row_count_to_equal":
        lambda k: "table row count must equal " + _j(k.get("value")),
    "expect_table_row_count_to_equal_other_table":
        lambda k: "table row count must equal that of table " + _j(k.get("other_table_name")),
    "expect_table_column_count_to_be_between":
        lambda k: "table column count must be " + _between_words(k),
    "expect_table_column_count_to_equal":
        lambda k: "table column count must equal " + _j(k.get("value")),
    "expect_table_columns_to_match_set":
        lambda k: "table columns must match the set [" + _set_words(k.get("column_set")) + "]",
    "expect_table_columns_to_match_ordered_list":
        lambda k: "table columns must match the ordered list ["
        + _set_words(k.get("column_list")) + "]",
    "expect_column_to_exist": lambda k: "column {col} must exist",
    # pairs / multicolumn --------------------------------------------------
    "expect_column_pair_values_a_to_be_greater_than_b":
        lambda k: "{colA} values must be greater than "
        + ("or equal to " if k.get("or_equal") else "") + "{colB} values",
    "expect_column_pair_values_to_be_equal":
        lambda k: "{colA} values must equal {colB} values",
    "expect_column_pair_values_to_be_in_set":
        lambda k: "({colA}, {colB}) value pairs must belong to the given set",
    "expect_compound_columns_to_be_unique":
        lambda k: "the column combination ({cols}) must be unique",
    "expect_multicolumn_sum_to_equal":
        lambda k: "the sum across ({cols}) must equal " + _j(k.get("sum_total")),
    "expect_select_column_values_to_be_unique_within_record":
        lambda k: "values across ({cols}) must be distinct within each row",
    "expect_column_values_to_not_be_in_other_table":
        lambda k: "{col} values must not appear in the other table",
}


def expectation_prose(config: Any) -> str:
    """One-sentence English description of an expectation configuration —
    the engine-sized subset of the reference's per-expectation content
    blocks (render/renderer/content_block/expectation_string.py
    ExpectationStringRenderer + the per-type _prescriptive_renderer
    templates): the rendered page names the expectation's column(s) and
    bounds instead of showing raw kwargs JSON. ``mostly`` and
    ``row_condition`` append as qualifier clauses, mirroring the
    reference's "at least X % of the time" suffix. Unknown types fall
    back to the humanized type name plus the column, so plugin
    expectations degrade gracefully instead of rendering nothing."""
    k = config.kwargs
    t = config.expectation_type
    build = _PROSE.get(t)
    if build is not None:
        core = build(k)
    else:
        words = t.removeprefix("expect_").replace("_", " ")
        core = ("{col} " + words) if "column" in k else words
    core = core.replace("{col}", str(k.get("column", "?")))
    core = core.replace("{colA}", str(k.get("column_A", "?")))
    core = core.replace("{colB}", str(k.get("column_B", "?")))
    core = core.replace("{cols}", ", ".join(str(c) for c in k.get("column_list", [])))
    quals = []
    mostly = k.get("mostly")
    if mostly is not None and mostly != 1:
        quals.append(f"at least {round(float(mostly) * 100, 2):g}% of the time")
    if k.get("row_condition"):
        quals.append(f"for rows where {k['row_condition']}")
    if k.get("ignore_row_if") and k["ignore_row_if"] != "neither":
        quals.append(f"ignoring rows if {str(k['ignore_row_if']).replace('_', ' ')}")
    return core + ("" if not quals else ", " + ", ".join(quals)) + "."


def render_validation_docs(
    result: SuiteValidationResult,
    docs_dir: str,
    run_id: str,
    partial_list_limit: int = 20,
) -> str:
    """Render ONE suite validation result to a static HTML page — the
    engine-sized subset of the reference's
    render/renderer/page_renderer.py ValidationResultsPageRenderer (10k-LoC
    Jinja pipeline): an overview panel (statistics + batch meta), then one
    section per expectation with its kwargs, the count summary
    (element/missing/unexpected/percent), the observed value, the
    partial_unexpected_counts value table, a violation-sample list, and
    the exception traceback when raised. Pure driver-side string
    rendering — no Spark jobs, no template engine.

    Deterministic for a given (result, run_id): a golden-file test pins
    the layout (tests/test_actions.py)."""
    import html as _html

    os.makedirs(docs_dir, exist_ok=True)
    stats = result.statistics
    sections: list[str] = []
    for i, evr in enumerate(result.results):
        res = evr.result or {}
        cfg = evr.expectation_config
        exc = evr.exception_info or {}
        status = "EXC" if exc.get("raised_exception") else (
            "PASS" if evr.success else "FAIL")
        kw_rows = "".join(
            f"<tr><td>{_html.escape(str(k))}</td><td><code>{_fmt(v)}</code></td></tr>"
            for k, v in sorted(cfg.kwargs.items(), key=lambda kv: str(kv[0]))
        )
        body = [
            f"<h2><span class='badge {status.lower()}'>{status}</span>"
            f"{i + 1}. {_html.escape(cfg.expectation_type)}</h2>",
            f"<p class='prose'>{_html.escape(expectation_prose(cfg))}</p>",
            f"<table>{kw_rows}</table>" if kw_rows else "",
        ]
        count_keys = [
            ("element_count", "elements"), ("missing_count", "missing"),
            ("unexpected_count", "unexpected"),
            ("unexpected_percent", "unexpected %"),
        ]
        counts = [(lbl, res[k]) for k, lbl in count_keys if k in res]
        if counts:
            body.append(
                "<table><tr>" + "".join(f"<th>{lbl}</th>" for lbl, _ in counts)
                + "</tr><tr>" + "".join(
                    f"<td>{_fmt(round(v, 5) if isinstance(v, float) else v)}</td>"
                    for _, v in counts)
                + "</tr></table>")
        if "observed_value" in res:
            body.append(
                f"<p>observed value: <code>{_fmt(res['observed_value'])}</code></p>")
        puc = res.get("partial_unexpected_counts")
        if puc:
            body.append(
                "<h3>most common unexpected values</h3>"
                "<table><tr><th>value</th><th>count</th></tr>" + "".join(
                    f"<tr><td><code>{_fmt(d.get('value'))}</code></td>"
                    f"<td>{_fmt(d.get('count'))}</td></tr>" for d in puc)
                + "</table>")
        pul = res.get("partial_unexpected_list")
        if pul and not puc:
            shown = pul[:partial_list_limit]
            body.append(
                "<h3>sample unexpected values</h3><table>" + "".join(
                    f"<tr><td><code>{_fmt(v)}</code></td></tr>" for v in shown)
                + "</table>"
                + (f"<p>… first {len(shown)} shown</p>"
                   if len(pul) > len(shown) else ""))
        rows = res.get("unexpected_rows")
        if rows:
            cols = list(rows[0].keys())
            body.append(
                "<h3>sample violating rows</h3>"
                "<table><tr>" + "".join(
                    f"<th>{_html.escape(str(c))}</th>" for c in cols)
                + "</tr>" + "".join(
                    "<tr>" + "".join(
                        f"<td><code>{_fmt(r.get(c))}</code></td>" for c in cols)
                    + "</tr>" for r in rows[:partial_list_limit])
                + "</table>")
        if exc.get("raised_exception"):
            body.append(
                f"<h3>exception</h3><p><code>{_html.escape(str(exc.get('exception_message')))}"
                "</code></p>"
                + (f"<pre>{_html.escape(str(exc.get('exception_traceback')))}</pre>"
                   if exc.get("exception_traceback") else ""))
        sections.append("<section>" + "".join(b for b in body if b) + "</section>")

    html = (
        "<!doctype html><meta charset='utf-8'>"
        f"<title>{_html.escape(result.suite_name)} — {_html.escape(run_id)}</title>"
        f"<style>{_DOCS_CSS}</style>"
        f"<h1>{_html.escape(result.suite_name)}</h1>"
        f"<p>run_id=<code>{_html.escape(run_id)}</code> · "
        f"<span class={'pass' if result.success else 'fail'!r}>"
        f"{'Succeeded' if result.success else 'Failed'}</span> · "
        f"{stats.get('successful_expectations')}/{stats.get('evaluated_expectations')} "
        f"expectations passed ({stats.get('success_percent')}%)</p>"
        + "".join(sections))
    path = os.path.join(docs_dir, f"{result.suite_name}__{run_id}.html")
    with open(path, "w") as f:
        f.write(html)
    return path


def build_docs_site(store: Any, docs_dir: str, suite_store: Any = None) -> str:
    """Build a static data-docs SITE from every result in a
    ``stores.ValidationResultStore``: one page per (suite, run) via
    ``render_validation_docs`` plus an ``index.html`` grouped by suite with
    per-run status links — the engine-sized subset of the reference's
    SiteBuilder + DefaultSiteIndexBuilder
    (render/renderer/site_builder.py:37,291,511,725) over an
    HtmlSiteStore (data_context/store/html_site_store.py:35).

    ``suite_store`` (a ``stores.ExpectationSuiteStore``) additionally
    renders one suite-DEFINITION page per stored suite
    (``render_suite_docs``) and links it from the index section header —
    the reference site's Expectation-Suites tab.

    Pure driver-side rendering. Returns the index path. Deterministic for
    given store contents (keys render in sorted order)."""
    import html as _html

    os.makedirs(docs_dir, exist_ok=True)
    by_suite: dict[str, list[tuple[str, Any]]] = {}
    for suite_name, run_id in store.list_keys():
        by_suite.setdefault(suite_name, []).append(
            (run_id, store.get((suite_name, run_id))))

    suite_pages: dict[str, str] = {}
    if suite_store is not None:
        for (name,) in suite_store.list_keys():
            suite_pages[name] = render_suite_docs(
                suite_store.get((name,)), docs_dir)

    suite_sections: list[str] = []
    for suite_name in sorted(set(by_suite) | set(suite_pages)):
        rows = []
        for run_id, result in by_suite.get(suite_name, []):
            page = render_validation_docs(result, docs_dir, run_id)
            stats = result.statistics
            status = ("<span class='pass'>Succeeded</span>" if result.success
                      else "<span class='fail'>Failed</span>")
            rows.append(
                f"<tr><td><a href='{_html.escape(os.path.basename(page))}'>"
                f"{_html.escape(run_id)}</a></td><td>{status}</td>"
                f"<td>{stats.get('successful_expectations')}/"
                f"{stats.get('evaluated_expectations')}</td></tr>")
        head = _html.escape(suite_name)
        if suite_name in suite_pages:
            head += (" <a href='"
                     f"{_html.escape(os.path.basename(suite_pages[suite_name]))}"
                     "'>[definition]</a>")
        suite_sections.append(
            f"<section><h2>{head}</h2>"
            "<table><tr><th>run</th><th>status</th><th>passed</th></tr>"
            + "".join(rows) + "</table></section>")

    index = (
        "<!doctype html><meta charset='utf-8'><title>Data Docs</title>"
        f"<style>{_DOCS_CSS}</style><h1>Validation results</h1>"
        + "".join(suite_sections))
    path = os.path.join(docs_dir, "index.html")
    with open(path, "w") as f:
        f.write(index)
    return path


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


def render_profile_docs(profile_df, docs_dir: str, table_name: str,
                        details: dict | None = None) -> str:
    """Render a ``profiler.profile()`` result to a static HTML page — the
    engine-sized subset of the reference's ProfilingResultsPageRenderer +
    ProfilingResultsOverviewSectionRenderer
    (render/renderer/page_renderer.py:895,
    profiling_results_overview_section_renderer.py:16): a dataset-info
    panel (row count, column count), the variable-kinds summary the
    overview section renders, and one stats row per column (type,
    null fraction, approx-distinct + cardinality band, numeric
    min/max/mean/stddev, datetime range, string/binary length stats).

    ``details`` (from ``profiler.profile_details``) additionally renders
    one SECTION per column — properties, common-value bars, histogram
    bars — the reference's ProfilingResultsColumnSectionRenderer
    (render/renderer/column_section_renderer.py:33) re-expressed.

    ``profile_df`` is the one-row-per-COLUMN frame ``profiler.profile``
    returns (collected here — driver transfer bounded by schema width) or
    an already-collected list of Rows/dicts. Pure driver-side rendering;
    deterministic for a given profile (golden-file test)."""
    import html as _html

    os.makedirs(docs_dir, exist_ok=True)
    rows = (profile_df if isinstance(profile_df, list)
            else profile_df.collect())
    rows = [r if isinstance(r, dict) else r.asDict() for r in rows]

    def num(v, nd=4):
        if v is None:
            return ""
        f = float(v)
        return str(int(f)) if f == int(f) else f"{round(f, nd)}"

    n_rows = rows[0]["n_rows"] if rows else 0
    kinds: dict[str, int] = {}
    for r in rows:
        kinds[r["kind"]] = kinds.get(r["kind"], 0) + 1
    kind_cells = "".join(
        f"<tr><td>{_html.escape(k)}</td><td>{kinds[k]}</td></tr>"
        for k in sorted(kinds))

    body: list[str] = []
    for r in rows:
        if r["kind"] == "numeric":
            rng = f"{num(r['min'])} … {num(r['max'])}"
            extra = f"mean {num(r['mean'])} · sd {num(r['stddev'])}"
        elif r["kind"] == "datetime":
            rng = (f"{_html.escape(r['min_ts'] or '')} … "
                   f"{_html.escape(r['max_ts'] or '')}")
            extra = ""
        elif r["kind"] in ("string", "binary"):
            rng = f"len {num(r['min_len'])} … {num(r['max_len'])}"
            extra = f"avg len {num(r['avg_len'], 1)}"
        else:
            rng, extra = "", ""
        card = ("" if r["approx_distinct"] is None else
                f"{r['approx_distinct']} ({_html.escape(r['cardinality_band'] or '')})")
        body.append(
            "<tr>"
            f"<td><code>{_html.escape(r['column'])}</code></td>"
            f"<td>{_html.escape(r['dtype'])}</td>"
            f"<td>{_html.escape(r['kind'])}</td>"
            f"<td>{num(r['null_fraction'])}</td>"
            f"<td>{card}</td>"
            f"<td>{rng}</td>"
            f"<td>{extra}</td>"
            "</tr>")

    # per-column sections (column_section_renderer.py:33) — properties
    # from the overview row, plus common-value / histogram bars when the
    # caller supplies profile_details()
    col_sections: list[str] = []
    if details is not None:
        def bar(count: int, biggest: int, label: str) -> str:
            pct = max(2, round(100 * count / biggest)) if biggest else 0
            return (f"<tr><td>{label}</td><td>{count}</td>"
                    f"<td><div style='background:#69c;height:0.8em;"
                    f"width:{pct}%'></div></td></tr>")

        for r in rows:
            c = r["column"]
            props = [("type", r["dtype"]), ("kind", r["kind"]),
                     ("null fraction", num(r["null_fraction"]))]
            if r["approx_distinct"] is not None:
                props.append(("≈distinct",
                              f"{r['approx_distinct']} "
                              f"({r['cardinality_band'] or ''})"))
            if r["kind"] == "numeric":
                props += [("min", num(r["min"])), ("max", num(r["max"])),
                          ("mean", num(r["mean"])),
                          ("stddev", num(r["stddev"]))]
            elif r["kind"] == "datetime":
                props += [("min", r["min_ts"] or ""),
                          ("max", r["max_ts"] or "")]
            elif r["kind"] in ("string", "binary"):
                props += [("min length", num(r["min_len"])),
                          ("max length", num(r["max_len"])),
                          ("avg length", num(r["avg_len"], 1))]
            prop_rows = "".join(
                f"<tr><td>{_html.escape(str(k))}</td>"
                f"<td>{_html.escape(str(v))}</td></tr>" for k, v in props)
            parts = [f"<section><h3><code>{_html.escape(c)}</code></h3>"
                     f"<table>{prop_rows}</table>"]
            d = details.get(c) or {}
            tv = d.get("top_values")
            if tv:
                biggest = max(n for _v, n in tv)
                parts.append(
                    "<h4>common values</h4><table>"
                    + "".join(bar(n, biggest,
                                  _html.escape(str(v))) for v, n in tv)
                    + "</table>")
            hist = d.get("histogram")
            if hist:
                biggest = max(hist["counts"]) if hist["counts"] else 0
                labels = [
                    f"[{num(hist['edges'][i], 3)}, {num(hist['edges'][i + 1], 3)}"
                    + ("]" if i == len(hist["counts"]) - 1 else ")")
                    for i in range(len(hist["counts"]))]
                parts.append(
                    "<h4>histogram</h4><table>"
                    + "".join(bar(n, biggest, _html.escape(lbl))
                              for lbl, n in zip(labels, hist["counts"]))
                    + "</table>")
            parts.append("</section>")
            col_sections.append("".join(parts))

    html = (
        "<!doctype html><meta charset='utf-8'>"
        f"<title>Profile — {_html.escape(table_name)}</title>"
        f"<style>{_DOCS_CSS}</style>"
        f"<h1>Profile: {_html.escape(table_name)}</h1>"
        f"<section><h3>dataset</h3><p>{n_rows} rows · {len(rows)} columns "
        "profiled</p>"
        f"<table><tr><th>kind</th><th>columns</th></tr>{kind_cells}</table>"
        "</section>"
        "<section><h3>columns</h3>"
        "<table><tr><th>column</th><th>type</th><th>kind</th>"
        "<th>null frac</th><th>≈distinct (band)</th><th>range</th>"
        "<th></th></tr>" + "".join(body) + "</table></section>"
        + "".join(col_sections))
    path = os.path.join(docs_dir, f"profile__{table_name}.html")
    with open(path, "w") as f:
        f.write(html)
    return path


def render_suite_docs(suite, docs_dir: str) -> str:
    """Render an ExpectationSuite DEFINITION (not a result) to a static
    HTML page — the engine-sized subset of the reference's
    ExpectationSuitePageRenderer (render/renderer/page_renderer.py:647):
    a header panel (suite name, expectation count, evaluation parameters)
    and one row per expectation with its type and kwargs, grouped by
    column (table-level expectations first), matching the reference's
    column-section organization. Pure driver-side rendering;
    deterministic for a given suite."""
    import html as _html

    os.makedirs(docs_dir, exist_ok=True)
    groups: dict[str, list] = {}
    for cfg in suite.expectations:
        col = cfg.kwargs.get("column") or cfg.kwargs.get("column_A") or (
            ", ".join(cfg.kwargs.get("column_list", [])) or "(table)")
        groups.setdefault(str(col), []).append(cfg)
    ordered = sorted(groups, key=lambda c: (c != "(table)", c))

    sections: list[str] = []
    for col in ordered:
        rows = "".join(
            "<tr>"
            f"<td><code>{_html.escape(cfg.expectation_type)}</code></td>"
            f"<td>{_fmt({k: v for k, v in sorted(cfg.kwargs.items())})}</td>"
            "</tr>"
            for cfg in groups[col])
        sections.append(
            f"<section><h3>{_html.escape(col)}</h3>"
            "<table><tr><th>expectation</th><th>kwargs</th></tr>"
            + rows + "</table></section>")

    ep = suite.evaluation_parameters or {}
    ep_html = (f"<p>evaluation parameters: {_fmt(ep)}</p>" if ep else "")
    html = (
        "<!doctype html><meta charset='utf-8'>"
        f"<title>Suite — {_html.escape(suite.name)}</title>"
        f"<style>{_DOCS_CSS}</style>"
        f"<h1>Suite: {_html.escape(suite.name)}</h1>"
        f"<p>{len(suite.expectations)} expectations</p>" + ep_html
        + "".join(sections))
    path = os.path.join(docs_dir, f"suite__{suite.name}.html")
    with open(path, "w") as f:
        f.write(html)
    return path
