"""Validation result schema.

Field set mirrors the reference
(great_expectations/core/expectation_validation_result.py:66,436 and the
result-tier formatter expectations/expectation.py:3411-3555): each
expectation yields ``{success, expectation_config, result{...},
exception_info, meta}``; the suite result adds
``statistics.{evaluated_expectations, successful_expectations,
unsuccessful_expectations, success_percent}``.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from great_expectations_spark.core.suite import ExpectationConfiguration

_NO_EXCEPTION = {
    "raised_exception": False,
    "exception_message": None,
    "exception_traceback": None,
}


@dataclass
class ExpectationValidationResult:
    success: bool
    expectation_config: ExpectationConfiguration
    result: dict[str, Any] = field(default_factory=dict)
    exception_info: dict[str, Any] = field(default_factory=lambda: dict(_NO_EXCEPTION))
    meta: dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        return {
            "success": bool(self.success),
            "expectation_config": self.expectation_config.to_dict(),
            "result": self.result,
            "exception_info": self.exception_info,
            "meta": self.meta,
        }

    def get_metric(self, metric_name: str, **kwargs: Any) -> Any:
        """Expose expectation-defined metrics for URN chaining — mirrors the
        reference's EVR.get_metric (core/expectation_validation_result.py:
        332-377): ``<expectation_type>.success`` or
        ``<expectation_type>.result.<field>``; kwargs (e.g. column=...) must
        match this EVR's configuration."""
        parts = metric_name.split(".")
        if parts[0] != self.expectation_config.expectation_type:
            raise KeyError(f"metric {metric_name} does not match this result")
        for k, v in kwargs.items():
            if str(self.expectation_config.kwargs.get(k)) != str(v):
                raise KeyError(
                    f"metric kwargs {kwargs} do not match this result's configuration")
        if len(parts) == 2 and parts[1] == "success":
            return self.success
        if len(parts) >= 3 and parts[1] == "result":
            if len(parts) == 3:
                return self.result.get(parts[2])
            if parts[2] == "details":
                return self.result["details"].get(parts[3])
        raise KeyError(f"unrecognized metric name {metric_name}")

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ExpectationValidationResult":
        """Inverse of ``to_dict`` — mirrors the reference constructor's
        kwargs (core/expectation_validation_result.py:66) so a stored EVR
        round-trips through any store backend."""
        return cls(
            success=bool(d["success"]),
            expectation_config=ExpectationConfiguration.from_dict(
                d["expectation_config"]),
            result=dict(d.get("result") or {}),
            exception_info=dict(d.get("exception_info") or _NO_EXCEPTION),
            meta=dict(d.get("meta") or {}),
        )

    @classmethod
    def exception(
        cls, config: ExpectationConfiguration, message: str, traceback: str | None = None
    ) -> "ExpectationValidationResult":
        return cls(
            success=False,
            expectation_config=config,
            result={},
            exception_info={
                "raised_exception": True,
                "exception_message": message,
                "exception_traceback": traceback,
            },
        )


@dataclass
class SuiteValidationResult:
    success: bool
    results: list[ExpectationValidationResult]
    suite_name: str = "default"
    statistics: dict[str, Any] = field(default_factory=dict)
    meta: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_results(
        cls,
        results: list[ExpectationValidationResult],
        suite_name: str = "default",
        meta: dict[str, Any] | None = None,
    ) -> "SuiteValidationResult":
        evaluated = len(results)
        successful = sum(1 for r in results if r.success)
        stats = {
            "evaluated_expectations": evaluated,
            "successful_expectations": successful,
            "unsuccessful_expectations": evaluated - successful,
            "success_percent": (100.0 * successful / evaluated) if evaluated else None,
        }
        return cls(
            success=(successful == evaluated),
            results=results,
            suite_name=suite_name,
            statistics=stats,
            meta=meta or {},
        )

    def get_metric(self, metric_name: str, **kwargs: Any) -> Any:
        """Suite-level metric lookup for cross-suite URN chaining — mirrors
        ExpectationSuiteValidationResult.get_metric (reference
        core/expectation_validation_result.py:560-598): ``statistics.<name>``
        or the first matching expectation's EVR metric."""
        parts = metric_name.split(".")
        if parts[0] == "statistics" and len(parts) == 2:
            return self.statistics.get(parts[1])
        if parts[0].startswith("expect_"):
            matches = []
            for r in self.results:
                try:
                    matches.append(r.get_metric(metric_name, **kwargs))
                except KeyError:
                    continue
            if len(matches) > 1:
                # with no disambiguating kwargs, several EVRs of this type
                # match — returning the first would feed an ARBITRARY
                # column's metric into downstream bounds (the reference
                # raises UnavailableMetricError unless kwargs pin one)
                raise KeyError(
                    f"metric {metric_name} is ambiguous: {len(matches)} "
                    f"expectations match; pass kwargs (e.g. column=...)")
            if matches:
                return matches[0]
        raise KeyError(f"metric {metric_name} (kwargs={kwargs}) not available in suite result")

    def to_dict(self) -> dict[str, Any]:
        return {
            "success": bool(self.success),
            "results": [r.to_dict() for r in self.results],
            "suite_name": self.suite_name,
            "statistics": self.statistics,
            "meta": self.meta,
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), sort_keys=True, default=str)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "SuiteValidationResult":
        """Inverse of ``to_dict`` (reference
        core/expectation_validation_result.py:436 constructor kwargs).
        Statistics are taken verbatim, not recomputed, so a stored result
        re-loads byte-identical."""
        return cls(
            success=bool(d["success"]),
            results=[ExpectationValidationResult.from_dict(r)
                     for r in d.get("results", [])],
            suite_name=d.get("suite_name", "default"),
            statistics=dict(d.get("statistics") or {}),
            meta=dict(d.get("meta") or {}),
        )

    @classmethod
    def from_json(cls, s: str) -> "SuiteValidationResult":
        return cls.from_dict(json.loads(s))
