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
