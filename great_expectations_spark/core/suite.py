"""Expectation suite IR.

Mirrors the reference data model (great_expectations/core/
expectation_configuration.py, core/expectation_suite.py): an expectation is a
``{expectation_type, kwargs, meta}`` record; a suite is a named, JSON-
serializable list of them plus suite-level ``evaluation_parameters``.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from typing import Any, Iterable


def _stable_id(obj: Any) -> str:
    """md5 of sorted-key JSON — same keying idea as the reference's
    IDDict.to_id() (great_expectations/core/id_dict.py:13-25)."""
    return hashlib.md5(
        json.dumps(obj, sort_keys=True, default=str).encode("utf-8")
    ).hexdigest()


@dataclass
class ExpectationConfiguration:
    expectation_type: str
    kwargs: dict[str, Any] = field(default_factory=dict)
    meta: dict[str, Any] = field(default_factory=dict)

    @property
    def id(self) -> str:
        return _stable_id({"t": self.expectation_type, "k": self.kwargs})

    def to_dict(self) -> dict[str, Any]:
        return {
            "expectation_type": self.expectation_type,
            "kwargs": dict(self.kwargs),
            "meta": dict(self.meta),
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ExpectationConfiguration":
        return cls(
            expectation_type=d["expectation_type"],
            kwargs=dict(d.get("kwargs", {})),
            meta=dict(d.get("meta", {})),
        )


@dataclass
class ExpectationSuite:
    name: str = "default"
    expectations: list[ExpectationConfiguration] = field(default_factory=list)
    evaluation_parameters: dict[str, Any] = field(default_factory=dict)
    meta: dict[str, Any] = field(default_factory=dict)

    def add(self, expectation_type: str, **kwargs: Any) -> "ExpectationSuite":
        """Fluent builder: suite.add("expect_column_values_to_not_be_null", column="text")."""
        self.expectations.append(
            ExpectationConfiguration(expectation_type=expectation_type, kwargs=kwargs)
        )
        return self

    def extend(self, configs: Iterable[ExpectationConfiguration]) -> "ExpectationSuite":
        self.expectations.extend(configs)
        return self

    def to_dict(self) -> dict[str, Any]:
        return {
            "expectation_suite_name": self.name,
            "expectations": [e.to_dict() for e in self.expectations],
            "evaluation_parameters": dict(self.evaluation_parameters),
            "meta": dict(self.meta),
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), sort_keys=True, default=str)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ExpectationSuite":
        return cls(
            name=d.get("expectation_suite_name", d.get("name", "default")),
            expectations=[
                ExpectationConfiguration.from_dict(e) for e in d.get("expectations", [])
            ],
            evaluation_parameters=dict(d.get("evaluation_parameters", {})),
            meta=dict(d.get("meta", {})),
        )

    @classmethod
    def from_json(cls, s: str) -> "ExpectationSuite":
        return cls.from_dict(json.loads(s))
