"""Evaluation parameters: ``$PARAMETER`` substitution + cross-suite URNs.

Re-expresses the reference's runtime-parameter machinery
(great_expectations/core/evaluation_parameters.py:226-267 —
``build_evaluation_parameters`` — and :340-455 —
``parse_evaluation_parameter``) with a hand-written tokenizer +
recursive-descent parser instead of pyparsing. Supported expression
language (the reference's fourFn-derived grammar, :40-120):

    expr    := term (('+'|'-') term)*
    term    := factor (('*'|'/') factor)*
    factor  := unary ('^' factor)?          # right-associative
    unary   := ('+'|'-')* primary
    primary := NUMBER | PI | E | fn '(' args ')' | IDENT | URN | '(' expr ')'
    args    := expr (',' expr)* | NAME '=' expr (',' NAME '=' expr)*

Functions (reference ``EvaluationParameterParser.fn``): sin cos tan exp abs
trunc round sgn now datetime timedelta. Bare identifiers bind from the
``evaluation_parameters`` dict; ``urn:great_expectations:...`` identifiers
bind through a resolver callback (cross-suite chaining — the reference
resolves ``validations`` URNs from its evaluation-parameter store, here
they resolve against prior ``SuiteValidationResult`` objects).

Reference-matching special cases (:358-402):
  * a single zero-arg function call (``now()``) evaluates normally;
  * a single bare identifier present in ``evaluation_parameters`` returns
    the RAW bound value — complex types (lists) pass through unparsed;
  * otherwise a lone unresolvable token is an ``EvaluationParameterError``.
"""

from __future__ import annotations

import datetime
import math
import re
from typing import Any, Callable, Mapping

URN_PREFIX = "urn:great_expectations:"


class EvaluationParameterError(ValueError):
    pass


_FUNCTIONS: dict[str, Callable[..., Any]] = {
    "sin": math.sin,
    "cos": math.cos,
    "tan": math.tan,
    "exp": math.exp,
    "abs": abs,
    "trunc": lambda a: int(a),
    "round": round,
    "sgn": lambda a: -1 if a < -1e-12 else 1 if a > 1e-12 else 0,
    "now": datetime.datetime.now,
    "datetime": datetime.datetime,
    "timedelta": datetime.timedelta,
}

# URNs embed ':' and extended punctuation (reference core/urn.py urn_word)
_URN_RE = re.compile(re.escape(URN_PREFIX) + r"[A-Za-z0-9_$?=%.&,:]+")
_NUM_RE = re.compile(r"(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?")
_IDENT_RE = re.compile(r"[A-Za-z][A-Za-z0-9_$]*")

Token = tuple[str, Any]  # (kind, value); kinds: num ident urn op lpar rpar comma eq


def _tokenize(s: str) -> list[Token]:
    tokens: list[Token] = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch.isspace():
            i += 1
            continue
        m = _URN_RE.match(s, i)
        if m:
            tokens.append(("urn", m.group()))
            i = m.end()
            continue
        m = _NUM_RE.match(s, i)
        if m:
            txt = m.group()
            tokens.append(("num", float(txt) if ("." in txt or "e" in txt or "E" in txt) else int(txt)))
            i = m.end()
            continue
        m = _IDENT_RE.match(s, i)
        if m:
            tokens.append(("ident", m.group()))
            i = m.end()
            continue
        if ch in "+-*/^":
            tokens.append(("op", ch))
        elif ch == "(":
            tokens.append(("lpar", ch))
        elif ch == ")":
            tokens.append(("rpar", ch))
        elif ch == ",":
            tokens.append(("comma", ch))
        elif ch == "=":
            tokens.append(("eq", ch))
        else:
            raise EvaluationParameterError(f"Unable to parse evaluation parameter: unexpected character {ch!r} in {s!r}")
        i += 1
    return tokens


class _Parser:
    def __init__(
        self,
        tokens: list[Token],
        params: Mapping[str, Any],
        resolver: Callable[[str], Any] | None,
    ) -> None:
        self.toks = tokens
        self.pos = 0
        self.params = params
        self.resolver = resolver

    def peek(self) -> Token | None:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self) -> Token:
        t = self.peek()
        if t is None:
            raise EvaluationParameterError("Unable to parse evaluation parameter: unexpected end of expression")
        self.pos += 1
        return t

    def expect(self, kind: str) -> Token:
        t = self.next()
        if t[0] != kind:
            raise EvaluationParameterError(f"Unable to parse evaluation parameter: expected {kind}, got {t}")
        return t

    # grammar -------------------------------------------------------------

    def expr(self) -> Any:
        v = self.term()
        while (t := self.peek()) and t[0] == "op" and t[1] in "+-":
            self.next()
            rhs = self.term()
            v = v + rhs if t[1] == "+" else v - rhs
        return v

    def term(self) -> Any:
        v = self.factor()
        while (t := self.peek()) and t[0] == "op" and t[1] in "*/":
            self.next()
            rhs = self.factor()
            v = v * rhs if t[1] == "*" else v / rhs
        return v

    def factor(self) -> Any:
        v = self.unary()
        t = self.peek()
        if t and t == ("op", "^"):
            self.next()
            return v ** self.factor()  # right-associative
        return v

    def unary(self) -> Any:
        neg = False
        while (t := self.peek()) and t[0] == "op" and t[1] in "+-":
            self.next()
            if t[1] == "-":
                neg = not neg
        v = self.primary()
        return -v if neg else v

    def primary(self) -> Any:
        t = self.next()
        if t[0] == "num":
            return t[1]
        if t[0] == "lpar":
            v = self.expr()
            self.expect("rpar")
            return v
        if t[0] == "urn":
            return self._resolve(t[1])
        if t[0] == "ident":
            name = t[1]
            if name.upper() == "PI" and not (self.peek() and self.peek()[0] == "lpar"):
                return math.pi
            if name.upper() == "E" and not (self.peek() and self.peek()[0] == "lpar"):
                return math.e
            if self.peek() and self.peek()[0] == "lpar":
                return self._call(name)
            return self._resolve(name)
        raise EvaluationParameterError(f"Unable to parse evaluation parameter: unexpected token {t}")

    def _call(self, name: str) -> Any:
        if name not in _FUNCTIONS:
            raise EvaluationParameterError(f"Unknown function {name!r} in evaluation parameter")
        self.expect("lpar")
        args: list[Any] = []
        kwargs: dict[str, Any] = {}
        if self.peek() and self.peek()[0] != "rpar":
            while True:
                # keyword argument: IDENT '=' expr (reference kwarglist)
                if (
                    self.peek()
                    and self.peek()[0] == "ident"
                    and self.pos + 1 < len(self.toks)
                    and self.toks[self.pos + 1][0] == "eq"
                ):
                    key = self.next()[1]
                    self.next()  # '='
                    kwargs[key] = self.expr()
                else:
                    args.append(self.expr())
                if self.peek() and self.peek()[0] == "comma":
                    self.next()
                    continue
                break
        self.expect("rpar")
        return _FUNCTIONS[name](*args, **kwargs)

    def _resolve(self, name: str) -> Any:
        if name in self.params:
            return self.params[name]
        if name.startswith(URN_PREFIX):
            if self.resolver is None:
                raise EvaluationParameterError(f"No value found for $PARAMETER {name}")
            return self.resolver(name)
        # reference evaluate_stack falls back to number/datetime parsing
        try:
            return int(name)
        except ValueError:
            pass
        try:
            return float(name)
        except ValueError:
            pass
        try:
            from dateutil import parser as _p

            return _p.parse(name)
        except (ValueError, OverflowError):
            raise EvaluationParameterError(f"No value found for $PARAMETER {name}")


def parse_evaluation_parameter(
    expression: str,
    evaluation_parameters: Mapping[str, Any] | None = None,
    resolver: Callable[[str], Any] | None = None,
) -> Any:
    """Evaluate a ``$PARAMETER`` expression (reference
    parse_evaluation_parameter, core/evaluation_parameters.py:340-455)."""
    params = evaluation_parameters or {}
    try:
        tokens = _tokenize(expression)
    except EvaluationParameterError as err:
        # bare datetime strings ("2020-01-01T00:00:00") aren't valid
        # arithmetic but are accepted as values (reference evaluate_stack
        # dateutil fallback, core/evaluation_parameters.py:214-224)
        try:
            from dateutil import parser as _p

            return _p.parse(expression)
        except (ValueError, OverflowError):
            raise err

    # single bare identifier bound in params → RAW value (complex types ok)
    if len(tokens) == 1 and tokens[0][0] in ("ident", "urn"):
        name = tokens[0][1]
        if name in params:
            return params[name]
        if tokens[0][0] == "urn":
            if resolver is None:
                raise EvaluationParameterError(f"No value found for $PARAMETER {name}")
            return resolver(name)
    p = _Parser(tokens, params, resolver)
    result = p.expr()
    if p.peek() is not None:
        raise EvaluationParameterError(
            f"Unable to parse evaluation parameter: trailing tokens in {expression!r}")
    return result


def build_evaluation_parameters(
    kwargs: dict[str, Any],
    evaluation_parameters: Mapping[str, Any] | None = None,
    resolver: Callable[[str], Any] | None = None,
) -> tuple[dict[str, Any], dict[str, Any]]:
    """Replace ``{"$PARAMETER": expr}`` kwarg values with evaluated results
    (reference build_evaluation_parameters, core/evaluation_parameters.py:226-267,
    including the ``$PARAMETER.<expr>`` runtime-override key)."""
    out = dict(kwargs)
    substituted: dict[str, Any] = {}
    for key, value in kwargs.items():
        if isinstance(value, dict) and "$PARAMETER" in value:
            override_key = f"$PARAMETER.{value['$PARAMETER']}"
            if override_key in value:
                out[key] = value[override_key]
            else:
                out[key] = parse_evaluation_parameter(
                    value["$PARAMETER"], evaluation_parameters, resolver)
            substituted[key] = out[key]
    return out, substituted


# ------------------------------------------------------------ URN chaining


_URN_SPLIT = re.compile(
    re.escape(URN_PREFIX)
    + r"(?P<urn_type>metrics|validations|stores):(?P<rest>.+)$"
)


def parse_urn(urn: str) -> dict[str, str]:
    """Split a GE URN into its fields (reference core/urn.py grammar).
    ``validations`` URNs: suite_name : metric_name [: metric_kwargs]."""
    m = _URN_SPLIT.match(urn)
    if not m:
        raise EvaluationParameterError(f"Invalid URN: {urn}")
    parts = m.group("rest").split(":")
    d = {"urn_type": m.group("urn_type")}
    if m.group("urn_type") == "validations":
        if len(parts) < 2:
            raise EvaluationParameterError(f"Invalid validations URN: {urn}")
        d["expectation_suite_name"] = parts[0]
        d["metric_name"] = parts[1]
        if len(parts) > 2:
            d["metric_kwargs"] = ":".join(parts[2:])
    elif m.group("urn_type") == "metrics":
        if len(parts) < 3:
            raise EvaluationParameterError(f"Invalid metrics URN: {urn}")
        d["run_id"], d["expectation_suite_name"], d["metric_name"] = parts[0], parts[1], parts[2]
        if len(parts) > 3:
            d["metric_kwargs"] = ":".join(parts[3:])
    else:  # stores
        if len(parts) < 2:
            raise EvaluationParameterError(f"Invalid stores URN: {urn}")
        d["store_name"], d["metric_name"] = parts[0], parts[1]
        if len(parts) > 2:
            d["metric_kwargs"] = ":".join(parts[2:])
    return d


def make_validations_resolver(validation_results: Mapping[str, Any]) -> Callable[[str], Any]:
    """Resolver for ``urn:great_expectations:validations:<suite>:<metric>``
    against prior suite results — the engine-native version of the
    reference's evaluation-parameter store chaining (checkpoint actions
    StoreEvaluationParametersAction feeding get_bind_params,
    validator/validator.py:1688-1693)."""

    def resolve(urn: str) -> Any:
        d = parse_urn(urn)
        if d["urn_type"] != "validations":
            raise EvaluationParameterError(
                f"Only validations URNs resolve against prior results: {urn}")
        suite = d["expectation_suite_name"]
        if suite not in validation_results:
            raise EvaluationParameterError(
                f"No prior validation result for suite {suite!r} (URN {urn})")
        kw: dict[str, Any] = {}
        for pair in (d.get("metric_kwargs") or "").split(","):
            if "=" in pair:
                k, v = pair.split("=", 1)
                kw[k] = v
        return validation_results[suite].get_metric(d["metric_name"], **kw)

    return resolve
