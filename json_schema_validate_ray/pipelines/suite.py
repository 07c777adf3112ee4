"""The engine's user-extension surface: named, composable checks.

The reference's extension surface is the SQL layer itself (schemas stored in
tables + SQL function wrappers, README.md:480-505,
sql/json_schema_validate.sql:315-322).  Our equivalent is a ``Check``
registry: each check is a named unit with a uniform ``run(ds) -> CheckResult``
contract, and a ``ValidationSuite`` composes them into one report with
per-check pass/fail, metrics and wall time.

Built-in check types:

* SchemaCheck       — vectorized TablePlan validation (row verdicts)
* UniquenessCheck   — exact duplicate keys (hash-bucketed aggregation)
* ReferentialCheck  — broadcast semi-join against an allowed key set
* StatsCheck        — column stats + NDV with optional bounds assertions
* DriftCheck        — chi-square / KS against a baseline snapshot
* RowCountCheck     — min/max row-count bounds

Custom checks subclass ``Check`` and register with ``@register_check``.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.checks import (
    column_stats,
    drift_report,
    duplicate_keys,
    referential_violations,
)
from ..stages.vectorized import ListLengthEquals
from .validate import validate_dataset

CHECK_TYPES: dict[str, type] = {}


def register_check(cls):
    CHECK_TYPES[cls.kind] = cls
    return cls


@dataclass
class CheckResult:
    name: str
    kind: str
    passed: bool
    metrics: dict
    wall_sec: float


class Check:
    """One named check over a Dataset factory (a zero-arg callable returning
    a fresh lazy Dataset, so each check builds its own streaming pipeline)."""

    kind = "abstract"

    def __init__(self, name: str):
        self.name = name

    def run(self, make_ds: Callable[[], Any]) -> CheckResult:
        t0 = time.perf_counter()
        passed, metrics = self._evaluate(make_ds)
        return CheckResult(self.name, self.kind, passed, metrics,
                           round(time.perf_counter() - t0, 3))

    def _evaluate(self, make_ds):
        raise NotImplementedError


@register_check
class SchemaCheck(Check):
    kind = "schema"

    def __init__(self, name: str, schema, max_invalid_rate: float = 0.0,
                 cross_checks: tuple = (), id_column: str = "doc_id"):
        super().__init__(name)
        self.schema = schema
        self.max_invalid_rate = max_invalid_rate
        self.cross_checks = tuple(cross_checks)
        self.id_column = id_column

    def _evaluate(self, make_ds):
        verdicts = validate_dataset(make_ds(), self.schema, self.cross_checks,
                                    id_column=self.id_column)
        agg = verdicts.map_batches(
            lambda b: pa.table({
                "n": pa.array([b.num_rows], type=pa.int64()),
                "bad": pa.array([int(pc.sum(pc.invert(b["valid"])).as_py() or 0)],
                                type=pa.int64()),
                "viol": pa.array([int(pc.sum(b["n_violations"]).as_py() or 0)],
                                 type=pa.int64())}),
            batch_format="pyarrow").take_all()
        n = sum(r["n"] for r in agg)
        bad = sum(r["bad"] for r in agg)
        viol = sum(r["viol"] for r in agg)
        rate = bad / n if n else 0.0
        return rate <= self.max_invalid_rate, {
            "rows": n, "invalid_rows": bad, "violations": viol,
            "invalid_rate": round(rate, 6)}


@register_check
class UniquenessCheck(Check):
    kind = "uniqueness"

    def __init__(self, name: str, key: str = "doc_id", max_duplicate_keys: int = 0):
        super().__init__(name)
        self.key = key
        self.max_duplicate_keys = max_duplicate_keys

    def _evaluate(self, make_ds):
        dups = duplicate_keys(make_ds(), self.key).count()
        return dups <= self.max_duplicate_keys, {
            "duplicate_keys": dups, "key": self.key}


@register_check
class ReferentialCheck(Check):
    kind = "referential"

    def __init__(self, name: str, column: str, allowed,
                 id_column: str = "doc_id", max_violations: int = 0):
        super().__init__(name)
        self.column = column
        self.allowed = allowed
        self.id_column = id_column
        self.max_violations = max_violations

    def _evaluate(self, make_ds):
        n = referential_violations(make_ds(), self.column, self.allowed,
                                   self.id_column).count()
        return n <= self.max_violations, {
            "referential_violations": n, "column": self.column}


@register_check
class StatsCheck(Check):
    """Column stats with optional bound assertions, e.g.
    ``bounds={"n_tok": {"max_null_rate": 0.0, "min": 1, "max": 2048}}``."""

    kind = "stats"

    def __init__(self, name: str, columns: list, ndv_columns: list | None = None,
                 bounds: Optional[dict] = None):
        super().__init__(name)
        self.columns = columns
        self.ndv_columns = ndv_columns
        self.bounds = bounds or {}

    def _evaluate(self, make_ds):
        tbl = column_stats(make_ds(), self.columns, self.ndv_columns)
        rows = {r["column"]: r for r in tbl.to_pylist()}
        failures = []
        for col, b in self.bounds.items():
            r = rows.get(col)
            if r is None:
                failures.append(f"{col}: column missing")
                continue
            if "max_null_rate" in b and r["null_rate"] > b["max_null_rate"]:
                failures.append(f"{col}: null_rate {r['null_rate']} > {b['max_null_rate']}")
            if "min" in b and r["min_value"] is not None and float(r["min_value"]) < b["min"]:
                failures.append(f"{col}: min {r['min_value']} < {b['min']}")
            if "max" in b and r["max_value"] is not None and float(r["max_value"]) > b["max"]:
                failures.append(f"{col}: max {r['max_value']} > {b['max']}")
            if "min_ndv" in b and (r["ndv_estimate"] or 0) < b["min_ndv"]:
                failures.append(f"{col}: ndv {r['ndv_estimate']} < {b['min_ndv']}")
        return not failures, {"column_stats": rows, "failures": failures}


@register_check
class DriftCheck(Check):
    kind = "drift"

    def __init__(self, name: str, baseline_counts: dict, baseline_hist,
                 cat_column: str = "source", num_column: str = "n_tok",
                 max_chi_square: float = 100.0, max_ks: float = 0.1):
        super().__init__(name)
        self.baseline_counts = baseline_counts
        self.baseline_hist = baseline_hist
        self.cat_column = cat_column
        self.num_column = num_column
        self.max_chi_square = max_chi_square
        self.max_ks = max_ks

    def _evaluate(self, make_ds):
        rep = drift_report(make_ds(), self.baseline_counts, self.baseline_hist,
                           self.cat_column, self.num_column)
        passed = (rep["chi_square"] <= self.max_chi_square
                  and rep["ks_statistic"] <= self.max_ks)
        return passed, {"chi_square": rep["chi_square"],
                        "ks_statistic": rep["ks_statistic"]}


@register_check
class RowCountCheck(Check):
    kind = "row_count"

    def __init__(self, name: str, min_rows: int = 0, max_rows: Optional[int] = None):
        super().__init__(name)
        self.min_rows = min_rows
        self.max_rows = max_rows

    def _evaluate(self, make_ds):
        n = make_ds().count()
        ok = n >= self.min_rows and (self.max_rows is None or n <= self.max_rows)
        return ok, {"rows": n}


@dataclass
class ValidationSuite:
    """Named checks run against one input; produces a combined report.

    Each check re-creates its own lazy Dataset from the factory, so every
    check is an independent streaming pipeline (no shared materialization)."""

    name: str
    checks: list = field(default_factory=list)

    def add(self, check: Check) -> "ValidationSuite":
        self.checks.append(check)
        return self

    def run(self, make_ds: Callable[[], Any]) -> dict:
        t0 = time.perf_counter()
        results = [c.run(make_ds) for c in self.checks]
        return {
            "suite": self.name,
            "passed": all(r.passed for r in results),
            "n_checks": len(results),
            "n_failed": sum(1 for r in results if not r.passed),
            "wall_sec": round(time.perf_counter() - t0, 3),
            "checks": [{"name": r.name, "kind": r.kind, "passed": r.passed,
                        "wall_sec": r.wall_sec, "metrics": r.metrics}
                       for r in results],
        }


def tokens_default_suite() -> ValidationSuite:
    """The flagship suite for the input_hint tokens table."""
    from ..sources.tokens import MAX_TOKENS, SOURCES
    from .schemas import TOKENS_SCHEMA
    return (ValidationSuite("tokens-default")
            .add(SchemaCheck("schema", TOKENS_SCHEMA,
                             max_invalid_rate=0.01,
                             cross_checks=(ListLengthEquals("n_tok", "tokens"),)))
            .add(UniquenessCheck("doc_id-unique", "doc_id",
                                 max_duplicate_keys=10_000))
            .add(ReferentialCheck("source-known", "source", SOURCES,
                                  max_violations=10_000))
            .add(StatsCheck("column-bounds",
                            ["doc_id", "tokens", "n_tok", "source"],
                            ndv_columns=["doc_id", "source"],
                            bounds={"n_tok": {"max_null_rate": 0.0, "min": 1,
                                              "max": MAX_TOKENS + 10}}))
            .add(RowCountCheck("non-empty", min_rows=1)))
