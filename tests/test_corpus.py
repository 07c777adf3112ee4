"""Reference regression-corpus parity: all 147 pg_regress cases.

Cases extracted from /root/reference/expected/json_schema_validate.out by
tools/extract_corpus.py into tests/corpus.jsonl (committed).  Verdicts must
match exactly; the golden error-array cases must match structurally AND
byte-for-byte in the per-variant rendering (raw text for the ``json``
overload, PG-jsonb-normalized for ``jsonb``,
expected/json_schema_validate.out:540 vs :576).
"""

import json
import os

import pytest

from json_schema_validate_ray import (
    jsonschema_compile,
    jsonschema_is_valid,
    jsonschema_validate,
)
from json_schema_validate_ray.functions.evaluator import (
    render_errors_json,
    render_errors_jsonb,
)

CORPUS = os.path.join(os.path.dirname(__file__), "corpus.jsonl")

with open(CORPUS) as f:
    CASES = [json.loads(line) for line in f]

assert len(CASES) == 147, f"expected 147 corpus cases, got {len(CASES)}"


@pytest.mark.parametrize("case", CASES, ids=[c["test"] for c in CASES])
def test_corpus_case(case):
    if case["mode"] == "compile":
        assert jsonschema_compile(case["schema"] or "{}") is not None
        return

    data, schema = case["data"], case["schema"]

    if case["mode"] == "is_valid":
        assert jsonschema_is_valid(data, schema) is case["expected_valid"], (
            f"verdict mismatch for {case['test']!r}")
    else:
        errors = jsonschema_validate(data, schema)
        assert (len(errors) == 0) is case["expected_valid"]
        expected = json.loads(case["expected_errors"])
        assert errors == expected, (
            f"error-array mismatch for {case['test']!r}:\n"
            f"  got      {errors}\n  expected {expected}")
        if case["variant"] == "json":
            assert render_errors_json(errors) == case["expected_errors"]
        else:
            assert render_errors_jsonb(errors) == case["expected_errors"]


def test_corpus_verdict_tally():
    """87 true / 52 false boolean verdicts per BASELINE.md."""
    bools = [c for c in CASES if c["mode"] in ("is_valid", "compile")]
    t = sum(1 for c in bools if c["expected_valid"])
    assert (t, len(bools) - t) == (87, 52)
