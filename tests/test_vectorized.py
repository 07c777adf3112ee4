"""Vectorized table-validation kernels vs. the per-row parity evaluator.

The oracle here is our OWN corpus-verified evaluator: for every batch the
vectorized plan's per-row verdict must equal running the reference-parity
recursive evaluator on the equivalent JSON object per row."""

import numpy as np
import pyarrow as pa
import pytest

from json_schema_validate_ray.functions.evaluator import Evaluator
from json_schema_validate_ray.functions.compiler import jsonschema_compile
from json_schema_validate_ray.pipelines.schemas import TOKENS_SCHEMA
from json_schema_validate_ray.sources.tokens import (
    HOT_DOC_ID, UNKNOWN_SOURCE, VOCAB_SIZE, synth_tokens_partition,
)
from json_schema_validate_ray.stages.vectorized import (
    ListLengthEquals, TablePlan, TableValidator, ValidityAnnotator,
    ViolationExtractor, violations_to_table,
)


def _row_oracle(schema: dict, batch: pa.Table) -> np.ndarray:
    """Per-row verdicts from the corpus-verified evaluator; Arrow nulls map to
    missing keys (the documented column mapping)."""
    ev = Evaluator(jsonschema_compile(schema))
    out = []
    for row in batch.to_pylist():
        doc = {k: v for k, v in row.items() if v is not None}
        out.append(ev.validate_document(doc, None))
    return np.array(out, dtype=bool)


def test_tokens_batch_matches_row_evaluator():
    batch = synth_tokens_partition(0, 3000, seed=42)
    plan = TablePlan(TOKENS_SCHEMA, id_column="doc_id")
    valid, violations = plan.evaluate_batch(batch)
    oracle = _row_oracle(TOKENS_SCHEMA, batch)
    mismatch = np.nonzero(valid != oracle)[0]
    assert len(mismatch) == 0, (
        f"{len(mismatch)} verdict mismatches, first rows: "
        f"{batch.slice(int(mismatch[0]), 1).to_pylist()}")
    # planted violations exist at this partition size
    assert not valid.all()
    assert valid.mean() > 0.99


def test_planted_violation_classes_detected():
    batch = synth_tokens_partition(1, 5000, seed=42)
    plan = TablePlan(TOKENS_SCHEMA, id_column="doc_id",
                     cross_checks=(ListLengthEquals("n_tok", "tokens"),))
    _, violations = plan.evaluate_batch(batch)
    vt = violations_to_table(batch, "doc_id", violations)
    cids = set(vt["constraint_id"].to_pylist())
    assert "tokens/items.minimum" in cids            # planted negative token
    assert "tokens/items.exclusiveMaximum" in cids   # planted >= VOCAB token
    assert "row/n_tok_equals_len_tokens" in cids     # planted n_tok mismatch
    srcs = vt.filter(
        pa.compute.equal(vt["constraint_id"], "source/enum"))["observed"].to_pylist()
    assert srcs and all(UNKNOWN_SOURCE in s for s in srcs)


def test_violation_messages_match_reference_strings():
    batch = pa.table({
        "doc_id": ["doc-000000000001", "x", None],
        "tokens": pa.array([[1, 2], [], [3]], type=pa.list_(pa.int32())),
        "n_tok": pa.array([2, 0, 1], type=pa.int32()),
        "source": ["src0", "srcX", "src1"],
    })
    plan = TablePlan(TOKENS_SCHEMA, id_column="doc_id")
    _, violations = plan.evaluate_batch(batch)
    vt = violations_to_table(batch, "doc_id", violations)
    rows = {(r["constraint_id"], r["doc_id"]): r for r in vt.to_pylist()}
    # exact reference message strings (json_schema_validate.c:980, 1120, 770)
    assert rows[("doc_id/pattern", "x")]["message"] == "String does not match pattern: ^doc-"
    assert rows[("tokens/minItems", "x")]["message"] == "Array has 0 items, minimum is 1"
    assert rows[("doc_id/required", "None")]["message"] == "Missing required property: doc_id"
    assert rows[("doc_id/required", "None")]["path"] == ""
    assert rows[("n_tok/minimum", "x")]["message"] == "Value is less than minimum"
    assert rows[("source/enum", "x")]["message"] == "Value not in enum"


def test_items_path_format():
    batch = pa.table({
        "doc_id": ["doc-000000000001"],
        "tokens": pa.array([[5, -3, -9]], type=pa.list_(pa.int32())),
        "n_tok": pa.array([3], type=pa.int32()),
        "source": ["src0"],
    })
    plan = TablePlan(TOKENS_SCHEMA, id_column="doc_id")
    _, violations = plan.evaluate_batch(batch)
    vt = violations_to_table(batch, "doc_id", violations)
    row = [r for r in vt.to_pylist() if r["constraint_id"] == "tokens/items.minimum"][0]
    # "[i]" appended with no separator (json_schema_validate.c:2007-2023);
    # first failing element reported, count carried in observed
    assert row["path"] == "tokens[1]"
    assert "failing_elements\": 2" in row["observed"].replace(" ", "").replace('"', '"') or "2" in row["observed"]


@pytest.mark.parametrize("schema,column,expect_valid", [
    ({"type": "object", "properties": {"c": {"uniqueItems": True}}},
     pa.array([[1, 2, 3], [1, 1, 2], [], None], type=pa.list_(pa.int64())),
     [True, False, True, True]),
    ({"type": "object", "properties": {"c": {"type": "integer"}}},
     pa.array([1.0, 1.5, None]),
     [True, False, True]),  # null = missing property -> skipped
    ({"type": "object", "properties": {"c": {"minLength": 6}}},
     pa.array(["héllo", "hello!", "ab"]),
     [True, True, False]),  # byte length: héllo = 6 bytes
    ({"type": "object", "properties": {"c": {"contains": {"type": "number", "minimum": 10}, "minContains": 2}}},
     pa.array([[10, 20, 1], [10, 1, 2], []], type=pa.list_(pa.int64())),
     [True, False, False]),
    ({"type": "object", "properties": {"c": {"format": "email"}}},
     pa.array(["user@example.com", "not an email"]),
     [True, False]),
    ({"type": "object", "properties": {"c": {"multipleOf": 3}}},
     pa.array([9, 10, 0], type=pa.int64()),
     [True, False, True]),
])
def test_kernel_semantics(schema, column, expect_valid):
    batch = pa.table({"c": column})
    plan = TablePlan(schema, id_column="c")
    valid, _ = plan.evaluate_batch(batch)
    assert valid.tolist() == expect_valid
    # cross-check against the parity evaluator
    oracle = _row_oracle(schema, batch)
    assert valid.tolist() == oracle.tolist()


def test_fallback_column_uses_row_evaluator():
    # anyOf is not vectorizable -> per-column fallback, same verdicts
    schema = {"type": "object", "properties": {
        "c": {"anyOf": [{"type": "string"}, {"type": "number", "minimum": 5}]}}}
    batch = pa.table({"c": pa.array([3, 7, None], type=pa.int64())})
    plan = TablePlan(schema)
    assert plan.columns[0].vectorized is False
    valid, _ = plan.evaluate_batch(batch)
    assert valid.tolist() == [False, True, True]


def test_hot_key_planted():
    batch = synth_tokens_partition(0, 3000, seed=42)
    ids = batch["doc_id"].to_pylist()
    assert ids.count(HOT_DOC_ID) == 3


def test_validator_stage_callables():
    batch = synth_tokens_partition(2, 1000, seed=42)
    v = TableValidator(TOKENS_SCHEMA)(batch)
    assert v.column_names[-1] == "valid"
    e = ViolationExtractor(TOKENS_SCHEMA)(batch)
    assert e.column_names == ["doc_id", "constraint_id", "path", "message", "observed"]
    a = ValidityAnnotator(TOKENS_SCHEMA, cross_checks=(ListLengthEquals(),))(batch)
    assert a.column_names[-3:] == ["valid", "n_violations", "violations"]


@pytest.mark.parametrize("schema,batch,expect", [
    # allOf: AND of subplans, all errors reported
    ({"allOf": [{"required": ["a"]}, {"properties": {"b": {"minimum": 5}}}]},
     pa.table({"a": [1, None, 2], "b": [9, 9, 1]}),
     [True, False, False]),
    # anyOf: OR of sub-verdicts
    ({"anyOf": [{"properties": {"a": {"minimum": 10}}},
                {"properties": {"b": {"const": "x"}}}]},
     pa.table({"a": [11, 1, 1], "b": ["q", "x", "q"]}),
     [True, True, False]),
    # oneOf: exactly one branch
    ({"oneOf": [{"properties": {"a": {"minimum": 5}}},
                {"properties": {"a": {"maximum": 10}}}]},
     pa.table({"a": [7, 2, 100]}),   # 7 matches both -> fail
     [False, True, True]),
    # not
    ({"not": {"properties": {"a": {"const": 3}}}},
     pa.table({"a": [3, 4]}),
     [False, True]),
    # if/then/else with masked branch errors
    ({"if": {"properties": {"t": {"const": "s"}}},
      "then": {"properties": {"v": {"minimum": 10}}},
      "else": {"properties": {"v": {"maximum": 0}}}},
     pa.table({"t": ["s", "s", "x", "x"], "v": [20, 1, -1, 5]}),
     [True, False, True, False]),
    # minProperties over non-null fields
    ({"minProperties": 2},
     pa.table({"a": [1, None], "b": [2, None]}),
     [True, False]),
])
def test_row_level_composition(schema, batch, expect):
    plan = TablePlan(schema)
    valid, _ = plan.evaluate_batch(batch)
    assert valid.tolist() == expect
    oracle = _row_oracle(schema, batch)
    assert valid.tolist() == oracle.tolist()


def test_additional_properties_row_level():
    schema = {"properties": {"a": {"type": "integer"}},
              "additionalProperties": False}
    batch = pa.table({"a": [1, 2], "extra": ["x", None]})
    plan = TablePlan(schema)
    valid, viol = plan.evaluate_batch(batch)
    assert valid.tolist() == [False, True]   # null extra = missing -> allowed
    oracle = _row_oracle(schema, batch)
    assert valid.tolist() == oracle.tolist()
    vt = violations_to_table(batch, "a", viol)
    assert vt["message"][0].as_py() == "Additional property 'extra' is not allowed"
    # patternProperties exempts names only (json_schema_validate.c:1419-1449)
    schema2 = {"properties": {}, "patternProperties": {"^ext": {"type": "number"}},
               "additionalProperties": False}
    batch2 = pa.table({"a": [1, None], "extra": ["x", "y"]})
    plan2 = TablePlan(schema2)
    valid2, _ = plan2.evaluate_batch(batch2)
    # row0: 'a' present and not exempt -> invalid; 'extra' exempt even though
    # its value violates the patternProperties schema (values never validated)
    assert valid2.tolist() == [False, True]
    assert valid2.tolist() == _row_oracle(schema2, batch2).tolist()


def test_violation_cap_reports_dropped():
    batch = pa.table({
        "doc_id": [f"d{i}" for i in range(100)],
        "n": pa.array([-1] * 100, type=pa.int64()),
    })
    plan = TablePlan({"properties": {"n": {"minimum": 0}}}, id_column="doc_id")
    _, viol = plan.evaluate_batch(batch)
    vt = violations_to_table(batch, "doc_id", viol, max_rows=10)
    assert vt.num_rows == 11
    last = vt.to_pylist()[-1]
    assert "dropped" in last["observed"] and "90" in last["observed"]
