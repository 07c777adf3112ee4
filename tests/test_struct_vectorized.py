"""Vectorized struct-column validation (object subschemas over Arrow struct
columns) vs the per-row parity evaluator.

Engine-wide convention (documented in stages/vectorized.py): an Arrow null —
at ANY nesting level — is the JSON 'key absent' state, so the evaluator
oracle strips null-valued keys recursively before validating."""

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from json_schema_validate_ray.functions.compiler import jsonschema_compile
from json_schema_validate_ray.functions.evaluator import Evaluator
from json_schema_validate_ray.stages.vectorized import (
    TablePlan,
    _strip_struct_nones,
)


def _oracle(schema, batch):
    ev = Evaluator(jsonschema_compile(schema))
    out = []
    for row in batch.to_pylist():
        doc = {k: _strip_struct_nones(v) for k, v in row.items() if v is not None}
        out.append(ev.validate_document(doc, None))
    return out


def _check(schema, batch, expect_vectorized=True):
    plan = TablePlan(schema, id_column="doc_id")
    if expect_vectorized:
        for cp in plan.columns:
            assert cp.vectorized, f"column {cp.col} unexpectedly on fallback"
    valid, _ = plan.evaluate_batch(batch)
    oracle = _oracle(schema, batch)
    assert list(valid) == oracle, (
        f"vectorized {list(valid)} != evaluator {oracle} for rows "
        f"{batch.to_pylist()}")
    return valid


NESTED_SCHEMA = {
    "type": "object",
    "properties": {
        "s": {
            "type": "object",
            "required": ["a"],
            "properties": {
                "a": {"type": "integer", "minimum": 0, "maximum": 100},
                "b": {"type": "string", "minLength": 2, "pattern": "^x"},
                "inner": {
                    "type": "object",
                    "required": ["k"],
                    "properties": {"k": {"type": "integer", "multipleOf": 2}},
                },
            },
        },
    },
}


def test_struct_column_stays_vectorized():
    plan = TablePlan(NESTED_SCHEMA, id_column="s")
    assert plan.columns[0].vectorized
    assert plan.columns[0]._children is not None
    assert plan.columns[0]._children["s/inner"
        if False else "inner"]._children is not None


def test_nested_struct_verdicts():
    batch = pa.table({"s": pa.array([
        {"a": 1, "b": "xy", "inner": {"k": 4}},     # valid
        {"a": -1, "b": "xy", "inner": {"k": 4}},    # a/minimum
        {"a": None, "b": "xy", "inner": {"k": 4}},  # required a
        {"a": 1, "b": "zz", "inner": {"k": 4}},     # b pattern
        {"a": 1, "b": "xy", "inner": {"k": 3}},     # inner.k multipleOf
        {"a": 1, "b": "xy", "inner": {"k": None}},  # inner required k
        {"a": 1, "b": "xy", "inner": None},         # inner absent -> valid
        None,                                       # column absent -> valid
    ])})
    valid = _check(NESTED_SCHEMA, batch)
    assert list(valid) == [True, False, False, False, False, False, True, True]


def test_struct_additional_and_size_properties():
    schema = {"type": "object", "properties": {
        "s": {"required": ["a"],
              "properties": {"a": {"type": "integer"}},
              "additionalProperties": False,
              "minProperties": 1, "maxProperties": 1}}}
    batch = pa.table({"s": pa.array([
        {"a": 1, "extra": None},      # extra absent -> ok
        {"a": 1, "extra": 5},         # additionalProperties
        {"a": None, "extra": 5},      # required + additional + minProperties? (1 present)
        None,
    ])})
    valid = _check(schema, batch)
    assert list(valid) == [True, False, False, True]


def test_struct_type_mismatch_column():
    # object schema on a string column: properties are vacuous, type flags
    schema = {"type": "object", "properties": {
        "s": {"type": "object", "properties": {"a": {"type": "integer"}},
              "required": ["a"]}}}
    batch = pa.table({"s": ["not an object", None]})
    plan = TablePlan(schema, id_column="s")
    valid, _ = plan.evaluate_batch(batch)
    oracle = _oracle(schema, batch)
    assert list(valid) == oracle == [False, True]


def test_pattern_properties_falls_back():
    schema = {"type": "object", "properties": {
        "s": {"properties": {"a": {"type": "integer"}},
              "patternProperties": {"^x": {"type": "string"}}}}}
    plan = TablePlan(schema, id_column="s")
    assert not plan.columns[0].vectorized
    # fallback still agrees with the stripped-nones oracle
    batch = pa.table({"s": pa.array([{"a": 1, "xq": "ok"},
                                     {"a": None, "xq": "ok"}])})
    valid, _ = plan.evaluate_batch(batch)
    assert list(valid) == _oracle(schema, batch)


struct_field_schema = st.fixed_dictionaries({}, optional={
    "type": st.sampled_from(["integer", "string"]),
    "minimum": st.integers(-3, 3),
    "maxLength": st.integers(0, 4),
    "enum": st.lists(st.integers(-2, 2), min_size=1, max_size=3),
})

object_schema = st.builds(
    lambda props, req, mx: {
        "type": "object",
        "properties": {"s": {
            "properties": props,
            "required": [r for r in req if r in props],
            **({"maxProperties": mx} if mx is not None else {}),
        }},
    },
    props=st.dictionaries(st.sampled_from(["a", "b", "c"]),
                          struct_field_schema, min_size=1, max_size=3),
    req=st.lists(st.sampled_from(["a", "b", "c"]), max_size=2, unique=True),
    mx=st.one_of(st.none(), st.integers(0, 3)),
)

struct_rows = st.lists(
    st.one_of(st.none(), st.fixed_dictionaries({}, optional={
        "a": st.one_of(st.none(), st.integers(-5, 5)),
        "b": st.one_of(st.none(), st.sampled_from(["", "ab", "xyz"])),
        "c": st.one_of(st.none(), st.integers(-5, 5)),
    })),
    min_size=1, max_size=10)


@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(schema=object_schema, rows=struct_rows)
def test_struct_differential(schema, rows):
    # normalize rows so pyarrow infers one struct type (all keys present)
    norm = [None if r is None else
            {"a": r.get("a"), "b": r.get("b"), "c": r.get("c")} for r in rows]
    typ = pa.struct([("a", pa.int64()), ("b", pa.string()), ("c", pa.int64())])
    batch = pa.table({"s": pa.array(norm, type=typ)})
    plan = TablePlan(schema, id_column="s")
    valid, _ = plan.evaluate_batch(batch)
    assert list(valid) == _oracle(schema, batch)


def test_property_names_vectorized():
    schema = {"type": "object", "properties": {
        "s": {"properties": {"ok": {"type": "integer"}},
              "propertyNames": {"maxLength": 3}}}}
    plan = TablePlan(schema, id_column="s")
    assert plan.columns[0].vectorized
    batch = pa.table({"s": pa.array([
        {"ok": 1, "toolong": None},   # bad name absent -> valid
        {"ok": 1, "toolong": 5},      # bad name present -> invalid
        None,
    ])})
    valid = _check(schema, batch)
    assert list(valid) == [True, False, True]


def test_property_names_boolean_schema():
    schema = {"type": "object", "properties": {
        "s": {"properties": {"a": {"type": "integer"}},
              "propertyNames": False}}}
    batch = pa.table({"s": pa.array([{"a": 1}, {"a": None}, None])})
    valid = _check(schema, batch)
    # any present field fails propertyNames=false
    assert list(valid) == [False, True, True]
