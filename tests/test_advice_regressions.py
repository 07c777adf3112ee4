"""Regression tests for the round-1 ADVICE findings: vectorized-path
false-accepts vs the per-row parity evaluator (stages/vectorized.py).

Each test pins a case where the vectorized kernels previously returned
valid=True while the corpus-verified evaluator (and the reference,
json_schema_validate.c) rejects the row.  Oracle = the evaluator, exactly as
in test_vectorized.py."""

import numpy as np
import pyarrow as pa
import pytest

from json_schema_validate_ray.functions.compiler import jsonschema_compile
from json_schema_validate_ray.functions.evaluator import Evaluator
from json_schema_validate_ray.stages.vectorized import TablePlan


def _check(schema: dict, batch: pa.Table):
    """Vectorized verdicts must equal the per-row evaluator on every row."""
    plan = TablePlan(schema, id_column="doc_id")
    valid, _ = plan.evaluate_batch(batch)
    ev = Evaluator(jsonschema_compile(schema))
    for i, row in enumerate(batch.to_pylist()):
        doc = {k: v for k, v in row.items() if v is not None}
        expect = ev.validate_document(doc, None)
        assert valid[i] == expect, (
            f"row {i} {doc}: vectorized={bool(valid[i])} evaluator={expect}")
    return valid


# ---------------------------------------------------------------------------
# ADVICE #1 (high): contains admitted keywords it never kernelized
# ---------------------------------------------------------------------------

def test_contains_exclusive_minimum():
    # {"contains": {"exclusiveMinimum": 5}} must REJECT [1,2,3]
    schema = {"type": "object",
              "properties": {"a": {"contains": {"exclusiveMinimum": 5}}}}
    batch = pa.table({"a": [[1, 2, 3], [1, 6], [5], None]})
    valid = _check(schema, batch)
    assert list(valid) == [False, True, False, True]


def test_contains_exclusive_maximum_and_enum_falls_back():
    schema = {"type": "object",
              "properties": {"a": {"contains": {"exclusiveMaximum": 2}}}}
    batch = pa.table({"a": [[5, 6], [1, 9], [2]]})
    valid = _check(schema, batch)
    assert list(valid) == [False, True, False]
    # enum inside contains is NOT kernelized -> must take the fallback and
    # still be correct
    schema2 = {"type": "object",
               "properties": {"a": {"contains": {"enum": [7, 8]}}}}
    batch2 = pa.table({"a": [[1, 2], [7, 1], [8]]})
    valid2 = _check(schema2, batch2)
    assert list(valid2) == [False, True, True]


def test_contains_min_max_length_fallback():
    schema = {"type": "object",
              "properties": {"a": {"contains": {"minLength": 3}}}}
    batch = pa.table({"a": [["x", "ab"], ["abc", "z"], ["ab"]]})
    valid = _check(schema, batch)
    assert list(valid) == [False, True, False]


def test_contains_const_bool_vs_number():
    # JSON true != 1: contains const true never matches an int column
    schema = {"type": "object",
              "properties": {"a": {"contains": {"const": True}}}}
    batch = pa.table({"a": pa.array([[1, 0], [1]], type=pa.list_(pa.int64()))})
    valid = _check(schema, batch)
    assert list(valid) == [False, False]
    schema2 = {"type": "object",
               "properties": {"a": {"contains": {"const": 2.0}}}}
    batch2 = pa.table({"a": pa.array([[1, 2], [3]], type=pa.list_(pa.int64()))})
    valid2 = _check(schema2, batch2)
    assert list(valid2) == [True, False]


# ---------------------------------------------------------------------------
# ADVICE #2 (high): items const / minLength / maxLength / enum fallback
# ---------------------------------------------------------------------------

def test_items_min_length():
    schema = {"type": "object",
              "properties": {"a": {"items": {"minLength": 5}}}}
    batch = pa.table({"a": [["ab"], ["abcdef"], ["abcde", "x"]]})
    valid = _check(schema, batch)
    assert list(valid) == [False, True, False]


def test_items_max_length_bytes():
    schema = {"type": "object",
              "properties": {"a": {"items": {"maxLength": 3}}}}
    # é is 2 UTF-8 bytes: "éé" = 4 bytes > 3 (reference counts BYTES)
    batch = pa.table({"a": [["abc"], ["éé"], ["abcd"]]})
    valid = _check(schema, batch)
    assert list(valid) == [True, False, False]


def test_items_const():
    schema = {"type": "object", "properties": {"a": {"items": {"const": 7}}}}
    batch = pa.table({"a": [[1, 7], [7, 7], [7], []]})
    valid = _check(schema, batch)
    assert list(valid) == [False, True, True, True]


def test_items_const_container_never_matches():
    schema = {"type": "object", "properties": {"a": {"items": {"const": [1]}}}}
    batch = pa.table({"a": [[1], []]})
    valid = _check(schema, batch)
    assert list(valid) == [False, True]


def test_items_enum_cross_type_no_silent_pass():
    # enum of strings against an int column: nothing matches, and the Arrow
    # conversion failure must NOT silently drop the check
    schema = {"type": "object",
              "properties": {"a": {"items": {"enum": ["x", "y"]}}}}
    batch = pa.table({"a": pa.array([[1], []], type=pa.list_(pa.int64()))})
    valid = _check(schema, batch)
    assert list(valid) == [False, True]


def test_items_enum_bool_not_number():
    # JSON true is not 1: enum [1, 2] must reject boolean elements
    schema2 = {"type": "object",
               "properties": {"a": {"items": {"enum": [1, 2]}}}}
    batch2 = pa.table({"a": pa.array([[True], [False]], type=pa.list_(pa.bool_()))})
    valid2 = _check(schema2, batch2)
    assert list(valid2) == [False, False]


def test_items_null_element_enum_const():
    # a null ELEMENT is JSON null: not in enum [1,2]; equal to const null
    schema = {"type": "object",
              "properties": {"a": {"items": {"enum": [1, 2]}}}}
    batch = pa.table({"a": [[1, None], [2]]})
    valid = _check(schema, batch)
    assert list(valid) == [False, True]
    schema2 = {"type": "object",
               "properties": {"a": {"items": {"const": None}}}}
    batch2 = pa.table({"a": [[None, None], [None, 1]]})
    valid2 = _check(schema2, batch2)
    assert list(valid2) == [True, False]


# ---------------------------------------------------------------------------
# ADVICE #3 (medium): enum/const vs container-typed columns
# ---------------------------------------------------------------------------

def test_enum_container_column_always_fails():
    schema = {"type": "object", "properties": {"a": {"enum": [1, 2]}}}
    batch = pa.table({"a": [[1], [2], None]})
    valid = _check(schema, batch)
    assert list(valid) == [False, False, True]


def test_const_scalar_vs_container_column_always_fails():
    schema = {"type": "object", "properties": {"a": {"const": 7}}}
    batch = pa.table({"a": [[7], None]})
    valid = _check(schema, batch)
    assert list(valid) == [False, True]


# ---------------------------------------------------------------------------
# ADVICE #4 (medium): enum fallback used stringified comparison
# ---------------------------------------------------------------------------

def test_enum_mixed_types_type_strict():
    # "1" must NOT match enum [1, "b"]  (cross-type stringified match bug)
    schema = {"type": "object", "properties": {"a": {"enum": [1, "b"]}}}
    batch = pa.table({"a": ["1", "b", "c"]})
    valid = _check(schema, batch)
    assert list(valid) == [False, True, False]


def test_enum_bool_column_vs_numeric_enum():
    schema = {"type": "object", "properties": {"a": {"enum": [1, 0]}}}
    batch = pa.table({"a": [True, False]})
    valid = _check(schema, batch)
    assert list(valid) == [False, False]


def test_const_bool_vs_int_column():
    schema = {"type": "object", "properties": {"a": {"const": True}}}
    batch = pa.table({"a": pa.array([1, 0], type=pa.int64())})
    valid = _check(schema, batch)
    assert list(valid) == [False, False]


def test_enum_float_int_equivalence():
    # JSON 2.0 == 2: enum [2.0] matches int 2; enum [1.5] matches nothing int
    schema = {"type": "object", "properties": {"a": {"enum": [2.0, 1.5]}}}
    batch = pa.table({"a": pa.array([2, 1, 3], type=pa.int64())})
    valid = _check(schema, batch)
    assert list(valid) == [True, False, False]


# ---------------------------------------------------------------------------
# ADVICE #5 (low): duplicate nulls in uniqueItems
# ---------------------------------------------------------------------------

def test_unique_items_duplicate_nulls():
    schema = {"type": "object", "properties": {"a": {"uniqueItems": True}}}
    batch = pa.table({"a": [[1, None, None], [1, None], [None], [1, 1]]})
    valid = _check(schema, batch)
    assert list(valid) == [False, True, True, False]


def test_unique_items_duplicate_nulls_string_column():
    schema = {"type": "object", "properties": {"a": {"uniqueItems": True}}}
    batch = pa.table({"a": [["x", None, None], ["x", None], ["x", "x"]]})
    valid = _check(schema, batch)
    assert list(valid) == [False, True, False]


# ---------------------------------------------------------------------------
# hypothesis differential over the enum/const dtype matrix (the round-1 bug
# area): every (column dtype x entry type) combination must match the
# corpus-verified evaluator
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_entry = st.one_of(
    st.integers(-3, 3), st.floats(allow_nan=False, allow_infinity=False,
                                  min_value=-3, max_value=3),
    st.booleans(), st.sampled_from(["", "a", "1", "2.0", "true"]),
    st.none(), st.just([1]), st.just({"k": 1}))

_int_col = st.lists(st.one_of(st.none(), st.integers(-3, 3)), min_size=1, max_size=8)
_float_col = st.lists(st.one_of(st.none(), st.floats(allow_nan=False,
                                                     allow_infinity=False,
                                                     min_value=-3, max_value=3)),
                      min_size=1, max_size=8)
_bool_col = st.lists(st.one_of(st.none(), st.booleans()), min_size=1, max_size=8)
_str_col = st.lists(st.one_of(st.none(), st.sampled_from(["", "a", "1", "2.0", "true"])),
                    min_size=1, max_size=8)


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=st.one_of(_int_col, _float_col, _bool_col, _str_col),
       entries=st.lists(_entry, min_size=1, max_size=4),
       use_const=st.booleans())
def test_enum_const_dtype_matrix(data, entries, use_const):
    import pyarrow as pa
    from json_schema_validate_ray.functions.evaluator import Evaluator
    sub = {"const": entries[0]} if use_const else {"enum": entries}
    schema = {"type": "object", "properties": {"a": sub}}
    batch = pa.table({"a": data})
    plan = TablePlan(schema, id_column="a")
    valid, _ = plan.evaluate_batch(batch)
    ev = Evaluator(jsonschema_compile(schema))
    for i, row in enumerate(batch.to_pylist()):
        doc = {k: v for k, v in row.items() if v is not None}
        expect = ev.validate_document(doc, None)
        assert valid[i] == expect, (
            f"{sub} on {data[i]!r} (col {batch['a'].type}): "
            f"vectorized={bool(valid[i])} evaluator={expect}")


def test_enum_negative_zero():
    # Arrow's hash-based is_in distinguishes -0.0 from 0.0; JSON equality
    # does not — fuzzer-found (test_enum_const_dtype_matrix)
    schema = {"type": "object", "properties": {"a": {"enum": [0]}}}
    batch = pa.table({"a": [-0.0, 0.0, 1.0]})
    valid = _check(schema, batch)
    assert list(valid) == [True, True, False]
    schema2 = {"type": "object", "properties": {"a": {"enum": [-0.0]}}}
    valid2 = _check(schema2, pa.table({"a": [0.0, 2.0]}))
    assert list(valid2) == [True, False]
