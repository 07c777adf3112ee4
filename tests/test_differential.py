"""Property-based differential testing.

Two oracles are cross-checked on randomized inputs:
1. vectorized TablePlan verdicts vs the corpus-verified recursive evaluator
   over random flat tables + random vectorizable schemas;
2. the recursive evaluator's total-verdict consistency between error-collecting
   and suppressed modes (the C ``errors == NULL`` convention must never change
   a verdict, json_schema_validate.c:248-265 vs :204-214).
"""

import json

import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from json_schema_validate_ray.functions.compiler import jsonschema_compile
from json_schema_validate_ray.functions.evaluator import Evaluator
from json_schema_validate_ray.stages.vectorized import TablePlan

# ---------------------------------------------------------------------------
# schema + data strategies (kept small: verdict diversity, bounded runtime)
# ---------------------------------------------------------------------------

scalar_schema = st.one_of(
    st.fixed_dictionaries({}, optional={
        "type": st.sampled_from(["integer", "number", "string", "boolean"]),
        "minimum": st.integers(-5, 5),
        "maximum": st.integers(-5, 5),
        "exclusiveMinimum": st.integers(-5, 5),
        "minLength": st.integers(0, 6),
        "maxLength": st.integers(0, 6),
        "pattern": st.sampled_from(["^a", "b$", "[0-9]+", "^$"]),
        "enum": st.lists(st.one_of(st.integers(-3, 3),
                                   st.sampled_from(["a", "b", "ab"])),
                         min_size=1, max_size=4),
        "const": st.one_of(st.integers(-3, 3), st.sampled_from(["a", "b"])),
        "multipleOf": st.integers(1, 4),
    }),
)

list_schema = st.fixed_dictionaries({}, optional={
    "type": st.just("array"),
    "minItems": st.integers(0, 4),
    "maxItems": st.integers(0, 4),
    "uniqueItems": st.booleans(),
    "items": st.fixed_dictionaries({}, optional={
        "type": st.just("integer"),
        "minimum": st.integers(-3, 3),
        "maximum": st.integers(-3, 3),
    }),
    "contains": st.fixed_dictionaries(
        {"type": st.just("number")},
        optional={"minimum": st.integers(-3, 3)}),
    "minContains": st.integers(0, 3),
    "maxContains": st.integers(0, 3),
})

int_col = st.lists(st.one_of(st.none(), st.integers(-8, 8)), min_size=1, max_size=12)
str_col = st.lists(st.one_of(st.none(), st.sampled_from(["", "a", "ab", "b9", "zzz"])),
                   min_size=1, max_size=12)
list_col = st.lists(st.one_of(st.none(),
                              st.lists(st.integers(-5, 5), max_size=5)),
                    min_size=1, max_size=12)


def _oracle(schema, batch):
    ev = Evaluator(jsonschema_compile(schema))
    out = []
    for row in batch.to_pylist():
        doc = {k: v for k, v in row.items() if v is not None}
        out.append(ev.validate_document(doc, None))
    return out


@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(sub=scalar_schema, data=st.one_of(int_col, str_col),
       required=st.booleans())
def test_scalar_column_plan_matches_evaluator(sub, data, required):
    schema = {"type": "object", "properties": {"c": sub}}
    if required:
        schema["required"] = ["c"]
    batch = pa.table({"c": pa.array(data)})
    plan = TablePlan(schema, id_column="c")
    valid, _ = plan.evaluate_batch(batch)
    assert valid.tolist() == _oracle(schema, batch), json.dumps(sub)


@settings(max_examples=80, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(sub=list_schema, data=list_col)
def test_list_column_plan_matches_evaluator(sub, data):
    schema = {"type": "object", "properties": {"c": sub}}
    batch = pa.table({"c": pa.array(data, type=pa.list_(pa.int64()))})
    plan = TablePlan(schema, id_column="c")
    valid, _ = plan.evaluate_batch(batch)
    assert valid.tolist() == _oracle(schema, batch), json.dumps(sub)


json_value = st.recursive(
    st.one_of(st.none(), st.booleans(), st.integers(-9, 9),
              st.sampled_from(["", "a", "b3"])),
    lambda children: st.one_of(
        st.lists(children, max_size=3),
        st.dictionaries(st.sampled_from(["x", "y", "zz"]), children, max_size=3)),
    max_leaves=8)

nested_schema = st.recursive(
    scalar_schema,
    lambda children: st.one_of(
        st.fixed_dictionaries({}, optional={
            "properties": st.dictionaries(st.sampled_from(["x", "y", "zz"]),
                                          children, max_size=2),
            "required": st.lists(st.sampled_from(["x", "y"]), max_size=2),
            "items": children,
            "not": children,
            "anyOf": st.lists(children, min_size=1, max_size=2),
            "allOf": st.lists(children, min_size=1, max_size=2),
            "oneOf": st.lists(children, min_size=1, max_size=2),
        }),
        st.booleans()),
    max_leaves=6)


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(schema=nested_schema, doc=json_value)
def test_error_mode_never_changes_verdict(schema, doc):
    ev = Evaluator(jsonschema_compile(schema))
    silent = ev.validate_document(doc, None)
    errors: list = []
    collecting = ev.validate_document(doc, errors)
    assert silent == collecting
    assert collecting == (len(errors) == 0) or not collecting
    if collecting:
        assert errors == []
