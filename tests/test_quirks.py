"""Pin reference behaviors ABSENT from its own corpus (SURVEY.md §1.2, §5).

These cases pin our evaluator to the C *code's* behavior, cited per test."""

from json_schema_validate_ray import jsonschema_is_valid, jsonschema_validate


def test_container_const_never_matches():
    # jsonb_values_equal returns false for containers even when identical
    # (json_schema_validate.c:1330-1340, explicit TODO)
    assert jsonschema_is_valid('[1, 2]', '{"const": [1, 2]}') is False
    assert jsonschema_is_valid('{"a": 1}', '{"const": {"a": 1}}') is False


def test_container_enum_never_matches():
    # check_enum handles scalars only (json_schema_validate.c:704-726)
    assert jsonschema_is_valid('[1]', '{"enum": [[1], [2]]}') is False
    assert jsonschema_is_valid('1', '{"enum": [[1], 1]}') is True


def test_unique_items_container_dupes_undetectable():
    # container duplicates never compare equal (json_schema_validate.c:1170)
    assert jsonschema_is_valid('[{"a": 1}, {"a": 1}]', '{"uniqueItems": true}') is True
    assert jsonschema_is_valid('[[1], [1]]', '{"uniqueItems": true}') is True


def test_unique_items_numeric_cross_format():
    # numeric_eq is exact-value equality: 1 and 1.0 are duplicates
    assert jsonschema_is_valid('[1, 1.0]', '{"uniqueItems": true}') is False
    assert jsonschema_is_valid('[1, 1.5]', '{"uniqueItems": true}') is True


def test_min_length_is_byte_length():
    # str_len is the raw UTF-8 byte length (json_schema_validate.c:924-927):
    # "héllo" is 6 bytes / 5 code points
    assert jsonschema_is_valid('"h\\u00e9llo"', '{"maxLength": 5}') is False
    assert jsonschema_is_valid('"h\\u00e9llo"', '{"minLength": 6}') is True


def test_pattern_properties_values_never_validated():
    # patternProperties only exempts names inside additionalProperties; its
    # schemas are NEVER applied to values (json_schema_validate.c:1419-1449)
    schema = '{"patternProperties": {"^n_": {"type": "number"}}}'
    assert jsonschema_is_valid('{"n_x": "not a number"}', schema) is True
    # ...but the exemption works with additionalProperties: false
    schema2 = ('{"patternProperties": {"^n_": {"type": "number"}}, '
               '"additionalProperties": false}')
    assert jsonschema_is_valid('{"n_x": "still not a number"}', schema2) is True
    assert jsonschema_is_valid('{"other": 1}', schema2) is False


def test_ref_siblings_still_evaluated():
    # keywords alongside $ref still apply (json_schema_validate.c:400-408)
    schema = ('{"$defs": {"s": {"type": "string"}}, '
              '"properties": {"x": {"$ref": "#/$defs/s", "minLength": 5}}}')
    assert jsonschema_is_valid('{"x": "long enough"}', schema) is True
    assert jsonschema_is_valid('{"x": "ab"}', schema) is False  # sibling minLength
    assert jsonschema_is_valid('{"x": 12}', schema) is False    # ref type


def test_unresolved_ref_is_error():
    errs = jsonschema_validate('{"x": 1}', '{"properties": {"x": {"$ref": "#/nope"}}}')
    assert errs == [{"path": "x", "message": "Could not resolve $ref"}]


def test_ref_to_root():
    # "#" resolves to the root schema (json_schema_validate.c:1886-1892)
    schema = ('{"type": "object", "properties": {"child": {"$ref": "#"}}}')
    assert jsonschema_is_valid('{"child": {"child": {}}}', schema) is True
    assert jsonschema_is_valid('{"child": 5}', schema) is False


def test_ref_pointer_escapes():
    # ~0 -> ~ and ~1 -> / unescaping (json_schema_validate.c:1907-1934)
    schema = ('{"$defs": {"a/b": {"type": "number"}}, '
              '"properties": {"x": {"$ref": "#/$defs/a~1b"}}}')
    assert jsonschema_is_valid('{"x": 3}', schema) is True
    assert jsonschema_is_valid('{"x": "s"}', schema) is False


def test_invalid_regex_pattern_silently_passes():
    # regcomp failure -> check skipped, no error (json_schema_validate.c:189-198, 972)
    assert jsonschema_is_valid('"anything"', '{"pattern": "[invalid"}') is True


def test_ill_typed_keyword_values_skipped():
    # non-numeric minLength ignored (json_schema_validate.c:930); non-array
    # enum ignored (:689-694); boolean items ignored (jbvBool != jbvBinary)
    assert jsonschema_is_valid('"ab"', '{"minLength": "5"}') is True
    assert jsonschema_is_valid('"x"', '{"enum": "abc"}') is True
    assert jsonschema_is_valid('[1, 2]', '{"items": false}') is True
    # boolean bounds ignored (:1036, 1049)
    assert jsonschema_is_valid('3', '{"minimum": true}') is True


def test_array_form_items_trivially_passes():
    # items as an array (prefixItems form) is a jbvBinary container: each
    # element validates against the ARRAY schema which has no object keys ->
    # everything passes (json_schema_validate.c:1190-1217; README.md:608)
    assert jsonschema_is_valid('["x", 5]',
                               '{"items": [{"type": "number"}, {"type": "string"}]}') is True


def test_top_level_non_object_schema_fails():
    # json_schema_validate.c:333-338
    errs = jsonschema_validate('{}', '42')
    assert errs == [{"path": "", "message": "Schema must be an object or boolean"}]
    assert jsonschema_is_valid('{}', '[]') is False


def test_nested_non_object_schema_passes():
    # nested non-object schema silently passes (json_schema_validate.c:384)
    assert jsonschema_is_valid('{"x": 1}', '{"properties": {"x": 42}}') is True
    assert jsonschema_is_valid('{"x": 1}', '{"properties": {"x": "nope"}}') is True


def test_nested_boolean_schema():
    assert jsonschema_is_valid('{"x": 1}', '{"properties": {"x": false}}') is False
    assert jsonschema_is_valid('{"x": 1}', '{"properties": {"x": true}}') is True


def test_error_order_follows_pg_key_sort():
    # jsonb object keys iterate by (byte length, bytewise): "age" before
    # "name" even if schema listed name first (expected/json_schema_validate.out:561)
    errs = jsonschema_validate(
        '{"name": 123, "age": "old", "zz": 1, "aaa": 2}',
        '{"properties": {"name": {"type": "string"}, "age": {"type": "number"},'
        ' "zz": {"type": "string"}, "aaa": {"type": "boolean"}}}')
    assert [e["path"] for e in errs] == ["zz", "aaa", "age", "name"]


def test_path_format_array_indices():
    # "[i]" appended with no separator (json_schema_validate.c:2007-2023)
    errs = jsonschema_validate(
        '{"items": [{"id": "a"}]}',
        '{"properties": {"items": {"items": {"properties": {"id": {"type": "number"}}}}}}')
    assert errs == [{"path": "items[0]/id",
                     "message": "Expected type number but got string"}]


def test_exact_decimal_multiple_of():
    # numeric_mod is exact decimal (json_schema_validate.c:1064-1080)
    assert jsonschema_is_valid('4.5', '{"multipleOf": 1.5}') is True
    assert jsonschema_is_valid('0.3', '{"multipleOf": 0.1}') is True  # floats get this wrong
    assert jsonschema_is_valid('4.6', '{"multipleOf": 1.5}') is False


def test_integer_accepts_whole_float():
    # floor(x) == x semantics (json_schema_validate.c:617-632)
    assert jsonschema_is_valid('42.0', '{"type": "integer"}') is True
    assert jsonschema_is_valid('42.5', '{"type": "integer"}') is False


def test_boolean_is_not_number():
    # jbvBool never satisfies numeric constraints or type number
    assert jsonschema_is_valid('true', '{"type": "number"}') is False
    assert jsonschema_is_valid('true', '{"type": "integer"}') is False
    assert jsonschema_is_valid('true', '{"minimum": 5}') is True  # not numeric -> skip


def test_enum_null_matches_when_data_null():
    # case jbvNull: return true (json_schema_validate.c:706-707)
    assert jsonschema_is_valid('null', '{"enum": [null, 1]}') is True
    assert jsonschema_is_valid('null', '{"enum": [1, 2]}') is False


def test_min_contains_zero_passes_empty():
    assert jsonschema_is_valid('["a"]',
                               '{"contains": {"type": "number"}, "minContains": 0}') is True


def test_if_without_then_else_is_noop():
    # json_schema_validate.c:1656-1657
    assert jsonschema_is_valid('5', '{"if": {"type": "string"}}') is True


def test_required_error_order_is_array_order():
    errs = jsonschema_validate('{}', '{"required": ["zebra", "ant"]}')
    assert [e["message"] for e in errs] == [
        "Missing required property: zebra", "Missing required property: ant"]


def test_additional_properties_error_order_is_data_key_order():
    # data keys iterate in PG jsonb order: "c" (1 byte) before "bb" (2 bytes)
    errs = jsonschema_validate('{"bb": 1, "c": 2}',
                               '{"properties": {}, "additionalProperties": false}')
    assert [e["message"] for e in errs] == [
        "Additional property 'c' is not allowed",
        "Additional property 'bb' is not allowed"]


def test_type_array_error_message_says_unknown():
    # expected_type falls back to "unknown" for array-valued type
    # (json_schema_validate.c:419-423)
    errs = jsonschema_validate('42', '{"type": ["string", "null"]}')
    assert errs == [{"path": "", "message": "Expected type unknown but got number"}]


def test_suppressed_errors_in_composition():
    # anyOf/oneOf/not/if/contains sub-failures are invisible; only summary
    # errors surface (json_schema_validate.c:1551, 1594, 1626, 1660, 1250)
    errs = jsonschema_validate('true', '{"anyOf": [{"type": "string"}, {"type": "number"}]}')
    assert errs == [{"path": "", "message": "Value does not match any schema in anyOf"}]
    errs = jsonschema_validate('"x"', '{"oneOf": [{"type": "number"}, {"type": "boolean"}]}')
    assert errs == [{"path": "", "message": "Value does not match any schema in oneOf"}]


def test_one_of_match_count_message():
    errs = jsonschema_validate('2', '{"oneOf": [{"minimum": 0}, {"maximum": 3}]}')
    assert errs == [{"path": "",
                     "message": "Value matches 2 schemas in oneOf, but must match exactly one"}]


def test_unimplemented_keywords_ignored_like_reference():
    """The reference ignores keywords it does not implement (README.md
    Limitations: prefixItems, dependentRequired, dependentSchemas,
    unevaluated*, $id/$anchor) — both engine paths must too."""
    import pyarrow as pa
    from json_schema_validate_ray.functions.compiler import jsonschema_compile
    from json_schema_validate_ray.functions.evaluator import Evaluator
    from json_schema_validate_ray.stages.vectorized import TablePlan

    schema = {
        "type": "object",
        "properties": {
            "a": {"type": "integer", "dependentRequired": {"a": ["b"]},
                  "unevaluatedProperties": False},
        },
        "dependentSchemas": {"a": {"required": ["zzz"]}},
        "$id": "https://example.com/x",
        "prefixItems": [{"type": "string"}],
    }
    doc = {"a": 1}
    assert Evaluator(jsonschema_compile(schema)).validate_document(doc, None)
    plan = TablePlan(schema)
    valid, viol = plan.evaluate_batch(pa.table({"a": [1, None]}))
    assert list(valid) == [True, True] and not viol
