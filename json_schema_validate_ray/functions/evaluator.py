"""Recursive JSON-Schema evaluator — the parity core.

A quirk-faithful from-scratch reimplementation of the reference's recursive
interpreter ``validate_value_with_root`` (json_schema_validate.c:363-549) and
every ``check_*`` helper it dispatches to.  Keyword evaluation order is fixed
and determines error order:

    $ref -> type -> enum -> const -> allOf -> anyOf -> oneOf -> not ->
    if/then/else -> string(+format) -> number -> object(required ->
    properties -> additionalProperties -> propertyNames -> min/maxProperties)
    -> array(minItems -> maxItems -> uniqueItems -> items -> contains)

All checks run even after a failure (error accumulation, no short-circuit),
EXCEPT sub-validations inside anyOf/oneOf/not/if/contains which run with
errors suppressed (the C ``errors == NULL`` convention,
json_schema_validate.c:1551, 1594, 1626, 1660, 1250).

Replicated quirks (see SURVEY.md §1.2):
  * containers never compare equal (const/enum/uniqueItems),
    json_schema_validate.c:1330-1340
  * patternProperties only EXEMPTS key names inside additionalProperties; its
    schemas are never applied to values, json_schema_validate.c:1419-1449
  * string lengths are byte lengths, json_schema_validate.c:924-927
  * ``integer`` = number with floor(x) == x, json_schema_validate.c:617-632
  * exact-decimal multipleOf, json_schema_validate.c:1061-1081
  * object iteration in PG jsonb key order (byte length, then bytewise) fixes
    error ordering, expected/json_schema_validate.out:555-562
  * ill-typed keyword values are silently skipped (non-numeric minLength,
    non-array enum, boolean ``items``, ...), json_schema_validate.c:675, 930
  * $ref siblings still evaluated, json_schema_validate.c:400-408
  * invalid regex pattern -> check silently passes, json_schema_validate.c:189-198
"""

from __future__ import annotations

from typing import Any, Optional

from .compiler import FORMAT_TABLE, _FORMAT_REGEXES, CompiledSchema, RegexCache, jsonschema_compile, translate_posix_pattern
from .jsonvalue import (
    build_path,
    is_integral_number,
    is_number,
    json_type_name,
    numeric_to_int,
    parse_json,
    pg_sorted_keys,
    scalars_equal,
    to_decimal,
    utf8_len,
)

import re

ErrorList = Optional[list]  # list of {"path":..., "message":...} dicts, or None to suppress


def _append_error(errors: ErrorList, path: str, message: str) -> None:
    if errors is not None:
        errors.append({"path": path, "message": message})


def _is_schema_number(v) -> bool:
    # keyword bounds apply only when the schema value is jbvNumeric
    # (booleans are ignored, json_schema_validate.c:1036, 1049)
    return is_number(v)


class Evaluator:
    """Evaluates documents against one compiled schema; holds the regex cache
    (the reference's per-backend session state, json_schema_validate.c:88-92)."""

    def __init__(self, compiled: CompiledSchema) -> None:
        self.compiled = compiled
        self.regexes: RegexCache = compiled.regex_cache
        # per-subschema numeric-keyword plans, keyed by id(schema dict):
        # schema dicts are owned by the CompiledSchema and immutable for the
        # evaluator's lifetime, so the id is a stable memo key.  Avoids five
        # dict lookups + keyword-type validations per NUMBER per element in
        # the hot items loop.
        self._num_plans: dict = {}
        # dispatch plans: per-subschema keyword-presence flags (same id()
        # memo rationale) — lets the per-element hot loop skip whole check
        # families without re-probing the dict twelve times per value
        self._dispatch_plans: dict = {}

    # -- top level -------------------------------------------------------

    def validate_document(self, data, errors: ErrorList):
        """Top-level entry mirroring validate_jsonb_internal
        (json_schema_validate.c:317-358)."""
        schema = self.compiled.schema
        if isinstance(schema, bool):
            return schema
        if not isinstance(schema, dict):
            _append_error(errors, "", "Schema must be an object or boolean")
            return False
        return self._validate(data, schema, "", errors, schema)

    # -- recursive dispatcher -------------------------------------------

    def _validate(self, data, schema, path: str, errors: ErrorList, root) -> bool:
        # validate_value_with_root, json_schema_validate.c:363-549
        if isinstance(schema, bool):
            return schema
        if not isinstance(schema, dict):
            return True  # non-object nested schema, assume valid (:384)

        valid = True

        plan = self._dispatch_plans.get(id(schema))
        if plan is None:
            plan = ("$ref" in schema, "enum" in schema, "const" in schema,
                    "allOf" in schema or "anyOf" in schema or "oneOf" in schema
                    or "not" in schema, "if" in schema)
            self._dispatch_plans[id(schema)] = plan
        has_ref, has_enum, has_const, has_comp, has_if = plan

        if has_ref:
            ref = schema.get("$ref")
            if isinstance(ref, str) and root is not None:
                resolved, found = self._resolve_ref(ref, root)
                if found:
                    if not self._validate(data, resolved, path, errors, root):
                        valid = False
                else:
                    _append_error(errors, path, "Could not resolve $ref")
                    valid = False
                # siblings of $ref still evaluated (:406-408)

        if "type" in schema:
            type_val = schema["type"]
            if not self._check_type(data, type_val):
                expected = type_val if isinstance(type_val, str) else "unknown"
                _append_error(
                    errors, path,
                    f"Expected type {expected} but got {json_type_name(data)}")
                valid = False

        if has_enum and not self._check_enum(data, schema["enum"]):
            _append_error(errors, path, "Value not in enum")
            valid = False

        if has_const and not scalars_equal(data, schema["const"]):
            _append_error(errors, path, "Value does not match const")
            valid = False

        if has_comp:
            if "allOf" in schema:
                if not self._check_all_of(data, schema["allOf"], path, errors, root):
                    valid = False

            if "anyOf" in schema:
                if not self._check_any_of(data, schema["anyOf"], path, errors, root):
                    valid = False

            if "oneOf" in schema:
                if not self._check_one_of(data, schema["oneOf"], path, errors, root):
                    valid = False

            if "not" in schema:
                if self._validate(data, schema["not"], path, None, root):
                    _append_error(errors, path, "Value must not match the schema in 'not'")
                    valid = False

        if has_if and not self._check_if_then_else(data, schema, path, errors, root):
            valid = False

        if isinstance(data, str):
            if not self._check_string_constraints(data, schema, path, errors):
                valid = False
            if "format" in schema:
                if not self._check_format(data, schema["format"], path, errors):
                    valid = False

        if is_number(data):
            if not self._check_number_constraints(data, schema, path, errors):
                valid = False

        if isinstance(data, dict):
            if "required" in schema:
                if not self._check_required(data, schema["required"], path, errors):
                    valid = False
            if not self._check_properties(data, schema, path, errors, root):
                valid = False
            if not self._check_additional_properties(data, schema, path, errors, root):
                valid = False
            if "propertyNames" in schema:
                if not self._check_property_names(data, schema["propertyNames"], path, errors, root):
                    valid = False
            if not self._check_object_size(data, schema, path, errors):
                valid = False

        if isinstance(data, list):
            if not self._check_array_constraints(data, schema, path, errors, root):
                valid = False

        return valid

    # -- keyword checks --------------------------------------------------

    def _check_single_type(self, data, type_str: str) -> bool:
        # check_single_type, json_schema_validate.c:611-638
        actual = json_type_name(data)
        if type_str == "integer":
            return actual == "number" and is_integral_number(data)
        return type_str == actual

    def _check_type(self, data, type_val) -> bool:
        # check_type, json_schema_validate.c:643-676
        if isinstance(type_val, str):
            return self._check_single_type(data, type_val)
        if isinstance(type_val, list):
            for t in type_val:
                if isinstance(t, str) and self._check_single_type(data, t):
                    return True
            return False
        return True  # invalid type specification -> skip check

    def _check_enum(self, data, enum_val) -> bool:
        # check_enum, json_schema_validate.c:681-731 — scalar-only membership
        if not isinstance(enum_val, list):
            return True
        for item in enum_val:
            if scalars_equal(data, item):
                return True
        return False

    def _check_all_of(self, data, all_of, path, errors, root) -> bool:
        if not isinstance(all_of, list):
            return True
        valid = True
        for sub in all_of:
            if not self._validate(data, sub, path, errors, root):
                valid = False  # keep going: report all errors (:1514-1518)
        return valid

    def _check_any_of(self, data, any_of, path, errors, root) -> bool:
        if not isinstance(any_of, list):
            return True
        for sub in any_of:
            if self._validate(data, sub, path, None, root):
                return True  # short-circuits on first match (:1554)
        _append_error(errors, path, "Value does not match any schema in anyOf")
        return False

    def _check_one_of(self, data, one_of, path, errors, root) -> bool:
        # counts matches across ALL branches, no short-circuit (:1588-1597)
        if not isinstance(one_of, list):
            return True
        match_count = 0
        for sub in one_of:
            if self._validate(data, sub, path, None, root):
                match_count += 1
        if match_count == 0:
            _append_error(errors, path, "Value does not match any schema in oneOf")
            return False
        if match_count > 1:
            _append_error(
                errors, path,
                f"Value matches {match_count} schemas in oneOf, but must match exactly one")
            return False
        return True

    def _check_if_then_else(self, data, schema, path, errors, root) -> bool:
        # check_if_then_else, json_schema_validate.c:1640-1682
        if "if" not in schema:
            return True
        then_val = schema.get("then")
        else_val = schema.get("else")
        has_then = "then" in schema
        has_else = "else" in schema
        if not has_then and not has_else:
            return True  # if alone is a no-op (:1656-1657)
        if self._validate(data, schema["if"], path, None, root):
            if has_then:
                return self._validate(data, then_val, path, errors, root)
        else:
            if has_else:
                return self._validate(data, else_val, path, errors, root)
        return True

    def _check_string_constraints(self, s: str, schema, path, errors) -> bool:
        # check_string_constraints, json_schema_validate.c:915-992
        valid = True
        length = utf8_len(s)  # BYTE length (:927)

        minlen_val = schema.get("minLength")
        if _is_schema_number(minlen_val):
            minlen = numeric_to_int(minlen_val)
            if length < minlen:
                _append_error(errors, path,
                              f"String length {length} is less than minLength {minlen}")
                valid = False

        maxlen_val = schema.get("maxLength")
        if _is_schema_number(maxlen_val):
            maxlen = numeric_to_int(maxlen_val)
            if length > maxlen:
                _append_error(errors, path,
                              f"String length {length} exceeds maxLength {maxlen}")
                valid = False

        pattern_val = schema.get("pattern")
        if isinstance(pattern_val, str):
            regex = self.regexes.get(pattern_val)
            if regex is not None:  # invalid regex -> check silently passes
                if regex.search(s) is None:
                    _append_error(errors, path,
                                  f"String does not match pattern: {pattern_val}")
                    valid = False
        return valid

    def _check_format(self, s: str, format_val, path, errors) -> bool:
        # check_format, json_schema_validate.c:1797-1860
        if not isinstance(format_val, str):
            return True
        if format_val == "regex":
            # data string must itself compile as a regex (:1816-1829)
            try:
                re.compile(translate_posix_pattern(s))
                return True
            except re.error:
                _append_error(errors, path, "String is not a valid regular expression")
                return False
        entry = _FORMAT_REGEXES.get(format_val)
        if entry is None:
            return True  # unknown formats ignored (:1853)
        if entry.search(s) is None:
            _append_error(errors, path, FORMAT_TABLE[format_val][1])
            return False
        return True

    def _numeric_plan(self, schema: dict):
        """Memoized numeric keyword extraction (None when absent/ill-typed —
        the reference silently skips non-numeric keyword values)."""
        key = id(schema)
        plan = self._num_plans.get(key)
        if plan is None:
            def kw(name):
                v = schema.get(name)
                return v if _is_schema_number(v) else None
            plan = (kw("minimum"), kw("maximum"), kw("exclusiveMinimum"),
                    kw("exclusiveMaximum"), kw("multipleOf"))
            self._num_plans[key] = plan
        return plan

    def _check_number_constraints(self, data, schema, path, errors) -> bool:
        # check_number_constraints, json_schema_validate.c:997-1084
        mn, mx, emn, emx, mult = self._numeric_plan(schema)
        if mn is None and mx is None and emn is None and emx is None                 and mult is None:
            return True
        valid = True
        # int fast path: for int data vs int bounds, native comparison and
        # modulo are EXACT and identical to the decimal semantics below
        # (divisibility is sign-convention-free); Decimal only when a float
        # is involved — that is where the exact-decimal quirks live.  The
        # per-element hot loop (items over token arrays) is all-int.
        data_is_int = type(data) is int

        if mn is not None:
            if (data < mn if data_is_int and type(mn) is int
                    else to_decimal(data) < to_decimal(mn)):
                _append_error(errors, path, "Value is less than minimum")
                valid = False

        if mx is not None:
            if (data > mx if data_is_int and type(mx) is int
                    else to_decimal(data) > to_decimal(mx)):
                _append_error(errors, path, "Value exceeds maximum")
                valid = False

        if emn is not None:
            if (data <= emn if data_is_int and type(emn) is int
                    else to_decimal(data) <= to_decimal(emn)):
                _append_error(errors, path, "Value must be greater than exclusiveMinimum")
                valid = False

        if emx is not None:
            if (data >= emx if data_is_int and type(emx) is int
                    else to_decimal(data) >= to_decimal(emx)):
                _append_error(errors, path, "Value must be less than exclusiveMaximum")
                valid = False

        if mult is not None:
            # exact decimal numeric_mod(x, m) == 0 (:1064-1080), so
            # 4.5 multipleOf 1.5 is true (sql/json_schema_validate.sql:329)
            if data_is_int and type(mult) is int and mult != 0:
                bad = data % mult != 0
            else:
                bad = to_decimal(data) % to_decimal(mult) != 0
            if bad:
                _append_error(errors, path, "Value is not a multiple of multipleOf")
                valid = False
        return valid

    def _check_required(self, data: dict, required_val, path, errors) -> bool:
        # check_required, json_schema_validate.c:736-780 — array order preserved
        if not isinstance(required_val, list):
            return True
        valid = True
        for prop in required_val:
            if isinstance(prop, str) and prop not in data:
                _append_error(errors, path, f"Missing required property: {prop}")
                valid = False
        return valid

    def _check_properties(self, data: dict, schema, path, errors, root) -> bool:
        # check_properties, json_schema_validate.c:785-837; iterates schema
        # props in PG jsonb key order — this fixes error ordering
        props = schema.get("properties")
        if not isinstance(props, dict):
            return True
        valid = True
        for prop_name in pg_sorted_keys(props):
            if prop_name in data:
                prop_path = build_path(path, prop_name)
                if not self._validate(data[prop_name], props[prop_name],
                                      prop_path, errors, root):
                    valid = False
        return valid

    def _check_additional_properties(self, data: dict, schema, path, errors, root) -> bool:
        # check_additional_properties, json_schema_validate.c:1358-1487.
        # patternProperties only EXEMPTS names here; its schemas are NEVER
        # applied to values (:1419-1449) — spec deviation replicated.
        if "additionalProperties" not in schema:
            return True
        addl = schema["additionalProperties"]
        if addl is True:
            return True

        props = schema.get("properties")
        props_obj = props if isinstance(props, dict) else None
        pattern_props = schema.get("patternProperties")

        valid = True
        for prop_name in pg_sorted_keys(data):
            is_defined = props_obj is not None and prop_name in props_obj
            matches_pattern = False
            if not is_defined and isinstance(pattern_props, dict):
                for pattern in pg_sorted_keys(pattern_props):
                    regex = self.regexes.get(pattern)
                    if regex is not None and regex.search(prop_name) is not None:
                        matches_pattern = True
                        break
            if not is_defined and not matches_pattern:
                if addl is False:
                    _append_error(errors, path,
                                  f"Additional property '{prop_name}' is not allowed")
                    valid = False
                elif isinstance(addl, (dict, list)):
                    prop_path = build_path(path, prop_name)
                    if not self._validate(data[prop_name], addl, prop_path, errors, root):
                        valid = False
        return valid

    def _check_property_names(self, data: dict, names_schema, path, errors, root) -> bool:
        # check_property_names, json_schema_validate.c:842-882
        valid = True
        for key in pg_sorted_keys(data):
            key_path = build_path(path, key)
            if not self._validate(key, names_schema, key_path, errors, root):
                valid = False
        return valid

    def _check_object_size(self, data: dict, schema, path, errors) -> bool:
        # check_object_size_constraints, json_schema_validate.c:1687-1740
        valid = True
        count = len(data)
        v = schema.get("minProperties")
        if _is_schema_number(v):
            bound = numeric_to_int(v)
            if count < bound:
                _append_error(errors, path,
                              f"Object has {count} properties, minimum is {bound}")
                valid = False
        v = schema.get("maxProperties")
        if _is_schema_number(v):
            bound = numeric_to_int(v)
            if count > bound:
                _append_error(errors, path,
                              f"Object has {count} properties, maximum is {bound}")
                valid = False
        return valid

    def _array_plan(self, schema: dict):
        """Memoized array-keyword extraction (bounds pre-converted; same
        id() rationale as _numeric_plan)."""
        key = id(schema)
        plan = self._num_plans.get(("arr", key))
        if plan is None:
            v = schema.get("minItems")
            mn = numeric_to_int(v) if _is_schema_number(v) else None
            v = schema.get("maxItems")
            mx = numeric_to_int(v) if _is_schema_number(v) else None
            plan = (mn, mx)
            self._num_plans[("arr", key)] = plan
        return plan

    def _check_array_constraints(self, data: list, schema, path, errors, root) -> bool:
        # check_array_constraints, json_schema_validate.c:1089-1282
        valid = True
        count = len(data)

        mn, mx = self._array_plan(schema)
        if mn is not None and count < mn:
            _append_error(errors, path,
                          f"Array has {count} items, minimum is {mn}")
            valid = False

        if mx is not None and count > mx:
            _append_error(errors, path,
                          f"Array has {count} items, maximum is {mx}")
            valid = False

        unique_val = schema.get("uniqueItems")
        if unique_val is True:
            # O(n^2) pairwise scalar equality in the reference (:1148-1188);
            # same semantics (containers never equal) done in O(n) via a seen-set
            # over (type, canonical value) for scalars only.
            seen = set()
            has_duplicate = False
            for item in data:
                if isinstance(item, (list, dict)):
                    continue  # container dupes undetectable (quirk)
                if is_number(item):
                    d = to_decimal(item)
                    key = ("number", "0" if d == 0 else str(d.normalize()))
                else:
                    key = (json_type_name(item), item)
                if key in seen:
                    has_duplicate = True
                    break
                seen.add(key)
            if has_duplicate:
                _append_error(errors, path, "Array items are not unique")
                valid = False

        items_val = schema.get("items")
        if isinstance(items_val, (dict, list)):
            # single-schema form; an array-form items is a container too and
            # (matching the reference) validates every element trivially true
            for idx, elem in enumerate(data):
                elem_path = build_path(path, f"[{idx}]")
                if not self._validate(elem, items_val, elem_path, errors, root):
                    valid = False

        if "contains" in schema:
            contains_val = schema["contains"]
            min_contains = 1
            max_contains = -1
            v = schema.get("minContains")
            if _is_schema_number(v):
                min_contains = numeric_to_int(v)
            v = schema.get("maxContains")
            if _is_schema_number(v):
                max_contains = numeric_to_int(v)
            contains_count = 0
            for elem in data:
                # errors suppressed while counting (:1250)
                if self._validate(elem, contains_val, path, None, root):
                    contains_count += 1
            if contains_count < min_contains:
                if min_contains == 1:
                    _append_error(errors, path,
                                  "Array does not contain any item matching the contains schema")
                else:
                    _append_error(errors, path,
                                  f"Array contains {contains_count} matching items, minimum is {min_contains}")
                valid = False
            if 0 <= max_contains < contains_count:
                _append_error(errors, path,
                              f"Array contains {contains_count} matching items, maximum is {max_contains}")
                valid = False
        return valid

    # -- $ref ------------------------------------------------------------

    def _resolve_ref(self, ref: str, root):
        """resolve_ref, json_schema_validate.c:1866-1960.  Local ``#...`` refs
        only; JSON-Pointer walk over OBJECT keys only (array-index steps
        unsupported, :1936); ``~0``/``~1`` unescaped; a scalar found mid-walk
        terminates the walk and IS the result (:1949-1953).
        Returns (resolved_value, found_bool)."""
        if not ref.startswith("#"):
            return None, False
        rest = ref[1:]
        if rest == "" or rest == "/":
            return root, True
        if rest.startswith("/"):
            rest = rest[1:]
        current = root
        result = None
        found_any = False
        # strtok_r collapses consecutive separators, so filter empty tokens
        for token in rest.split("/"):
            if token == "":
                continue
            token = token.replace("~1", "/").replace("~0", "~")
            if not isinstance(current, dict):
                return None, False  # object-key lookup only
            if token not in current:
                return None, False
            found = current[token]
            found_any = True
            if isinstance(found, (dict, list)):
                current = found
                result = found
            else:
                return found, True  # scalar terminates the walk
        return (result, True) if found_any else (None, False)


# ---------------------------------------------------------------------------
# Public per-document API mirroring the SQL surface
# (json_schema_validate--0.1.0.sql:6-33; C entries json_schema_validate.c:204-312)
# ---------------------------------------------------------------------------

def _coerce_schema(schema) -> CompiledSchema:
    if isinstance(schema, CompiledSchema):
        return schema
    return jsonschema_compile(schema)


def _coerce_data(data):
    if isinstance(data, str):
        return parse_json(data)
    return data


def jsonschema_is_valid(data, schema) -> bool:
    """``jsonschema_is_valid(data, schema) -> bool``.  ``data`` given as JSON
    text is parsed (the reference's ``json`` overload); a parsed value is used
    as-is (``jsonb`` overload); ``schema`` may be JSON text, a parsed value,
    or a ``CompiledSchema``."""
    ev = Evaluator(_coerce_schema(schema))
    return ev.validate_document(_coerce_data(data), None)


def jsonschema_validate(data, schema) -> list:
    """``jsonschema_validate(data, schema)`` -> list of error objects
    ``{"path": ..., "message": ...}``; ``[]`` when valid (NOT None —
    expected/json_schema_validate.out:1134)."""
    errors: list = []
    ev = Evaluator(_coerce_schema(schema))
    ev.validate_document(_coerce_data(data), errors)
    return errors


def render_errors_json(errors: list) -> str:
    """Raw-text rendering of the error array, byte-matching the reference's
    ``json`` variant (hand-serialized, no spaces: json_schema_validate.c:1965-2002,
    expected/json_schema_validate.out:576)."""
    from .jsonvalue import escape_error_message
    parts = []
    for e in errors:
        parts.append('{"path":"%s","message":"%s"}'
                     % (e["path"], escape_error_message(e["message"])))
    return "[" + ",".join(parts) + "]"


def render_errors_jsonb(errors: list) -> str:
    """PG-jsonb-normalized rendering (what the ``jsonb`` variant prints after
    a jsonb round-trip: keys in PG sort order — "path" before "message" — with
    ", "/": " separators, expected/json_schema_validate.out:540)."""
    parts = []
    for e in errors:
        parts.append('{"path": "%s", "message": "%s"}'
                     % (e["path"], e["message"].replace("\\", "\\\\").replace('"', '\\"')))
    return "[" + ", ".join(parts) + "]"


def jsonschema_validate_text(data, schema) -> str:
    """Error array as raw JSON text (the ``json``-overload behavior)."""
    return render_errors_json(jsonschema_validate(data, schema))
