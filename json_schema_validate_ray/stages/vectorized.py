"""Vectorized table-schema validation: JSON-Schema semantics over Arrow batches.

This is the engine's hot path.  A JSON schema of the "flat table" shape

    {"type": "object", "required": [...],
     "properties": {column: column_subschema, ...}}

is compiled ONCE into per-column kernel plans evaluated with pyarrow.compute /
numpy over whole batches — no Python loop over rows.  Column subschemas using
only vectorizable keywords (type, enum, const, bounds, multipleOf, string
length/pattern/format, minItems/maxItems/uniqueItems, scalar ``items``,
``contains``) run fully vectorized; any other subschema falls back to the
per-row parity evaluator for THAT COLUMN only (the reference's recursive
interpreter semantics, json_schema_validate.c:363-549).

Data-model mapping (documented design decision): an Arrow NULL in a column is
the JSON "property missing" state — ``required`` flags it, all other checks
skip it (mirroring check_properties validating only keys present in the data,
json_schema_validate.c:823-830).

Violation rows carry ``(doc_id, constraint_id, path, message, observed)`` with
message strings identical to the reference's error strings
(json_schema_validate.c:418-424, 939, 956, 980, 1017-1078, 1120, 1137, 1185,
1261-1274).  For element-level (``items``) violations, ONE row per (document,
constraint) is emitted for the first failing element, with the total failing
count in ``observed`` — a documented explosion cap (SURVEY.md §7.3 #5); the
per-document evaluator path reports every element when exact parity is needed.
"""

from __future__ import annotations

import json
import re
from fractions import Fraction
from typing import Callable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.compiler import FORMAT_TABLE, CompiledSchema, jsonschema_compile, translate_posix_pattern
from ..functions.evaluator import Evaluator
from ..functions.jsonvalue import is_number, numeric_to_int, scalars_equal, utf8_len

VIOLATION_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("constraint_id", pa.string()),
    ("path", pa.string()),
    ("message", pa.string()),
    ("observed", pa.string()),
])

VECTORIZABLE_KEYWORDS = {
    "type", "enum", "const",
    "minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum", "multipleOf",
    "minLength", "maxLength", "pattern", "format",
    "minItems", "maxItems", "uniqueItems", "items",
    "contains", "minContains", "maxContains",
}

_ITEM_KEYWORDS = {"type", "minimum", "maximum", "exclusiveMinimum",
                  "exclusiveMaximum", "enum", "const", "minLength", "maxLength",
                  "pattern"}

# ``contains`` kernels implement exactly these keywords (_contains_violations);
# anything else drops the COLUMN to the per-row parity evaluator.
_CONTAINS_KEYWORDS = {"type", "minimum", "maximum", "exclusiveMinimum",
                      "exclusiveMaximum", "const"}

# Object-shaped subschemas over Arrow STRUCT columns stay vectorized when
# they use only these keywords (recursing into fields via pc.struct_field);
# anything else (patternProperties, propertyNames, schema-form
# additionalProperties, ...) drops the column to the per-row evaluator.
_OBJECT_KEYWORDS = {"type", "enum", "const", "properties", "required",
                    "minProperties", "maxProperties", "additionalProperties",
                    "propertyNames"}


def _strip_struct_nones(v):
    """Arrow-struct convention: a null field is the JSON 'key absent' state
    (same rule as top-level columns).  Applied before handing struct-column
    values to the per-row evaluator so both paths agree."""
    if isinstance(v, dict):
        return {k: _strip_struct_nones(x) for k, x in v.items() if x is not None}
    if isinstance(v, list):
        return [_strip_struct_nones(x) for x in v]
    return v


def _dtype_contains_struct(dt: pa.DataType) -> bool:
    if pa.types.is_struct(dt):
        return True
    if pa.types.is_list(dt) or pa.types.is_large_list(dt) or pa.types.is_fixed_size_list(dt):
        return _dtype_contains_struct(dt.value_type)
    return False


def _observed(v, limit: int = 128) -> str:
    try:
        s = json.dumps(v, default=str)
    except TypeError:
        s = str(v)
    return s if len(s) <= limit else s[:limit] + "..."


def _json_type_of_arrow(dtype: pa.DataType) -> str:
    if pa.types.is_string(dtype) or pa.types.is_large_string(dtype):
        return "string"
    if pa.types.is_boolean(dtype):
        return "boolean"
    if pa.types.is_integer(dtype):
        return "integer"   # subset of "number"
    if pa.types.is_floating(dtype) or pa.types.is_decimal(dtype):
        return "number"
    if pa.types.is_list(dtype) or pa.types.is_large_list(dtype) or pa.types.is_fixed_size_list(dtype):
        return "array"
    if pa.types.is_struct(dtype) or pa.types.is_map(dtype):
        return "object"
    if pa.types.is_temporal(dtype):
        return "string"    # timestamps surface as strings in JSON
    return "unknown"


def _np_bool(mask) -> np.ndarray:
    """Arrow boolean array/scalar-result -> dense numpy bool (nulls = False)."""
    if isinstance(mask, np.ndarray):
        return mask
    if isinstance(mask, pa.ChunkedArray):
        mask = mask.combine_chunks()
    return mask.fill_null(False).to_numpy(zero_copy_only=False)


def _numeric_numpy(arr: pa.Array, notnull: np.ndarray) -> Optional[np.ndarray]:
    """Numeric Arrow array -> numpy values for bound checks, zero-copy when
    null-free.  Comparing in numpy against a scalar of the SAME kind avoids
    pyarrow's whole-array cast to float64 (a silent 10x on int32 columns)."""
    if not (pa.types.is_integer(arr.type) or pa.types.is_floating(arr.type)):
        return None
    if arr.null_count == 0:
        return arr.to_numpy(zero_copy_only=True)
    return arr.fill_null(0).to_numpy(zero_copy_only=False)


def _bound_value(v, vals: np.ndarray):
    """Bound as the cheapest comparable scalar: keep integral bounds integral
    so int columns compare without promotion."""
    from decimal import Decimal
    if isinstance(v, Decimal):
        v = int(v) if v == v.to_integral_value() else float(v)
    if isinstance(v, float) and v.is_integer() and vals.dtype.kind in "iu":
        return int(v)
    return v


def _enum_value_set(dtype: pa.DataType, entries) -> tuple[Optional[pa.Array], bool]:
    """Enum/const entries that can possibly equal a NON-NULL value of this
    Arrow type under JSON type-strict equality (bool != number, containers
    never equal, 2.0 == 2).  Returns ``(value_set, exact)``:
    ``(arr, True)`` -> use pc.is_in/pc.equal; ``(None, True)`` -> no entry can
    match (every present value fails); ``(None, False)`` -> dtype isn't
    kernelized, caller must fall back to per-value scalars_equal."""
    is_bool = pa.types.is_boolean(dtype)
    is_int = pa.types.is_integer(dtype)
    is_num = is_int or pa.types.is_floating(dtype) or pa.types.is_decimal(dtype)
    is_str = pa.types.is_string(dtype) or pa.types.is_large_string(dtype)
    if not (is_bool or is_num or is_str):
        return None, False
    out = []
    for v in entries:
        if isinstance(v, bool):
            if is_bool:
                out.append(v)
        elif isinstance(v, (int, float)):
            if is_num:
                if is_int and isinstance(v, float):
                    if v.is_integer():
                        out.append(int(v))
                else:
                    out.append(v)
        elif isinstance(v, str):
            if is_str:
                out.append(v)
        # None / containers never equal a non-null scalar value
    if not out:
        return None, True
    if is_num and not is_int:
        # Arrow's hash-based is_in distinguishes -0.0 from 0.0 (bit-pattern
        # hash) while JSON/decimal equality does not: cover both signs
        zeros = [v for v in out if isinstance(v, (int, float)) and v == 0]
        if zeros:
            out.extend([0.0, -0.0])
    try:
        return pa.array(out, type=dtype), True
    except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
        return None, False


def _enum_bad_fallback(arr: pa.Array, entries) -> np.ndarray:
    """Per-value parity equality (scalars_equal) for dtypes the is_in kernel
    can't take — rare path, bounded by batch size.  Nulls = missing -> pass."""
    return np.array([v is not None and not any(scalars_equal(v, e) for e in entries)
                     for v in arr.to_pylist()], dtype=bool)


# (keyword, violated-predicate, reference message) for numeric bounds,
# json_schema_validate.c:1009-1058
_NUMERIC_BOUNDS = (
    ("minimum", lambda v, b: v < b, "Value is less than minimum"),
    ("maximum", lambda v, b: v > b, "Value exceeds maximum"),
    ("exclusiveMinimum", lambda v, b: v <= b, "Value must be greater than exclusiveMinimum"),
    ("exclusiveMaximum", lambda v, b: v >= b, "Value must be less than exclusiveMaximum"),
)


class ColumnViolation:
    """One vectorized constraint's result on one batch column."""
    __slots__ = ("constraint_id", "bad", "detail")

    def __init__(self, constraint_id: str, bad: np.ndarray,
                 detail: Callable[[int], tuple[str, str, str]]):
        self.constraint_id = constraint_id
        self.bad = bad           # np.bool_ mask over batch rows (True = violation)
        self.detail = detail     # row index -> (path, message, observed)


class ColumnCheckPlan:
    """Compiled kernels for one column's subschema."""

    def __init__(self, col: str, subschema, compiled: CompiledSchema):
        self.col = col
        self.subschema = subschema
        self.compiled = compiled
        self._children: Optional[dict] = None   # struct-field sub-plans
        self.vectorized = (
            isinstance(subschema, dict)
            and set(subschema.keys()) <= VECTORIZABLE_KEYWORDS
            and self._items_vectorizable(subschema.get("items"))
            and self._contains_vectorizable(subschema.get("contains"))
        ) or isinstance(subschema, bool)
        if not self.vectorized and isinstance(subschema, dict):
            self.vectorized = self._object_vectorizable(subschema)
        # fallback evaluator built lazily per worker (not picklable state)
        self._row_eval: Optional[Evaluator] = None

    def _object_vectorizable(self, s: dict) -> bool:
        """Object-shaped subschema -> compile per-field sub-plans (recursive);
        vectorizable iff every keyword and every field subschema is."""
        keys = set(s.keys())
        if not keys & {"properties", "required", "minProperties",
                       "maxProperties", "additionalProperties",
                       "propertyNames"}:
            return False
        if not keys <= _OBJECT_KEYWORDS:
            return False
        if "propertyNames" in s and not isinstance(s["propertyNames"], (dict, bool)):
            return False
        if "additionalProperties" in s and not isinstance(s["additionalProperties"], bool):
            return False   # schema-form additionalProperties -> row fallback
        if "required" in s and not isinstance(s["required"], list):
            return False
        props = s.get("properties", {})
        if props is not None and not isinstance(props, dict):
            return False
        children = {name: ColumnCheckPlan(f"{self.col}/{name}", sub, None)
                    for name, sub in (props or {}).items()}
        if not all(ch.vectorized for ch in children.values()):
            return False
        self._children = children
        return True

    @staticmethod
    def _items_vectorizable(items) -> bool:
        if items is None or isinstance(items, list):
            return True
        return isinstance(items, dict) and set(items.keys()) <= _ITEM_KEYWORDS

    @staticmethod
    def _contains_vectorizable(contains) -> bool:
        if contains is None:
            return True
        if not (isinstance(contains, dict) and set(contains.keys()) <= _CONTAINS_KEYWORDS):
            return False
        # list-form ``type`` inside contains is not kernelized -> fallback
        return not ("type" in contains and not isinstance(contains["type"], str))

    # ------------------------------------------------------------------
    def evaluate(self, arr: pa.Array) -> list[ColumnViolation]:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        notnull = _np_bool(pc.is_valid(arr))
        if isinstance(self.subschema, bool):
            if self.subschema:
                return []
            bad = notnull.copy()
            col = self.col
            return [ColumnViolation(f"{col}/false_schema", bad,
                                    lambda i: (col, "Schema is false", "present"))]
        if not isinstance(self.subschema, dict):
            return []
        if self.vectorized:
            return self._evaluate_vectorized(arr, notnull)
        return self._evaluate_fallback(arr, notnull)

    # ------------------------------------------------------------------
    def _evaluate_fallback(self, arr: pa.Array, notnull: np.ndarray) -> list[ColumnViolation]:
        """Per-row parity evaluation of a non-vectorizable subschema (rare path)."""
        if self._row_eval is None:
            self._row_eval = Evaluator(jsonschema_compile(self.subschema))
        values = arr.to_pylist()
        if _dtype_contains_struct(arr.type):
            # struct convention: null field == key absent (engine-wide rule)
            values = [_strip_struct_nones(v) for v in values]
        col = self.col
        bad = np.zeros(len(values), dtype=bool)
        errors_by_row: dict[int, list] = {}
        for i, v in enumerate(values):
            if not notnull[i]:
                continue
            errs: list = []
            # the column subschema is its own root for $ref resolution
            if not self._row_eval._validate(v, self.subschema, col, errs, self.subschema):
                bad[i] = True
                errors_by_row[i] = errs

        def detail(i: int):
            errs = errors_by_row.get(i, [])
            first = errs[0] if errs else {"path": col, "message": "invalid"}
            return (first["path"], first["message"], _observed(values[i]))

        return [ColumnViolation(f"{col}/schema", bad, detail)] if bad.any() else []

    # ------------------------------------------------------------------
    def _evaluate_vectorized(self, arr: pa.Array, notnull: np.ndarray) -> list[ColumnViolation]:
        out: list[ColumnViolation] = []
        s = self.subschema
        col = self.col
        dtype = arr.type
        actual_type = _json_type_of_arrow(dtype)

        def add(keyword: str, bad: np.ndarray, message, observed_fn=None):
            bad = bad & notnull
            if not bad.any():
                return
            if observed_fn is None:
                vals = arr
                observed_fn = lambda i: _observed(vals[i].as_py())
            if callable(message):
                detail = lambda i: (col, message(i), observed_fn(i))
            else:
                detail = lambda i: (col, message, observed_fn(i))
            out.append(ColumnViolation(f"{col}/{keyword}", bad, detail))

        # ---- type ----
        if "type" in s:
            bad = self._type_bad_mask(arr, notnull, s["type"], actual_type)
            if bad is not None:
                expected = s["type"] if isinstance(s["type"], str) else "unknown"
                got = "number" if actual_type == "integer" else actual_type
                add("type", bad, f"Expected type {expected} but got {got}")

        # ---- enum / const ----
        if "enum" in s and isinstance(s["enum"], list):
            if actual_type in ("array", "object"):
                # a container value never matches ANY enum entry (:1330-1340)
                add("enum", notnull.copy(), "Value not in enum")
            else:
                vset, exact = _enum_value_set(dtype, s["enum"])
                if not exact:
                    bad = _enum_bad_fallback(arr, s["enum"])
                elif vset is None:
                    bad = notnull.copy()
                else:
                    bad = ~_np_bool(pc.is_in(arr, value_set=vset))
                add("enum", bad, "Value not in enum")

        if "const" in s:
            cv = s["const"]
            if isinstance(cv, (list, dict)) or actual_type in ("array", "object"):
                # containers never compare equal on either side (:1330-1340)
                add("const", notnull.copy(), "Value does not match const")
            else:
                vset, exact = _enum_value_set(dtype, [cv])
                if not exact:
                    bad = _enum_bad_fallback(arr, [cv])
                elif vset is None:
                    bad = notnull.copy()
                else:
                    bad = ~_np_bool(pc.equal(arr, vset[0]))
                add("const", bad, "Value does not match const")

        # ---- numeric bounds (number columns only, like check_number_constraints) ----
        if actual_type in ("integer", "number"):
            vals = _numeric_numpy(arr, notnull)
            if vals is not None:
                for kw, violated, msg in _NUMERIC_BOUNDS:
                    if is_number(s.get(kw)):
                        add(kw, violated(vals, _bound_value(s[kw], vals)), msg)
            if is_number(s.get("multipleOf")):
                add("multipleOf", self._multiple_of_bad(arr, s["multipleOf"], actual_type),
                    "Value is not a multiple of multipleOf")

        # ---- string constraints (byte lengths, json_schema_validate.c:927) ----
        if actual_type == "string" and (pa.types.is_string(dtype) or pa.types.is_large_string(dtype)):
            if is_number(s.get("minLength")) or is_number(s.get("maxLength")):
                # pc.binary_length counts BYTES on utf8 arrays — the parity unit
                np_len = pc.binary_length(arr).fill_null(0).to_numpy(zero_copy_only=False)
            if is_number(s.get("minLength")):
                bound = numeric_to_int(s["minLength"])
                add("minLength", np_len < bound,
                    lambda i, b=bound: f"String length {np_len[i]} is less than minLength {b}")
            if is_number(s.get("maxLength")):
                bound = numeric_to_int(s["maxLength"])
                add("maxLength", np_len > bound,
                    lambda i, b=bound: f"String length {np_len[i]} exceeds maxLength {b}")
            if isinstance(s.get("pattern"), str):
                pat = s["pattern"]
                bad = self._regex_bad(arr, pat)
                if bad is not None:
                    add("pattern", bad, f"String does not match pattern: {pat}")
            if isinstance(s.get("format"), str) and s["format"] in FORMAT_TABLE:
                fmt_pat, fmt_msg = FORMAT_TABLE[s["format"]]
                bad = self._regex_bad(arr, fmt_pat, preserve=True)
                if bad is not None:
                    add("format", bad, fmt_msg)

        # ---- array constraints ----
        if actual_type == "array":
            lengths = pc.list_value_length(arr).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
            if is_number(s.get("minItems")):
                bound = numeric_to_int(s["minItems"])
                add("minItems", lengths < bound,
                    lambda i, b=bound: f"Array has {lengths[i]} items, minimum is {b}",
                    observed_fn=lambda i: str(lengths[i]))
            if is_number(s.get("maxItems")):
                bound = numeric_to_int(s["maxItems"])
                add("maxItems", lengths > bound,
                    lambda i, b=bound: f"Array has {lengths[i]} items, maximum is {b}",
                    observed_fn=lambda i: str(lengths[i]))
            flat, offsets = self._flatten(arr, lengths)
            flat_is_scalar = flat is not None and not (
                pa.types.is_nested(flat.type))
            if s.get("uniqueItems") is True and flat_is_scalar:
                # container elements never compare equal in the reference
                # (json_schema_validate.c:1330-1340) so nested lists have no
                # detectable duplicates — scalar lists only
                add("uniqueItems", self._unique_bad(flat, offsets),
                    "Array items are not unique", observed_fn=lambda i: str(lengths[i]))
            items = s.get("items")
            if isinstance(items, dict) and flat_is_scalar:
                out.extend(self._items_violations(col, items, flat, offsets, notnull))
            if "contains" in s and flat_is_scalar:
                out.extend(self._contains_violations(col, s, flat, offsets, notnull, lengths))
            if (not flat_is_scalar
                    and (isinstance(items, dict) or "contains" in s)):
                # nested list-of-list columns: element kernels assume scalar
                # values — use the per-row parity evaluator instead
                return self._evaluate_fallback(arr, notnull)

        # ---- object constraints over Arrow struct columns (vectorized
        # recursion, pc.struct_field per declared property) ----
        if self._children is not None and pa.types.is_struct(dtype):
            out.extend(self._struct_violations(arr, notnull))
        return out

    def _struct_violations(self, arr: pa.Array, notnull: np.ndarray) -> list[ColumnViolation]:
        """Object keywords over a struct column.  Field-null == key absent
        (the engine's column convention applied recursively), so:
        ``required`` flags parent-present & field-null; per-field subschemas
        recurse through sub-plans on ``pc.struct_field``; min/maxProperties
        count non-null fields; additionalProperties=False flags non-null
        undeclared fields.  Mirrors check_properties /
        check_additional_properties / check_object_size_constraints
        (json_schema_validate.c:785-837, 1358-1487, 1687-1740)."""
        s = self.subschema
        col = self.col
        out: list[ColumnViolation] = []
        field_names = [f.name for f in arr.type]

        for name in s.get("required", []) or []:
            if not isinstance(name, str):
                continue
            if name in field_names:
                child = pc.struct_field(arr, name)
                bad = notnull & ~_np_bool(pc.is_valid(child))
            else:
                bad = notnull.copy()
            if bad.any():
                out.append(ColumnViolation(
                    f"{col}/{name}/required", bad,
                    lambda i, c=name: (col, f"Missing required property: {c}",
                                       "null")))

        pn = s.get("propertyNames")
        if isinstance(pn, (dict, bool)):
            # struct field NAMES are fixed per type: validate each name ONCE
            # (parity evaluator on the string), then flag rows where a
            # bad-named field is present — per-row work stays vectorized
            # (check_property_names, json_schema_validate.c:842-882)
            name_eval = Evaluator(jsonschema_compile(pn))
            for f in field_names:
                errs: list = []
                if not name_eval._validate(f, pn, f"{col}/{f}", errs, pn):
                    bad = notnull & _np_bool(pc.is_valid(pc.struct_field(arr, f)))
                    if bad.any():
                        first = errs[0] if errs else {
                            "path": f"{col}/{f}", "message": "invalid property name"}
                        out.append(ColumnViolation(
                            f"{col}/{f}/propertyNames", bad,
                            lambda i, _p=first["path"], _m=first["message"], _f=f:
                            (_p, _m, json.dumps(_f))))

        for name, child_plan in (self._children or {}).items():
            if name not in field_names:
                continue   # field absent everywhere: no present values to check
            child = pc.struct_field(arr, name)
            for v in child_plan.evaluate(child):
                masked = v.bad & notnull   # parent-null rows are 'column missing'
                if masked.any():
                    out.append(ColumnViolation(v.constraint_id, masked, v.detail))

        if is_number(s.get("minProperties")) or is_number(s.get("maxProperties")) \
                or s.get("additionalProperties") is False:
            present_counts = np.zeros(len(notnull), dtype=np.int64)
            declared = set((s.get("properties") or {}).keys())
            for f in field_names:
                fvalid = _np_bool(pc.is_valid(pc.struct_field(arr, f)))
                present_counts += fvalid.astype(np.int64)
                if s.get("additionalProperties") is False and f not in declared:
                    bad = fvalid & notnull
                    if bad.any():
                        out.append(ColumnViolation(
                            f"{col}/{f}/additionalProperties", bad,
                            lambda i, c=f: (col,
                                            f"Additional property '{c}' is not allowed",
                                            "present")))
            v = s.get("minProperties")
            if is_number(v):
                bound = numeric_to_int(v)
                bad = (present_counts < bound) & notnull
                if bad.any():
                    out.append(ColumnViolation(
                        f"{col}/minProperties", bad,
                        lambda i, b=bound: (col,
                                            f"Object has {present_counts[i]} properties, minimum is {b}",
                                            str(present_counts[i]))))
            v = s.get("maxProperties")
            if is_number(v):
                bound = numeric_to_int(v)
                bad = (present_counts > bound) & notnull
                if bad.any():
                    out.append(ColumnViolation(
                        f"{col}/maxProperties", bad,
                        lambda i, b=bound: (col,
                                            f"Object has {present_counts[i]} properties, maximum is {b}",
                                            str(present_counts[i]))))
        return out

    # ------------------------------------------------------------------
    def _type_bad_mask(self, arr, notnull, type_val, actual_type) -> Optional[np.ndarray]:
        types = [type_val] if isinstance(type_val, str) else (
            [t for t in type_val if isinstance(t, str)] if isinstance(type_val, list) else None)
        if types is None:
            return None  # invalid spec -> skip (json_schema_validate.c:675)
        n = len(notnull)

        def accepts_statically(t: str) -> bool:
            # arrow column type decides the JSON type of every non-null value
            return (t == actual_type
                    or (t == "number" and actual_type == "integer"))

        if any(accepts_statically(t) for t in types):
            return np.zeros(n, dtype=bool)
        # runtime 'integer' check on float/decimal columns: floor(x) == x
        # (json_schema_validate.c:617-632)
        if "integer" in types and actual_type == "number":
            return ~_np_bool(pc.equal(pc.floor(arr), arr))
        return notnull.copy()  # static mismatch: every present value fails

    @staticmethod
    def _multiple_of_bad(arr, m, actual_type) -> np.ndarray:
        vals = arr.fill_null(0).to_numpy(zero_copy_only=False)
        frac = Fraction(str(m))
        if actual_type == "integer":
            # x multiple of p/q  <=>  (x * q) % p == 0  (exact in int space)
            return (vals.astype(np.int64) * frac.denominator) % frac.numerator != 0
        # float columns: exact-decimal semantics via Decimal(str(x)) per value
        # (only the reference-parity corner; numeric columns are usually int)
        from decimal import Decimal
        md = Decimal(str(m))
        return np.array([bool(v is not None and Decimal(str(v)) % md != 0)
                         for v in arr.to_pylist()], dtype=bool)

    def _regex_bad(self, arr, pattern: str, preserve: bool = False) -> Optional[np.ndarray]:
        """Unanchored regex search (regexec semantics).  RE2 via Arrow when the
        pattern compiles there, else Python re per value.  An invalid pattern
        -> None (check silently passes, json_schema_validate.c:189-198)."""
        pat = translate_posix_pattern(pattern)
        # RE2 parses "{,n}" as LITERAL text while Python re reads {0,n} —
        # the one construct RE2 accepts with different semantics; every other
        # divergence (back-references etc.) makes RE2 raise and fall through.
        # The engine's canonical dialect is Python re (tests/test_regex_dialect).
        if "{," not in pat:
            try:
                ok = pc.match_substring_regex(arr, pat)
                return ~_np_bool(ok)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                pass
        try:
            rex = re.compile(pat)
        except re.error:
            return None
        return np.array([v is not None and rex.search(v) is None
                         for v in arr.to_pylist()], dtype=bool)

    @staticmethod
    def _flatten(arr, lengths) -> tuple[Optional[pa.Array], Optional[np.ndarray]]:
        try:
            flat = pc.list_flatten(arr)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            return None, None
        offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        return flat, offsets

    @staticmethod
    def _unique_bad(flat: pa.Array, offsets: np.ndarray) -> np.ndarray:
        """Per-row duplicate detection over list<scalar>, vectorized: sort
        (row_id, value) pairs and look for equal neighbors within a row.
        Container elements are skipped upstream (they never compare equal,
        json_schema_validate.c:1330-1340)."""
        n_rows = len(offsets) - 1
        values = flat.to_numpy(zero_copy_only=False)
        if values.dtype == object:
            # string/scalar-object path via numpy unicode conversion
            values = np.asarray(flat.to_pylist(), dtype=object)
            row_ids = np.repeat(np.arange(n_rows), np.diff(offsets))
            order = np.lexsort((np.array([str(v) for v in values]), row_ids))
        else:
            row_ids = np.repeat(np.arange(n_rows), np.diff(offsets))
            order = np.lexsort((values, row_ids))
        if len(order) == 0:
            return np.zeros(n_rows, dtype=bool)
        sv, sr = values[order], row_ids[order]
        dup_pair = (sr[1:] == sr[:-1]) & (sv[1:] == sv[:-1])
        bad = np.zeros(n_rows, dtype=bool)
        bad_rows = np.unique(sr[1:][dup_pair])
        bad[bad_rows] = True
        if flat.null_count:
            # nulls became NaN above (NaN != NaN hides them); JSON null equals
            # JSON null (jbvNull, json_schema_validate.c:1310) so >=2 null
            # elements in a row is a duplicate — count nulls per segment
            isnull = (~_np_bool(pc.is_valid(flat))).astype(np.int64)
            seg = np.diff(offsets)
            nonempty = seg > 0
            nulls_per_row = np.zeros(n_rows, dtype=np.int64)
            if nonempty.any():
                nulls_per_row[nonempty] = np.add.reduceat(isnull, offsets[:-1][nonempty])
            bad |= nulls_per_row > 1
        return bad

    def _items_violations(self, col, items_schema, flat, offsets, notnull) -> list[ColumnViolation]:
        """Element-level checks: flat kernel over ALL list values at once, then
        a segmented reduce back to rows.  One violation row per (row, keyword)
        for the first failing element; the failing count rides in ``observed``."""
        from ..functions.jsonvalue import json_type_name

        per_kw: list[tuple[str, np.ndarray, Callable]] = []
        ftype = _json_type_of_arrow(flat.type)
        n_flat = len(flat)
        fnull = (np.zeros(n_flat, dtype=bool) if flat.null_count == 0
                 else ~_np_bool(pc.is_valid(flat)))

        t = items_schema.get("type")
        if t is not None and isinstance(t, (str, list)):
            types = [t] if isinstance(t, str) else [x for x in t if isinstance(x, str)]
            ok_static = any(x == ftype or (x == "number" and ftype == "integer")
                            for x in types)
            bad = np.zeros(n_flat, dtype=bool) if "null" in types else fnull.copy()
            if not ok_static:
                if "integer" in types and ftype == "number":
                    bad |= ~_np_bool(pc.equal(pc.floor(flat), flat))
                else:
                    bad |= ~fnull
            expected = t if isinstance(t, str) else "unknown"
            per_kw.append(("items.type", bad,
                           lambda v, _e=expected: f"Expected type {_e} but got {json_type_name(v)}"))
        if ftype in ("integer", "number"):
            vals = _numeric_numpy(flat, ~fnull)
            if vals is not None:
                for kw, violated, msg in _NUMERIC_BOUNDS:
                    if is_number(items_schema.get(kw)):
                        ebad = violated(vals, _bound_value(items_schema[kw], vals)) & ~fnull
                        per_kw.append((f"items.{kw}", ebad, lambda v, _m=msg: _m))
        if ftype == "string":
            if isinstance(items_schema.get("pattern"), str):
                bad = self._regex_bad(flat, items_schema["pattern"])
                if bad is not None:
                    per_kw.append(("items.pattern", bad & ~fnull,
                                   lambda v, _p=items_schema["pattern"]:
                                   f"String does not match pattern: {_p}"))
            if is_number(items_schema.get("minLength")) or is_number(items_schema.get("maxLength")):
                e_len = pc.binary_length(flat).fill_null(0).to_numpy(zero_copy_only=False)
            if is_number(items_schema.get("minLength")):
                b = numeric_to_int(items_schema["minLength"])
                per_kw.append(("items.minLength", (e_len < b) & ~fnull,
                               lambda v, _b=b: f"String length {utf8_len(v)} is less than minLength {_b}"))
            if is_number(items_schema.get("maxLength")):
                b = numeric_to_int(items_schema["maxLength"])
                per_kw.append(("items.maxLength", (e_len > b) & ~fnull,
                               lambda v, _b=b: f"String length {utf8_len(v)} exceeds maxLength {_b}"))
        if isinstance(items_schema.get("enum"), list):
            entries = items_schema["enum"]
            vset, exact = _enum_value_set(flat.type, entries)
            if not exact:
                ebad = np.array([not any(scalars_equal(v, e) for e in entries)
                                 for v in flat.to_pylist()], dtype=bool)
            elif vset is None:
                ebad = np.ones(n_flat, dtype=bool)
            else:
                ebad = ~_np_bool(pc.is_in(flat, value_set=vset))
            # a null ELEMENT is JSON null (not "missing"): in enum iff null is
            ebad[fnull] = not any(e is None for e in entries)
            per_kw.append(("items.enum", ebad, lambda v: "Value not in enum"))
        if "const" in items_schema:
            cv = items_schema["const"]
            if isinstance(cv, (list, dict)):
                # containers never compare equal (:1330-1340) -> every element
                # (incl. JSON null) fails
                ebad = np.ones(n_flat, dtype=bool)
            else:
                vset, exact = _enum_value_set(flat.type, [cv])
                if not exact:
                    ebad = np.array([not scalars_equal(v, cv)
                                     for v in flat.to_pylist()], dtype=bool)
                elif vset is None:
                    ebad = np.ones(n_flat, dtype=bool)
                else:
                    ebad = ~_np_bool(pc.equal(flat, vset[0]))
                ebad[fnull] = cv is not None   # JSON null == const null
            per_kw.append(("items.const", ebad, lambda v: "Value does not match const"))

        out = []
        for kw, ebad, msg_fn in per_kw:
            if not ebad.any():
                continue
            bad_idx = np.nonzero(ebad)[0]
            rows = np.searchsorted(offsets, bad_idx, side="right") - 1
            # first bad element + count per row (bad_idx is sorted, so the
            # first occurrence of each row id is its first bad element)
            uniq_rows, first_pos, counts = np.unique(rows, return_index=True,
                                                     return_counts=True)
            row_first = dict(zip(uniq_rows.tolist(), bad_idx[first_pos].tolist()))
            row_count = dict(zip(uniq_rows.tolist(), counts.tolist()))
            row_bad = np.zeros(len(offsets) - 1, dtype=bool)
            row_bad[uniq_rows] = True
            row_bad &= notnull

            def detail(i: int, _first=row_first, _count=row_count, _msg=msg_fn, _off=offsets):
                fi = _first[i]
                elem_idx = fi - _off[i]
                v = flat[int(fi)].as_py()
                return (f"{col}[{elem_idx}]", _msg(v),
                        _observed({"value": v, "failing_elements": _count[i]}))

            out.append(ColumnViolation(f"{col}/{kw}", row_bad, detail))
        return out

    def _contains_violations(self, col, s, flat, offsets, notnull, lengths) -> list[ColumnViolation]:
        contains = s["contains"]
        match = np.ones(len(flat), dtype=bool)
        ftype = _json_type_of_arrow(flat.type)
        t = contains.get("type")
        if isinstance(t, str):
            ok = (t == ftype) or (t == "number" and ftype == "integer")
            if not ok:
                match &= False
        if ftype in ("integer", "number"):
            vals = _numeric_numpy(flat, None)
            if vals is not None:
                if is_number(contains.get("minimum")):
                    match &= vals >= _bound_value(contains["minimum"], vals)
                if is_number(contains.get("maximum")):
                    match &= vals <= _bound_value(contains["maximum"], vals)
                if is_number(contains.get("exclusiveMinimum")):
                    match &= vals > _bound_value(contains["exclusiveMinimum"], vals)
                if is_number(contains.get("exclusiveMaximum")):
                    match &= vals < _bound_value(contains["exclusiveMaximum"], vals)
        if "const" in contains:
            cv = contains["const"]
            if isinstance(cv, (list, dict)):
                match &= False     # containers never compare equal (:1330-1340)
            elif isinstance(cv, bool):
                # JSON true != 1: bool const only ever matches a boolean column
                if pa.types.is_boolean(flat.type):
                    match &= _np_bool(pc.equal(flat, pa.scalar(cv)))
                else:
                    match &= False
            elif isinstance(cv, (int, float)) and not (
                    pa.types.is_integer(flat.type) or pa.types.is_floating(flat.type)
                    or pa.types.is_decimal(flat.type)):
                match &= False     # number const never equals string/bool values
            elif isinstance(cv, str) and not (
                    pa.types.is_string(flat.type) or pa.types.is_large_string(flat.type)):
                match &= False
            else:
                if (isinstance(cv, float) and cv.is_integer()
                        and pa.types.is_integer(flat.type)):
                    cv = int(cv)   # JSON 2.0 == 2 on an int column
                elif (isinstance(cv, float) and not cv.is_integer()
                        and pa.types.is_integer(flat.type)):
                    cv = None      # non-integral const never equals an int value
                if cv is None and contains["const"] is not None:
                    match &= False
                else:
                    try:
                        match &= _np_bool(pc.equal(flat, pa.scalar(cv, type=flat.type)))
                    except (pa.ArrowInvalid, pa.ArrowTypeError):
                        match &= False
        if flat.null_count:
            # a null element matches iff the contains schema accepts JSON null
            # (the C path validates each element recursively, :1250)
            from ..functions.evaluator import Evaluator
            null_matches = Evaluator(jsonschema_compile(contains)).validate_document(None, None)
            match[~_np_bool(pc.is_valid(flat))] = null_matches
        n_rows = len(offsets) - 1
        counts = np.zeros(n_rows, dtype=np.int64)
        nonempty = np.diff(offsets) > 0
        if len(flat) and nonempty.any():
            # reduceat over NON-EMPTY rows only: their starts are strictly
            # increasing and in range, so segments are exact (clamping empty
            # trailing rows would corrupt the preceding segment)
            starts = offsets[:-1][nonempty]
            counts[nonempty] = np.add.reduceat(match.astype(np.int64), starts)
        min_c = numeric_to_int(s["minContains"]) if is_number(s.get("minContains")) else 1
        max_c = numeric_to_int(s["maxContains"]) if is_number(s.get("maxContains")) else -1
        out = []
        low = (counts < min_c) & notnull
        if low.any():
            if min_c == 1:
                msg_fn = lambda i: "Array does not contain any item matching the contains schema"
            else:
                msg_fn = lambda i: f"Array contains {counts[i]} matching items, minimum is {min_c}"
            out.append(ColumnViolation(
                f"{col}/minContains", low,
                lambda i: (col, msg_fn(i), str(counts[i]))))
        if max_c >= 0:
            high = (counts > max_c) & notnull
            if high.any():
                out.append(ColumnViolation(
                    f"{col}/maxContains", high,
                    lambda i: (col, f"Array contains {counts[i]} matching items, maximum is {max_c}",
                               str(counts[i]))))
        return out


class CrossColumnCheck:
    """Engine extension point: a constraint spanning multiple columns."""

    constraint_id = "row/cross"

    def evaluate(self, batch: pa.Table) -> Optional[ColumnViolation]:
        raise NotImplementedError


class ListLengthEquals(CrossColumnCheck):
    """``len_col == len(list_col)`` — the tokens-table consistency invariant
    (n_tok must equal len(tokens)); fully vectorized."""

    def __init__(self, len_col: str = "n_tok", list_col: str = "tokens"):
        self.len_col = len_col
        self.list_col = list_col
        self.constraint_id = f"row/{len_col}_equals_len_{list_col}"

    def evaluate(self, batch: pa.Table) -> Optional[ColumnViolation]:
        if self.len_col not in batch.column_names or self.list_col not in batch.column_names:
            return None
        declared = batch[self.len_col]
        actual = pc.list_value_length(batch[self.list_col])
        ok = pc.equal(declared, actual)
        bad = ~_np_bool(ok) & _np_bool(pc.is_valid(declared)) & _np_bool(pc.is_valid(actual))
        if not bad.any():
            return None
        d = declared.combine_chunks() if isinstance(declared, pa.ChunkedArray) else declared
        a = actual.combine_chunks() if isinstance(actual, pa.ChunkedArray) else actual
        return ColumnViolation(
            self.constraint_id, bad,
            lambda i: (self.len_col,
                       f"{self.len_col} {d[i].as_py()} does not equal list length {a[i].as_py()}",
                       _observed({"declared": d[i].as_py(), "actual": a[i].as_py()})))


class TablePlan:
    """Compiled table-level plan: per-column kernel plans + required set +
    cross-column checks.  Built once (driver or actor __init__), evaluated
    per batch."""

    def __init__(self, schema, id_column: str = "doc_id",
                 cross_checks: tuple = ()):
        if isinstance(schema, CompiledSchema):
            schema = schema.schema
        if isinstance(schema, str):
            schema = jsonschema_compile(schema).schema
        self.schema = schema
        self.id_column = id_column
        self.cross_checks = tuple(cross_checks)
        props = schema.get("properties", {}) if isinstance(schema, dict) else {}
        self.required = [c for c in schema.get("required", [])
                         if isinstance(c, str)] if isinstance(schema, dict) else []
        self.columns = [ColumnCheckPlan(c, sub, None) for c, sub in props.items()]
        # row-level compositional keywords: subplans compiled once, evaluated
        # as vectorized boolean mask algebra (the plan-level AND/OR/XOR-count
        # mapping of check_all_of/any_of/one_of/not/if_then_else,
        # json_schema_validate.c:1492-1682)
        self._sub = {}
        if isinstance(schema, dict):
            for kw in ("allOf", "anyOf", "oneOf"):
                subs = schema.get(kw)
                if isinstance(subs, list):
                    self._sub[kw] = [TablePlan(s, id_column) for s in subs
                                     if isinstance(s, (dict, bool))]
            if isinstance(schema.get("not"), (dict, bool)):
                self._sub["not"] = TablePlan(schema["not"], id_column)
            if "if" in schema and ("then" in schema or "else" in schema):
                self._sub["if"] = TablePlan(schema["if"], id_column)
                if isinstance(schema.get("then"), (dict, bool)):
                    self._sub["then"] = TablePlan(schema["then"], id_column)
                if isinstance(schema.get("else"), (dict, bool)):
                    self._sub["else"] = TablePlan(schema["else"], id_column)

    def _valid_mask(self, batch: pa.Table) -> np.ndarray:
        valid, _ = self.evaluate_batch(batch)
        return valid

    def evaluate_batch(self, batch: pa.Table) -> tuple[np.ndarray, list[ColumnViolation]]:
        n = batch.num_rows
        violations: list[ColumnViolation] = []
        if isinstance(self.schema, bool):
            if self.schema:
                return np.ones(n, dtype=bool), []
            bad = np.ones(n, dtype=bool)
            return np.zeros(n, dtype=bool), [ColumnViolation(
                "row/false_schema", bad,
                lambda i: ("", "Schema is false", ""))]
        # required: missing column entirely, or null value
        for col in self.required:
            if col not in batch.column_names:
                bad = np.ones(n, dtype=bool)
            else:
                bad = ~_np_bool(pc.is_valid(batch[col]))
            if bad.any():
                violations.append(ColumnViolation(
                    f"{col}/required", bad,
                    lambda i, c=col: ("", f"Missing required property: {c}", "null")))

        # additionalProperties on the row object: a column outside
        # ``properties`` is an additional property wherever its value is
        # non-null (patternProperties keys exempt NAMES only,
        # json_schema_validate.c:1358-1487)
        s0 = self.schema
        addl = s0.get("additionalProperties") if isinstance(s0, dict) else None
        if addl is False:
            declared = set(s0.get("properties", {}) or {})
            pattern_props = s0.get("patternProperties")
            exempt_res = []
            if isinstance(pattern_props, dict):
                for pat in pattern_props:
                    try:
                        exempt_res.append(re.compile(translate_posix_pattern(pat)))
                    except re.error:
                        pass
            for col in batch.column_names:
                if col in declared:
                    continue
                if any(r.search(col) for r in exempt_res):
                    continue
                bad = _np_bool(pc.is_valid(batch[col]))
                if bad.any():
                    violations.append(ColumnViolation(
                        f"{col}/additionalProperties", bad,
                        lambda i, c=col: ("", f"Additional property '{c}' is not allowed",
                                          "present")))
        for plan in self.columns:
            if plan.col in batch.column_names:
                violations.extend(plan.evaluate(batch[plan.col]))
        for cross in self.cross_checks:
            v = cross.evaluate(batch)
            if v is not None:
                violations.append(v)

        # object-size keywords on the row object: property count = non-null
        # fields (check_object_size_constraints, json_schema_validate.c:1687-1740)
        s = self.schema
        if is_number(s.get("minProperties")) or is_number(s.get("maxProperties")):
            present = np.zeros(n, dtype=np.int64)
            for col in batch.column_names:
                present += _np_bool(pc.is_valid(batch[col])).astype(np.int64)
            v = s.get("minProperties")
            if is_number(v):
                bound = numeric_to_int(v)
                bad = present < bound
                if bad.any():
                    violations.append(ColumnViolation(
                        "row/minProperties", bad,
                        lambda i, b=bound: ("", f"Object has {present[i]} properties, minimum is {b}",
                                            str(present[i]))))
            v = s.get("maxProperties")
            if is_number(v):
                bound = numeric_to_int(v)
                bad = present > bound
                if bad.any():
                    violations.append(ColumnViolation(
                        "row/maxProperties", bad,
                        lambda i, b=bound: ("", f"Object has {present[i]} properties, maximum is {b}",
                                            str(present[i]))))

        # compositional keywords: sub-verdicts are mask algebra; sub-errors
        # suppressed exactly as the reference suppresses them
        # (json_schema_validate.c:1551, 1594, 1626, 1660)
        if "allOf" in self._sub:
            for idx, sub in enumerate(self._sub["allOf"]):
                sub_valid, sub_viol = sub.evaluate_batch(batch)
                violations.extend(sub_viol)  # allOf reports all errors (:1514-1518)
        if "anyOf" in self._sub:
            any_mask = np.zeros(n, dtype=bool)
            for sub in self._sub["anyOf"]:
                any_mask |= sub._valid_mask(batch)
            bad = ~any_mask
            if bad.any():
                violations.append(ColumnViolation(
                    "row/anyOf", bad,
                    lambda i: ("", "Value does not match any schema in anyOf", "")))
        if "oneOf" in self._sub:
            match_count = np.zeros(n, dtype=np.int64)
            for sub in self._sub["oneOf"]:
                match_count += sub._valid_mask(batch).astype(np.int64)
            bad = match_count != 1
            if bad.any():
                violations.append(ColumnViolation(
                    "row/oneOf", bad,
                    lambda i: ("", "Value does not match any schema in oneOf"
                               if match_count[i] == 0 else
                               f"Value matches {match_count[i]} schemas in oneOf, but must match exactly one",
                               str(match_count[i]))))
        if "not" in self._sub:
            bad = self._sub["not"]._valid_mask(batch)
            if bad.any():
                violations.append(ColumnViolation(
                    "row/not", bad,
                    lambda i: ("", "Value must not match the schema in 'not'", "")))
        if "if" in self._sub:
            # then/else sub-errors pass through, masked to the rows their
            # branch applies to (json_schema_validate.c:1662-1678)
            if_mask = self._sub["if"]._valid_mask(batch)
            for branch, mask in (("then", if_mask), ("else", ~if_mask)):
                if branch in self._sub:
                    _valid, sub_viol = self._sub[branch].evaluate_batch(batch)
                    for v in sub_viol:
                        masked = v.bad & mask
                        if masked.any():
                            violations.append(
                                ColumnViolation(v.constraint_id, masked, v.detail))

        valid = np.ones(n, dtype=bool)
        for v in violations:
            valid &= ~v.bad
        return valid, violations


def violations_to_table(batch: pa.Table, id_column: str,
                        violations: list[ColumnViolation],
                        max_rows: Optional[int] = None) -> pa.Table:
    """Materialize violation rows (only for failing rows — cheap when the
    violation rate is low).

    ``max_rows`` caps pathological explosion (a schema that fails every
    constraint on every row, SURVEY.md §7.3 #5): when the cap is hit, one
    summary row per truncated constraint records the DROPPED count — never a
    silent truncation."""
    id_arr = batch[id_column] if id_column in batch.column_names else None
    doc_ids, cids, paths, msgs, obs = [], [], [], [], []
    for v in violations:
        bad_idx = np.nonzero(v.bad)[0]
        if len(bad_idx) == 0:
            continue
        if max_rows is not None and len(doc_ids) >= max_rows:
            doc_ids.append("")
            cids.append(v.constraint_id)
            paths.append("")
            msgs.append("violation cap reached; rows dropped")
            obs.append(json.dumps({"dropped": int(len(bad_idx))}))
            continue
        if max_rows is not None and len(doc_ids) + len(bad_idx) > max_rows:
            keep = max_rows - len(doc_ids)
            dropped = len(bad_idx) - keep
            bad_idx = bad_idx[:keep]
        else:
            dropped = 0
        # gather only the failing rows' ids (no full-column materialization)
        ids = (id_arr.take(pa.array(bad_idx)).to_pylist()
               if id_arr is not None else [None] * len(bad_idx))
        for i, did in zip(bad_idx, ids):
            p, m, o = v.detail(int(i))
            doc_ids.append(str(did))
            cids.append(v.constraint_id)
            paths.append(p)
            msgs.append(m)
            obs.append(o)
        if dropped:
            doc_ids.append("")
            cids.append(v.constraint_id)
            paths.append("")
            msgs.append("violation cap reached; rows dropped")
            obs.append(json.dumps({"dropped": int(dropped)}))
    return pa.table({
        "doc_id": pa.array(doc_ids, type=pa.string()),
        "constraint_id": pa.array(cids, type=pa.string()),
        "path": pa.array(paths, type=pa.string()),
        "message": pa.array(msgs, type=pa.string()),
        "observed": pa.array(obs, type=pa.string()),
    })


class TableValidator:
    """``map_batches`` stage: appends a ``valid`` bool column.

    Stateful actor-pool pattern (the reference's per-backend session,
    json_schema_validate.c:88-92): the plan — including every compiled regex —
    is built ONCE per actor in ``__init__``; ``__call__`` only runs kernels.

        ds.map_batches(TableValidator, fn_constructor_kwargs={"schema": SCHEMA},
                       batch_format="pyarrow", concurrency=N)
    """

    def __init__(self, schema, id_column: str = "doc_id", cross_checks: tuple = ()):
        self.plan = TablePlan(schema, id_column, cross_checks)

    def __call__(self, batch: pa.Table) -> pa.Table:
        valid, _ = self.plan.evaluate_batch(batch)
        return batch.append_column("valid", pa.array(valid))


class ViolationExtractor:
    """``map_batches`` stage: emits ONLY the violation rows for each batch
    (output rows ≪ input rows at a sane violation rate).  ``max_rows_per_batch``
    caps explosion with an explicit dropped-count row (no silent truncation)."""

    def __init__(self, schema, id_column: str = "doc_id", cross_checks: tuple = (),
                 max_rows_per_batch: int = 100_000):
        self.plan = TablePlan(schema, id_column, cross_checks)
        self.id_column = id_column
        self.max_rows_per_batch = max_rows_per_batch

    def __call__(self, batch: pa.Table) -> pa.Table:
        _, violations = self.plan.evaluate_batch(batch)
        return violations_to_table(batch, self.id_column, violations,
                                   max_rows=self.max_rows_per_batch)


class ValidityAnnotator:
    """``map_batches`` stage emitting the full verdict in ONE pass over the
    data: input columns + ``valid`` + ``n_violations`` + (optionally) a
    ``violations`` JSON-text column, null for valid rows — so verdicts and
    violations never require a second scan of the input."""

    def __init__(self, schema, id_column: str = "doc_id", cross_checks: tuple = (),
                 emit_violations_json: bool = True, keep_columns=None):
        self.plan = TablePlan(schema, id_column, cross_checks)
        self.emit_violations_json = emit_violations_json
        self.keep_columns = keep_columns

    def __call__(self, batch: pa.Table) -> pa.Table:
        valid, violations = self.plan.evaluate_batch(batch)
        n_viol = np.zeros(batch.num_rows, dtype=np.int32)
        for v in violations:
            n_viol += v.bad.astype(np.int32)
        out = batch
        if self.keep_columns is not None:
            out = out.select([c for c in self.keep_columns if c in out.column_names])
        out = (out.append_column("valid", pa.array(valid))
                  .append_column("n_violations", pa.array(n_viol)))
        if self.emit_violations_json:
            per_row: dict[int, list[str]] = {}
            for v in violations:
                for i in np.nonzero(v.bad)[0]:
                    i = int(i)
                    p, m, o = v.detail(i)
                    per_row.setdefault(i, []).append(
                        json.dumps({"constraint_id": v.constraint_id,
                                    "path": p, "message": m, "observed": o}))
            texts: list[Optional[str]] = [None] * batch.num_rows
            for i, entries in per_row.items():
                texts[i] = "[" + ",".join(entries) + "]"
            out = out.append_column("violations", pa.array(texts, type=pa.string()))
        return out
