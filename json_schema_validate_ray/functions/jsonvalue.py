"""JSON value model matching PostgreSQL jsonb semantics.

The reference operates on PG ``jsonb`` values (json_schema_validate.c:49-62).
We model documents as plain Python values parsed with exact-decimal numbers so
that numeric comparisons replicate PG ``numeric`` arithmetic
(json_schema_validate.c:1012-1080 uses numeric_lt/gt/le/ge/eq/mod):

* ``null``    -> None
* ``boolean`` -> bool
* ``number``  -> int | decimal.Decimal   (never float on the parity path)
* ``string``  -> str
* ``array``   -> list
* ``object``  -> dict  (iteration helpers expose PG jsonb key order:
                 byte-length first, then bytewise — the order that fixes
                 emitted-error ordering, see expected/json_schema_validate.out:561)
"""

from __future__ import annotations

import json
from decimal import ROUND_FLOOR, ROUND_HALF_UP, Decimal


def parse_json(text: str):
    """Parse JSON text with exact-decimal numbers (PG numeric analog)."""
    return json.loads(text, parse_float=Decimal)


def json_type_name(v) -> str:
    """Runtime type tag, mirroring jsonb_type_name (json_schema_validate.c:571-606)."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float, Decimal)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    if isinstance(v, dict):
        return "object"
    return "unknown"


def is_number(v) -> bool:
    """True for JSON numbers (bool is NOT a number, matching jbvNumeric)."""
    return isinstance(v, (int, float, Decimal)) and not isinstance(v, bool)


def to_decimal(v) -> Decimal:
    """Exact Decimal for any JSON number (floats via str to avoid binary fuzz)."""
    if isinstance(v, Decimal):
        return v
    if isinstance(v, int):
        return Decimal(v)
    return Decimal(str(v))


def numeric_to_int(v) -> int:
    """PG numeric -> int4 conversion: round half away from zero
    (used for minLength/minItems/... bounds, json_schema_validate.c:932-933)."""
    return int(to_decimal(v).to_integral_value(rounding=ROUND_HALF_UP))


def is_integral_number(v) -> bool:
    """'integer' type check: number whose floor equals itself
    (json_schema_validate.c:617-632); 42.0 IS an integer, 42.5 is not."""
    if isinstance(v, bool) or not isinstance(v, (int, float, Decimal)):
        return False
    if isinstance(v, int):
        return True
    d = to_decimal(v)
    return d == d.to_integral_value(rounding=ROUND_FLOOR)


def pg_key_sort_key(key: str) -> tuple[int, bytes]:
    """PG jsonb object-key sort: byte length first, then bytewise memcmp."""
    b = key.encode("utf-8")
    return (len(b), b)


def pg_sorted_keys(obj: dict) -> list[str]:
    """Object keys in PG jsonb storage order — the iteration order of
    ``properties`` / data keys that determines error ordering
    (json_schema_validate.c:809-834; expected/json_schema_validate.out:561)."""
    return sorted(obj.keys(), key=pg_key_sort_key)


def utf8_len(s: str) -> int:
    """String length in BYTES, not code points — the reference counts the raw
    jsonb string bytes (json_schema_validate.c:924-927)."""
    return len(s.encode("utf-8"))


def scalars_equal(a, b) -> bool:
    """Scalar equality mirroring jsonb_values_equal
    (json_schema_validate.c:1287-1344) including the quirk that containers
    NEVER compare equal (explicit TODO at :1338-1339), so ``const``/``enum``
    with object/array values can never match and ``uniqueItems`` cannot detect
    duplicate containers."""
    a_cont = isinstance(a, (list, dict))
    b_cont = isinstance(b, (list, dict))
    if a_cont or b_cont:
        return False
    ta, tb = json_type_name(a), json_type_name(b)
    if ta != tb:
        return False
    if a is None:
        return True
    if ta == "boolean":
        return a is b or a == b
    if ta == "number":
        return to_decimal(a) == to_decimal(b)
    if ta == "string":
        return a == b
    return False


def escape_error_message(message: str) -> str:
    """Manual JSON escaping as append_error does (json_schema_validate.c:1974-1999):
    only ``\" \\ \\n \\r \\t`` are escaped."""
    out = []
    for ch in message:
        if ch == '"':
            out.append('\\"')
        elif ch == "\\":
            out.append("\\\\")
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        else:
            out.append(ch)
    return "".join(out)


def build_path(base: str, key: str) -> str:
    """Error-path builder (json_schema_validate.c:2007-2023): ``/``-joined
    property names; array index ``[i]`` appended with NO separator."""
    if base:
        if key and key[0] == "[":
            return base + key
        return base + "/" + key
    return key
