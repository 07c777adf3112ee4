"""Extract the reference pg_regress corpus into tests/corpus.jsonl.

Parses /root/reference/expected/json_schema_validate.out (statements echoed
with their golden results) into one JSON line per case:

    {"test": ..., "data": <raw JSON text>, "schema": <raw JSON text>,
     "mode": "is_valid" | "validate" | "compile",
     "variant": "jsonb" | "json",
     "expected_valid": bool | null,
     "expected_errors": <raw golden error-array text> | null}

Run once; the output is committed so tests do not depend on /root/reference.
"""

from __future__ import annotations

import json
import re
import sys

OUT = "/root/reference/expected/json_schema_validate.out"
DEST = "tests/corpus.jsonl"

# Multi-statement cases (CREATE TABLE / CREATE FUNCTION plumbing) whose
# data/schema cannot be parsed from the SELECT itself; semantics transcribed
# from sql/json_schema_validate.sql:308-322.
SPECIAL = {
    "stored compiled schema": {
        "data": '{"name": "test"}',
        "schema": '{"type": "object", "required": ["name"]}',
    },
    "function wrapped schema: valid": {
        "data": '{"name": "John", "email": "john@test.com"}',
        "schema": '{"type": "object", "required": ["name", "email"]}',
    },
    "function wrapped schema: invalid": {
        "data": '{"name": "John"}',
        "schema": '{"type": "object", "required": ["name", "email"]}',
    },
}


def unescape_sql(lit: str) -> str:
    return lit.replace("''", "'")


def parse_statement(stmt: str):
    """Return (test, mode, variant, data, schema) or None for non-test stmts."""
    m = re.search(r"SELECT\s+'((?:[^']|'')*)'\s+AS\s+test\s*,", stmt, re.S)
    if not m:
        return None
    test = unescape_sql(m.group(1))

    if "jsonschema_compile(" in stmt and "IS NOT NULL" in stmt:
        return (test, "compile", "jsonb", "{}", None)

    if test in SPECIAL:
        mode = "validate" if "jsonschema_validate(" in stmt else "is_valid"
        return (test, mode, "jsonb", SPECIAL[test]["data"], SPECIAL[test]["schema"])

    mode = None
    if "jsonschema_is_valid(" in stmt:
        mode = "is_valid"
    elif "jsonschema_validate(" in stmt:
        mode = "validate"
    if mode is None:
        return None

    # WITH schema AS (SELECT jsonschema_compile('<schema>')...) SELECT ...
    # jsonschema_xxx('<data>'::jsonb, compiled)
    wm = re.search(r"jsonschema_compile\(\s*'((?:[^']|'')*)'", stmt, re.S)
    if wm and "WITH" in stmt.split("SELECT")[0] + "WITH" or (wm and stmt.lstrip().startswith("WITH")):
        pass
    if stmt.lstrip().startswith("WITH") and wm:
        schema = unescape_sql(wm.group(1))
        dm = re.search(
            r"jsonschema_(?:is_valid|validate)\(\s*'((?:[^']|'')*)'::(jsonb|json)",
            stmt, re.S)
        if not dm:
            return None
        return (test, mode, dm.group(2), unescape_sql(dm.group(1)), schema)

    dm = re.search(
        r"jsonschema_(?:is_valid|validate)\(\s*'((?:[^']|'')*)'::(jsonb|json)\s*,\s*"
        r"'((?:[^']|'')*)'::(jsonschema_compiled|jsonb|json)",
        stmt, re.S)
    if not dm:
        return None
    # "variant" records the RESULT rendering: only validate(json, json)
    # returns raw hand-serialized text (json_schema_validate.c:289-312); every
    # other overload round-trips through jsonb (json_schema_validate.c:271-284,
    # 2175-2199), normalizing key order and spacing.
    if mode == "validate":
        variant = "json" if dm.group(4) == "json" else "jsonb"
    else:
        variant = dm.group(2)
    return (test, mode, variant, unescape_sql(dm.group(1)), unescape_sql(dm.group(3)))


def main() -> None:
    lines = open(OUT).read().split("\n")
    cases = []
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        stripped = line.strip()
        if stripped.startswith("SELECT '") or stripped.startswith("WITH "):
            stmt_lines = [line]
            while not stmt_lines[-1].rstrip().endswith(";"):
                i += 1
                stmt_lines.append(lines[i])
            stmt = "\n".join(stmt_lines)
            parsed = parse_statement(stmt)
            if parsed is None:
                i += 1
                continue
            test, mode, variant, data, schema = parsed
            # result block: header | separator | value row | (1 row)
            i += 1
            while i < n and "---" not in lines[i]:
                i += 1
            i += 1  # value row
            row = lines[i]
            value = row.split("|", 1)[1].strip() if "|" in row else row.strip()
            case = {
                "test": test,
                "data": data,
                "schema": schema,
                "mode": mode,
                "variant": variant,
            }
            if mode == "validate":
                case["expected_valid"] = value == "[]"
                case["expected_errors"] = value
            else:
                case["expected_valid"] = value == "t"
                case["expected_errors"] = None
            cases.append(case)
        i += 1

    with open(DEST, "w") as f:
        for c in cases:
            f.write(json.dumps(c) + "\n")
    n_valid = sum(1 for c in cases if c["expected_valid"])
    print(f"{len(cases)} cases -> {DEST} ({n_valid} valid / {len(cases)-n_valid} invalid)")
    for c in cases:
        if c["schema"] is not None:
            json.loads(c["schema"])
        json.loads(c["data"])
    print("all data/schema literals parse as JSON")


if __name__ == "__main__":
    sys.exit(main())
