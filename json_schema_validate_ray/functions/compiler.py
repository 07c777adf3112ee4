"""Schema compilation: schema JSON -> CompiledSchema.

The reference's ``jsonschema_compile`` stores a verbatim copy of the schema and
relies on a lazily-populated per-backend regex cache
(json_schema_validate.c:2036-2056, 143-199).  Our compilation is eager: we walk
the schema once on the driver, pre-compile every regex it can ever need
(``pattern``, ``patternProperties`` keys, the ``format`` table patterns), and
ship the result to Ray actors once via the object store — so per-batch work
never compiles a regex.

Regex dialect note: the reference uses POSIX ERE (REG_EXTENDED | REG_NOSUB,
json_schema_validate.c:188).  We use Python ``re`` with POSIX character-class
translation ([:space:] etc.); the reference corpus patterns are
dialect-neutral and parity is pinned by tests/corpus tests.  A pattern that
fails to compile is recorded as invalid and — exactly like the reference
(json_schema_validate.c:189-198, 972) — its check silently passes.
"""

from __future__ import annotations

import json
import re
from decimal import Decimal
from typing import Any, Optional

from .jsonvalue import parse_json

# The reference's 9 format regexes, ported verbatim from the format_table
# (json_schema_validate.c:1753-1791) with POSIX [:space:] translated to \s.
FORMAT_TABLE: dict[str, tuple[str, str]] = {
    "date-time": (
        r"^[0-9]{4}-[0-9]{2}-[0-9]{2}[Tt][0-9]{2}:[0-9]{2}:[0-9]{2}(\.[0-9]+)?([Zz]|[+-][0-9]{2}:[0-9]{2})?$",
        "String does not match date-time format",
    ),
    "date": (
        r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$",
        "String does not match date format",
    ),
    "time": (
        r"^([01][0-9]|2[0-3]):[0-5][0-9]:[0-5][0-9](\.[0-9]+)?([Zz]|[+-][0-9]{2}:[0-9]{2})?$",
        "String does not match time format",
    ),
    "email": (
        r"^[^@\s]+@[^@\s]+\.[^@\s]+$",
        "String does not match email format",
    ),
    "hostname": (
        r"^[a-zA-Z0-9]([a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?(\.[a-zA-Z0-9]([a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?)*$",
        "String does not match hostname format",
    ),
    "ipv4": (
        r"^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$",
        "String does not match IPv4 format",
    ),
    "ipv6": (
        r"^([0-9a-fA-F]{1,4}:){7}[0-9a-fA-F]{1,4}$|^::$|^(([0-9a-fA-F]{1,4}:)*[0-9a-fA-F]{1,4})?::([0-9a-fA-F]{1,4}(:([0-9a-fA-F]{1,4}))*)?$",
        "String does not match IPv6 format",
    ),
    "uri": (
        r"^[a-zA-Z][a-zA-Z0-9+.-]*:.+$",
        "String does not match URI format",
    ),
    "uuid": (
        r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
        "String does not match UUID format",
    ),
}

_FORMAT_REGEXES: dict[str, re.Pattern] = {
    name: re.compile(pat) for name, (pat, _msg) in FORMAT_TABLE.items()
}

# POSIX bracket-expression classes -> Python re equivalents, applied inside
# user patterns so POSIX-ERE-style schemas keep working.
_POSIX_CLASSES = {
    "[:alnum:]": "a-zA-Z0-9",
    "[:alpha:]": "a-zA-Z",
    "[:digit:]": "0-9",
    "[:lower:]": "a-z",
    "[:upper:]": "A-Z",
    "[:space:]": r" \t\n\r\f\v",
    "[:xdigit:]": "0-9a-fA-F",
    "[:punct:]": r"!-/:-@\[-`{-~",
    "[:blank:]": r" \t",
}


# GNU/POSIX escape forms Python `re` rejects or misreads, translated to the
# equivalent Python constructs.  \< and \> (GNU start/end-of-word, supported
# by glibc regcomp) previously failed to compile in `re`, so the check
# silently PASSED where the reference matched a word boundary — a real
# dialect divergence, now translated instead.
_GNU_ESCAPES = {
    "<": r"\b(?=\w)",   # start of word
    ">": r"\b(?<=\w)",  # end of word
    "`": r"\A",         # start of buffer
    "'": r"\Z",         # end of buffer
}

_TRANSLATE_TOKENS = ("[:", "[.", "[=", "\\<", "\\>", "\\`", "\\'")


def translate_posix_pattern(pattern: str) -> str:
    """Translate POSIX/GNU ERE constructs so schema patterns behave in
    Python ``re`` as they do under the reference's regcomp
    (json_schema_validate.c:188): bracket classes ``[:alpha:]`` expand to
    ranges, single-char collating/equivalence elements ``[.x.]`` / ``[=x=]``
    become the character itself (Python would read them as a class of
    ``[``/``.``/x), and GNU word/buffer anchors ``\\< \\> \\` \\'`` map to
    lookaround/absolute anchors.  OUTSIDE a bracket expression a backslash
    escapes the next character, so ``\\\\<`` stays a literal backslash +
    ``<``; INSIDE ``[...]`` POSIX makes a backslash an ordinary literal
    member (no escaping), so in-bracket content skips the GNU-escape
    substitution and a bare ``\\`` is emitted doubled so Python keeps it a
    class member instead of reading it as an escape.  Remaining divergences
    are CHOSEN Python semantics, pinned in tests/test_regex_dialect.py."""
    if not any(tok in pattern for tok in _TRANSLATE_TOKENS):
        return pattern
    out: list[str] = []
    i, n = 0, len(pattern)
    in_bracket = False      # inside a [...] bracket expression
    bracket_first = False   # at class-start position (right after [ or [^)
    while i < n:
        c = pattern[i]
        if c == "[" and i + 1 < n and pattern[i + 1] in ":.=":
            # [:class:] / [.coll.] / [=equiv=] sub-elements (valid inside a
            # bracket expression; also expanded bare, matching prior rounds)
            mark = pattern[i + 1]
            end = pattern.find(mark + "]", i + 2)
            if mark == ":" and end != -1:
                cls = pattern[i:end + 2]
                if cls in _POSIX_CLASSES:
                    out.append(_POSIX_CLASSES[cls])
                    i = end + 2
                    bracket_first = False
                    continue
            elif mark in ".=" and end == i + 3:   # single-char [.x.] / [=x=]
                out.append(re.escape(pattern[i + 2]))
                i = end + 2
                bracket_first = False
                continue
        if in_bracket:
            if c == "]" and not bracket_first:
                in_bracket = False
            elif c == "\\":
                # POSIX: backslash is a literal inside [...] — double it so
                # Python keeps it a class member, and do NOT consume the
                # next character as an escape pair
                out.append("\\")
                bracket_first = False
            else:
                bracket_first = False
            out.append(c)
            i += 1
            continue
        if c == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            out.append(_GNU_ESCAPES.get(nxt, c + nxt))
            i += 2
            continue
        if c == "[":
            in_bracket = True
            out.append(c)
            i += 1
            if i < n and pattern[i] == "^":
                out.append("^")
                i += 1
            bracket_first = True    # ] here is a literal member ([]a] rule)
            continue
        out.append(c)
        i += 1
    return "".join(out)


class RegexCache:
    """Eager analog of the reference's per-backend regex cache
    (json_schema_validate.c:81-92, 143-199).  Unlike the reference we do not
    truncate keys to 256 bytes (a collision quirk) nor cap at 128 entries —
    the cache is bounded by the number of distinct patterns in ONE schema.
    ``None`` entries mark patterns that failed to compile: their checks pass
    silently, matching regcomp-failure behavior."""

    def __init__(self) -> None:
        self._cache: dict[str, Optional[re.Pattern]] = {}

    def get(self, pattern: str) -> Optional[re.Pattern]:
        try:
            return self._cache[pattern]
        except KeyError:
            pass
        try:
            compiled: Optional[re.Pattern] = re.compile(translate_posix_pattern(pattern))
        except re.error:
            compiled = None
        self._cache[pattern] = compiled
        return compiled

    def warm(self, pattern: str) -> None:
        self.get(pattern)


def _walk_patterns(schema: Any, cache: RegexCache) -> None:
    """Pre-compile every regex a schema can reference: ``pattern`` values,
    ``patternProperties`` keys, and the format-table patterns are already
    module-level constants."""
    if isinstance(schema, dict):
        pat = schema.get("pattern")
        if isinstance(pat, str):
            cache.warm(pat)
        pp = schema.get("patternProperties")
        if isinstance(pp, dict):
            for key in pp:
                cache.warm(key)
        for v in schema.values():
            _walk_patterns(v, cache)
    elif isinstance(schema, list):
        for v in schema:
            _walk_patterns(v, cache)


class CompiledSchema:
    """A reusable compiled schema: parsed schema value + warmed regex cache.

    Mirrors the ``jsonschema_compiled`` type (json_schema_validate.c:68-76,
    2036-2056) but with real eager compilation.  Picklable (regexes re-warm on
    unpickle), so it broadcasts cleanly to Ray actors via constructor args.
    """

    __slots__ = ("schema", "regex_cache")

    def __init__(self, schema: Any) -> None:
        self.schema = schema
        self.regex_cache = RegexCache()
        _walk_patterns(schema, self.regex_cache)

    def __getstate__(self):
        return {"schema": self.schema}

    def __setstate__(self, state):
        self.schema = state["schema"]
        self.regex_cache = RegexCache()
        _walk_patterns(self.schema, self.regex_cache)

    def to_json(self) -> str:
        """Serialize back to schema JSON text — the analog of
        ``jsonschema_compiled_out`` (json_schema_validate.c:2086-2095)."""
        return json.dumps(self.schema, default=str)

    def __repr__(self) -> str:
        return f"CompiledSchema({self.to_json()[:80]}...)"


def jsonschema_compile(schema) -> CompiledSchema:
    """Compile a schema given as JSON text, a parsed value, or a bool.

    Accepts what the SQL surface accepts (jsonb schema or boolean schema,
    json_schema_validate.c:324-338); shape errors surface at validate time to
    match the reference (which defers them)."""
    if isinstance(schema, str):
        schema = parse_json(schema)
    return CompiledSchema(schema)
