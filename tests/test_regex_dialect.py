"""Regex dialect pinning: POSIX ERE (the reference, REG_EXTENDED,
json_schema_validate.c:188) vs Python ``re`` (this engine).

Each divergence is enumerated here with the engine's CHOSEN behavior asserted
on both validation paths (per-row evaluator and vectorized kernels), so any
future dialect change is a visible test break, not a silent verdict flip.

Chosen behaviors (documented in functions/compiler.py):
* Perl classes (\\d \\w \\s ...): Python semantics (character classes).  In
  POSIX ERE these are undefined (glibc matches the literal letter); schemas
  relying on literal 'd' via '\\d' will diverge from the reference.
* Back-references (\\1): supported (Python).  Invalid in POSIX ERE.
* POSIX bracket classes ([[:digit:]] etc.): translated, work on both paths.
* Open-ended lower interval ``{,3}``: Python treats it as {0,3}.
* Invalid patterns (unbalanced paren): the check silently PASSES — identical
  to the reference's regcomp-failure behavior (json_schema_validate.c:189-198).
"""

import pyarrow as pa

from json_schema_validate_ray.functions.compiler import jsonschema_compile
from json_schema_validate_ray.functions.evaluator import Evaluator
from json_schema_validate_ray.stages.vectorized import TablePlan


def _row_verdict(pattern: str, value: str) -> bool:
    schema = {"type": "object",
              "properties": {"a": {"type": "string", "pattern": pattern}}}
    return Evaluator(jsonschema_compile(schema)).validate_document({"a": value}, None)


def _vec_verdict(pattern: str, value: str) -> bool:
    schema = {"type": "object",
              "properties": {"a": {"type": "string", "pattern": pattern}}}
    plan = TablePlan(schema, id_column="a")
    valid, _ = plan.evaluate_batch(pa.table({"a": [value]}))
    return bool(valid[0])


def _both(pattern: str, value: str) -> bool:
    r, v = _row_verdict(pattern, value), _vec_verdict(pattern, value)
    assert r == v, f"row/vectorized disagree on {pattern!r} vs {value!r}: {r} != {v}"
    return r


def test_perl_digit_class_is_python_semantics():
    # POSIX ERE would match the literal 'd'; we CHOOSE Python \d = [0-9]
    assert _both(r"^\d+$", "123")
    assert not _both(r"^\d+$", "ddd")


def test_perl_word_class_is_python_semantics():
    assert _both(r"^\w+$", "ab_9")
    assert not _both(r"^\w+$", "!!")


def test_perl_space_class_is_python_semantics():
    assert _both(r"a\sb", "a b")
    assert not _both(r"a\sb", "asb")


def test_backreference_supported():
    # invalid in POSIX ERE; we CHOOSE Python support
    assert _both(r"^(ab)\1$", "abab")
    assert not _both(r"^(ab)\1$", "abcd")


def test_posix_bracket_classes_translated():
    assert _both(r"^[[:digit:]]+$", "42")
    assert not _both(r"^[[:digit:]]+$", "4a")
    assert _both(r"^[[:alpha:][:space:]]+$", "ab cd")
    assert not _both(r"^[[:alpha:][:space:]]+$", "ab9")


def test_interval_bounds():
    assert _both(r"^a{2,3}$", "aa")
    assert _both(r"^a{2,3}$", "aaa")
    assert not _both(r"^a{2,3}$", "a")
    assert not _both(r"^a{2,3}$", "aaaa")
    # open lower bound: Python {,3} == {0,3}
    assert _both(r"^a{,3}$", "")
    assert _both(r"^a{,3}$", "aaa")
    assert not _both(r"^a{,3}$", "aaaa")


def test_invalid_pattern_silently_passes():
    # regcomp failure -> check passes (json_schema_validate.c:189-198, 972)
    assert _both(r"(unbalanced", "anything")


def test_malformed_brace_is_literal():
    # "a{bad" compiles as a LITERAL in both Python re and RE2 — it is not an
    # invalid pattern, so the check applies
    assert _both(r"a{bad", "xx a{bad yy")
    assert not _both(r"a{bad", "zzz")


def test_unanchored_search_semantics():
    # regexec searches anywhere in the string (not fullmatch)
    assert _both("doc", "xx doc yy")
    assert not _both("^doc", "xx doc")


def test_gnu_word_anchors_translated():
    # glibc regcomp supports \< \> (start/end of word); Python re rejects
    # them, which used to make the check silently pass — now translated
    assert _both(r"\<cat\>", "the cat sat")
    assert not _both(r"\<cat\>", "concatenate")
    assert not _both(r"\<cat\>", "cats")
    assert _both(r"\<cat", "cats")          # start-of-word only
    assert not _both(r"\<cat", "concat")
    assert _both(r"cat\>", "concat")        # end-of-word only
    assert not _both(r"cat\>", "cats")


def test_gnu_buffer_anchors_translated():
    assert _both("\\`abc", "abcdef")
    assert not _both("\\`abc", "xabc")
    assert _both(r"def\'", "abcdef")
    assert not _both(r"def\'", "defabc")


def test_escaped_backslash_before_angle_stays_literal():
    # "\\\\<" is a literal backslash then '<' — NOT a word anchor
    assert _both(r"a\\<b", r"a\<b")
    assert not _both(r"a\\<b", "a<b")


def test_collating_and_equivalence_elements():
    # [[.a.]] / [[=a=]] are POSIX collating/equivalence elements for 'a';
    # Python would read the inner tokens as a class containing '[', '.', 'a'
    assert _both(r"^[[.a.]]+$", "aaa")
    assert not _both(r"^[[.a.]]+$", "...")   # '.' must NOT match
    assert not _both(r"^[[.a.]]+$", "[[[")   # '[' must NOT match
    assert _both(r"^[[=a=]]+$", "aa")
    assert not _both(r"^[[=a=]]+$", "==")
    # special chars inside the element are escaped, not interpreted
    assert _both(r"^[x[.^.]]+$", "x^x")
    assert not _both(r"^[x[.^.]]+$", "b")    # ^ after [ is NOT negation here


def test_class_of_dot_and_a_not_mistranslated():
    # "[.a]" is a plain class {., a} — no collating element (no ".]" pair
    # at the single-char offset), must pass through untouched
    assert _both(r"^[.a]+$", ".a.")
    assert not _both(r"^[.a]+$", "b")


def test_word_anchor_inside_bracket_is_literal_members():
    # POSIX: inside [...] a backslash is an ordinary literal, so [\<x] is
    # the class {\, <, x} — the \< must NOT become a word anchor (which in
    # Python would match backspace/word chars instead).  ADVICE r4.
    assert _both(r"^[\<x]+$", "x<x")
    assert _both(r"^[\<x]+$", "\\")          # backslash IS a member
    assert not _both(r"^[\<x]+$", "b")
    assert not _both(r"^[\<x]+$", "\b")      # \b backspace must NOT match


def test_buffer_anchor_inside_bracket_is_literal_members():
    # [\`] under POSIX is the class {\, `}
    assert _both(r"^[\`]+$", "`")
    assert _both(r"^[\`]+$", "\\")
    assert not _both(r"^[\`]+$", "a")


def test_bracket_context_ends_translation_suppression():
    # after the bracket closes, \< is a word anchor again
    assert _both(r"^[\<]\<cat", "<cat sat"[0:] )
    assert not _both(r"^[\<]\<cat", "<concat")


def test_negated_class_with_backslash_member():
    # [^\<x] excludes backslash, '<' and 'x'
    assert _both(r"^[^\<x]+$", "abc")
    assert not _both(r"^[^\<x]+$", "a<c")
    assert not _both(r"^[^\<x]+$", "a\\c")


def test_literal_close_bracket_first_member_with_anchor_token():
    # []x] puts ']' in the class ([ then literal-]); the trailing \< still
    # translates because the bracket tracker closed at the real ']'
    assert _both(r"^[]x]+ \<cat", "]x cat")
    assert not _both(r"^[]x]+ \<cat", "]x concat"[:-3] + "xyz")
    assert not _both(r"^[]x]+ \<cat", "]xcat")
