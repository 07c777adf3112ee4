"""Canonical schemas for the flagship pipelines."""

from ..sources.tokens import MAX_TOKENS, SOURCES, VOCAB_SIZE

# The tokens-table constraint schema (the input_hint table's contract).
# Every keyword here compiles to a vectorized Arrow kernel (stages/vectorized.py);
# semantics are the reference's (json_schema_validate.c checks cited per kernel).
TOKENS_SCHEMA = {
    "type": "object",
    "required": ["doc_id", "tokens", "n_tok", "source"],
    "properties": {
        "doc_id": {
            "type": "string",
            "minLength": 1,
            "maxLength": 64,
            "pattern": "^doc-",
        },
        "tokens": {
            "type": "array",
            "minItems": 1,
            "maxItems": MAX_TOKENS,
            "items": {
                "type": "integer",
                "minimum": 0,
                "exclusiveMaximum": VOCAB_SIZE,
            },
        },
        "n_tok": {
            "type": "integer",
            "minimum": 1,
            "maximum": MAX_TOKENS,
        },
        "source": {
            "type": "string",
            "enum": list(SOURCES),
        },
    },
}

# events.props JSON documents (FIXTURES.md §4): nested-schema target for the
# per-document (actor-pool) validator path.
PROPS_SCHEMA = {
    "type": "object",
    "required": ["country"],
    "properties": {
        "country": {"type": "string", "minLength": 2, "maxLength": 2,
                    "pattern": "^[A-Z]{2}$"},
        "postal_code": {"type": "string", "minLength": 3},
        "age": {"type": "integer", "minimum": 0, "maximum": 150},
        "tags": {"type": "array", "items": {"type": "string"}, "maxItems": 16},
    },
    "additionalProperties": True,
}
