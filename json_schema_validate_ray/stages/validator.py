"""Per-document JSON validation as a stateful ``map_batches`` actor stage.

The Ray analog of the reference's compiled-schema row loop
(json_schema_validate.c:2102-2116 ``jsonschema_is_valid_compiled`` applied per
row by the SQL executor): the schema is compiled ONCE per actor in
``__init__`` — including every regex (the reference's per-backend cache,
json_schema_validate.c:88-92, warmed eagerly) — and ``__call__`` validates a
whole Arrow batch of JSON text per invocation.

    ds.map_batches(JsonDocValidator,
                   fn_constructor_kwargs={"schema": SCHEMA, "json_column": "props",
                                          "id_column": "event_id"},
                   batch_format="pyarrow", concurrency=N)
"""

from __future__ import annotations

import json
from typing import Optional

import pyarrow as pa

from ..functions.compiler import CompiledSchema, jsonschema_compile
from ..functions.evaluator import Evaluator, render_errors_json
from ..functions.jsonvalue import parse_json


class JsonDocValidator:
    """Appends ``valid`` (bool) and optionally ``errors`` (JSON text, the
    reference's jsonschema_validate error-array format) per document."""

    def __init__(self, schema, json_column: str, id_column: Optional[str] = None,
                 emit_errors: bool = False, exact_numerics: bool = False,
                 keep_columns: Optional[tuple] = None):
        if not isinstance(schema, CompiledSchema):
            schema = jsonschema_compile(schema)
        self.evaluator = Evaluator(schema)
        self.json_column = json_column
        self.id_column = id_column
        self.emit_errors = emit_errors
        # extra input columns to pass through unchanged (e.g. a timestamp
        # for windowed valid-rate compositions)
        self.keep_columns = tuple(keep_columns or ())
        # exact_numerics=True parses numbers as Decimal (full reference
        # parity); False uses stock json.loads (faster; identical verdicts
        # unless the schema exercises exact-decimal multipleOf/equality)
        self.exact_numerics = exact_numerics

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.json_column].to_pylist()
        validate = self.evaluator.validate_document
        loads = parse_json if self.exact_numerics else json.loads
        valids = []
        errors_out = [] if self.emit_errors else None
        for t in texts:
            if t is None:
                valids.append(None)
                if errors_out is not None:
                    errors_out.append(None)
                continue
            try:
                doc = loads(t)
            except (ValueError, TypeError):
                valids.append(False)
                if errors_out is not None:
                    errors_out.append('[{"path":"","message":"Invalid JSON"}]')
                continue
            if errors_out is None:
                valids.append(validate(doc, None))
            else:
                errs: list = []
                valids.append(validate(doc, errs))
                errors_out.append(render_errors_json(errs))
        cols = {}
        if self.id_column is not None and self.id_column in batch.column_names:
            cols[self.id_column] = batch[self.id_column]
        for c in self.keep_columns:
            if c in batch.column_names:
                cols[c] = batch[c]
        cols["valid"] = pa.array(valids, type=pa.bool_())
        if errors_out is not None:
            cols["errors"] = pa.array(errors_out, type=pa.string())
        return pa.table(cols)


class RowParityValidator:
    """Exact reference-semantics validation of TABLE rows: each row becomes
    the JSON object {column: value, ...} (nulls = missing) and runs through
    the corpus-verified recursive evaluator — the row-at-a-time path the
    reference executes for every SQL row (json_schema_validate.c:204-214).
    CPU-bound by design; used when byte-exact error parity is required and
    as the parity cross-check against the vectorized TablePlan."""

    def __init__(self, schema, id_column: Optional[str] = None):
        if not isinstance(schema, CompiledSchema):
            schema = jsonschema_compile(schema)
        self.evaluator = Evaluator(schema)
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        validate = self.evaluator.validate_document
        valids = [validate({k: v for k, v in row.items() if v is not None}, None)
                  for row in rows]
        cols = {}
        if self.id_column is not None and self.id_column in batch.column_names:
            cols[self.id_column] = batch[self.id_column]
        cols["valid"] = pa.array(valids, type=pa.bool_())
        return pa.table(cols)


class JsonViolationExtractor:
    """Per-document validation emitting one violation row per error:
    ``(doc_id, constraint_id, path, message, observed)`` — the engine's
    violation-row surface over JSON documents."""

    def __init__(self, schema, json_column: str, id_column: str,
                 exact_numerics: bool = False):
        if not isinstance(schema, CompiledSchema):
            schema = jsonschema_compile(schema)
        self.evaluator = Evaluator(schema)
        self.json_column = json_column
        self.id_column = id_column
        self.exact_numerics = exact_numerics

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.json_column].to_pylist()
        ids = batch[self.id_column].to_pylist()
        loads = parse_json if self.exact_numerics else json.loads
        doc_ids, cids, paths, msgs, obs = [], [], [], [], []
        for did, t in zip(ids, texts):
            if t is None:
                continue
            try:
                doc = loads(t)
            except (ValueError, TypeError):
                doc_ids.append(str(did)); cids.append("document/parse")
                paths.append(""); msgs.append("Invalid JSON"); obs.append(t[:128])
                continue
            errs: list = []
            if not self.evaluator.validate_document(doc, errs):
                for e in errs:
                    doc_ids.append(str(did))
                    # constraint id = error path (the column/keyword locus)
                    cids.append(e["path"] or "$")
                    paths.append(e["path"])
                    msgs.append(e["message"])
                    obs.append("")
        return pa.table({
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "constraint_id": pa.array(cids, type=pa.string()),
            "path": pa.array(paths, type=pa.string()),
            "message": pa.array(msgs, type=pa.string()),
            "observed": pa.array(obs, type=pa.string()),
        })
