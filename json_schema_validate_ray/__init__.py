"""json_schema_validate_ray — a Ray-Data-native schema + constraint validation engine.

A from-scratch reimplementation of the query/data-processing capabilities of the
``adunstan/json_schema_validate`` PostgreSQL extension (reference at
``/root/reference/``), re-expressed Ray-Data-first:

* ``functions/`` — the per-document JSON-Schema validator core: schema
  compiler (eager regex compilation, the reference's session regex cache
  analog, json_schema_validate.c:143-199) and a quirk-faithful recursive
  evaluator (json_schema_validate.c:317-549).
* ``stages/``   — ``map_batches`` stage callables (stateful actor-pool
  validators, vectorized Arrow kernels for flat constraints).
* ``sources/``  — deterministic tokens-table synthesis + parquet readers.
* ``pipelines/``— end-to-end validation / dedup / similarity / text-analysis
  pipelines over ``ray.data.Dataset``.
* ``state/``    — mergeable sketches (HyperLogLog, histograms, drift stats).

Public per-document API mirrors the reference SQL surface
(json_schema_validate--0.1.0.sql:6-92):

    jsonschema_is_valid(data, schema)   -> bool
    jsonschema_validate(data, schema)   -> list of {"path","message"} errors
    jsonschema_compile(schema)          -> CompiledSchema (reusable, regexes
                                           pre-compiled once)
"""

from .functions.compiler import CompiledSchema, jsonschema_compile
from .functions.evaluator import (
    jsonschema_is_valid,
    jsonschema_validate,
    jsonschema_validate_text,
)

__all__ = [
    "CompiledSchema",
    "jsonschema_compile",
    "jsonschema_is_valid",
    "jsonschema_validate",
    "jsonschema_validate_text",
]

__version__ = "0.1.0"
