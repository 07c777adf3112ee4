"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship tokens-table validation pipeline at sf0.001
scale; ``queries()`` / ``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 (see json_schema_validate_ray/pipelines/queries.py for the
registry, each with its DuckDB oracle where SQL-expressible).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ray.init() / ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from json_schema_validate_ray.pipelines import queries as _q


def entry() -> Any:
    """Flagship pipeline: synthesize the sf0.001-scale tokens table
    deterministically, run the vectorized schema-validation stage, and return
    the verdict Dataset (doc_id, valid, n_violations, violations)."""
    import ray.data as rd

    from json_schema_validate_ray.pipelines.validate import validate_dataset
    from json_schema_validate_ray.sources.tokens import write_tokens_parquet

    path = write_tokens_parquet("/tmp/jsv_tokens/entry_sf0.001", 6000,
                                n_partitions=8)
    return validate_dataset(rd.read_parquet(path))


def queries() -> dict[str, Callable[[str], Any]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
