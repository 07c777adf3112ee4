"""Deterministic content-addressed percent bands over an id column.

Every sampling/mixing/splitting operator in this engine assigns each row a
stable band in [0, 100) derived purely from its id, then keeps rows with
``band < rate``.  Content addressing makes the predicate reproducible
across runs, workers and resumes with no RNG state, and lets any worker
compute it independently (a pure map — no shuffle).

Two interchangeable band functions:

- ``mode="md5"`` — ``int(md5(str(id)).hexdigest()[:8], 16) % 100``.
  Bit-identical to the DuckDB oracle predicate
  ``CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8)) AS BIGINT) % 100``,
  so SQL-checked registry queries use it.  One ``hashlib`` call per row:
  fine at test scale, a full-corpus Python loop at 100 TB.
- ``mode="fast"`` — the repo's vectorized splitmix64 hash
  (``state.sketches._hash64``) ``% 100``.  No per-row Python (numpy over
  the Arrow value buffers), deterministic across runs/workers (no
  PYTHONHASHSEED dependence), same uniform keep-rate statistics; the band
  MEMBERSHIP differs from md5, which is irrelevant for production sampling
  but means "fast" cannot be checked against a DuckDB ``md5()`` oracle.
  This is the production band for scale pipelines (the CLI default).

tests/test_banding.py pins determinism, block-layout invariance, keep-rate
agreement between the two modes, and the md5<->oracle equivalence.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

BAND_MODES = ("md5", "fast")


def band_hash32(ids) -> np.ndarray:
    """Raw 32-bit md5-prefix hash per id (the band convention WITHOUT the
    % 100), for operators that need the full uniform value — e.g. the
    hash/weight priorities of deterministic weighted sampling.  Matches
    the DuckDB expression
    ``CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8)) AS BIGINT)``."""
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return np.fromiter(
        (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
         for i in ids.to_pylist()),
        dtype=np.int64, count=len(ids))


def band_values(ids, mode: str = "md5") -> np.ndarray:
    """Per-row band in [0, 100) for an Arrow array/ChunkedArray of ids.

    The band depends only on each id's VALUE (never on row position or
    block layout), so any slicing of the input yields the same assignment.
    """
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    if mode == "fast":
        from ..state.sketches import _hash64
        return (_hash64(ids) % np.uint64(100)).astype(np.int64)
    if mode != "md5":
        raise ValueError(f"unknown band mode {mode!r}; expected one of "
                         f"{BAND_MODES}")
    return np.fromiter(
        (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
         for i in ids.to_pylist()),
        dtype=np.int64, count=len(ids))


def band_mask(ids, rate, mode: str = "md5") -> pa.BooleanArray:
    """Keep-mask ``band < rate``; ``rate`` is a scalar percent or a per-row
    integer array (e.g. a per-language mixture rate looked up per row)."""
    b = band_values(ids, mode)
    return pa.array(b < np.asarray(rate, dtype=np.int64))
