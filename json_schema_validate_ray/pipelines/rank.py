"""Global rank / ROW_NUMBER and NTILE over a distributed sort.

SQL's ``ROW_NUMBER() OVER (ORDER BY ...)`` needs a total order — the one
window shape that genuinely requires a global sort.  Distributed as the same
two-pass prefix pattern as sequence packing (pipelines/packing.py): Ray's
range-partitioned ``Dataset.sort`` does the all-to-all ONCE on a projected
(key, id) table (never the payload), then each block of the materialized
sorted dataset reports one tiny (first_key, n_rows) row; the driver computes
exclusive row offsets (O(#blocks), independent of corpus size) and broadcasts
them; the assign pass adds ``offset + arange`` per block — streaming, no
second shuffle.

NTILE(t) follows from the rank and the total row count with the standard SQL
fill rule (the first ``n % t`` tiles get one extra row), so it costs nothing
beyond the rank pass.

Partitioning assumption: ``id_column`` is unique (it is the tie-breaker that
makes the total order — and therefore the rank — deterministic).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ntile_from_rank(rank: np.ndarray, n_total: int, tiles: int) -> np.ndarray:
    """SQL NTILE: tiles as even as possible, larger tiles first."""
    base, rem = divmod(n_total, tiles)
    head = rem * (base + 1)  # rows covered by the (base+1)-sized tiles
    out = np.empty(len(rank), dtype=np.int64)
    in_head = rank <= head
    out[in_head] = (rank[in_head] - 1) // (base + 1) + 1
    if base:
        out[~in_head] = rem + (rank[~in_head] - head - 1) // base + 1
    return out


def global_rank(ds, key_column: str, id_column: str,
                descending: bool = True, ntile: int = None,
                rank_name: str = "rnk", ntile_name: str = "quartile",
                percent_rank: bool = False,
                percent_rank_name: str = "pct_rank_1e6"):
    """(id, key, rank[, ntile]) with rank = ROW_NUMBER() OVER
    (ORDER BY key [DESC], id).  ``ds`` must already be projected to exactly
    [id_column, key_column] — callers drop payload columns BEFORE the sort
    so the one all-to-all moves two columns, not documents."""
    import ray

    sorted_ds = ds.sort([key_column, id_column],
                        descending=[descending, False]).materialize()

    # one row per BLOCK on the driver; order blocks by their first row's
    # position in the global sort (blocks of a materialized sorted dataset
    # are contiguous ranges, so the first id identifies the range)
    firsts = sorted_ds.map_batches(
        lambda b: pa.table({
            # types carried from the input columns, so string/int/float ids
            # and keys all round-trip (no silent numeric cast)
            "first_id": b[id_column].slice(0, min(1, b.num_rows)),
            "first_key": b[key_column].slice(0, min(1, b.num_rows)),
            "n_rows": pa.array([b.num_rows] if b.num_rows else [],
                               type=pa.int64())}),
        batch_format="pyarrow").take_all()
    # ORDER BY key [DESC], id ASC via two stable sorts (works for any
    # comparable key type — no arithmetic negation of the key)
    firsts.sort(key=lambda r: r["first_id"])
    firsts.sort(key=lambda r: r["first_key"], reverse=descending)
    if len({r["first_id"] for r in firsts}) != len(firsts):
        raise ValueError("global_rank: duplicate id across block boundaries "
                         "— the tie-breaker id must be unique")
    offsets: dict = {}
    acc = 0
    for r in firsts:
        offsets[r["first_id"]] = acc
        acc += r["n_rows"]
    n_total = acc
    offsets_ref = ray.put(offsets)

    def assign(b: pa.Table) -> pa.Table:
        cols = {id_column: pa.array([], type=b.schema.field(id_column).type),
                key_column: pa.array([], type=b.schema.field(key_column).type),
                rank_name: pa.array([], type=pa.int64())}
        if ntile:
            cols[ntile_name] = pa.array([], type=pa.int64())
        if percent_rank:
            cols[percent_rank_name] = pa.array([], type=pa.int64())
        if b.num_rows == 0:
            return pa.table(cols)
        off = ray.get(offsets_ref)[b[id_column][0].as_py()]
        rank = off + np.arange(1, b.num_rows + 1, dtype=np.int64)
        cols = {id_column: b[id_column], key_column: b[key_column],
                rank_name: pa.array(rank, type=pa.int64())}
        if ntile:
            cols[ntile_name] = pa.array(
                _ntile_from_rank(rank, n_total, ntile), type=pa.int64())
        if percent_rank:
            # SQL PERCENT_RANK = (rank-1)/(n-1), integer-scaled x1e6 with
            # pure integer arithmetic so both sides are bit-identical
            denom = max(n_total - 1, 1)
            cols[percent_rank_name] = pa.array(
                (rank - 1) * 1_000_000 // denom, type=pa.int64())
        return pa.table(cols)

    return sorted_ds.map_batches(assign, batch_format="pyarrow")
