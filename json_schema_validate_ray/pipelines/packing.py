"""Sequence packing: assign documents to fixed-capacity token bins.

The training-prep operator that turns a deduplicated corpus into
context-window-sized chunks: documents are taken in a deterministic global
order (sorted by id) and laid end-to-end; a document starts in bin
``floor(prefix_tokens_before / capacity)``.  This is the streaming-packing
semantics (a document longer than the remaining bin space spills into the
next bin rather than being reordered), which makes the result a pure
function of the sorted order — reproducible, resumable, and expressible as
a SQL window prefix sum (the oracle).

Distributed as a two-pass PREFIX SUM over the sorted dataset, not a serial
scan:

1. count pass: token counts per doc (vectorized RE2 kernel), text dropped —
   the sort shuffle carries only (id, n_tokens);
2. offset pass: each block of the materialized sorted dataset reports
   (first_id, block_token_sum) — one tiny row per BLOCK on the driver,
   independent of corpus size; the driver computes exclusive block offsets;
3. assign pass: offsets are broadcast (``ray.put``); each block adds its
   offset to its internal cumulative sum and derives bin ids — streaming,
   no further shuffle.

Partitioning assumption: ``id_column`` is unique (it is the pack order key);
the offset lookup raises if two blocks report the same first id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def pack_sequences(ds, id_column: str = "doc_id", text_column: str = "text",
                   capacity: int = 2048, count_column: str = None):
    """(id, n_tokens, bin_id) for every document.  ``count_column`` skips
    the tokenize pass when the input already carries token counts."""
    from ..stages.text import token_counts_arrow

    import ray

    if count_column is None:
        def count(b: pa.Table) -> pa.Table:
            return pa.table({
                id_column: b[id_column],
                "n_tokens": token_counts_arrow(b[text_column]).cast(pa.int64()),
            })
        counted = ds.map_batches(count, batch_format="pyarrow")
    else:
        counted = ds.map_batches(
            lambda b: pa.table({id_column: b[id_column],
                                "n_tokens": pc.cast(b[count_column], pa.int64())}),
            batch_format="pyarrow")

    # materialized: the block layout must be IDENTICAL in the offset pass
    # and the assign pass (blocks of a materialized dataset are pinned)
    sorted_ds = counted.sort(id_column).materialize()

    def block_partial(b: pa.Table) -> pa.Table:
        # first_id carries the INPUT id type (string ids work: the tokens
        # table's doc_id is string) — no hardcoded int64 cast
        return pa.table({
            "first_id": b[id_column].slice(0, min(1, b.num_rows)),
            "block_sum": pa.array(
                [int(pc.sum(b["n_tokens"]).as_py() or 0)]
                if b.num_rows else [], type=pa.int64()),
        })

    parts = sorted(
        ((r["first_id"], r["block_sum"]) for r in
         sorted_ds.map_batches(block_partial,
                               batch_format="pyarrow").take_all()),
        key=lambda t: t[0])
    if len({f for f, _ in parts}) != len(parts):
        raise ValueError(
            f"pack_sequences: duplicate {id_column} across block boundaries — "
            "the pack order key must be unique")
    offsets: dict = {}
    acc = 0
    for first_id, block_sum in parts:
        offsets[first_id] = acc
        acc += block_sum
    offsets_ref = ray.put(offsets)

    def assign(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({id_column: pa.array(
                                 [], type=b.schema.field(id_column).type),
                             "n_tokens": pa.array([], type=pa.int64()),
                             "bin_id": pa.array([], type=pa.int64())})
        off = ray.get(offsets_ref)[b[id_column][0].as_py()]
        n = b["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        prefix_before = off + np.cumsum(n) - n
        return pa.table({
            id_column: b[id_column],
            "n_tokens": pa.array(n, type=pa.int64()),
            "bin_id": pa.array(prefix_before // capacity, type=pa.int64()),
        })

    return sorted_ds.map_batches(assign, batch_format="pyarrow")


def packing_summary(packed, capacity: int = 2048) -> pa.Table:
    """One-row accounting over a pack_sequences output: bins used, total
    tokens, fill rate (total_tokens / (n_bins * capacity), exact 1e6-scaled
    int both sides)."""
    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"n_docs": pa.array([0], type=pa.int64()),
                             "tok": pa.array([0], type=pa.int64()),
                             "max_bin": pa.array([-1], type=pa.int64())})
        return pa.table({
            "n_docs": pa.array([b.num_rows], type=pa.int64()),
            "tok": pa.array([int(pc.sum(b["n_tokens"]).as_py() or 0)],
                            type=pa.int64()),
            "max_bin": pa.array([int(pc.max(b["bin_id"]).as_py())],
                                type=pa.int64()),
        })

    rows = packed.map_batches(partial, batch_format="pyarrow").take_all()
    n_docs = sum(r["n_docs"] for r in rows)
    tok = sum(r["tok"] for r in rows)
    n_bins = (max(r["max_bin"] for r in rows) + 1) if rows else 0
    fill = int(tok * 1_000_000 // (n_bins * capacity)) if n_bins else 0
    return pa.table({
        "n_docs": pa.array([n_docs], type=pa.int64()),
        "total_tokens": pa.array([tok], type=pa.int64()),
        "n_bins": pa.array([n_bins], type=pa.int64()),
        "fill_rate_1e6": pa.array([fill], type=pa.int64()),
    })
