"""End-to-end corpus curation: the flagship composition of the engine's
training-data operators into one pipeline —

    weighted mixture filter  (content-addressed md5 band per language)
 -> near-dup deduplication   (MinHash+LSH verified pairs -> connected
                              components -> canonical survivors)
 -> sequence packing         (distributed prefix sum -> context-window bins)

Every stage is the already-oracled operator; the composition itself is also
SQL-expressible (the summary query chains the same predicates as CTEs), so
the end-to-end result is bit-checkable, not just each piece.

Scale shape: the mixture filter is one streaming pass (no shuffle); dedup
shuffles only id/signature payloads (text never enters the count
exchanges); packing adds one sort of (id, n_tokens) pairs plus a per-block
offset round-trip.  Nothing materializes the corpus on the driver.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


def mixture_filter(ds, id_column: str = "doc_id", lang_column: str = "lang",
                   rates: dict | None = None, default_rate: int = 100):
    """Keep a per-language fraction via the deterministic md5 band
    (reproducible, resume-friendly; no RNG state)."""
    rates = rates or {}

    def keep(b: pa.Table) -> pa.Table:
        ids = b[id_column].to_pylist()
        rr = [rates.get(l, default_rate) for l in b[lang_column].to_pylist()]
        mask = [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100 < r
                for i, r in zip(ids, rr)]
        return b.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def curate_corpus(ds, id_column: str = "doc_id", text_column: str = "text",
                  lang_column: str = "lang", mix_rates: dict | None = None,
                  threshold: float = 0.5, capacity: int = 2048):
    """mixture -> near-dup survivors -> packed bins.  Returns the packed
    dataset (id, n_tokens, bin_id)."""
    from .dedup import near_dup_survivors
    from .packing import pack_sequences

    mixed = mixture_filter(ds, id_column, lang_column, mix_rates)
    deduped = near_dup_survivors(mixed, text_column, id_column,
                                 threshold=threshold)
    return pack_sequences(deduped, id_column, text_column, capacity=capacity)


def curate_summary(ds, id_column: str = "doc_id", text_column: str = "text",
                   lang_column: str = "lang", mix_rates: dict | None = None,
                   threshold: float = 0.5, capacity: int = 2048) -> pa.Table:
    """One-row accounting of the whole curation run: input docs, docs after
    mixing, docs after dedup, bins/tokens/fill of the packed output.  All
    exact int64."""
    from .packing import packing_summary

    from .dedup import near_dup_survivors
    from .packing import pack_sequences

    n_input = ds.count()
    # materialized: the mixed corpus feeds both the count and the dedup
    mixed = mixture_filter(ds, id_column, lang_column,
                           mix_rates).materialize()
    n_mixed = mixed.count()
    deduped = near_dup_survivors(mixed, text_column, id_column,
                                 threshold=threshold)
    packed = pack_sequences(deduped, id_column, text_column,
                            capacity=capacity)
    ps = packing_summary(packed, capacity=capacity).to_pylist()[0]
    return pa.table({
        "n_input": pa.array([n_input], type=pa.int64()),
        "n_after_mix": pa.array([n_mixed], type=pa.int64()),
        "n_after_dedup": pa.array([ps["n_docs"]], type=pa.int64()),
        "total_tokens": pa.array([ps["total_tokens"]], type=pa.int64()),
        "n_bins": pa.array([ps["n_bins"]], type=pa.int64()),
        "fill_rate_1e6": pa.array([ps["fill_rate_1e6"]], type=pa.int64()),
    })
