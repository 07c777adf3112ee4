"""End-to-end corpus curation: the flagship composition of the engine's
training-data operators into one pipeline —

    weighted mixture filter  (content-addressed band per language)
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

The mixture band has two modes (stages/banding.py): ``band="md5"`` is the
oracle-parity band (bit-identical to the DuckDB md5 predicate, one hashlib
call per row); ``band="fast"`` is the vectorized splitmix64 band — same
keep-rate statistics, no per-row Python — used by production runs (the CLI
default) where a full-corpus Python loop would dominate at scale.
"""

from __future__ import annotations

import pyarrow as pa

from ..stages.banding import band_mask


def mixture_filter(ds, id_column: str = "doc_id", lang_column: str = "lang",
                   rates: dict | None = None, default_rate: int = 100,
                   band: str = "md5"):
    """Keep a per-language fraction via the deterministic content-addressed
    band (reproducible, resume-friendly; no RNG state).  ``band="fast"``
    selects the vectorized production band (see stages/banding.py)."""
    import numpy as np

    rates = rates or {}

    def keep(b: pa.Table) -> pa.Table:
        langs = b[lang_column].to_pylist()
        rr = np.fromiter((rates.get(l, default_rate) for l in langs),
                         dtype=np.int64, count=len(langs))
        return b.filter(band_mask(b[id_column], rr, mode=band))

    return ds.map_batches(keep, batch_format="pyarrow")


def curate_corpus(ds, id_column: str = "doc_id", text_column: str = "text",
                  lang_column: str = "lang", mix_rates: dict | None = None,
                  threshold: float = 0.5, capacity: int = 2048,
                  band: str = "md5"):
    """mixture -> near-dup survivors -> packed bins.  Returns the packed
    dataset (id, n_tokens, bin_id)."""
    from .dedup import near_dup_survivors
    from .packing import pack_sequences

    mixed = mixture_filter(ds, id_column, lang_column, mix_rates, band=band)
    deduped = near_dup_survivors(mixed, text_column, id_column,
                                 threshold=threshold)
    return pack_sequences(deduped, id_column, text_column, capacity=capacity)


def curate_run(ds, id_column: str = "doc_id", text_column: str = "text",
               lang_column: str = "lang", mix_rates: dict | None = None,
               threshold: float = 0.5, capacity: int = 2048,
               band: str = "md5"):
    """Single-execution curation: run the pipeline ONCE and return both the
    materialized packed dataset and the one-row summary table.

    The expensive stages (mixing scan, MinHash/LSH dedup, prefix-sum
    packing) each execute exactly once; the summary is derived from the
    materialized intermediates (the CLI previously recomputed the whole
    pipeline a second time just to print the summary)."""
    from .packing import packing_summary

    from .dedup import near_dup_survivors
    from .packing import pack_sequences

    n_input = ds.count()
    # materialized: the mixed corpus feeds both the count and the dedup
    mixed = mixture_filter(ds, id_column, lang_column, mix_rates,
                           band=band).materialize()
    n_mixed = mixed.count()
    deduped = near_dup_survivors(mixed, text_column, id_column,
                                 threshold=threshold)
    # materialized: feeds both the parquet write and the summary aggregate
    packed = pack_sequences(deduped, id_column, text_column,
                            capacity=capacity).materialize()
    ps = packing_summary(packed, capacity=capacity).to_pylist()[0]
    summary = pa.table({
        "n_input": pa.array([n_input], type=pa.int64()),
        "n_after_mix": pa.array([n_mixed], type=pa.int64()),
        "n_after_dedup": pa.array([ps["n_docs"]], type=pa.int64()),
        "total_tokens": pa.array([ps["total_tokens"]], type=pa.int64()),
        "n_bins": pa.array([ps["n_bins"]], type=pa.int64()),
        "fill_rate_1e6": pa.array([ps["fill_rate_1e6"]], type=pa.int64()),
    })
    return packed, summary


def curate_summary(ds, id_column: str = "doc_id", text_column: str = "text",
                   lang_column: str = "lang", mix_rates: dict | None = None,
                   threshold: float = 0.5, capacity: int = 2048,
                   band: str = "md5") -> pa.Table:
    """One-row accounting of the whole curation run: input docs, docs after
    mixing, docs after dedup, bins/tokens/fill of the packed output.  All
    exact int64."""
    _, summary = curate_run(ds, id_column, text_column, lang_column,
                            mix_rates, threshold, capacity, band=band)
    return summary
