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

import json
import os
import shutil

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
                  band: str = "md5", dedup_method: str = "minhash"):
    """mixture -> near-dup survivors -> packed bins.  Returns the packed
    dataset (id, n_tokens, bin_id).  ``dedup_method="exact"`` swaps the
    MinHash pair generator for the prefix-filtered exact n-gram Jaccard
    join — deterministic recall at higher cost (verdict r4 #5)."""
    from .dedup import near_dup_survivors
    from .packing import pack_sequences

    mixed = mixture_filter(ds, id_column, lang_column, mix_rates, band=band)
    deduped = near_dup_survivors(mixed, text_column, id_column,
                                 threshold=threshold, method=dedup_method)
    return pack_sequences(deduped, id_column, text_column, capacity=capacity)


def curate_run(ds, id_column: str = "doc_id", text_column: str = "text",
               lang_column: str = "lang", mix_rates: dict | None = None,
               threshold: float = 0.5, capacity: int = 2048,
               band: str = "md5", dedup_method: str = "minhash"):
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
                                 threshold=threshold, method=dedup_method)
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
                   band: str = "md5",
                   dedup_method: str = "minhash") -> pa.Table:
    """One-row accounting of the whole curation run: input docs, docs after
    mixing, docs after dedup, bins/tokens/fill of the packed output.  All
    exact int64."""
    _, summary = curate_run(ds, id_column, text_column, lang_column,
                            mix_rates, threshold, capacity, band=band,
                            dedup_method=dedup_method)
    return summary


# ---------------------------------------------------------------------------
# Stage-granular checkpointing (verdict r4 #9)
# ---------------------------------------------------------------------------

def _stage_done(ckpt_dir: str, stage: str) -> dict | None:
    mpath = os.path.join(ckpt_dir, "manifest", stage + ".json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            return json.load(f)
    return None


def _stage_commit(ckpt_dir: str, stage: str, meta: dict) -> None:
    """Manifest written LAST and renamed atomically: a killed run leaves
    either no manifest (stage recomputes) or a complete one — never a
    manifest pointing at half-written parquet."""
    mdir = os.path.join(ckpt_dir, "manifest")
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, stage + ".json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(mdir, stage + ".json"))


def _atomic_parquet(ds_out, dest: str) -> None:
    tmp = dest + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ds_out.write_parquet(tmp)
    if os.path.exists(dest):
        shutil.rmtree(dest)
    os.replace(tmp, dest)


def curate_run_checkpointed(ds, checkpoint_dir: str,
                            id_column: str = "doc_id",
                            text_column: str = "text",
                            lang_column: str = "lang",
                            mix_rates: dict | None = None,
                            threshold: float = 0.5, capacity: int = 2048,
                            band: str = "md5",
                            dedup_method: str = "minhash"):
    """Resumable curation (verdict r4 #9): the 13-minute 10M-row
    composition no longer restarts from zero on failure.  Each EXPENSIVE
    stage persists its output behind the validate-pipeline manifest
    pattern (pipelines/validate.py:147-251 — parquet to ``.tmp`` + atomic
    rename, JSON manifest committed last), and a re-run skips every stage
    whose manifest exists:

      * ``counts``  — n_input / n_after_mix (the mixed corpus itself is
        NOT persisted: the band filter is a pure deterministic map, so
        resume re-derives it in one cheap streaming pass instead of
        paying a corpus-sized write)
      * ``removed`` — the near-dup removed-id set (the MinHash/LSH or
        exact-join dedup, components and all — the dominant cost)
      * ``packed``  — the packed (id, n_tokens, bin_id) output + the
        packing summary fields

    Returns (packed Dataset, summary Table, stage_log) where stage_log
    maps stage -> "computed" | "resumed"."""
    import ray.data as rd

    from .dedup import anti_filter_removed, near_dup_removed_ids
    from .packing import pack_sequences, packing_summary

    os.makedirs(checkpoint_dir, exist_ok=True)
    stage_log: dict[str, str] = {}

    mixed = mixture_filter(ds, id_column, lang_column, mix_rates, band=band)

    counts = _stage_done(checkpoint_dir, "counts")
    if counts is None:
        mixed = mixed.materialize()     # feeds the count AND the dedup scan
        counts = {"n_input": ds.count(), "n_after_mix": mixed.count()}
        _stage_commit(checkpoint_dir, "counts", counts)
        stage_log["counts"] = "computed"
    else:
        stage_log["counts"] = "resumed"

    removed_dir = os.path.join(checkpoint_dir, "removed_ids")
    rm_meta = _stage_done(checkpoint_dir, "removed")
    if rm_meta is None:
        removed = near_dup_removed_ids(mixed, text_column, id_column,
                                       threshold=threshold,
                                       method=dedup_method)
        _atomic_parquet(removed, removed_dir)
        rm_meta = {"output": removed_dir, "n_removed": removed.count(),
                   "method": dedup_method, "threshold": threshold}
        _stage_commit(checkpoint_dir, "removed", rm_meta)
        stage_log["removed"] = "computed"
    else:
        stage_log["removed"] = "resumed"
    removed = (rd.read_parquet(removed_dir).materialize()
               if rm_meta["n_removed"] else None)

    packed_dir = os.path.join(checkpoint_dir, "packed")
    pk_meta = _stage_done(checkpoint_dir, "packed")
    if pk_meta is None:
        deduped = (anti_filter_removed(mixed, removed, id_column)
                   if removed is not None else mixed)
        packed = pack_sequences(deduped, id_column, text_column,
                                capacity=capacity).materialize()
        _atomic_parquet(packed, packed_dir)
        ps = packing_summary(packed, capacity=capacity).to_pylist()[0]
        pk_meta = {"output": packed_dir, **ps}
        _stage_commit(checkpoint_dir, "packed", pk_meta)
        stage_log["packed"] = "computed"
    else:
        stage_log["packed"] = "resumed"
    packed = rd.read_parquet(packed_dir)

    summary = pa.table({
        "n_input": pa.array([counts["n_input"]], type=pa.int64()),
        "n_after_mix": pa.array([counts["n_after_mix"]], type=pa.int64()),
        "n_after_dedup": pa.array([pk_meta["n_docs"]], type=pa.int64()),
        "total_tokens": pa.array([pk_meta["total_tokens"]], type=pa.int64()),
        "n_bins": pa.array([pk_meta["n_bins"]], type=pa.int64()),
        "fill_rate_1e6": pa.array([pk_meta["fill_rate_1e6"]],
                                  type=pa.int64()),
    })
    return packed, summary, stage_log
