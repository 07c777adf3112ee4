"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard training-data hygiene step (e.g. GPT-3 appendix C, Dodge et al.
2021 "Documenting Large Webtext Corpora"): any document whose n-gram set
intersects the benchmark's n-gram set is contaminated and must be dropped
before training.  No counterpart in the reference engine (it is per-document
validation only, json_schema_validate.c:363-549); this is a table-level
check in the spirit of SURVEY.md §2.4.

Shape: the benchmark side is SMALL relative to the corpus (thousands of
eval documents vs billions of training documents) — that is the documented
partitioning assumption.  The benchmark's distinct shingle hashes are
collected once (per-block distinct partials, tiny driver union) and
broadcast via the object store either

* exactly — a sorted ``uint64`` array, 8 bytes per distinct shingle
  (~80 MB for 10M benchmark shingles: one object-store copy per node), or
* as a Bloom filter (``bloom_fpr=``) when even that is too large —
  zero false negatives, so contamination is NEVER missed; a clean document
  is falsely flagged with probability ~fpr per distinct shingle, which for
  decontamination only drops a little extra data.

The probe side is one streaming ``map_batches`` pass: vectorized shingle
hashing (stages.text.batch_shingle_hashes — no Python loop over rows or
tokens), per-row distinct via one lexsort, membership via binary search
(``np.searchsorted``) against the broadcast array.  No shuffle anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.text import batch_shingle_hashes
from ..state.sketches import BloomFilter


def _distinct_per_row(flat: np.ndarray, offsets: np.ndarray):
    """First occurrence mask of each (row, hash) pair + the row id of every
    flat entry; one lexsort, no Python loop."""
    n = len(flat)
    rows = np.repeat(np.arange(len(offsets) - 1, dtype=np.int64),
                     np.diff(offsets))
    if n == 0:
        return flat, rows
    order = np.lexsort((flat, rows))
    sf, sr = flat[order], rows[order]
    first = np.empty(n, dtype=bool)
    first[0] = True
    np.not_equal(sf[1:], sf[:-1], out=first[1:])
    first[1:] |= sr[1:] != sr[:-1]
    return sf[first], sr[first]


class _BenchmarkProbe:
    """Appends per-document contamination columns.  The benchmark shingle
    set is fetched from the object store once per actor (__init__), like the
    reference's per-backend regex cache (json_schema_validate.c:88-92)."""

    def __init__(self, text_column: str, bench_ref, n_shingle: int):
        import ray
        self.text_column = text_column
        self.n_shingle = n_shingle
        obj = ray.get(bench_ref)
        if isinstance(obj, bytes):
            self.bloom = BloomFilter.from_bytes(obj)
            self.bench = None
        else:
            self.bloom = None
            self.bench = obj          # sorted uint64 array

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, offsets = batch_shingle_hashes(batch[self.text_column],
                                             self.n_shingle)
        dh, dr = _distinct_per_row(flat, offsets)
        n_rows = batch.num_rows
        n_shingles = np.bincount(dr, minlength=n_rows).astype(np.int64)
        if self.bench is not None:
            if len(self.bench) and len(dh):
                pos = np.minimum(np.searchsorted(self.bench, dh),
                                 len(self.bench) - 1)
                member = self.bench[pos] == dh
            else:
                member = np.zeros(len(dh), dtype=bool)
        else:
            member = self.bloom.test(pa.array(dh, type=pa.uint64())) \
                if len(dh) else np.zeros(0, dtype=bool)
        n_hit = np.bincount(dr[member], minlength=n_rows).astype(np.int64)
        return (batch
                .append_column("n_shingles", pa.array(n_shingles))
                .append_column("n_contaminated", pa.array(n_hit))
                .append_column("contaminated", pa.array(n_hit > 0)))


def benchmark_shingle_hashes(bench_ds, text_column: str = "text",
                             n_shingle: int = 3,
                             batch_size: int | None = None) -> np.ndarray:
    """Distinct shingle hashes of the benchmark set: per-block distinct
    partials (uint64 blobs), unioned on the driver.  Driver cost is bounded
    by the benchmark's distinct-shingle count — the smallness assumption."""
    def partial(b: pa.Table) -> pa.Table:
        flat, _ = batch_shingle_hashes(b[text_column], n_shingle)
        return pa.table({"h": pa.array([np.unique(flat).tobytes()],
                                       type=pa.binary())})

    blobs = bench_ds.map_batches(partial, batch_format="pyarrow",
                                 batch_size=batch_size).take_all()
    if not blobs:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(np.concatenate(
        [np.frombuffer(row["h"], dtype=np.uint64) for row in blobs]))


def decontaminate(ds, bench_ds, text_column: str = "text",
                  n_shingle: int = 3, bloom_fpr: float | None = None,
                  batch_size: int | None = None):
    """Append ``n_shingles`` / ``n_contaminated`` / ``contaminated`` columns
    to ``ds`` by probing against ``bench_ds``'s word-n-gram set.  Filter on
    ``contaminated`` downstream to drop or quarantine."""
    import ray
    bench = benchmark_shingle_hashes(bench_ds, text_column, n_shingle,
                                     batch_size)
    if bloom_fpr is not None:
        bf = BloomFilter.sized(len(bench), fpr=bloom_fpr)
        bf.update(pa.array(bench, type=pa.uint64()))
        bench_ref = ray.put(bf.to_bytes())
    else:
        bench_ref = ray.put(bench)
    return ds.map_batches(
        _BenchmarkProbe,
        fn_constructor_kwargs={"text_column": text_column,
                               "bench_ref": bench_ref,
                               "n_shingle": n_shingle},
        batch_format="pyarrow", batch_size=batch_size, concurrency=(1, 8),
        max_restarts=0)
