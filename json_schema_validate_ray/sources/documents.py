"""Deterministic distributed synthesis of a documents-shaped table for
scale demonstrations (verdict r3 #6): same schema as
``/root/testdata/sf*/documents.parquet`` — ``doc_id`` int64, ``text``
small-vocabulary word string, ``lang``, ``source``, ``n_chars`` — with
PLANTED near-duplicate clusters so the MinHash/LSH/CC curation pipeline has
real work to find at any scale.

Synthesis is a pure function of ``(partition_id, rows_per_partition, seed)``
— like ``sources/tokens.py`` — so a 10M-row corpus is generated IN the
cluster (one task per partition), never on the driver, and any subset is
reproducible.

Duplicate structure: ids are grouped into clusters of ``CLUSTER`` consecutive
ids; a deterministic ``DUP_PCT``% of clusters are near-dup clusters whose
members share the canonical member's word sequence with ~1/13 of the
positions perturbed (Jaccard over 3-word shingles ≈ 0.6-0.8, above the 0.5
verify threshold); every other document draws its words independently.  All
word-index generation is a vectorized splitmix64 over (seed, position) —
no RNG object state, no Python loop — and the final string assembly is one
``pc.binary_join`` over an Arrow ListArray.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

VOCAB = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
    "query", "a", "big", "key", "window", "row", "table", "stream",
    "merge", "data", "vector", "join", "customer", "the", "shard", "block",
    "arrow", "plan", "stage", "actor", "sketch", "probe", "bucket", "range",
]
LANGS = ["en", "zh", "fr", "de", "es"]
# lang buckets out of 10 -> en 40%, zh 30%, fr/de/es 10% each
_LANG_BUCKETS = [0, 0, 0, 0, 1, 1, 1, 2, 3, 4]
CLUSTER = 4                 # ids per potential near-dup cluster
DUP_PCT = 20                # % of clusters that are near-dup clusters
_MIX_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over a uint64 array (stateless, vectorized)."""
    z = (x + _MIX_GOLD).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def synth_documents_partition(part_id: int, rows: int, seed: int = 42,
                              mean_words: int = 60,
                              vocab_size: int | None = None,
                              base: int | None = None) -> pa.Table:
    """One partition of the synthetic documents table (pure function).

    ``vocab_size`` (default: the 40-word testdata-like VOCAB) switches to a
    generated ``w%05d`` vocabulary — a LARGE vocab makes shingles selective
    (realistic for natural text), which is what prefix-filtered exact joins
    rely on; the tiny default vocab is the adversarial dense case.

    ``base`` overrides the first doc_id (default ``part_id * rows``) so
    callers can hand out UNEVEN partition sizes (remainder distribution)
    while keeping ids contiguous — every column is a pure function of the
    doc id + seed, so content is independent of the partition layout."""
    if vocab_size is None:
        vocab = VOCAB
    else:
        vocab = [f"w{i:05d}" for i in range(vocab_size)]
    if base is None:
        base = part_id * rows
    ids = np.arange(base, base + rows, dtype=np.int64)
    u = ids.view(np.uint64) if ids.dtype == np.int64 else ids.astype(np.uint64)
    sd = np.uint64(seed)

    cid = (ids // CLUSTER).astype(np.uint64)
    member = (ids % CLUSTER).astype(np.uint64)
    is_dup_cluster = (_mix64(cid * np.uint64(3) + sd) % np.uint64(100)
                      ) < np.uint64(DUP_PCT)
    # dup-cluster members share the cluster seed; everyone else is unique
    doc_seed = np.where(is_dup_cluster, _mix64(cid + sd),
                        _mix64(u + sd + np.uint64(1)))

    # length: 1/3..5/3 of mean_words, from the doc seed (shared inside a
    # dup cluster so members align position-by-position)
    span = max(2, (4 * mean_words) // 3)
    lens = (mean_words - span // 2
            + (_mix64(doc_seed) % np.uint64(span)).astype(np.int64))
    offsets = np.zeros(rows + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    total = int(offsets[-1])

    flat_rows = np.repeat(np.arange(rows, dtype=np.int64), lens)
    pos = (np.arange(total, dtype=np.int64)
           - np.repeat(offsets[:-1], lens)).astype(np.uint64)
    base_words = (_mix64(doc_seed[flat_rows]
                         + pos * np.uint64(0x2545F4914F6CDD1D))
                  % np.uint64(len(vocab)))
    # perturb ~1/13 of positions for non-canonical dup members (member > 0)
    m_flat = member[flat_rows]
    dup_flat = is_dup_cluster[flat_rows]
    perturb = dup_flat & (m_flat > 0) & (
        ((pos + m_flat * np.uint64(5)) % np.uint64(13)) == np.uint64(0))
    alt_words = (_mix64(u[flat_rows] * np.uint64(31) + pos + sd)
                 % np.uint64(len(vocab)))
    words = np.where(perturb, alt_words, base_words).astype(np.int64)

    flat_arr = pc.take(pa.array(vocab, type=pa.string()),
                       pa.array(words, type=pa.int64()))
    lists = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()
                                              if total < 2**31 else pa.int64()),
                                     flat_arr)
    text = pc.binary_join(lists, " ")

    lang_idx = np.array(_LANG_BUCKETS, dtype=np.int64)[
        (_mix64(u + sd + np.uint64(7)) % np.uint64(10)).astype(np.int64)]
    lang = pc.take(pa.array(LANGS, type=pa.string()),
                   pa.array(lang_idx, type=pa.int64()))
    source = pc.take(
        pa.array([f"src{i}" for i in range(5)], type=pa.string()),
        pa.array((_mix64(u + sd + np.uint64(11)) % np.uint64(5))
                 .astype(np.int64), type=pa.int64()))
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": text,
        "lang": lang,
        "source": source,
        "n_chars": pc.utf8_length(text).cast(pa.int64()),
    })


def synth_documents_dataset(n_rows: int, n_partitions: int = 64,
                            seed: int = 42, mean_words: int = 60,
                            vocab_size: int | None = None):
    """Lazy Dataset of the synthetic documents table, generated in-cluster
    (one task per partition id — the driver never holds a row).

    Yields EXACTLY ``n_rows`` rows: the first ``n_rows % n_partitions``
    partitions carry one extra row with id bases shifted to stay contiguous
    (the old ``n_partitions * (n_rows // n_partitions)`` silently undershot
    non-divisible requests, so recorded scale points were slightly off —
    ADVICE r4)."""
    import ray.data as rd

    n_partitions = max(1, min(n_partitions, n_rows)) if n_rows else 1
    rows_per_part, rem = divmod(n_rows, n_partitions)

    def gen(batch: pa.Table) -> pa.Table:
        parts = []
        for pid in batch["id"].to_pylist():
            pid = int(pid)
            rows = rows_per_part + (1 if pid < rem else 0)
            base = pid * rows_per_part + min(pid, rem)
            parts.append(synth_documents_partition(
                pid, rows, seed, mean_words, vocab_size, base=base))
        return pa.concat_tables(parts)

    return (rd.range(n_partitions)
            .repartition(n_partitions)
            .map_batches(gen, batch_format="pyarrow", batch_size=1))
