"""Deterministic synthesis of the tokens table (the ``input_hint`` table).

Schema (BASELINE.json input_hint / FIXTURES.md §2):

    doc_id : string        "doc-%012d" with planted duplicates (~0.1%)
    tokens : list<int32>   seeded ints in [0, VOCAB); planted out-of-range (~0.1%)
    n_tok  : int32         == len(tokens), planted mismatches (~0.1%)
    source : string        zipf-skewed from {src0..src9} + planted unknown values

Synthesis is a pure function of ``(partition_id, rows_per_partition, seed)``
so any partition can be regenerated independently on any worker — this is how
the table scales to arbitrary row counts without a driver-side loop, and how
a resumed run regenerates exactly the same bytes.  Planted-violation classes
map 1:1 to constraint ids so expected violation counts are computable in
closed form (each class is deterministic in the RNG stream).

A ``HOT_DOC_ID`` is planted every ``HOT_EVERY`` rows across ALL partitions to
exercise salted-groupby uniqueness under adversarial skew (SURVEY.md §7.3).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_SIZE = 50257
MAX_TOKENS = 2048
MIN_TOKENS = 1
SOURCES = [f"src{i}" for i in range(10)]
UNKNOWN_SOURCE = "src_unknown"
HOT_DOC_ID = "doc-hot-key"
HOT_EVERY = 1000           # one hot doc_id per 1000 rows, in every partition
VIOLATION_RATE = 0.001     # per planted-violation class

TOKENS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("tokens", pa.list_(pa.int32())),
    ("n_tok", pa.int32()),
    ("source", pa.string()),
])


def synth_tokens_partition(part_id: int, rows: int, seed: int = 42,
                           mean_tokens: int = 256) -> pa.Table:
    """Generate one partition as an Arrow table — fully vectorized numpy."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, part_id]))
    base = part_id * rows

    ids = np.arange(base, base + rows, dtype=np.int64)
    doc_id = np.char.add("doc-", np.char.zfill(ids.astype("U12"), 12))

    # token lengths: lognormal-ish, clamped
    lengths = np.clip(
        rng.lognormal(mean=np.log(mean_tokens), sigma=0.6, size=rows).astype(np.int64),
        MIN_TOKENS, MAX_TOKENS)
    total = int(lengths.sum())
    flat = rng.integers(0, VOCAB_SIZE, size=total, dtype=np.int32)
    offsets = np.zeros(rows + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])

    n_tok = lengths.astype(np.int32)

    # zipf-skewed source draw over SOURCES
    ranks = np.arange(1, len(SOURCES) + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    source = np.array(SOURCES, dtype=object)[rng.choice(len(SOURCES), size=rows, p=probs)]

    # --- planted violations, each class an independent deterministic draw ---
    # 1. duplicate doc_id: copy the previous row's id
    dup_mask = rng.random(rows) < VIOLATION_RATE
    dup_mask[0] = False
    dup_idx = np.nonzero(dup_mask)[0]
    doc_id[dup_idx] = doc_id[dup_idx - 1]
    # 2. out-of-range token: poke one negative and one >= VOCAB value
    oor_mask = rng.random(rows) < VIOLATION_RATE
    for i in np.nonzero(oor_mask)[0]:
        flat[offsets[i]] = -1
        if lengths[i] > 1:
            flat[offsets[i] + 1] = VOCAB_SIZE + 7
    # 3. n_tok mismatch
    mis_mask = rng.random(rows) < VIOLATION_RATE
    n_tok = np.where(mis_mask, n_tok + 3, n_tok).astype(np.int32)
    # 4. unknown source
    unk_mask = rng.random(rows) < VIOLATION_RATE
    source[unk_mask] = UNKNOWN_SOURCE
    # 5. hot key for skew testing (also a duplicate-class violation)
    hot = np.arange(rows) % HOT_EVERY == (part_id % HOT_EVERY)
    doc_id[hot] = HOT_DOC_ID

    tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                      pa.array(flat, type=pa.int32()))
    return pa.table({
        "doc_id": pa.array(doc_id, type=pa.string()),
        "tokens": tokens,
        "n_tok": pa.array(n_tok, type=pa.int32()),
        "source": pa.array(source, type=pa.string()),
    })


def synth_tokens_dataset(n_rows: int, n_partitions: int = 32, seed: int = 42):
    """A lazy ``ray.data.Dataset`` of the tokens table: each partition is
    generated IN the cluster (one task per partition id), never on the driver,
    so synthesis itself scales out."""
    import ray.data as rd

    rows_per_part = max(1, n_rows // n_partitions)

    def gen(batch: pa.Table) -> pa.Table:
        parts = [synth_tokens_partition(int(pid), rows_per_part, seed)
                 for pid in batch["id"].to_pylist()]
        return pa.concat_tables(parts)

    return (rd.range(n_partitions)
            .repartition(n_partitions)
            .map_batches(gen, batch_format="pyarrow", batch_size=1))


def write_tokens_parquet(out_dir: str, n_rows: int, n_partitions: int = 32,
                         seed: int = 42, force: bool = False) -> str:
    """Materialize the tokens table as one parquet file per partition
    (resumable layout: file name = partition id; existing files are kept).
    Pure-pyarrow writer (no Ray needed) so tests/bench can prepare inputs
    without a cluster."""
    os.makedirs(out_dir, exist_ok=True)
    rows_per_part = max(1, n_rows // n_partitions)
    for pid in range(n_partitions):
        path = os.path.join(out_dir, f"part-{pid:05d}.parquet")
        if os.path.exists(path) and not force:
            continue
        tmp = path + ".tmp"
        pq.write_table(synth_tokens_partition(pid, rows_per_part, seed), tmp)
        os.replace(tmp, path)
    return out_dir


def read_tokens(path: str, columns=None):
    """Read the tokens table; pass ``columns`` to prune at the read."""
    import ray.data as rd
    return rd.read_parquet(path, columns=columns)
