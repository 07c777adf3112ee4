"""Table-level checks (SURVEY.md §2.4) — the wide/aggregate side of the engine.

Design rules for 100 TB scale:

* **Tree-style aggregation, not shuffles**, wherever the result is small:
  column stats / NDV / histograms / categorical counts are computed as
  per-block partials inside ``map_batches`` (one tiny serialized row per
  block) and merged at the end — the merge input is O(#blocks), never O(rows).
* **Pre-aggregated (combiner) groupby** for exact uniqueness: duplicate
  counting first collapses each batch to one row per (key, batch) via
  vectorized ``value_counts``, THEN shuffles the collapsed rows.  A hot key
  (adversarial skew) therefore contributes at most one row per block to the
  shuffle instead of its full multiplicity — the combiner is the skew
  mitigation; no single reducer ever sees the raw hot-key rows.
* **Broadcast semi-joins** for referential checks: the small side is put in
  the object store ONCE (``ray.put``) and read per actor, never shipped per
  batch and never shuffled.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..state.sketches import (
    BloomFilter,
    ColumnStats,
    Histogram,
    HyperLogLog,
    TDigest,
    chi_square,
    ks_statistic,
)

# ---------------------------------------------------------------------------
# Column stats + NDV sketches (partial + final; no shuffle)
# ---------------------------------------------------------------------------


def _stats_partial(batch: pa.Table, columns: list[str], ndv_columns: set,
                   hll_p: int = 14) -> pa.Table:
    """Stateless map_batches task: one serialized partial row per batch per
    column (no per-task setup worth an actor pool)."""
    cols, stats_blobs, hll_blobs = [], [], []
    for col in columns:
        if col not in batch.column_names:
            continue
        arr = batch[col]
        cs = ColumnStats()
        if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
            # list columns: stats over the element lengths
            cs.update_arrow(pc.list_value_length(arr))
        else:
            cs.update_arrow(arr)
        cols.append(col)
        stats_blobs.append(cs.to_bytes())
        if col in ndv_columns and not pa.types.is_nested(arr.type):
            h = HyperLogLog(p=hll_p)
            h.update(arr)
            hll_blobs.append(h.to_bytes())
        else:
            hll_blobs.append(None)
    return pa.table({
        "column": pa.array(cols, type=pa.string()),
        "stats": pa.array(stats_blobs, type=pa.binary()),
        "hll": pa.array(hll_blobs, type=pa.binary()),
    })


def column_stats(ds, columns: list[str], ndv_columns: list[str] | None = None,
                 batch_size: int = 65536) -> pa.Table:
    """Per-column min/max/null-rate/mean/std + HLL NDV estimate.

    One streaming pass; the only driver-side materialization is the partials
    table (O(#blocks × #columns) tiny rows)."""
    ndv_columns = list(ndv_columns if ndv_columns is not None else columns)
    ndv_set = set(ndv_columns)
    partials = ds.map_batches(
        lambda b: _stats_partial(b, columns, ndv_set),
        batch_format="pyarrow", batch_size=batch_size).take_all()

    merged: dict[str, ColumnStats] = {}
    hlls: dict[str, HyperLogLog] = {}
    for row in partials:
        col = row["column"]
        cs = ColumnStats.from_bytes(row["stats"])
        merged[col] = merged[col].merge(cs) if col in merged else cs
        if row["hll"] is not None:
            h = HyperLogLog.from_bytes(row["hll"])
            hlls[col] = hlls[col].merge(h) if col in hlls else h

    out = {"column": [], "row_count": [], "null_count": [], "null_rate": [],
           "min_value": [], "max_value": [], "mean_value": [], "std_value": [],
           "ndv_estimate": []}
    for col in columns:
        if col not in merged:
            continue
        cs = merged[col]
        out["column"].append(col)
        out["row_count"].append(cs.count)
        out["null_count"].append(cs.nulls)
        out["null_rate"].append(cs.null_rate)
        out["min_value"].append(None if cs.minimum is None else str(cs.minimum))
        out["max_value"].append(None if cs.maximum is None else str(cs.maximum))
        out["mean_value"].append(cs.mean)
        out["std_value"].append(cs.std)
        out["ndv_estimate"].append(
            float(hlls[col].estimate()) if col in hlls else None)
    return pa.table(out)


# ---------------------------------------------------------------------------
# Exact uniqueness (combiner + groupby-sum shuffle)
# ---------------------------------------------------------------------------


def _partial_counts(batch: pa.Table, key: str) -> pa.Table:
    vc = batch[key].value_counts()
    if isinstance(vc, pa.ChunkedArray):
        vc = vc.combine_chunks()
    return pa.table({
        key: vc.field("values"),
        "partial_count": vc.field("counts").cast(pa.int64()),
    })


def _bucketed_partial_counts(batch: pa.Table, key: str, n_buckets: int) -> pa.Table:
    """Combiner + explicit hash-bucket column.  The stable 64-bit hash
    (state/sketches._hash64 — NOT Python's per-process-salted hash) makes the
    bucket of a key identical on every worker, so the later per-bucket merge
    sees ALL partials for a key."""
    from ..state.sketches import _hash64
    t = _partial_counts(batch, key)
    bucket = (_hash64(t[key]) % np.uint64(n_buckets)).astype(np.int32)
    return t.append_column("bucket", pa.array(bucket))


def duplicate_keys(ds, key: str = "doc_id", batch_size: int = 65536,
                   n_buckets: int = 256):
    """Exact duplicate detection via ONE combiner-first key shuffle — the
    default: measured 1.5-2x faster than the two-exchange hash-first variant
    at bench scale (each Ray all-to-all pays a ~1.5 s fixed floor locally),
    and the combiner already bounds any hot key to #blocks shuffle rows.
    ``duplicate_keys_hash_first`` is the alternative for corpora whose key
    column is so wide that sorting O(distinct) strings dominates: it ships
    fixed-width hash blobs instead and re-scans only suspect rows:

      1. combiner: per-batch ``value_counts`` collapses within-batch repeats
         (bounds any key's shuffle rows to #blocks — the planted-hot-key
         mitigation, sources/tokens.py HOT_DOC_ID);
      2. partition: stable-hash bucket column (int32) so the shuffle sorts
         small ints, NOT the key strings — measured 3.6x faster than
         ``groupby(key).sum`` whose sort-based shuffle sorts every key;
      3. merge: vectorized pandas groupby-sum per bucket, filter count > 1."""
    partials = ds.map_batches(
        lambda b: _bucketed_partial_counts(b, key, n_buckets),
        batch_format="pyarrow", batch_size=batch_size)

    def merge_bucket(g):
        out = g.groupby(key, as_index=False)["partial_count"].sum()
        out = out[out["partial_count"] > 1]
        # ARROW output: pandas returns from map_groups pay a pathological
        # per-group block conversion in Ray (measured 17x).  Key type derived
        # from the (never-empty) group so all buckets emit one schema.
        idt = pa.Array.from_pandas(g[key].head(1)).type
        return pa.table({key: pa.array(out[key], type=idt),
                         "dup_count": pa.array(out["partial_count"],
                                               type=pa.int64())})

    return partials.groupby("bucket").map_groups(merge_bucket,
                                                 batch_format="pandas")


# Above this many crowded hashes the broadcast filter would be large; fall
# back to the exact full-key shuffle instead (never truncate).
DUP_BROADCAST_LIMIT = 2_000_000


def duplicate_keys_hash_first(ds, key: str = "doc_id",
                              batch_size: int = 65536, n_buckets: int = 256):
    """EXACT duplicate detection on ``key`` — hash-first two-phase, so raw
    keys never enter the wide exchange.  The scale alternative to
    ``duplicate_keys`` for very wide keys (URLs, fingerprints): the exchange
    sorts O(blocks x buckets) blob rows instead of O(distinct) key strings,
    at the price of a second scan of the key column and a second (tiny)
    exchange — measured SLOWER at bench scale where Ray's per-exchange fixed
    cost dominates, faster when the string sort does:

      1. census: per-batch ``value_counts`` (combiner — a hot key ships at
         most one row per block) -> pack (hash64(key), count) pairs into ONE
         blob per (block, bucket); the shuffle sorts O(blocks x buckets)
         fixed-width rows, not O(keys) strings;
      2. crowded hashes: each bucket sums counts per hash (np.unique +
         bincount) and emits hashes with total > 1 — tiny when duplicates
         are rare (the north-rule regime).  Hash collisions can only ADD
         false candidates here, never hide a duplicate;
      3. verify: broadcast the sorted crowded-hash array (``ray.put`` once),
         re-scan the key column keeping only rows whose hash is crowded, and
         run the exact string groupby on that small suspect set — the
         count > 1 filter on REAL keys removes any hash false positives, so
         the result is exact, not probabilistic.

    If the crowded set exceeds DUP_BROADCAST_LIMIT (duplicates are NOT rare)
    the function falls back to the exact full-key shuffle
    (``duplicate_keys``) — no truncation ever.

    Returns a Dataset of (key, dup_count) rows."""
    import ray

    from ..state.sketches import _hash64

    empty_census = pa.table({"blob": pa.array([], type=pa.binary()),
                             "bucket": pa.array([], type=pa.int32())})

    def census(b: pa.Table) -> pa.Table:
        t = _partial_counts(b, key)
        if t.num_rows == 0:
            return empty_census
        h = _hash64(t[key])
        cnt = t["partial_count"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bk = (h % np.uint64(n_buckets)).astype(np.int64)
        order = np.argsort(bk, kind="stable")
        pairs = np.column_stack([h, cnt])[order]
        bk_sorted = bk[order]
        bounds = np.nonzero(np.diff(bk_sorted))[0] + 1
        blobs, buckets = [], []
        for chunk, b0 in zip(np.split(pairs, bounds),
                             np.split(bk_sorted, bounds)):
            blobs.append(np.ascontiguousarray(chunk).tobytes())
            buckets.append(int(b0[0]))
        return pa.table({"blob": pa.array(blobs, type=pa.binary()),
                         "bucket": pa.array(buckets, type=pa.int32())})

    def crowded(g: pa.Table) -> pa.Table:
        raw = np.frombuffer(b"".join(g["blob"].to_pylist()),
                            dtype=np.uint64).reshape(-1, 2)
        hashes, inv = np.unique(raw[:, 0], return_inverse=True)
        totals = np.bincount(inv, weights=raw[:, 1].astype(np.float64))
        hot = hashes[totals > 1]
        return pa.table({"h": pa.array(hot.astype(np.uint64))})

    hot_tables = ds.map_batches(census, batch_format="pyarrow",
                                batch_size=batch_size) \
        .groupby("bucket").map_groups(crowded, batch_format="pyarrow") \
        .take_all()
    hot = np.sort(np.array([r["h"] for r in hot_tables], dtype=np.uint64))
    if len(hot) > DUP_BROADCAST_LIMIT:
        return duplicate_keys(ds, key, batch_size, n_buckets)
    hot_ref = ray.put(hot)

    def suspects(b: pa.Table) -> pa.Table:
        hot_sorted = ray.get(hot_ref)
        t = _partial_counts(b, key)
        if len(hot_sorted) == 0 or t.num_rows == 0:
            return t.slice(0, 0)
        h = _hash64(t[key])
        idx = np.searchsorted(hot_sorted, h)
        idx[idx == len(hot_sorted)] = 0
        mask = hot_sorted[idx] == h
        return t.filter(pa.array(mask))

    filtered = ds.map_batches(suspects, batch_format="pyarrow",
                              batch_size=batch_size)
    partials = filtered.map_batches(
        lambda t: t.append_column("bucket", pa.array(
            (_hash64(t[key]) % np.uint64(n_buckets)).astype(np.int32))),
        batch_format="pyarrow")

    def merge_bucket(g):
        out = g.groupby(key, as_index=False)["partial_count"].sum()
        out = out[out["partial_count"] > 1]     # drops hash false positives
        idt = pa.Array.from_pandas(g[key].head(1)).type
        return pa.table({key: pa.array(out[key], type=idt),
                         "dup_count": pa.array(out["partial_count"],
                                               type=pa.int64())})

    return partials.groupby("bucket").map_groups(merge_bucket,
                                                 batch_format="pandas")


def exact_distinct_count(ds, key: str, batch_size: int = 65536,
                         n_buckets: int = 256) -> int:
    """EXACT number-of-distinct-values via the same combiner + stable-hash
    bucket pattern as ``duplicate_keys``: per-batch ``value_counts`` collapses
    repeats, the shuffle moves only (key, bucket) rows, and each bucket
    reports its local distinct count (buckets partition the key space, so the
    sum is exact).  Use the HLL sketch (``column_stats``) when an estimate is
    enough — this path pays one hash-partitioned shuffle of the distinct
    keys."""
    partials = ds.map_batches(
        lambda b: _bucketed_partial_counts(b, key, n_buckets).select(
            [key, "bucket"]),
        batch_format="pyarrow", batch_size=batch_size)

    def count_bucket(g):
        return pa.table({"n": pa.array([g[key].nunique()], type=pa.int64())})

    per_bucket = partials.groupby("bucket").map_groups(count_bucket,
                                                       batch_format="pandas")
    return sum(r["n"] for r in per_bucket.take_all())


# Target bytes of packed hash pairs per NDV reduce bucket: big enough that
# per-group scheduling (~ms) is amortized, small enough that one bucket's
# np.unique fits comfortably in a worker heap.
NDV_BUCKET_TARGET_BYTES = 64 << 20


def stats_and_exact_ndv(ds, columns: list[str], ndv_columns: list[str],
                        batch_size: int | None = None,
                        n_buckets: int | None = None) -> tuple[dict, dict[str, int]]:
    """Per-column stats AND exact NDV for several columns in ONE scan and ONE
    bucketed shuffle.

    The exchange never ships raw keys: each batch emits, per (NDV column,
    bucket), ONE binary blob packing the 128-bit hash pairs of the batch's
    distinct keys (seed-0 and seed-1 ``_hash64`` — a bijection per seed for
    64-bit numerics, two independent polynomial families for strings, so the
    pair is collision-free at any realistic scale; ~1e-15 at 10^12 keys).
    The shuffle therefore sorts O(blocks x buckets) fixed-width rows instead
    of O(distinct keys) strings — measured 3-4x less sort time at 600k keys
    — while per-bucket memory stays bounded at ~16 bytes x keys/buckets.
    The column identity is ENCODED IN THE BUCKET ID: NDV column i owns
    buckets [i*n_buckets, (i+1)*n_buckets); each stats column gets one
    dedicated bucket past that range carrying ColumnStats blobs (one tiny
    row per block).  Each reduce group either np.unique's the concatenated
    hash pairs or merges stats blobs; buckets partition the key-hash space,
    so per-bucket distinct counts sum exactly.

    Returns ({column: ColumnStats}, {column: exact_ndv})."""
    from ..state.sketches import _hash64

    ndv_cols = list(ndv_columns)
    if n_buckets is None:
        # size-derived: ~NDV_BUCKET_TARGET_BYTES of hash pairs per bucket
        # (ds.count() on parquet is metadata-only); a 600k-row table gets 8
        # buckets, a 10^12-key table ~250k — per-bucket memory stays bounded
        # while small inputs avoid hundreds of ms-scheduled tiny groups
        try:
            rows = ds.count()
        except Exception:
            rows = 0
        n_buckets = max(8, -(-(rows * 16) // NDV_BUCKET_TARGET_BYTES))
    stats_base = len(ndv_cols) * n_buckets
    schema = pa.schema([("blob", pa.binary()), ("bucket", pa.int32())])

    def partial(batch: pa.Table) -> pa.Table:
        blobs, buckets = [], []
        for ci, col in enumerate(columns):
            if col not in batch.column_names:
                continue
            arr = batch[col]
            cs = ColumnStats()
            if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
                cs.update_arrow(pc.list_value_length(arr))
            else:
                cs.update_arrow(arr)
            blobs.append(cs.to_bytes())
            buckets.append(stats_base + ci)
        for ni, col in enumerate(ndv_cols):
            if col not in batch.column_names:
                continue
            # combiner: the batch's DISTINCT keys only (nulls excluded —
            # count(DISTINCT) parity); fully vectorized, no per-key Python
            a = batch[col]
            if isinstance(a, pa.ChunkedArray):
                a = a.combine_chunks()
            vals = a.unique().drop_null()
            pair = np.column_stack([_hash64(vals), _hash64(vals, seed=1)])
            bk = (pair[:, 0] % np.uint64(n_buckets)).astype(np.int64)
            order = np.argsort(bk, kind="stable")
            bk_sorted = bk[order]
            bounds = np.nonzero(np.diff(bk_sorted))[0] + 1
            for chunk, b0 in zip(np.split(pair[order], bounds),
                                 np.split(bk_sorted, bounds)):
                blobs.append(np.ascontiguousarray(chunk).tobytes())
                buckets.append(ni * n_buckets + int(b0[0]))
        return pa.table({"blob": pa.array(blobs, type=pa.binary()),
                         "bucket": pa.array(buckets, type=pa.int32())},
                        schema=schema)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              **({} if batch_size is None
                                 else {"batch_size": batch_size}))

    def merge_bucket(g: pa.Table) -> pa.Table:
        bucket = g["bucket"][0].as_py()
        raw = b"".join(g["blob"].to_pylist())
        if bucket >= stats_base:                      # stats bucket
            merged = None
            for blob in g["blob"].to_pylist():
                cs = ColumnStats.from_bytes(blob)
                merged = cs if merged is None else merged.merge(cs)
            payload = merged.to_bytes()
        else:                                         # NDV bucket
            pairs = np.frombuffer(raw, dtype=np.uint64).reshape(-1, 2)
            n = len(np.unique(pairs.view([("a", "<u8"), ("b", "<u8")])))
            payload = int(n).to_bytes(8, "little")
        return pa.table({"bucket": pa.array([bucket], type=pa.int32()),
                         "payload": pa.array([payload], type=pa.binary())})

    rows = partials.groupby("bucket").map_groups(
        merge_bucket, batch_format="pyarrow").take_all()
    stats: dict[str, ColumnStats] = {}
    ndv: dict[str, int] = {c: 0 for c in ndv_cols}
    for r in rows:
        bucket = r["bucket"]
        if bucket >= stats_base:
            stats[columns[bucket - stats_base]] = ColumnStats.from_bytes(
                r["payload"])
        else:
            ndv[ndv_cols[bucket // n_buckets]] += int.from_bytes(
                r["payload"], "little")
    return stats, ndv


def exact_bounded_quantiles(ds, column: str, quantiles: list[float],
                            lo: int, hi: int, of_list_lengths: bool = False,
                            batch_size: int = 65536) -> tuple[list, int]:
    """EXACT quantiles of an integer column with a known bounded domain
    [lo, hi] (e.g. n_tok in [1, 2048]): per-batch ``np.bincount`` partials of
    size (hi-lo+1) merged on the driver — no sort, no shuffle, O(domain)
    driver memory regardless of row count.  Values outside the domain are
    clipped into the boundary bins (callers pass the true bounds).

    Quantile definition matches DuckDB ``quantile_disc`` (verified
    empirically): the value at 1-based rank ``ceil(q * n)`` of the sorted
    non-null values.  Returns (values, n_nonnull)."""
    domain = hi - lo + 1

    def partial(batch: pa.Table) -> pa.Table:
        arr = batch[column]
        if of_list_lengths:
            arr = pc.list_value_length(arr)
        vals = arr.combine_chunks().drop_null().to_numpy(zero_copy_only=False)
        counts = np.bincount(np.clip(vals.astype(np.int64) - lo, 0, domain - 1),
                             minlength=domain)
        return pa.table({"counts": pa.array([counts.tobytes()], type=pa.binary())})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=batch_size).take_all()
    total = np.zeros(domain, dtype=np.int64)
    for row in partials:
        total += np.frombuffer(row["counts"], dtype=np.int64)
    n = int(total.sum())
    if n == 0:
        return [None] * len(quantiles), 0
    cum = np.cumsum(total)
    out = []
    for q in quantiles:
        target = max(1, int(np.ceil(q * n)))        # 1-based rank
        idx = int(np.searchsorted(cum, target))
        out.append(lo + idx)
    return out, n


def exact_quantiles_distributed(ds, column: str, quantiles: list[float],
                                batch_size: int = 65536,
                                bracket_budget_rows: int = 2_000_000,
                                max_retries: int = 4) -> tuple[list, int]:
    """EXACT quantiles of an unbounded numeric column at ANY scale — no
    driver-side sort of the column:

    1. sketch pass: a mergeable t-digest locates each quantile approximately;
    2. bracket pass: per-batch partials count rows strictly below each
       bracket's lower bound and collect only the values INSIDE the bracket
       (expected ~2*eps*N rows, eps chosen from ``bracket_budget_rows``);
    3. the exact order statistic (DuckDB quantile_disc rank, ceil(q*n)) is
       selected inside the sorted bracket.

    If the sketch erred more than eps (rank falls outside the bracket), the
    bracket widens and the pass reruns (``max_retries``, doubling eps) —
    never a silent approximation.  Driver memory is O(bracket rows), bounded
    by the budget, regardless of N.  Returns (values, n_nonnull)."""
    from ..state.sketches import TDigest

    def count_pass(batch: pa.Table) -> pa.Table:
        arr = batch[column].combine_chunks() if isinstance(batch[column], pa.ChunkedArray) else batch[column]
        return pa.table({"n": pa.array([len(arr) - arr.null_count], type=pa.int64())})

    n = sum(r["n"] for r in ds.map_batches(
        count_pass, batch_format="pyarrow", batch_size=batch_size).take_all())
    if n == 0:
        return [None] * len(quantiles), 0

    td = column_tdigest(ds, column, batch_size=batch_size)
    eps = max(1e-4, bracket_budget_rows / (4.0 * n * max(1, len(quantiles))))

    for _ in range(max_retries):
        brackets = [(td.quantile(max(0.0, q - eps)), td.quantile(min(1.0, q + eps)))
                    for q in quantiles]

        def bracket_partial(batch: pa.Table, _brackets=brackets) -> pa.Table:
            arr = batch[column]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            vals = arr.drop_null().to_numpy(zero_copy_only=False) \
                      .astype(np.float64, copy=False)
            below, inside = [], []
            for lo, hi in _brackets:
                below.append(int((vals < lo).sum()))
                inside.append(vals[(vals >= lo) & (vals <= hi)].tobytes())
            return pa.table({
                "below": pa.array([below], type=pa.list_(pa.int64())),
                "inside": pa.array([inside], type=pa.list_(pa.binary())),
            })

        partials = ds.map_batches(bracket_partial, batch_format="pyarrow",
                                  batch_size=batch_size).take_all()
        out, ok = [], True
        for qi, q in enumerate(quantiles):
            n_below = sum(r["below"][qi] for r in partials)
            chunk = [np.frombuffer(r["inside"][qi], dtype=np.float64)
                     for r in partials]
            inside = np.sort(np.concatenate(chunk)) if chunk else np.array([])
            rank = max(1, int(np.ceil(q * n)))          # 1-based, quantile_disc
            idx = rank - n_below - 1                    # 0-based within bracket
            if idx < 0 or idx >= len(inside):
                ok = False                              # sketch err > eps: widen
                break
            out.append(float(inside[idx]))
        if ok:
            return out, n
        eps = min(0.5, eps * 2)
    raise RuntimeError(
        f"exact_quantiles_distributed: bracket missed rank after {max_retries} "
        f"retries (eps={eps}) — t-digest quality insufficient for {column}")


def uniqueness_report(ds, key: str = "doc_id") -> pa.Table:
    """Materialized duplicate report (duplicate keys are assumed rare)."""
    dups = duplicate_keys(ds, key)
    tbl = pa.Table.from_pylist(dups.take_all(),
                               schema=pa.schema([(key, pa.string()),
                                                 ("dup_count", pa.int64())]))
    return tbl


# ---------------------------------------------------------------------------
# Referential check (broadcast semi-join; no shuffle)
# ---------------------------------------------------------------------------


class _ReferentialCheck:
    """Emits violation rows for values of ``column`` not in the broadcast
    allowed set.  The set is fetched from the object store once per actor."""

    def __init__(self, column: str, allowed_ref, id_column: str = "doc_id"):
        import ray
        self.column = column
        self.id_column = id_column
        allowed = ray.get(allowed_ref) if not isinstance(allowed_ref, (list, set, tuple)) else allowed_ref
        self.allowed = pa.array(sorted(set(allowed)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = batch[self.column]
        ok = pc.is_in(arr, value_set=self.allowed)
        bad_mask = pc.and_kleene(pc.invert(ok.fill_null(False) if isinstance(ok, pa.Array) else ok.combine_chunks().fill_null(False)),
                                 pc.is_valid(arr))
        bad = batch.filter(bad_mask)
        n = bad.num_rows
        return pa.table({
            "doc_id": bad[self.id_column].cast(pa.string()) if self.id_column in bad.column_names
                      else pa.array([None] * n, type=pa.string()),
            "constraint_id": pa.array([f"{self.column}/referential"] * n, type=pa.string()),
            "path": pa.array([self.column] * n, type=pa.string()),
            "message": pa.array([f"Value not in referenced key set ({self.column})"] * n,
                                type=pa.string()),
            "observed": bad[self.column].cast(pa.string()),
        })


def referential_violations(ds, column: str, allowed, id_column: str = "doc_id",
                           batch_size: int = 65536):
    """Broadcast-small-side semi-join: ``allowed`` (an iterable of keys) is
    ``ray.put`` once; every task reads it from the object store."""
    import ray
    allowed_ref = ray.put(sorted(set(allowed)))
    return ds.map_batches(
        _ReferentialCheck,
        fn_constructor_kwargs={"column": column, "allowed_ref": allowed_ref,
                               "id_column": id_column},
        batch_format="pyarrow", batch_size=batch_size, concurrency=(1, 8),
        max_restarts=0)


class _BloomReferentialCheck:
    """Probe-side stage: flags rows whose key is DEFINITELY absent from the
    broadcast Bloom filter.  Every emitted violation is a true orphan; a true
    orphan escapes with probability ~fpr (see BloomFilter docstring)."""

    def __init__(self, column: str, bloom_ref, id_column: str = "doc_id"):
        import ray
        self.column = column
        self.id_column = id_column
        blob = ray.get(bloom_ref) if not isinstance(bloom_ref, bytes) else bloom_ref
        self.bloom = BloomFilter.from_bytes(blob)

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = batch[self.column]
        maybe = self.bloom.test(arr)
        valid = pc.is_valid(arr).combine_chunks().to_numpy(zero_copy_only=False)
        bad = batch.filter(pa.array(~maybe & valid))
        n = bad.num_rows
        return pa.table({
            "doc_id": bad[self.id_column].cast(pa.string()) if self.id_column in bad.column_names
                      else pa.array([None] * n, type=pa.string()),
            "constraint_id": pa.array([f"{self.column}/referential_bloom"] * n, type=pa.string()),
            "path": pa.array([self.column] * n, type=pa.string()),
            "message": pa.array([f"Value not in referenced key set ({self.column})"] * n,
                                type=pa.string()),
            "observed": bad[self.column].cast(pa.string()),
        })


def build_bloom(dim_ds, column: str, expected: int, fpr: float = 0.01,
                batch_size: int = 65536) -> "BloomFilter":
    """Distributed Bloom build: each block emits a fixed-size filter blob
    sized for the FULL expected key count; blobs OR-merge associatively on
    the driver (partial+final, no shuffle).  At 100 TB the dim-side scan is
    block-parallel and the driver merges #blocks fixed-size blobs — size the
    block count so #blocks x m/8 bytes stays in driver memory, or lift the
    merge into a tree of map_batches stages (the OR is associative)."""
    proto = BloomFilter.sized(expected, fpr)
    m, k = proto.num_bits, proto.num_hashes

    def _partial(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(num_bits=m, num_hashes=k)
        bf.update(batch[column])
        return pa.table({"bloom": pa.array([bf.to_bytes()], type=pa.binary())})

    merged = BloomFilter(num_bits=m, num_hashes=k)
    for row in dim_ds.map_batches(_partial, batch_format="pyarrow",
                                  batch_size=batch_size).take_all():
        merged.merge(BloomFilter.from_bytes(row["bloom"]))
    return merged


def bloom_referential_violations(ds, column: str, dim_ds, dim_column: str,
                                 expected: int, fpr: float = 0.01,
                                 id_column: str = "doc_id",
                                 batch_size: int = 65536):
    """Scale-path referential check: Bloom filter over the dimension keys
    instead of the exact broadcast set (~10 bits/key vs full key strings).
    Zero false accusations; misses a true orphan with probability ~fpr."""
    import ray
    bloom = build_bloom(dim_ds, dim_column, expected, fpr, batch_size)
    bloom_ref = ray.put(bloom.to_bytes())
    return ds.map_batches(
        _BloomReferentialCheck,
        fn_constructor_kwargs={"column": column, "bloom_ref": bloom_ref,
                               "id_column": id_column},
        batch_format="pyarrow", batch_size=batch_size, concurrency=(1, 8),
        max_restarts=0)


# ---------------------------------------------------------------------------
# Distribution drift (categorical chi-square + numeric KS; partial + final)
# ---------------------------------------------------------------------------


def categorical_counts(ds, column: str, batch_size: int = 65536) -> dict[str, int]:
    """Exact category -> count map via the same combiner + small merge
    (requires low cardinality, e.g. ``source``)."""
    partials = ds.map_batches(lambda b: _partial_counts(b, column),
                              batch_format="pyarrow", batch_size=batch_size).take_all()
    out: dict[str, int] = {}
    for row in partials:
        k = str(row[column])
        out[k] = out.get(k, 0) + int(row["partial_count"])
    return out


def _hist_partial(batch: pa.Table, column: str, lo: float, hi: float,
                  bins: int, of_list_lengths: bool) -> pa.Table:
    arr = batch[column]
    if of_list_lengths:
        arr = pc.list_value_length(arr)
    h = Histogram(lo, hi, bins)
    vals = arr.combine_chunks().drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
    h.update(vals)
    return pa.table({"hist": pa.array([h.to_bytes()], type=pa.binary())})


def column_histogram(ds, column: str, lo: float, hi: float, bins: int = 256,
                     of_list_lengths: bool = False,
                     batch_size: int = 65536) -> Histogram:
    partials = ds.map_batches(
        lambda b: _hist_partial(b, column, lo, hi, bins, of_list_lengths),
        batch_format="pyarrow", batch_size=batch_size).take_all()
    merged = Histogram(lo, hi, bins)
    for row in partials:
        merged.merge(Histogram.from_bytes(row["hist"]))
    return merged


def column_tdigest(ds, column: str, of_list_lengths: bool = False,
                   delta: float = 200.0, batch_size: int = 65536) -> TDigest:
    """Mergeable t-digest of a numeric column (or of list lengths): one
    partial digest per block, merged treewise — the token-length-histogram
    sketch of the north star, accurate at the tails under merging."""
    def partial(batch: pa.Table) -> pa.Table:
        arr = batch[column]
        if of_list_lengths:
            arr = pc.list_value_length(arr)
        d = TDigest(delta=delta)
        d.update(arr.combine_chunks().drop_null().to_numpy(zero_copy_only=False)
                 .astype(np.float64))
        return pa.table({"td": pa.array([d.to_bytes()], type=pa.binary())})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=batch_size).take_all()
    merged = TDigest(delta=delta)
    for row in partials:
        merged.merge(TDigest.from_bytes(row["td"]))
    return merged


def salted_group_count(ds, key: str, salt_buckets: int = 32,
                       batch_size: int = 65536):
    """Explicit salted two-phase aggregation (the classic hot-key shuffle
    pattern): phase 1 groups on (key, salt) so a pathological key's rows
    spread over ``salt_buckets`` reducers; phase 2 merges the per-salt
    partials.  ``duplicate_keys`` (combiner + hash bucket) is normally
    preferred — this path exists for inputs whose per-batch combiner cannot
    collapse (e.g. pre-grouped or high-multiplicity batches) and as the
    documented salting primitive of the north rule.
    Returns a Dataset of (key, count)."""
    def phase1(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        salt = np.arange(n, dtype=np.int64) % salt_buckets
        return pa.table({key: batch[key],
                         "salt": pa.array(salt)})

    salted = ds.map_batches(phase1, batch_format="pyarrow", batch_size=batch_size)
    per_salt = salted.groupby([key, "salt"]).count()

    def strip(t: pa.Table) -> pa.Table:
        return pa.table({key: t[key], "partial_count": t["count()"]})

    partials = per_salt.map_batches(strip, batch_format="pyarrow")
    totals = partials.groupby(key).sum("partial_count")
    return totals.map_batches(
        lambda t: t.rename_columns([key, "count"]), batch_format="pyarrow")


def top_violation_kinds(violations_ds, k: int = 20):
    """Top-k constraint kinds by violation count: groupby-count (combiner
    pattern) then a tiny sort+limit — the 'worst offenders' report."""
    counts = violations_ds.groupby("constraint_id").count()
    renamed = counts.map_batches(
        lambda t: t.rename_columns(["constraint_id", "n_violations"]),
        batch_format="pyarrow")
    return renamed.sort("n_violations", descending=True).limit(k)


def sample_violations(violations_ds, fraction: float = 0.01, seed: int = 42):
    """Deterministic violation sampling for eyeballing: Bernoulli sample in
    the stream (no shuffle, no materialization)."""
    return violations_ds.random_sample(fraction, seed=seed)


def worst_partitions(manifest_dir: str, k: int = 10) -> pa.Table:
    """Top-k worst partitions by violation rate from the run manifests
    (tiny driver-side read of per-partition lineage)."""
    import glob
    import json
    import os
    rows = []
    for path in glob.glob(os.path.join(manifest_dir, "*.json")):
        with open(path) as f:
            m = json.load(f)
        rate = m["violation_rows"] / m["rows"] if m["rows"] else 0.0
        rows.append({"partition": m["partition"], "rows": m["rows"],
                     "violation_rows": m["violation_rows"],
                     "violation_rate": round(rate, 6),
                     "partition_pass": m["partition_pass"]})
    rows.sort(key=lambda r: (-r["violation_rate"], r["partition"]))
    return pa.Table.from_pylist(rows[:k]) if rows else pa.table(
        {"partition": pa.array([], type=pa.string())})


def drift_report(ds, baseline_counts: dict[str, int], baseline_hist: Histogram,
                 cat_column: str = "source", num_column: str = "n_tok") -> dict:
    """Distribution drift vs a baseline snapshot: chi-square on the
    categorical column, KS on the numeric column.  Partials merged treewise;
    nothing shuffles."""
    counts = categorical_counts(ds, cat_column)
    hist = column_histogram(ds, num_column, baseline_hist.lo, baseline_hist.hi,
                            baseline_hist.bins)
    return {
        "cat_column": cat_column,
        "chi_square": chi_square(counts, baseline_counts),
        "observed_counts": counts,
        "num_column": num_column,
        "ks_statistic": ks_statistic(hist, baseline_hist),
    }
