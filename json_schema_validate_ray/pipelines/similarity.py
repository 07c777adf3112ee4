"""Similarity search over an embedding column (list<float>).

* ``brute_force_topk`` — the exact baseline: the query matrix is broadcast
  via ``ray.put`` once; every batch computes a numpy matmul against it and
  emits only its local top-k; a final tiny sort picks the global top-k.
  Work per batch is O(batch × n_query × d) flops, fully distributed, no
  shuffle of the corpus.
* ``srp_bucketed_topk`` — the scale path: sign-random-projection (LSH)
  buckets both corpus and query; only matching buckets are scanned.  Same
  per-batch kernel, corpus scan reduced by ~2^bits.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _default_concurrency() -> int:
    import ray
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, cpus - 2)


def _scan_partitions(ds, rows_per_part: int = 2000) -> int:
    """Size-derived partition count for the scan stages (see
    dedup._sig_partitions): enough blocks for every core, never so many tiny
    blocks that scheduling dominates.  ds.count() on parquet is metadata."""
    try:
        rows = ds.count()
    except Exception:
        return _default_concurrency() * 2
    return max(2, min(_default_concurrency() * 2, -(-rows // rows_per_part)))


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def matrix_from_list_array(arr) -> np.ndarray:
    """Arrow list<float> column -> (n, d) float32 numpy WITHOUT a Python
    to_pylist round-trip: flatten (zero-copy) + reshape when rows are
    rectangular and null-free; ragged/nullable columns fall back."""
    import pyarrow as _pa
    import pyarrow.compute as _pc
    if isinstance(arr, _pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float32)
    if arr.null_count == 0:
        lens = _pc.list_value_length(arr)
        d = _pc.min(lens).as_py()
        if d == _pc.max(lens).as_py():
            flat = _pc.list_flatten(arr).to_numpy(zero_copy_only=False)
            return flat.astype(np.float32, copy=False).reshape(n, int(d))
    return np.array(arr.to_pylist(), dtype=np.float32)


class _TopKScanner:
    """Per-batch exact scan: cos = batch_norm @ query_norm.T; emit each
    batch's top-k per query (global top-k ⊆ union of per-batch top-k)."""

    def __init__(self, query_ref, id_column: str, vec_column: str, k: int):
        import ray
        q = ray.get(query_ref)
        self.queries = _normalize(np.asarray(q, dtype=np.float32))
        self.id_column = id_column
        self.vec_column = vec_column
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_column].to_pylist()
        vecs = matrix_from_list_array(batch[self.vec_column])
        # id type comes from the input schema so empty and non-empty blocks
        # union cleanly for string ids too (ADVICE r4)
        id_type = batch.schema.field(self.id_column).type
        if len(vecs) == 0:
            return pa.table({"query_id": pa.array([], type=pa.int32()),
                             self.id_column: pa.array([], type=id_type),
                             "cosine": pa.array([], type=pa.float64())})
        sims = _normalize(vecs) @ self.queries.T            # (n, Q)
        k = min(self.k, len(vecs))
        out_q, out_id, out_cos = [], [], []
        for qi in range(self.queries.shape[0]):
            col = sims[:, qi]
            top = np.argpartition(-col, k - 1)[:k]
            for i in top:
                out_q.append(qi)
                out_id.append(ids[int(i)])
                out_cos.append(round(float(col[i]), 5))
        return pa.table({"query_id": pa.array(out_q, type=pa.int32()),
                         self.id_column: pa.array(out_id, type=id_type),
                         "cosine": pa.array(out_cos, type=pa.float64())})


def brute_force_topk(ds, queries: np.ndarray, k: int = 10,
                     id_column: str = "vec_id", vec_column: str = "embedding"):
    """Exact cosine top-k for each query vector.  Returns a Dataset of
    (query_id, id_column, cosine) — k rows per query after the final prune."""
    import ray

    from ..stages.taskcache import cached_stage

    queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
    query_ref = ray.put(queries)
    # repartition: single-file corpora arrive as one block; cached tasks
    # avoid actor-pool startup (the scan itself is milliseconds)
    partial = ds.repartition(_scan_partitions(ds)).map_batches(
        cached_stage(_TopKScanner, query_ref=query_ref, id_column=id_column,
                     vec_column=vec_column, k=k),
        batch_format="pyarrow")

    # final prune: per-query top-k over the (tiny) union of batch top-ks;
    # ARROW output (pandas map_groups returns pay a 17x block conversion)
    def prune(g):
        g = g.sort_values(["cosine", id_column], ascending=[False, True]).head(k)
        return pa.table({
            "query_id": pa.array(g["query_id"], type=pa.int32()),
            id_column: pa.Array.from_pandas(g[id_column]),
            "cosine": pa.array(g["cosine"], type=pa.float64())})

    return partial.groupby("query_id").map_groups(prune, batch_format="pandas")


def srp_signature(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-random-projection bucket ids: bit b set iff v · plane_b > 0."""
    bits = (mat @ planes.T) > 0
    out = np.zeros(len(mat), dtype=np.int64)
    for b in range(planes.shape[0]):
        out |= bits[:, b].astype(np.int64) << b
    return out


class _SRPTopKScanner(_TopKScanner):
    """Scans only rows whose SRP bucket matches some query bucket (probing
    the exact bucket; multi-probe = flip one bit, also matched)."""

    def __init__(self, query_ref, planes_ref, id_column, vec_column, k):
        import ray
        super().__init__(query_ref, id_column, vec_column, k)
        self.planes = ray.get(planes_ref)
        qsig = srp_signature(self.queries, self.planes)
        probe = set(qsig.tolist())
        for s in qsig.tolist():                 # multi-probe: 1-bit flips
            for b in range(self.planes.shape[0]):
                probe.add(s ^ (1 << b))
        self.probe = probe

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = matrix_from_list_array(batch[self.vec_column])
        if len(vecs) == 0:
            return super().__call__(batch)
        sig = srp_signature(_normalize(vecs), self.planes)
        keep = np.array([s in self.probe for s in sig.tolist()], dtype=bool)
        filtered = batch.filter(pa.array(keep))
        return super().__call__(filtered)


def train_ivf_centroids(ds, n_centroids: int = 16, sample_rows: int = 4096,
                        n_iter: int = 10, vec_column: str = "embedding",
                        seed: int = 29) -> np.ndarray:
    """Deterministic mini k-means for IVF coarse quantization: train on a
    bounded sample (one driver-side matrix of ``sample_rows`` vectors), a
    fixed seed and iteration count — same centroids every run.  At scale the
    sample is a tiny fraction; training cost is independent of N."""
    sample = ds.limit(sample_rows).take_all()
    mat = _normalize(np.array([r[vec_column] for r in sample], dtype=np.float32))
    rng = np.random.default_rng(seed)
    k = min(n_centroids, len(mat))
    cent = mat[rng.choice(len(mat), size=k, replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(mat @ cent.T, axis=1)          # cosine on normalized
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


class _IVFTopKScanner(_TopKScanner):
    """Scans only rows whose IVF cell is among each query's ``nprobe``
    nearest centroids — the classic coarse-quantizer prune; scan fraction
    ~ nprobe / n_centroids."""

    def __init__(self, query_ref, centroids_ref, id_column, vec_column, k,
                 nprobe: int):
        import ray
        super().__init__(query_ref, id_column, vec_column, k)
        self.centroids = ray.get(centroids_ref)           # (C, d) normalized
        qsims = self.queries @ self.centroids.T           # (Q, C)
        nprobe = min(nprobe, self.centroids.shape[0])
        probed = np.argpartition(-qsims, nprobe - 1, axis=1)[:, :nprobe]
        self.probe_cells = set(probed.reshape(-1).tolist())

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = matrix_from_list_array(batch[self.vec_column])
        if len(vecs) == 0:
            return super().__call__(batch)
        cells = np.argmax(_normalize(vecs) @ self.centroids.T, axis=1)
        keep = np.isin(cells, list(self.probe_cells))
        return super().__call__(batch.filter(pa.array(keep)))


def ivf_topk(ds, queries: np.ndarray, k: int = 10, n_centroids: int = 16,
             nprobe: int = 4, id_column: str = "vec_id",
             vec_column: str = "embedding", seed: int = 29):
    """Approximate top-k via IVF coarse quantization (the k-means sibling of
    the SRP path): centroids trained once on a bounded sample, broadcast via
    ``ray.put``; every batch assigns its vectors to cells vectorized and
    scans only the cells any query probes.  Recall rises with ``nprobe``
    (nprobe == n_centroids is exhaustive == brute force)."""
    import ray

    from ..stages.taskcache import cached_stage

    queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
    centroids = train_ivf_centroids(ds, n_centroids=n_centroids,
                                    vec_column=vec_column, seed=seed)
    query_ref = ray.put(queries)
    centroids_ref = ray.put(centroids)
    partial = ds.repartition(_scan_partitions(ds)).map_batches(
        cached_stage(_IVFTopKScanner, query_ref=query_ref,
                     centroids_ref=centroids_ref, id_column=id_column,
                     vec_column=vec_column, k=k, nprobe=nprobe),
        batch_format="pyarrow")

    def prune(g):
        g = g.sort_values(["cosine", id_column], ascending=[False, True]).head(k)
        return pa.table({
            "query_id": pa.array(g["query_id"], type=pa.int32()),
            id_column: pa.Array.from_pandas(g[id_column]),
            "cosine": pa.array(g["cosine"], type=pa.float64())})

    return partial.groupby("query_id").map_groups(prune, batch_format="pandas")


def srp_bucketed_topk(ds, queries: np.ndarray, k: int = 10, bits: int = 8,
                      id_column: str = "vec_id", vec_column: str = "embedding",
                      seed: int = 13):
    """Approximate top-k: SRP-bucket pruning (scan ~ (1+bits)/2^bits of the
    corpus with 1-bit multi-probe), same final prune as the exact path."""
    import ray

    queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
    dim = queries.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bits, dim)).astype(np.float32)
    from ..stages.taskcache import cached_stage

    query_ref = ray.put(queries)
    planes_ref = ray.put(planes)
    partial = ds.repartition(_scan_partitions(ds)).map_batches(
        cached_stage(_SRPTopKScanner, query_ref=query_ref, planes_ref=planes_ref,
                     id_column=id_column, vec_column=vec_column, k=k),
        batch_format="pyarrow")

    def prune(g):
        g = g.sort_values(["cosine", id_column], ascending=[False, True]).head(k)
        return pa.table({
            "query_id": pa.array(g["query_id"], type=pa.int32()),
            id_column: pa.Array.from_pandas(g[id_column]),
            "cosine": pa.array(g["cosine"], type=pa.float64())})

    return partial.groupby("query_id").map_groups(prune, batch_format="pandas")


def train_pq_codebooks(ds, m: int = 8, n_codes: int = 16,
                       sample_rows: int = 4096, n_iter: int = 10,
                       vec_column: str = "embedding",
                       seed: int = 31) -> np.ndarray:
    """Product-quantization codebooks (Jegou et al. 2011): split the
    normalized vector into ``m`` subspaces and train an ``n_codes``-entry
    k-means codebook per subspace on a bounded sample — deterministic
    (fixed seed/iterations), training cost independent of N."""
    sample = ds.limit(sample_rows).take_all()
    mat = _normalize(np.array([r[vec_column] for r in sample],
                              dtype=np.float32))
    return _kmeans_subspace_books(mat, m, n_codes, n_iter, seed)


def _kmeans_subspace_books(mat: np.ndarray, m: int, n_codes: int,
                           n_iter: int, seed: int) -> np.ndarray:
    """Per-subspace k-means codebooks over an in-memory training matrix
    (raw vectors for PQ, cell residuals for IVFADC)."""
    d = mat.shape[1]
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    sub = d // m
    rng = np.random.default_rng(seed)
    k = min(n_codes, len(mat))
    books = np.empty((m, k, sub), dtype=np.float32)
    for j in range(m):
        x = mat[:, j * sub:(j + 1) * sub]
        cent = x[rng.choice(len(x), size=k, replace=False)].copy()
        for _ in range(n_iter):
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                members = x[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j] = cent
    return books


class _PQTopKScanner:
    """ADC scan + exact rerank: per batch, encode vectors to PQ codes
    (argmin L2 per subspace, vectorized), score every query against every
    row from the per-query ADC lookup tables (sum of m table lookups — no
    full-dimension matmul), shortlist ``k * rerank`` rows per query, then
    compute the EXACT cosine for the shortlist only.  Output scores are
    exact; only the shortlist (recall) is approximate."""

    def __init__(self, query_ref, books_ref, id_column, vec_column, k,
                 rerank: int):
        import ray
        self.queries = _normalize(np.asarray(ray.get(query_ref),
                                             dtype=np.float32))
        self.books = ray.get(books_ref)                   # (m, C, sub)
        self.id_column = id_column
        self.vec_column = vec_column
        self.k = k
        self.rerank = rerank
        m, C, sub = self.books.shape
        Q = self.queries.shape[0]
        # ADC tables: adc[q, j, c] = q_sub_j . book[j, c]
        self.adc = np.einsum("qjs,jcs->qjc",
                             self.queries.reshape(Q, m, sub), self.books)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_column].to_pylist()
        vecs = matrix_from_list_array(batch[self.vec_column])
        # derive the id type from the INPUT schema: a hardcoded int64 here
        # would make empty blocks schema-diverge from non-empty ones for
        # string ids and fail the downstream union (ADVICE r4)
        id_type = batch.schema.field(self.id_column).type
        empty = pa.table({"query_id": pa.array([], type=pa.int32()),
                          self.id_column: pa.array([], type=id_type),
                          "cosine": pa.array([], type=pa.float64())})
        if len(vecs) == 0:
            return empty
        x = _normalize(vecs)
        m, C, sub = self.books.shape
        n = x.shape[0]
        xs = x.reshape(n, m, sub)
        # encode: nearest sub-centroid by L2, vectorized per subspace
        codes = np.empty((n, m), dtype=np.int64)
        for j in range(m):
            d2 = ((xs[:, j, None, :] - self.books[None, j]) ** 2).sum(axis=2)
            codes[:, j] = np.argmin(d2, axis=1)
        # approx sims: sum_j adc[q, j, codes[:, j]]  -> (Q, n)
        approx = np.zeros((self.queries.shape[0], n), dtype=np.float32)
        for j in range(m):
            approx += self.adc[:, j, codes[:, j]]
        shortlist = min(self.k * self.rerank, n)
        out_q, out_id, out_cos = [], [], []
        for qi in range(self.queries.shape[0]):
            top = np.argpartition(-approx[qi], shortlist - 1)[:shortlist]
            exact = x[top] @ self.queries[qi]             # exact rerank
            kk = min(self.k, len(top))
            best = np.argpartition(-exact, kk - 1)[:kk]
            for b in best:
                out_q.append(qi)
                out_id.append(ids[int(top[b])])
                out_cos.append(round(float(exact[b]), 5))
        return pa.table({"query_id": pa.array(out_q, type=pa.int32()),
                         self.id_column: pa.array(out_id, type=id_type),
                         "cosine": pa.array(out_cos, type=pa.float64())})


def pq_topk(ds, queries: np.ndarray, k: int = 10, m: int = 8,
            n_codes: int = 16, rerank: int = 4, id_column: str = "vec_id",
            vec_column: str = "embedding", seed: int = 31):
    """Approximate top-k via product quantization + exact rerank — the
    memory-bound scale path (codes are m bytes/vector vs 4d; the ADC scan
    does m table lookups per row instead of a d-dim dot product).
    Codebooks train once on a bounded sample and broadcast; recall rises
    with ``rerank`` and ``n_codes``.  Same per-batch-top-k + tiny final
    prune shape as the other ANN paths."""
    import ray

    from ..stages.taskcache import cached_stage

    queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
    books = train_pq_codebooks(ds, m=m, n_codes=n_codes,
                               vec_column=vec_column, seed=seed)
    query_ref = ray.put(queries)
    books_ref = ray.put(books)
    partial = ds.repartition(_scan_partitions(ds)).map_batches(
        cached_stage(_PQTopKScanner, query_ref=query_ref,
                     books_ref=books_ref, id_column=id_column,
                     vec_column=vec_column, k=k, rerank=rerank),
        batch_format="pyarrow")

    def prune(g):
        g = g.sort_values(["cosine", id_column],
                          ascending=[False, True]).head(k)
        return pa.table({
            "query_id": pa.array(g["query_id"], type=pa.int32()),
            id_column: pa.Array.from_pandas(g[id_column]),
            "cosine": pa.array(g["cosine"], type=pa.float64())})

    return partial.groupby("query_id").map_groups(prune,
                                                  batch_format="pandas")


def train_ivfpq(ds, n_centroids: int = 16, m: int = 8, n_codes: int = 16,
                sample_rows: int = 4096, n_iter: int = 10,
                vec_column: str = "embedding", seed: int = 31):
    """Train the two halves of the IVFADC layout (Jegou et al. 2011,
    §IV) on ONE bounded sample: the coarse quantizer (IVF centroids) and
    per-subspace PQ codebooks fitted to the RESIDUALS x - centroid(x) —
    residual energy is far smaller than vector energy, so the same code
    budget quantizes finer than raw-vector PQ.  Returns (centroids,
    books)."""
    sample = ds.limit(sample_rows).take_all()
    mat = _normalize(np.array([r[vec_column] for r in sample],
                              dtype=np.float32))
    rng = np.random.default_rng(seed)
    k = min(n_centroids, len(mat))
    cent = mat[rng.choice(len(mat), size=k, replace=False)].copy()
    for _ in range(n_iter):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    assign = np.argmax(mat @ cent.T, axis=1)
    residuals = mat - cent[assign]
    books = _kmeans_subspace_books(residuals, m, n_codes, n_iter, seed)
    return cent, books


class _IVFPQScanner:
    """IVFADC: the coarse quantizer restricts the ADC scan to each query's
    ``nprobe`` nearest cells, and the ADC tables score RESIDUAL codes —
    q . x_hat = q . c_cell + q . r_hat, the per-cell constant plus m
    residual-table lookups (Jegou et al. 2011).  Shortlist -> exact cosine
    rerank, so output scores are exact; only recall is approximate.  The
    memory-bound (m bytes/vector) and compute-bound (scan nprobe/C of the
    corpus) paths stack (verdict r4 #8)."""

    def __init__(self, query_ref, centroids_ref, books_ref, id_column,
                 vec_column, k, nprobe: int, rerank: int):
        import ray
        self.queries = _normalize(np.asarray(ray.get(query_ref),
                                             dtype=np.float32))
        self.centroids = ray.get(centroids_ref)          # (C, d) normalized
        self.books = ray.get(books_ref)                  # (m, Cc, sub)
        self.id_column = id_column
        self.vec_column = vec_column
        self.k = k
        self.rerank = rerank
        m, Cc, sub = self.books.shape
        Q = self.queries.shape[0]
        C = self.centroids.shape[0]
        self.qcent = self.queries @ self.centroids.T     # (Q, C) constants
        nprobe = min(nprobe, C)
        self.probed = np.argpartition(-self.qcent, nprobe - 1,
                                      axis=1)[:, :nprobe]        # (Q, np)
        # rows in any query's probed cells survive the batch filter
        self.probe_mask = np.zeros(C, dtype=bool)
        self.probe_mask[np.unique(self.probed)] = True
        # residual ADC tables: adc[q, j, c] = q_sub_j . book[j, c]
        self.adc = np.einsum("qjs,jcs->qjc",
                             self.queries.reshape(Q, m, sub), self.books)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_column].to_pylist()
        vecs = matrix_from_list_array(batch[self.vec_column])
        id_type = batch.schema.field(self.id_column).type
        empty = pa.table({"query_id": pa.array([], type=pa.int32()),
                          self.id_column: pa.array([], type=id_type),
                          "cosine": pa.array([], type=pa.float64())})
        if len(vecs) == 0:
            return empty
        x = _normalize(vecs)
        cells = np.argmax(x @ self.centroids.T, axis=1)
        keep = self.probe_mask[cells]
        if not keep.any():
            return empty
        kept = np.flatnonzero(keep)
        xk = x[kept]
        ck = cells[kept]
        res = xk - self.centroids[ck]
        m, Cc, sub = self.books.shape
        n = xk.shape[0]
        rs = res.reshape(n, m, sub)
        codes = np.empty((n, m), dtype=np.int64)
        for j in range(m):
            d2 = ((rs[:, j, None, :] - self.books[None, j]) ** 2).sum(axis=2)
            codes[:, j] = np.argmin(d2, axis=1)
        # approx per-query: constant q.c_cell + residual table lookups
        lut = np.zeros((self.queries.shape[0], n), dtype=np.float32)
        for j in range(m):
            lut += self.adc[:, j, codes[:, j]]
        out_q, out_id, out_cos = [], [], []
        for qi in range(self.queries.shape[0]):
            # restrict to THIS query's probed cells
            qcells = self.probed[qi]
            sel = np.flatnonzero(np.isin(ck, qcells))
            if len(sel) == 0:
                continue
            approx = self.qcent[qi, ck[sel]] + lut[qi, sel]
            shortlist = min(self.k * self.rerank, len(sel))
            top = sel[np.argpartition(-approx, shortlist - 1)[:shortlist]]
            exact = xk[top] @ self.queries[qi]           # exact rerank
            kk = min(self.k, len(top))
            best = np.argpartition(-exact, kk - 1)[:kk]
            for b in best:
                out_q.append(qi)
                out_id.append(ids[int(kept[top[b]])])
                out_cos.append(round(float(exact[b]), 5))
        return pa.table({"query_id": pa.array(out_q, type=pa.int32()),
                         self.id_column: pa.array(out_id, type=id_type),
                         "cosine": pa.array(out_cos, type=pa.float64())})


def ivfpq_topk(ds, queries: np.ndarray, k: int = 10, n_centroids: int = 16,
               nprobe: int = 8, m: int = 8, n_codes: int = 16,
               rerank: int = 4, id_column: str = "vec_id",
               vec_column: str = "embedding", seed: int = 31):
    """Approximate top-k via the composed IVF + PQ (IVFADC) layout: the
    coarse quantizer restricts each query's ADC scan to ``nprobe`` cells
    and the PQ codes quantize cell RESIDUALS, so at equal code budget the
    composition is both cheaper (scans nprobe/C of the corpus) and finer
    (residual quantization error < raw-vector error) than PQ alone —
    recall pinned >= the PQ-only path in tests/test_pq.py.  Same broadcast
    + per-batch-top-k + tiny final prune shape as every other ANN path."""
    import ray

    from ..stages.taskcache import cached_stage

    queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
    centroids, books = train_ivfpq(ds, n_centroids=n_centroids, m=m,
                                   n_codes=n_codes, vec_column=vec_column,
                                   seed=seed)
    query_ref = ray.put(queries)
    centroids_ref = ray.put(centroids)
    books_ref = ray.put(books)
    partial = ds.repartition(_scan_partitions(ds)).map_batches(
        cached_stage(_IVFPQScanner, query_ref=query_ref,
                     centroids_ref=centroids_ref, books_ref=books_ref,
                     id_column=id_column, vec_column=vec_column, k=k,
                     nprobe=nprobe, rerank=rerank),
        batch_format="pyarrow")

    def prune(g):
        g = g.sort_values(["cosine", id_column],
                          ascending=[False, True]).head(k)
        return pa.table({
            "query_id": pa.array(g["query_id"], type=pa.int32()),
            id_column: pa.Array.from_pandas(g[id_column]),
            "cosine": pa.array(g["cosine"], type=pa.float64())})

    return partial.groupby("query_id").map_groups(prune,
                                                  batch_format="pandas")


def semdedup(ds, threshold: float = 0.9, n_clusters: int | None = None,
             id_column: str = "vec_id", vec_column: str = "embedding",
             seed: int = 29, chunk: int = 1024,
             target_cluster_rows: int = 4096):
    """Semantic deduplication (SemDeDup, Abbas et al. 2023, arXiv:2303.09540):
    cluster embeddings with the IVF k-means coarse quantizer, then within
    each cluster drop every vector that has a >= ``threshold`` cosine
    neighbor with a SMALLER id (deterministic survivor choice — the id
    order replaces the paper's arbitrary keep-one).  Emits
    (id, cell, kept) for every row.

    Scale shape: centroids train on a bounded sample and broadcast via
    ``ray.put``; cell assignment is one vectorized matmul per batch; the only
    all-to-all moves (id, cell, vec) rows — grouped BY CELL, so per-group
    memory is a cluster, not the corpus.  ``n_clusters`` defaults to
    SIZE-DERIVED: ceil(rows / target_cluster_rows) capped at 8192 (the
    k-means sample grows with the cluster count, bounded at 64k vectors on
    the driver), so a cluster stays a ~target_cluster_rows-row group up to
    ~32M rows; beyond that pass ``n_clusters`` explicitly or run
    hierarchically (semdedup per coarse shard).  Within a cluster the
    pairwise pass is tiled (``chunk`` rows at a time) so sim-matrix memory
    is chunk x m, not m x m.  Probabilistic (k-means cells) — no SQL
    oracle; pytest pins the per-cluster semantics against brute force and
    the size derivation."""
    import ray

    from ..stages.taskcache import cached_stage

    if n_clusters is None:
        rows = ds.count()                     # parquet metadata, no scan
        n_clusters = min(8192, max(1, -(-rows // target_cluster_rows)))
    centroids = train_ivf_centroids(
        ds, n_centroids=n_clusters, vec_column=vec_column, seed=seed,
        sample_rows=min(65536, max(4096, 8 * n_clusters)))
    centroids_ref = ray.put(centroids)

    class _Assign:
        def __init__(self):
            self.centroids = ray.get(centroids_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _normalize(matrix_from_list_array(batch[vec_column]))
            cells = (np.argmax(mat @ self.centroids.T, axis=1).astype(np.int32)
                     if len(mat) else np.array([], dtype=np.int32))
            return pa.table({
                id_column: batch[id_column],
                "cell": pa.array(cells),
                vec_column: batch[vec_column]})

    assigned = ds.repartition(_scan_partitions(ds)).map_batches(
        cached_stage(_Assign), batch_format="pyarrow")

    def prune(g: pa.Table) -> pa.Table:
        g = g.sort_by(id_column)
        mat = _normalize(matrix_from_list_array(g[vec_column]))  # zero-copy
        m = len(mat)
        kept = np.ones(m, dtype=bool)
        col = np.arange(m)
        for lo in range(0, m, chunk):
            hi = min(lo + chunk, m)
            sims = mat[lo:hi] @ mat.T          # (hi-lo, m)
            # duplicate iff any smaller-id row is >= threshold similar
            dup = ((sims >= threshold) &
                   (col[None, :] < np.arange(lo, hi)[:, None])).any(axis=1)
            kept[lo:hi] = ~dup
        return pa.table({
            id_column: g[id_column],
            "cell": g["cell"],
            "kept": pa.array(kept)})

    return assigned.groupby("cell").map_groups(prune, batch_format="pyarrow")
