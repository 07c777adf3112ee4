"""SemDeDup (pipelines/similarity.semdedup) and global rank
(pipelines/rank.py) semantics pins."""

import numpy as np
import pyarrow as pa
import pytest

from json_schema_validate_ray.pipelines.rank import _ntile_from_rank


def _embedding_table(n, dim=8, n_dups=10, seed=3):
    """Random unit vectors plus n_dups near-duplicates of existing rows."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    for i in range(n_dups):
        src = rng.integers(0, n - n_dups)
        v = base[src] + 0.01 * rng.standard_normal(dim).astype(np.float32)
        base[n - n_dups + i] = v / np.linalg.norm(v)
    return pa.table({"vec_id": pa.array(np.arange(n), type=pa.int64()),
                     "embedding": pa.array(list(base.astype(float)),
                                           type=pa.list_(pa.float32()))})


def _brute_force_semdedup(ids, mat, cells, threshold):
    """Per-cell reference: drop i iff a smaller-id same-cell j has
    cosine(i, j) >= threshold."""
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    kept = {}
    order = np.argsort(ids)
    for pos_i in order:
        dup = False
        for pos_j in order:
            if ids[pos_j] >= ids[pos_i]:
                break
            if cells[pos_j] == cells[pos_i] and \
                    float(mat[pos_i] @ mat[pos_j]) >= threshold:
                dup = True
                break
        kept[int(ids[pos_i])] = not dup
    return kept


def test_semdedup_matches_brute_force(ray_session):
    import ray.data as rd

    from json_schema_validate_ray.pipelines.similarity import (
        matrix_from_list_array, _normalize, semdedup, train_ivf_centroids)

    tbl = _embedding_table(200, n_dups=25)
    ds = rd.from_arrow(tbl)
    out = semdedup(ds, threshold=0.95, n_clusters=4, chunk=16).take_all()
    got = {r["vec_id"]: r["kept"] for r in out}
    got_cells = {r["vec_id"]: r["cell"] for r in out}

    # reference cells come from the same deterministic centroid trainer
    centroids = train_ivf_centroids(ds, n_centroids=4)
    mat = _normalize(matrix_from_list_array(tbl["embedding"]))
    ids = tbl["vec_id"].to_numpy()
    cells = np.argmax(mat @ centroids.T, axis=1)
    assert got_cells == {int(i): int(c) for i, c in zip(ids, cells)}

    want = _brute_force_semdedup(ids, mat, cells, 0.95)
    assert got == want
    # the near-duplicate construction must actually drop something
    assert sum(not k for k in got.values()) >= 10


def test_semdedup_threshold_one_keeps_all(ray_session):
    import ray.data as rd

    from json_schema_validate_ray.pipelines.similarity import semdedup

    tbl = _embedding_table(60, n_dups=0, seed=11)
    out = semdedup(rd.from_arrow(tbl), threshold=1.0000001,
                   n_clusters=3).take_all()
    assert len(out) == 60 and all(r["kept"] for r in out)


@pytest.mark.parametrize("n,t", [(10, 4), (4, 4), (3, 4), (100, 7), (8, 2)])
def test_ntile_matches_sql_fill_rule(n, t):
    rank = np.arange(1, n + 1, dtype=np.int64)
    got = _ntile_from_rank(rank, n, t)
    # SQL rule: first n % t tiles have ceil(n/t) rows, the rest floor(n/t)
    base, rem = divmod(n, t)
    want = []
    tile = 1
    for size in [base + 1] * rem + [base] * (t - rem):
        want.extend([tile] * size)
        tile += 1
    assert got.tolist() == want[:n]


@pytest.mark.parametrize("blocks", [1, 3, 17])
def test_global_rank_block_layout_invariant(ray_session, blocks):
    import ray.data as rd

    from json_schema_validate_ray.pipelines.rank import global_rank

    rng = np.random.default_rng(5)
    n = 500
    key = rng.integers(0, 40, n)  # heavy ties -> id tie-break matters
    tbl = pa.table({"doc_id": pa.array(np.arange(n), type=pa.int64()),
                    "n_chars": pa.array(key, type=pa.int64())})
    out = global_rank(rd.from_arrow(tbl).repartition(blocks),
                      "n_chars", "doc_id", descending=True,
                      ntile=4).take_all()
    assert len(out) == n
    by_rank = sorted(out, key=lambda r: r["rnk"])
    order = sorted(range(n), key=lambda i: (-key[i], i))
    assert [r["doc_id"] for r in by_rank] == order
    assert [r["rnk"] for r in by_rank] == list(range(1, n + 1))
    assert [r["quartile"] for r in by_rank] == [
        (r - 1) // 125 + 1 for r in range(1, n + 1)]


def test_semdedup_size_derived_clusters(ray_session):
    # n_clusters=None derives ceil(rows / target_cluster_rows): forcing a
    # tiny target yields many small cells, every row still emitted exactly
    # once, identical vectors still deduped when they land in one cell.
    import ray.data as rd

    from json_schema_validate_ray.pipelines.similarity import semdedup

    tbl = _embedding_table(300, n_dups=30)
    out = semdedup(rd.from_arrow(tbl), threshold=0.99,
                   target_cluster_rows=25, chunk=8).take_all()
    assert len(out) == 300
    assert sorted(r["vec_id"] for r in out) == list(range(300))
    cells = {r["cell"] for r in out}
    # ceil(300/25) = 12 centroids requested; k-means may leave some cells
    # empty but the assignment must spread well beyond one fat cell
    assert len(cells) > 3
    # per-cell sizes bounded: no cell hoards the corpus
    from collections import Counter
    sizes = Counter(r["cell"] for r in out)
    assert max(sizes.values()) < 300


def test_semdedup_exact_duplicates_dropped_with_derived_clusters(ray_session):
    # identical vectors always share a cell (same argmax), so the smaller
    # id survives regardless of the derived cluster count
    import ray.data as rd

    from json_schema_validate_ray.pipelines.similarity import semdedup

    rng = np.random.default_rng(11)
    base = rng.standard_normal((60, 8)).astype(np.float32)
    base[30:] = base[:30]                      # 30 exact duplicate pairs
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    tbl = pa.table({"vec_id": pa.array(np.arange(60), type=pa.int64()),
                    "embedding": pa.array(list(base.astype(float)),
                                          type=pa.list_(pa.float32()))})
    out = semdedup(rd.from_arrow(tbl), threshold=0.999,
                   target_cluster_rows=10).take_all()
    kept = {r["vec_id"]: r["kept"] for r in out}
    for i in range(30):
        assert kept[i], i                      # smaller id survives
        assert not kept[i + 30], i             # exact dup dropped


def test_global_rank_string_key_and_id(ray_session):
    # the sort key and the tie-breaker id may both be strings: types carry
    # through the block-first projection (no float64/int64 hardcast)
    import ray.data as rd

    from json_schema_validate_ray.pipelines.rank import global_rank

    ids = [f"doc-{i:03d}" for i in range(40)]
    keys = [f"k{i % 7}" for i in range(40)]            # ties -> id breaks
    tbl = pa.table({"doc_id": pa.array(ids), "grp": pa.array(keys)})
    out = global_rank(rd.from_arrow(tbl).repartition(5), "grp", "doc_id",
                      descending=False).take_all()
    by_rank = sorted(out, key=lambda r: r["rnk"])
    want = sorted(range(40), key=lambda i: (keys[i], ids[i]))
    assert [r["doc_id"] for r in by_rank] == [ids[i] for i in want]
    assert [r["rnk"] for r in by_rank] == list(range(1, 41))
    # descending string key works too (no arithmetic negation)
    out_d = global_rank(rd.from_arrow(tbl).repartition(3), "grp", "doc_id",
                        descending=True).take_all()
    by_rank_d = sorted(out_d, key=lambda r: r["rnk"])
    want_d = sorted(range(40), key=lambda i: (keys[i], ids[i]))
    want_d.sort(key=lambda i: keys[i], reverse=True)
    assert [r["doc_id"] for r in by_rank_d] == [ids[i] for i in want_d]
