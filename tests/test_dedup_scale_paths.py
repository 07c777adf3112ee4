"""Scale-path regressions from the round-1 verdict:

* embedding_cosine_pairs must not materialize the dataset on the driver —
  it is now triangle block-pairing: results must be identical for every
  block count (1 block == the old all-pairs layout, B blocks == the
  distributed layout).
* _semi_join_crowded must return COMPLETE results when the crowded-key set
  exceeds the broadcast limit (the old code silently dropped keys past a
  200k cap).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from json_schema_validate_ray.pipelines.dedup import (
    _semi_join_crowded,
    embedding_cosine_pairs,
    embedding_srp_pairs,
    minhash_lsh_candidates,
    simhash_buckets,
)


def _embeddings_ds(n=120, d=16, seed=7):
    rng = np.random.default_rng(seed)
    # half the rows come in near-duplicate pairs -> plenty of close pairs
    base = rng.standard_normal((n // 2, d)).astype(np.float32)
    noisy = base + rng.standard_normal((n // 2, d)).astype(np.float32) * 0.05
    mat = np.concatenate([base, noisy])
    ids = list(range(len(mat)))
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in mat],
                              type=pa.list_(pa.float32())),
    })), mat, ids


def _brute_pairs(mat, ids, threshold):
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    v = mat / norms
    sims = v @ v.T
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if sims[i, j] >= threshold:
                out.add((ids[i], ids[j]))
    return out


def _pairs_set(ds):
    rows = ds.take_all()
    return {(r["id_a"], r["id_b"]) for r in rows}


@pytest.mark.parametrize("n_blocks", [1, 3, 7])
def test_triangle_blocks_exact_any_block_count(ray_session, n_blocks):
    ds, mat, ids = _embeddings_ds()
    expect = _brute_pairs(mat, ids, 0.8)
    got = _pairs_set(embedding_cosine_pairs(
        ds, "vec_id", "embedding", threshold=0.8, n_blocks=n_blocks))
    assert got == expect
    assert len(expect) > 10   # the fixture actually plants close pairs


def test_triangle_auto_blocks_small_input(ray_session):
    ds, mat, ids = _embeddings_ds(n=60)
    expect = _brute_pairs(mat, ids, 0.8)
    got = _pairs_set(embedding_cosine_pairs(ds, "vec_id", "embedding",
                                            threshold=0.8))
    assert got == expect


def test_srp_pairs_subset_of_exact(ray_session):
    ds, mat, ids = _embeddings_ds()
    exact = _brute_pairs(mat, ids, 0.8)
    approx = _pairs_set(embedding_srp_pairs(ds, "vec_id", "embedding",
                                            threshold=0.8, bits=4))
    assert approx <= exact
    # near-identical pairs (tiny angle) survive low-bit SRP with high prob:
    # the fixture's planted dups are ~0.999 cosine, expect most to surface
    assert len(approx) >= len(exact) // 2


def test_semi_join_distributed_path_complete(ray_session):
    # 300 crowded keys with broadcast_limit=10: MUST take the join path and
    # still return every crowded row (the old cap silently dropped keys)
    n_keys = 300
    keys = np.repeat(np.arange(n_keys, dtype=np.int64), 2)     # all crowded
    singles = np.arange(10_000, 10_500, dtype=np.int64)        # singletons
    tbl = pa.table({"band_key": pa.array(np.concatenate([keys, singles])),
                    "payload": pa.array(
                        np.arange(len(keys) + len(singles), dtype=np.int64))})
    ds = rd.from_arrow(tbl).repartition(4)
    out = _semi_join_crowded(ds, "band_key", broadcast_limit=10)
    rows = out.take_all()
    assert len(rows) == 2 * n_keys
    assert {r["band_key"] for r in rows} == set(range(n_keys))


def test_semi_join_broadcast_path_complete(ray_session):
    keys = np.repeat(np.arange(50, dtype=np.int64), 3)
    tbl = pa.table({"band_key": pa.array(keys),
                    "payload": pa.array(np.arange(len(keys), dtype=np.int64))})
    ds = rd.from_arrow(tbl).repartition(4)
    out = _semi_join_crowded(ds, "band_key", broadcast_limit=1000)
    assert out.count() == len(keys)


def test_semi_join_none_when_no_crowded(ray_session):
    tbl = pa.table({"band_key": pa.array(np.arange(100, dtype=np.int64))})
    assert _semi_join_crowded(rd.from_arrow(tbl), "band_key") is None


def test_minhash_and_simhash_still_find_planted_dups(ray_session):
    texts = [f"unique document number {i} with some distinct words {i * 7}"
             for i in range(50)]
    texts += ["the quick brown fox jumps over the lazy dog again and again"] * 3
    ids = [str(i) for i in range(len(texts))]
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    cands = minhash_lsh_candidates(ds, "text", "doc_id").take_all()
    crowded_ids = {d for r in cands for d in r["doc_ids"]}
    assert {"50", "51", "52"} <= crowded_ids
    buckets = simhash_buckets(ds, "text", "doc_id").take_all()
    sim_ids = {d for r in buckets for d in r["doc_ids"]}
    assert {"50", "51", "52"} <= sim_ids


def test_ivf_topk_recall(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from json_schema_validate_ray.pipelines.similarity import (
        brute_force_topk, ivf_topk)
    rng = np.random.default_rng(3)
    # clustered corpus: IVF's favorable regime
    centers = rng.standard_normal((8, 24)).astype(np.float32) * 3
    mat = np.concatenate([c + rng.standard_normal((200, 24)).astype(np.float32)
                          for c in centers])
    ids = np.arange(len(mat))
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in mat],
                              type=pa.list_(pa.float32()))})).repartition(4)
    q = mat[5]
    exact = {r["vec_id"] for r in brute_force_topk(ds, q, k=10).take_all()}
    # full probe == brute force (sanity: recall 1.0)
    full = {r["vec_id"] for r in ivf_topk(ds, q, k=10, n_centroids=8,
                                          nprobe=8).take_all()}
    assert full == exact
    # partial probe: high recall on clustered data
    approx = {r["vec_id"] for r in ivf_topk(ds, q, k=10, n_centroids=8,
                                            nprobe=2).take_all()}
    assert len(approx & exact) >= 8
