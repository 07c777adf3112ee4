"""Product-quantization ANN: determinism + recall@10 vs brute force, and
the exactness of the rerank scores."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd
    return rd.read_parquet("/root/testdata/sf0.01/embeddings.parquet",
                           columns=["vec_id", "embedding"]).materialize()


def _queries():
    rng = np.random.default_rng(17)
    return rng.normal(size=(5, 64)).astype(np.float32)


def test_pq_recall_and_exact_scores(emb_ds):
    from json_schema_validate_ray.pipelines.similarity import (
        brute_force_topk, pq_topk)
    q = _queries()
    truth = {}
    for r in brute_force_topk(emb_ds, q, k=10).take_all():
        truth.setdefault(r["query_id"], {})[r["vec_id"]] = r["cosine"]
    got = {}
    for r in pq_topk(emb_ds, q, k=10, m=8, n_codes=16, rerank=4).take_all():
        got.setdefault(r["query_id"], {})[r["vec_id"]] = r["cosine"]
    recalls = []
    for qi, t in truth.items():
        g = got.get(qi, {})
        hit = set(t) & set(g)
        recalls.append(len(hit) / len(t))
        # rerank scores are EXACT: any id found must carry the true cosine
        for vid in hit:
            assert g[vid] == t[vid]
    assert np.mean(recalls) >= 0.8, recalls


def test_pq_deterministic(emb_ds):
    from json_schema_validate_ray.pipelines.similarity import pq_topk
    q = _queries()
    a = sorted((r["query_id"], r["vec_id"], r["cosine"])
               for r in pq_topk(emb_ds, q, k=10).take_all())
    b = sorted((r["query_id"], r["vec_id"], r["cosine"])
               for r in pq_topk(emb_ds, q, k=10).take_all())
    assert a == b and len(a) == 50


def test_string_id_column_with_empty_blocks(ray_session):
    """ADVICE r4: a string id column must survive blocks that produce an
    empty scan result — the empty-table schema used to hardcode int64 and
    poison the union."""
    import pyarrow as pa
    import ray.data as rd

    from json_schema_validate_ray.pipelines.similarity import (
        brute_force_topk, pq_topk)

    rng = np.random.default_rng(7)
    n, d = 300, 16
    t = pa.table({
        "vec_id": pa.array([f"doc-{i:04d}" for i in range(n)]),
        "embedding": pa.array(rng.normal(size=(n, d)).astype(np.float32)
                              .tolist(), type=pa.list_(pa.float32())),
    })
    # more blocks than rows -> some blocks are genuinely EMPTY, so the
    # scanners' empty-table schema path is exercised, not just the happy one
    ds = rd.from_arrow(t).repartition(400).materialize()
    q = rng.normal(size=(3, d)).astype(np.float32)

    bf = brute_force_topk(ds, q, k=5, id_column="vec_id").take_all()
    assert len(bf) == 15
    assert all(isinstance(r["vec_id"], str) for r in bf)

    pq = pq_topk(ds, q, k=5, m=4, n_codes=8, rerank=4,
                 id_column="vec_id").take_all()
    assert len(pq) == 15
    assert all(isinstance(r["vec_id"], str) for r in pq)
