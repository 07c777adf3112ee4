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


def _clustered_corpus(seed=41, K=12, n=4000, d=64, noise=0.05):
    """Vectors with REAL cluster structure — the regime IVFADC's residual
    quantization is designed for (cell residuals << vector norms).  The
    testdata embeddings are uniform-random, where residuals are LARGER
    than the vectors and no coarse quantizer can help."""
    import pyarrow as pa
    import ray.data as rd
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(K, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, K, size=n)
    X = (centers[assign] + noise * rng.normal(size=(n, d))).astype(np.float32)
    t = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                  "embedding": pa.array(X.tolist(),
                                        type=pa.list_(pa.float32()))})
    q = (centers[rng.integers(0, K, size=5)]
         + noise * rng.normal(size=(5, d))).astype(np.float32)
    return rd.from_arrow(t).repartition(16).materialize(), q


def test_ivfpq_recall_at_least_pq_only(ray_session):
    """verdict r4 #8: the composed IVFADC layout (coarse cells restrict the
    ADC scan, PQ codes quantize residuals) must reach recall@10 >= the
    PQ-only path at EQUAL code budget (same m, n_codes, rerank) on
    clustered data while scanning only nprobe/n_centroids of the corpus;
    its rerank scores must be exact.  Measured at pin time: IVFADC 0.48
    vs PQ-only 0.26."""
    from json_schema_validate_ray.pipelines.similarity import (
        brute_force_topk, ivfpq_topk, pq_topk)
    ds, q = _clustered_corpus()
    truth, pq, ivfpq = {}, {}, {}
    for r in brute_force_topk(ds, q, k=10).take_all():
        truth.setdefault(r["query_id"], {})[r["vec_id"]] = r["cosine"]
    for r in pq_topk(ds, q, k=10, m=8, n_codes=16, rerank=4).take_all():
        pq.setdefault(r["query_id"], {})[r["vec_id"]] = r["cosine"]
    for r in ivfpq_topk(ds, q, k=10, n_centroids=16, nprobe=4, m=8,
                        n_codes=16, rerank=4).take_all():
        ivfpq.setdefault(r["query_id"], {})[r["vec_id"]] = r["cosine"]
    rec_pq, rec_ivfpq = [], []
    for qi, t in truth.items():
        rec_pq.append(len(set(t) & set(pq.get(qi, {}))) / len(t))
        hit = set(t) & set(ivfpq.get(qi, {}))
        rec_ivfpq.append(len(hit) / len(t))
        for vid in hit:                      # rerank scores are exact
            assert ivfpq[qi][vid] == t[vid]
    assert np.mean(rec_ivfpq) >= np.mean(rec_pq), (rec_ivfpq, rec_pq)
    assert np.mean(rec_ivfpq) >= 0.4, rec_ivfpq


def test_ivfpq_registry_setting_recall(emb_ds):
    """The registry entry's setting (nprobe 12/16, rerank 8) on the
    UNCLUSTERED testdata embeddings still clears 0.8 recall@10 — the
    rerank width compensates for residuals that uniform-random data makes
    larger than the vectors themselves."""
    from json_schema_validate_ray.pipelines.similarity import (
        brute_force_topk, ivfpq_topk)
    q = _queries()
    truth, got = {}, {}
    for r in brute_force_topk(emb_ds, q, k=10).take_all():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in ivfpq_topk(emb_ds, q, k=10, n_centroids=16, nprobe=12, m=8,
                        n_codes=16, rerank=8).take_all():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(truth[qi] & got.get(qi, set())) / len(truth[qi])
               for qi in truth]
    assert np.mean(recalls) >= 0.8, recalls


def test_ivfpq_deterministic(emb_ds):
    from json_schema_validate_ray.pipelines.similarity import ivfpq_topk
    q = _queries()
    a = sorted((r["query_id"], r["vec_id"], r["cosine"])
               for r in ivfpq_topk(emb_ds, q, k=10).take_all())
    b = sorted((r["query_id"], r["vec_id"], r["cosine"])
               for r in ivfpq_topk(emb_ds, q, k=10).take_all())
    assert a == b and len(a) == 50
