"""Connected components over pair graphs (pipelines/dedup.connected_components)
and the end-to-end near-dup dedup built on it.

The driver union-find path and the distributed hash-min label-propagation
path must agree exactly — both label each component with its
lexicographically smallest member (the SQL recursive-min-closure labeling
the oracle computes)."""

import numpy as np
import pyarrow as pa
import pytest

from json_schema_validate_ray.pipelines.dedup import (
    _union_find_components,
    connected_components,
    near_dup_dedup_summary,
)


def _pairs(edges):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "id_a": pa.array([a for a, _ in edges], type=pa.string()),
        "id_b": pa.array([b for _, b in edges], type=pa.string()),
    }))


def _as_map(result):
    return {r["node"]: r["component"] for r in result.take_all()}


def test_union_find_basic():
    comp = _union_find_components([("b", "c"), ("a", "b"), ("x", "y")])
    assert comp == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_driver_path_transitive(ray_session):
    got = _as_map(connected_components(_pairs([("d2", "d3"), ("d1", "d2"),
                                               ("d9", "d8")])))
    assert got == {"d1": "d1", "d2": "d1", "d3": "d1", "d8": "d8", "d9": "d8"}


def test_distributed_matches_union_find_random(ray_session):
    rng = np.random.default_rng(42)
    for trial, (n_nodes, n_edges) in enumerate([(40, 30), (60, 200), (25, 24)]):
        ia = rng.integers(0, n_nodes, n_edges)
        ib = rng.integers(0, n_nodes, n_edges)
        edges = [(f"n{a:03d}", f"n{b:03d}") for a, b in zip(ia, ib)]
        want = _union_find_components(edges)
        got = _as_map(connected_components(_pairs(edges),
                                           force_distributed=True))
        assert got == want, f"trial {trial}"


def test_distributed_chain_needs_iterations(ray_session):
    # a 12-node path graph: hash-min needs ~diameter rounds to converge
    edges = [(f"c{i:02d}", f"c{i + 1:02d}") for i in range(11)]
    got = _as_map(connected_components(_pairs(edges), force_distributed=True))
    assert got == {f"c{i:02d}": "c00" for i in range(12)}


def test_distributed_raises_without_convergence(ray_session):
    edges = [(f"c{i:02d}", f"c{i + 1:02d}") for i in range(11)]
    with pytest.raises(RuntimeError, match="convergence"):
        connected_components(_pairs(edges), force_distributed=True,
                             max_iters=2).take_all()


def test_empty_pairs(ray_session):
    got = connected_components(_pairs([])).take_all()
    assert got == []


def test_near_dup_dedup_summary_accounting(ray_session):
    import ray.data as rd
    docs = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(8)], type=pa.string()),
        "text": pa.array([
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy dog",    # dup of d0
            "the quick brown fox jumps over the lazy cat",    # near-dup
            "completely different content about ray data engines",
            "completely different content about ray data engines here",
            "unique text one with no resemblance to anything else at all",
            "unique second text nothing shared with other documents here",
            "entirely separate third standalone document text body",
        ]),
    })
    out = near_dup_dedup_summary(rd.from_arrow(docs), "text", "doc_id",
                                 threshold=0.5)
    row = out.to_pylist()[0]
    assert row["n_docs"] == 8
    # {d0,d1,d2} and {d3,d4} cluster
    assert row["n_dup_nodes"] == 5
    assert row["n_components"] == 2
    assert row["n_removed"] == 3
    assert row["n_kept"] == 5
    assert row["n_kept"] + row["n_removed"] == row["n_docs"]


def _corpus():
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(8)], type=pa.string()),
        "text": pa.array([
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy cat",
            "completely different content about ray data engines",
            "completely different content about ray data engines here",
            "unique text one with no resemblance to anything else at all",
            "unique second text nothing shared with other documents here",
            "entirely separate third standalone document text body",
        ]),
    }))


def test_near_dup_survivors_broadcast_path(ray_session):
    from json_schema_validate_ray.pipelines.dedup import near_dup_survivors
    surv = near_dup_survivors(_corpus(), "text", "doc_id", threshold=0.5)
    kept = sorted(r["doc_id"] for r in surv.take_all())
    # clusters {d0,d1,d2} and {d3,d4} keep their min member
    assert kept == ["d0", "d3", "d5", "d6", "d7"]


def test_near_dup_survivors_anti_join_path(ray_session):
    from json_schema_validate_ray.pipelines.dedup import near_dup_survivors
    surv = near_dup_survivors(_corpus(), "text", "doc_id", threshold=0.5,
                              broadcast_limit=0)
    kept = sorted(r["doc_id"] for r in surv.take_all())
    assert kept == ["d0", "d3", "d5", "d6", "d7"]
