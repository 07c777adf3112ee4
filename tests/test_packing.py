"""Sequence packing (pipelines/packing): streaming-packing semantics — a
document starts in bin floor(prefix_tokens_before / capacity) in sorted-id
order — and the distributed prefix sum that computes it."""

import pyarrow as pa

from json_schema_validate_ray.pipelines.packing import (
    pack_sequences,
    packing_summary,
)


def _docs(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    }))


def test_pack_bin_boundaries(ray_session):
    # capacity 5; token counts: 3, 3, 4, 6, 1 -> prefix_before 0,3,6,10,16
    # -> bins 0, 0, 1, 2, 3 (doc 4's 6 tokens START in bin 2 and spill)
    ds = _docs([(1, "a b c"), (2, "d e f"), (3, "g h i j"),
                (4, "k l m n o p"), (5, "q")])
    out = {r["doc_id"]: r for r in
           pack_sequences(ds, capacity=5).take_all()}
    assert {d: r["bin_id"] for d, r in out.items()} == {1: 0, 2: 0, 3: 1,
                                                        4: 2, 5: 3}
    assert {d: r["n_tokens"] for d, r in out.items()} == {1: 3, 2: 3, 3: 4,
                                                          4: 6, 5: 1}


def test_pack_order_is_by_id_not_input_order(ray_session):
    # same docs, shuffled input order: identical packing
    ds = _docs([(5, "q"), (3, "g h i j"), (1, "a b c"),
                (4, "k l m n o p"), (2, "d e f")])
    out = {r["doc_id"]: r["bin_id"] for r in
           pack_sequences(ds, capacity=5).take_all()}
    assert out == {1: 0, 2: 0, 3: 1, 4: 2, 5: 3}


def test_pack_empty_doc_counts_zero(ray_session):
    ds = _docs([(1, "  "), (2, "a b"), (3, "")])
    out = {r["doc_id"]: (r["n_tokens"], r["bin_id"]) for r in
           pack_sequences(ds, capacity=2).take_all()}
    assert out == {1: (0, 0), 2: (2, 0), 3: (0, 1)}


def test_pack_count_column_path(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "n_tok": pa.array([4, 4, 4], type=pa.int32()),
    }))
    out = {r["doc_id"]: r["bin_id"] for r in
           pack_sequences(ds, count_column="n_tok", capacity=8).take_all()}
    assert out == {1: 0, 2: 0, 3: 1}


def test_pack_duplicate_ids_within_block_ok(ray_session):
    # duplicate ids that land in one sorted block are well-defined (the
    # block-local cumsum orders them); the ValueError guard fires only when
    # two BLOCKS report the same first id (ambiguous offset lookup)
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([7] * 40, type=pa.int64()),
        "n_tok": pa.array([1] * 40, type=pa.int64()),
    }))
    out = pack_sequences(ds, count_column="n_tok", capacity=8).take_all()
    assert len(out) == 40
    assert sorted(r["bin_id"] for r in out) == [i // 8 for i in range(40)]


def test_packing_summary_accounting(ray_session):
    ds = _docs([(1, "a b c"), (2, "d e f"), (3, "g h i j"),
                (4, "k l m n o p"), (5, "q")])
    row = packing_summary(pack_sequences(ds, capacity=5),
                          capacity=5).to_pylist()[0]
    assert row["n_docs"] == 5
    assert row["total_tokens"] == 17
    assert row["n_bins"] == 4
    assert row["fill_rate_1e6"] == 17 * 1_000_000 // 20


def test_pack_string_ids(ray_session):
    # the tokens table's doc_id is a STRING — first_id and the empty-block
    # schema must carry the input id type, not a hardcoded int64
    import ray.data as rd
    ids = [f"doc-{i:04d}" for i in range(30)]
    tbl = pa.table({"doc_id": pa.array(ids),
                    "n_tok": pa.array([3] * 30, type=pa.int32())})
    out = pack_sequences(rd.from_arrow(tbl).repartition(4),
                         count_column="n_tok", capacity=9).take_all()
    assert sorted(r["doc_id"] for r in out) == ids
    by_id = {r["doc_id"]: r["bin_id"] for r in out}
    # ids sort lexicographically == numerically here; 3 docs of 3 tokens/bin
    for i, d in enumerate(ids):
        assert by_id[d] == i // 3, (d, by_id[d])
