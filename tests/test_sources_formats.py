"""JSONL / CSV source parity: the same pipeline over a lossy-format read
must match the parquet path bit-for-bit after cast_to_schema."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _sorted_rows(ds, key):
    rows = ds.take_all()
    rows.sort(key=lambda r: r[key])
    return rows


def test_tokens_jsonl_roundtrip_validates_identically(ray_session, tmp_path):
    import ray.data as rd

    from json_schema_validate_ray.pipelines.validate import validate_dataset
    from json_schema_validate_ray.pipelines.schemas import TOKENS_SCHEMA
    from json_schema_validate_ray.sources.formats import (
        TOKENS_ARROW_SCHEMA, read_tokens_jsonl, write_tokens_jsonl)
    from json_schema_validate_ray.sources.tokens import write_tokens_parquet

    pq_dir = str(tmp_path / "pq")
    write_tokens_parquet(pq_dir, 2000, n_partitions=4)
    parquet_ds = rd.read_parquet(pq_dir)

    jl_dir = str(tmp_path / "jl")
    write_tokens_jsonl(parquet_ds, jl_dir)
    jsonl_ds = read_tokens_jsonl(jl_dir)

    # canonical schema restored exactly (read_json widens ints to int64)
    assert jsonl_ds.schema().base_schema == TOKENS_ARROW_SCHEMA

    want = _sorted_rows(
        validate_dataset(parquet_ds, TOKENS_SCHEMA)
        .select_columns(["doc_id", "valid", "n_violations"]), "doc_id")
    got = _sorted_rows(
        validate_dataset(jsonl_ds, TOKENS_SCHEMA)
        .select_columns(["doc_id", "valid", "n_violations"]), "doc_id")
    assert got == want
    assert any(not r["valid"] for r in got)  # planted violations survive


def test_documents_csv_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from json_schema_validate_ray.sources.formats import (
        DOCUMENTS_ARROW_SCHEMA, read_documents_csv, write_documents_csv)

    src = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    csv_dir = str(tmp_path / "csv")
    write_documents_csv(src, csv_dir)
    back = read_documents_csv(csv_dir)
    assert back.schema().base_schema == DOCUMENTS_ARROW_SCHEMA
    want = _sorted_rows(src, "doc_id")
    got = _sorted_rows(back, "doc_id")
    assert got == want


def test_cast_to_schema_rejects_missing_column(ray_session):
    import ray.data as rd

    from json_schema_validate_ray.sources.formats import (
        DOCUMENTS_ARROW_SCHEMA, cast_to_schema)

    ds = rd.from_arrow(pa.table({"doc_id": pa.array([1], type=pa.int64())}))
    with pytest.raises(Exception):
        cast_to_schema(ds, DOCUMENTS_ARROW_SCHEMA).take_all()


def test_tokens_feather_roundtrip_validates_identically(ray_session,
                                                       tmp_path):
    import ray.data as rd

    from json_schema_validate_ray.pipelines.validate import validate_dataset
    from json_schema_validate_ray.pipelines.schemas import TOKENS_SCHEMA
    from json_schema_validate_ray.sources.formats import (
        TOKENS_ARROW_SCHEMA, read_tokens_feather, write_tokens_feather)
    from json_schema_validate_ray.sources.tokens import write_tokens_parquet

    pq_dir = str(tmp_path / "pq")
    write_tokens_parquet(pq_dir, 2000, n_partitions=4)
    parquet_ds = rd.read_parquet(pq_dir)

    ft_dir = str(tmp_path / "ft")
    write_tokens_feather(parquet_ds, ft_dir)
    feather_ds = read_tokens_feather(ft_dir)

    # IPC preserves the canonical schema exactly (cast is a no-op)
    assert feather_ds.schema().base_schema == TOKENS_ARROW_SCHEMA
    assert feather_ds.count() == parquet_ds.count()

    want = _sorted_rows(
        validate_dataset(parquet_ds, TOKENS_SCHEMA)
        .select_columns(["doc_id", "valid", "n_violations"]), "doc_id")
    got = _sorted_rows(
        validate_dataset(feather_ds, TOKENS_SCHEMA)
        .select_columns(["doc_id", "valid", "n_violations"]), "doc_id")
    assert got == want


def test_documents_raw_text_ingestion(ray_session, tmp_path):
    from json_schema_validate_ray.sources.formats import (
        DOCUMENTS_ARROW_SCHEMA, read_documents_text)

    d = tmp_path / "raw"
    d.mkdir()
    (d / "web.txt").write_text(
        "the quick brown fox\n\nder schnelle braune fuchs und\n")
    (d / "books.txt").write_text("the slow green turtle\n")

    ds = read_documents_text(str(d))
    rows = sorted(ds.take_all(), key=lambda r: (r["source"], r["text"]))
    assert ds.schema().base_schema == DOCUMENTS_ARROW_SCHEMA
    # blank line dropped; 3 docs total
    assert len(rows) == 3
    assert {r["source"] for r in rows} == {"web.txt", "books.txt"}
    assert all(r["n_chars"] == len(r["text"]) for r in rows)
    # content-addressed ids: re-reading yields identical ids
    again = sorted(read_documents_text(str(d)).take_all(),
                   key=lambda r: (r["source"], r["text"]))
    assert [r["doc_id"] for r in again] == [r["doc_id"] for r in rows]
    langs = {r["text"]: r["lang"] for r in rows}
    assert langs["the quick brown fox"] == "en"
    assert langs["der schnelle braune fuchs und"] == "de"


def test_raw_text_feeds_curation_end_to_end(ray_session, tmp_path):
    """The rawest arrival format drives the flagship composition: .txt ->
    canonical documents schema -> mixture -> near-dup dedup -> packing."""
    from json_schema_validate_ray.pipelines.curate import curate_corpus
    from json_schema_validate_ray.sources.formats import read_documents_text

    d = tmp_path / "raw"
    d.mkdir()
    lines = [f"the quick brown fox number {i} jumps over the lazy dog"
             for i in range(30)]
    lines += [lines[0], lines[1]]          # exact dupes (same doc_id)
    (d / "crawl.txt").write_text("\n".join(lines) + "\n")

    ds = read_documents_text(str(d))
    packed = curate_corpus(ds, capacity=64)
    rows = packed.take_all()
    # duplicate lines collapse via content-addressed ids before packing
    assert 0 < len(rows) <= 30
    assert {"doc_id", "n_tokens", "bin_id"} <= set(rows[0].keys())
