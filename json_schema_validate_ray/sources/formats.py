"""Alternate source formats (JSONL, CSV) with canonical-schema restoration.

Parquet is the native format (typed, pruned at the read); real corpora also
arrive as JSONL (documents, API exports — and the reference engine's own
inputs are JSON values: json_schema_validate.c operates on jsonb) and CSV
(flat tables).  Both are LOSSY relative to Arrow: JSON integers come back
int64 regardless of source width, CSV has no nested types at all.  The
pattern here is read -> ``cast_to_schema`` -> identical downstream pipeline:
one declared canonical schema per table, one vectorized ``Table.cast`` per
batch, and every operator behaves bit-identically to the parquet path
(pinned by tests/test_sources_formats.py).

CSV is restricted to flat tables (documents); the tokens table's
``list<int32>`` column round-trips through JSONL only.
"""

from __future__ import annotations

import pyarrow as pa

TOKENS_ARROW_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("tokens", pa.list_(pa.int32())),
    ("n_tok", pa.int32()),
    ("source", pa.string()),
])

DOCUMENTS_ARROW_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("text", pa.string()),
    ("lang", pa.string()),
    ("source", pa.string()),
    ("n_chars", pa.int64()),
])


def cast_to_schema(ds, schema: pa.Schema):
    """Restore a dataset read from a lossy format to its canonical Arrow
    schema: column order from the schema, one zero-copy-where-possible
    ``Table.cast`` per batch.  Raises (in the task) if a column is missing
    or a value doesn't fit the declared type — ingestion errors surface at
    read time, not deep inside an operator."""
    names = schema.names

    def restore(b: pa.Table) -> pa.Table:
        return b.select(names).cast(schema)

    return ds.map_batches(restore, batch_format="pyarrow")


def read_tokens_jsonl(path: str):
    """Tokens table from JSON-lines (nested ``tokens`` list preserved)."""
    import ray.data as rd
    return cast_to_schema(rd.read_json(path), TOKENS_ARROW_SCHEMA)


def write_tokens_jsonl(ds, path: str) -> str:
    """One .json (JSON-lines) file per block — same resumable layout rule
    as the parquet writers."""
    ds.write_json(path)
    return path


def read_documents_csv(path: str):
    """Documents table from CSV (flat columns only)."""
    import ray.data as rd
    return cast_to_schema(rd.read_csv(path), DOCUMENTS_ARROW_SCHEMA)


def write_documents_csv(ds, path: str) -> str:
    ds.write_csv(path)
    return path


def read_documents_text(path: str):
    """RAW text corpus ingestion: one document per line from .txt files —
    the rawest real-world arrival format.  The canonical documents schema
    is DERIVED in the read tasks: ``doc_id`` is the 63-bit md5 prefix of
    the text (content-addressed — stable across runs and file layouts,
    and duplicate lines get equal ids, which the exact-dedup operators
    then see as what they are), ``source`` is the file's basename,
    ``lang`` the n-gram language-ID heuristic, ``n_chars`` the byte
    length.  Blank lines are dropped."""
    import hashlib
    import os

    import pyarrow.compute as pc
    import ray.data as rd

    def derive(b: pa.Table) -> pa.Table:
        from ..stages.text import LanguageId
        texts = b["text"]
        keep = pc.not_equal(pc.utf8_trim_whitespace(texts), "")
        b = b.filter(keep)
        texts = b["text"]
        ids = [int(hashlib.md5(t.encode()).hexdigest()[:16], 16) >> 1
               for t in texts.to_pylist()]
        srcs = [os.path.basename(p) for p in b["path"].to_pylist()]
        langs = LanguageId()(pa.table({"text": texts}))["lang_pred"]
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": texts,
            "lang": langs,
            "source": pa.array(srcs, type=pa.string()),
            "n_chars": pc.binary_length(texts).cast(pa.int64()),
        })

    ds = rd.read_text(path, include_paths=True,
                      file_extensions=["txt", "text"])
    return ds.map_batches(derive, batch_format="pyarrow")


def read_tokens_feather(path: str):
    """Tokens table from Arrow IPC (Feather v2) files — the zero-copy
    wire format (nested ``tokens`` list preserved; the cast is a no-op
    when files already carry the canonical schema).  Ray has no native
    IPC reader, so each file streams through ``read_binary_files`` and
    decodes in the task — one file per input block, the same resumable
    layout rule as the other writers."""
    import ray.data as rd

    def decode(b: pa.Table) -> pa.Table:
        import pyarrow.ipc as ipc
        tables = [ipc.open_file(pa.BufferReader(x.as_py())).read_all()
                  for x in b["bytes"]]
        if not tables:
            return TOKENS_ARROW_SCHEMA.empty_table()
        return pa.concat_tables(tables)

    ds = rd.read_binary_files(path, file_extensions=["feather", "arrow"])
    return cast_to_schema(ds.map_batches(decode, batch_format="pyarrow"),
                          TOKENS_ARROW_SCHEMA)


def write_tokens_feather(ds, path: str) -> str:
    """One ``part-NNNNN.feather`` per block, written by parallel remote
    tasks from the block refs — no driver materialization, deterministic
    names so a partial directory is detectable."""
    import os

    import ray

    os.makedirs(path, exist_ok=True)

    @ray.remote
    def _write(block, out_file: str) -> int:
        import pyarrow.feather as feather
        tbl = block if isinstance(block, pa.Table) \
            else pa.Table.from_pandas(block)
        feather.write_feather(tbl, out_file)
        return tbl.num_rows

    refs = ds.to_arrow_refs()
    ray.get([_write.remote(r, os.path.join(path, f"part-{i:05d}.feather"))
             for i, r in enumerate(refs)])
    return path
