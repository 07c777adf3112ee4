"""End-to-end Ray pipeline tests: synth tokens -> validate -> checks ->
partitioned outputs with resume."""

import json
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from json_schema_validate_ray.pipelines.validate import (
    full_report,
    run_partitioned_validation,
    validate_dataset,
)
from json_schema_validate_ray.sources.tokens import (
    HOT_DOC_ID,
    SOURCES,
    synth_tokens_dataset,
    synth_tokens_partition,
    write_tokens_parquet,
)
from json_schema_validate_ray.stages.checks import (
    categorical_counts,
    column_histogram,
    column_stats,
    drift_report,
    duplicate_keys,
    referential_violations,
    uniqueness_report,
)

TOK_DIR = "/tmp/jsv_test_tokens/in"
OUT_DIR = "/tmp/jsv_test_tokens/out"
N_ROWS = 16000
N_PARTS = 4


@pytest.fixture(scope="module")
def tokens_dir(ray_session):
    shutil.rmtree("/tmp/jsv_test_tokens", ignore_errors=True)
    write_tokens_parquet(TOK_DIR, N_ROWS, n_partitions=N_PARTS)
    return TOK_DIR


def test_synthesis_deterministic():
    a = synth_tokens_partition(3, 500, seed=42)
    b = synth_tokens_partition(3, 500, seed=42)
    assert a.equals(b)
    c = synth_tokens_partition(4, 500, seed=42)
    assert not a.equals(c)


def test_token_array_equality_invariant(tokens_dir):
    """Per-row invariant vs the reference table (BASELINE.json:16): reading
    the written parquet back yields token arrays byte-equal to regeneration."""
    f = sorted(os.listdir(tokens_dir))[0]
    on_disk = pq.read_table(os.path.join(tokens_dir, f))
    regen = synth_tokens_partition(0, N_ROWS // N_PARTS, seed=42)
    assert on_disk["tokens"].combine_chunks().equals(regen["tokens"].combine_chunks())
    assert on_disk["doc_id"].to_pylist() == regen["doc_id"].to_pylist()


def test_validate_dataset_streaming(ray_session, tokens_dir):
    import ray.data as rd
    ds = rd.read_parquet(tokens_dir)
    verdicts = validate_dataset(ds, batch_size=4096, concurrency=2)
    tbl = pa.Table.from_pylist(verdicts.take_all())
    assert tbl.num_rows == N_ROWS
    assert set(tbl.column_names) == {"doc_id", "valid", "n_violations", "violations"}
    invalid = tbl.filter(pc.invert(tbl["valid"]))
    assert 0 < invalid.num_rows < N_ROWS * 0.02
    # violations JSON parses and references real constraint ids
    one = json.loads(invalid["violations"][0].as_py())
    assert {"constraint_id", "path", "message", "observed"} <= set(one[0].keys())


def test_partitioned_run_and_resume(ray_session, tokens_dir):
    shutil.rmtree(OUT_DIR, ignore_errors=True)
    s1 = run_partitioned_validation(tokens_dir, OUT_DIR, files_per_partition=2)
    assert s1["rows"] == N_ROWS and s1["skipped"] == 0
    assert os.path.exists(os.path.join(OUT_DIR, "summary.json"))
    manifests = sorted(os.listdir(os.path.join(OUT_DIR, "manifest")))
    assert len(manifests) == 2
    m = json.load(open(os.path.join(OUT_DIR, "manifest", manifests[0])))
    assert m["rows_per_sec"] > 0 and m["input_files"]
    # resume skips all partitions but reports identical totals
    s2 = run_partitioned_validation(tokens_dir, OUT_DIR, files_per_partition=2)
    assert s2["skipped"] == 2
    assert s2["rows"] == s1["rows"]
    assert s2["invalid_rows"] == s1["invalid_rows"]
    # violation parquet layout readable, rows match summary
    import ray.data as rd
    viol = rd.read_parquet(os.path.join(OUT_DIR, "violations"))
    assert viol.count() == s1["violation_rows"]


def test_column_stats_accuracy(ray_session, tokens_dir):
    import ray.data as rd
    ds = rd.read_parquet(tokens_dir)
    stats = column_stats(ds, ["doc_id", "n_tok", "source"],
                         ndv_columns=["doc_id", "source"])
    by_col = {r["column"]: r for r in stats.to_pylist()}
    assert by_col["doc_id"]["row_count"] == N_ROWS
    # exact NDV from duckdb for comparison
    import duckdb
    exact = duckdb.sql(
        f"select count(distinct doc_id) from read_parquet('{tokens_dir}/*.parquet')"
    ).fetchone()[0]
    est = by_col["doc_id"]["ndv_estimate"]
    assert abs(est - exact) / exact < 0.05
    assert 10 <= by_col["source"]["ndv_estimate"] <= 12.5


def test_uniqueness_exact(ray_session, tokens_dir):
    import duckdb
    import ray.data as rd
    rep = uniqueness_report(rd.read_parquet(tokens_dir), "doc_id")
    exact = duckdb.sql(
        f"select count(*) from (select doc_id from read_parquet('{tokens_dir}/*.parquet')"
        " group by doc_id having count(*) > 1)").fetchone()[0]
    assert rep.num_rows == exact
    hot = rep.filter(pc.equal(rep["doc_id"], HOT_DOC_ID))
    assert hot.num_rows == 1 and hot["dup_count"][0].as_py() == N_ROWS // 1000


def test_stats_and_exact_ndv_bucket_invariance(ray_session, tokens_dir):
    """The fused one-scan stats+NDV result must be identical at every bucket
    count (buckets partition the key-hash space; counts sum exactly), and
    match DuckDB's count(DISTINCT) and count(*)."""
    import duckdb
    import ray.data as rd

    from json_schema_validate_ray.stages.checks import stats_and_exact_ndv
    exact_ndv, exact_rows = duckdb.sql(
        f"select count(distinct doc_id), count(*) from "
        f"read_parquet('{tokens_dir}/*.parquet')").fetchone()
    for n_buckets in (1, 7, 64, None):
        stats, ndv = stats_and_exact_ndv(
            rd.read_parquet(tokens_dir), ["doc_id", "n_tok", "source"],
            ndv_columns=["doc_id", "source"], n_buckets=n_buckets)
        assert ndv["doc_id"] == exact_ndv, n_buckets
        assert 10 <= ndv["source"] <= 12
        assert stats["doc_id"].count == exact_rows
        assert stats["n_tok"].count == exact_rows


def test_uniqueness_hash_first_matches_default(ray_session, tokens_dir):
    """The hash-first two-phase variant (scale path for wide keys) must be
    EXACT: identical (key, dup_count) rows to the single-shuffle default,
    including the planted hot key."""
    import ray.data as rd

    from json_schema_validate_ray.stages.checks import duplicate_keys_hash_first
    a = sorted((r["doc_id"], r["dup_count"]) for r in
               duplicate_keys(rd.read_parquet(tokens_dir), "doc_id").take_all())
    b = sorted((r["doc_id"], r["dup_count"]) for r in
               duplicate_keys_hash_first(
                   rd.read_parquet(tokens_dir), "doc_id").take_all())
    assert a == b and len(a) > 0
    assert (HOT_DOC_ID, N_ROWS // 1000) in b


def test_referential_and_drift(ray_session, tokens_dir):
    import ray.data as rd
    rv = referential_violations(rd.read_parquet(tokens_dir), "source", SOURCES)
    n_bad = rv.count()
    import duckdb
    exact = duckdb.sql(
        f"select count(*) from read_parquet('{tokens_dir}/*.parquet')"
        " where source not in (" + ",".join(f"'{s}'" for s in SOURCES) + ")").fetchone()[0]
    assert n_bad == exact

    # Bloom scale path: build the filter from the allowed "dimension" keys
    # distributedly, probe the fact table.  Flagged rows must be a SUBSET of
    # the exact orphans (no false accusations); with fpr=1e-4 and a handful
    # of distinct orphan values the (deterministic-hash) escape set is empty,
    # so it matches the exact check outright.
    from json_schema_validate_ray.stages.checks import bloom_referential_violations
    dim = rd.from_arrow(pa.table({"source": pa.array(sorted(SOURCES))}))
    bv = bloom_referential_violations(
        rd.read_parquet(tokens_dir), "source", dim, "source",
        expected=len(SOURCES), fpr=1e-4)
    bloom_rows = bv.take_all()
    assert len(bloom_rows) == exact
    assert all(r["observed"] not in SOURCES for r in bloom_rows)

    base_counts = categorical_counts(rd.read_parquet(tokens_dir), "source")
    base_hist = column_histogram(rd.read_parquet(tokens_dir), "n_tok", 0, 2100, 128)
    rep = drift_report(rd.read_parquet(tokens_dir), base_counts, base_hist)
    assert rep["chi_square"] == 0.0 and rep["ks_statistic"] == 0.0


def test_full_report(ray_session, tokens_dir):
    r = full_report(tokens_dir)
    assert r["rows"] == N_ROWS
    assert r["invalid_rows"] > 0
    assert r["duplicate_doc_ids"] > 0
    assert len(r["column_stats"]) == 4


def test_validation_suite(ray_session, tokens_dir):
    import ray.data as rd
    from json_schema_validate_ray.pipelines.suite import (
        CHECK_TYPES, SchemaCheck, UniquenessCheck, ValidationSuite,
        tokens_default_suite)

    make_ds = lambda: rd.read_parquet(tokens_dir)
    report = tokens_default_suite().run(make_ds)
    assert report["n_checks"] == 5
    assert report["passed"] is True          # planted rates are under bounds
    by_name = {c["name"]: c for c in report["checks"]}
    assert by_name["schema"]["metrics"]["invalid_rows"] > 0
    assert by_name["doc_id-unique"]["metrics"]["duplicate_keys"] > 0
    assert all(c["wall_sec"] >= 0 for c in report["checks"])

    # a strict suite fails on the planted violations
    strict = (ValidationSuite("strict")
              .add(SchemaCheck("schema", __import__(
                  "json_schema_validate_ray.pipelines.schemas",
                  fromlist=["TOKENS_SCHEMA"]).TOKENS_SCHEMA,
                  max_invalid_rate=0.0))
              .add(UniquenessCheck("uniq", "doc_id", max_duplicate_keys=0)))
    rep2 = strict.run(make_ds)
    assert rep2["passed"] is False and rep2["n_failed"] == 2
    assert set(CHECK_TYPES) >= {"schema", "uniqueness", "referential",
                                "stats", "drift", "row_count"}


def test_tdigest_and_salted_checks(ray_session, tokens_dir):
    import duckdb
    import ray.data as rd
    from json_schema_validate_ray.stages.checks import (
        column_tdigest, salted_group_count)

    td = column_tdigest(rd.read_parquet(tokens_dir), "n_tok")
    exact = duckdb.sql(
        f"select quantile_cont(n_tok, 0.5) from read_parquet('{tokens_dir}/*.parquet')"
    ).fetchone()[0]
    assert abs(td.quantile(0.5) - exact) / exact < 0.05
    assert td.total_weight == N_ROWS

    counts = {r["source"]: r["count"] for r in salted_group_count(
        rd.read_parquet(tokens_dir, columns=["source"]), "source").take_all()}
    exact_counts = dict(duckdb.sql(
        f"select source, count(*) from read_parquet('{tokens_dir}/*.parquet') group by 1"
    ).fetchall())
    assert counts == exact_counts
