"""Round-5 operator semantics the sf testdata can't exercise: planted
out-of-order events for the late-event watermark path (the shipped events
table is fully ts-sorted, so n_late is 0 there), the bit-matrix vocabulary
co-occurrence against a brute-force set intersection, and the discrete
median rule against DuckDB ``quantile_disc``."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from json_schema_validate_ray.pipelines.queries import (
    SQL_LATE_EVENTS_BY_TYPE,
    SQL_SOURCE_VOCAB_OVERLAP,
    q_late_events_by_type,
    q_source_vocab_overlap,
)


def _write_events(path, n=5000, seed=7, swap_frac=0.1):
    """ts mostly increasing in event_id order, with planted inversions:
    a fraction of rows get their ts pulled back far enough to land under
    the running max."""
    rng = np.random.default_rng(seed)
    base = np.cumsum(rng.integers(1, 2_000_000, n))  # us steps
    ts = base.copy()
    late_idx = rng.choice(n - 1, size=int(n * swap_frac), replace=False) + 1
    ts[late_idx] -= rng.integers(1_000_000, 50_000_000, len(late_idx))
    tbl = pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "ts": pa.array(ts, type=pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 50, n), type=pa.int64()),
        "event_type": pa.array(
            np.array(["click", "view", "error"])[rng.integers(0, 3, n)],
            type=pa.string()),
        "value": pa.array(rng.random(n), type=pa.float64()),
        "props": pa.array(["{}"] * n, type=pa.string()),
    })
    pq.write_table(tbl, str(path))
    return tbl


def test_late_events_planted_inversions(ray_session, tmp_path):
    _write_events(tmp_path / "events.parquet")
    got = q_late_events_by_type(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')")
    want = con.sql(SQL_LATE_EVENTS_BY_TYPE).df()
    assert got["n_late"].sum() > 0  # the planted path actually fires
    assert got["max_lateness_us"].max() > 0
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_source_vocab_overlap_vs_brute(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(60)]
    srcs, texts = [], []
    for i in range(400):
        s = f"s{rng.integers(0, 4)}"
        toks = rng.choice(vocab, size=rng.integers(1, 12))
        srcs.append(s)
        texts.append(" ".join(toks))
    pq.write_table(pa.table({
        "doc_id": pa.array(range(400), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(["en"] * 400, type=pa.string()),
        "source": pa.array(srcs, type=pa.string()),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    }), str(tmp_path / "documents.parquet"))

    got = q_source_vocab_overlap(str(tmp_path)).to_pandas()

    # brute force: per-source token sets
    sets: dict = {}
    for s, t in zip(srcs, texts):
        sets.setdefault(s, set()).update(t.split())
    keys = sorted(sets)
    for _, r in got.iterrows():
        a, b = sets[r["source_a"]], sets[r["source_b"]]
        inter = len(a & b)
        assert r["n_shared"] == inter
        assert r["jaccard_x1e6"] == inter * 1_000_000 // len(a | b)
    assert len(got) == sum(
        1 for i in range(len(keys)) for j in range(i + 1, len(keys))
        if sets[keys[i]] & sets[keys[j]])


@pytest.mark.parametrize("vals", [
    [1, 2, 3, 4], [1, 2, 3, 4, 5], [10, 10, 10, 40], [7],
    [3, 3, 1, 1, 9, 9, 9, 2],
])
def test_disc_median_matches_duckdb(vals):
    # the rule the MAD query relies on: sorted[floor(0.5 * (n - 1))]
    con = duckdb.connect()
    want = con.sql(
        "SELECT quantile_disc(x, 0.5) FROM (SELECT unnest(?) AS x)",
        params=[vals]).fetchone()[0]
    v, c = np.unique(np.array(vals, dtype=np.int64), return_counts=True)
    n = int(c.sum())
    rank = (n - 1) // 2 + 1
    got = int(v[np.searchsorted(np.cumsum(c), rank)])
    assert got == want


def test_prefix_containment_planted(ray_session, tmp_path):
    from json_schema_validate_ray.pipelines.queries import (
        SQL_PREFIX_CONTAINMENT_DOCS, q_prefix_containment_docs)
    texts = ["alpha beta", "alpha beta gamma", "alpha beta gamma delta",
             "zeta", "zeta eta", "omega", "omega", "kappa mu"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(["en"] * len(texts), type=pa.string()),
        "source": pa.array(["s0"] * len(texts), type=pa.string()),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    got = q_prefix_containment_docs(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.sql(SQL_PREFIX_CONTAINMENT_DOCS).df()
    # distinct texts = 7; prefixes: "alpha beta" -> "... gamma",
    # "alpha beta gamma" -> "... delta", "zeta" -> "zeta eta"
    assert got["n_texts"].iloc[0] == 7
    assert got["n_prefix_texts"].iloc[0] == 3
    assert got["n_docs_affected"].iloc[0] == 3
    assert got.equals(want.astype("int64"))
