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


def test_event_followups_planted(ray_session, tmp_path):
    """Window boundary (b.ts == a.ts + 300s is IN), strict order (equal ts
    excluded), and cross-user isolation, vs the SQL self-join."""
    from json_schema_validate_ray.pipelines.queries import (
        SQL_EVENT_FOLLOWUPS, q_event_followups)
    us = 1_000_000
    rows = [
        # user 1: click at t0, view at +300s (boundary: counted),
        # error at +301s (outside click's window, inside view's)
        (1, 0, "click"), (1, 300 * us, "view"), (1, 301 * us, "error"),
        # user 2: two events with EQUAL ts -> no pair either direction
        (2, 1000 * us, "click"), (2, 1000 * us, "view"),
        # user 3 right after user 2's times: must not pair cross-user
        (3, 1001 * us, "error"),
    ]
    base = np.datetime64("2026-01-01T00:00:00", "us").astype(np.int64)
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), type=pa.int64()),
        "ts": pa.array([base + r[1] for r in rows],
                       type=pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[2] for r in rows], type=pa.string()),
        "value": pa.array([1.0] * len(rows), type=pa.float64()),
        "props": pa.array(["{}"] * len(rows), type=pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = q_event_followups(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')")
    want = con.sql(SQL_EVENT_FOLLOWUPS).df()
    pairs = {(r.type_a, r.type_b): r.n_pairs for r in got.itertuples()}
    assert pairs == {("click", "view"): 1, ("view", "error"): 1}
    want_pairs = {(r.type_a, r.type_b): r.n_pairs for r in want.itertuples()}
    assert pairs == want_pairs


def test_doc_length_gini_known(ray_session, tmp_path):
    """Hand-checked Gini: lengths [1,1,1,1] -> 0; [0-ish skew] matches the
    closed form on a tiny planted corpus."""
    from json_schema_validate_ray.pipelines.queries import (
        SQL_DOC_LENGTH_GINI, q_doc_length_gini)
    lens = [10, 10, 10, 10]
    def write(lengths):
        pq.write_table(pa.table({
            "doc_id": pa.array(range(len(lengths)), type=pa.int64()),
            "text": pa.array(["x" * n for n in lengths], type=pa.string()),
            "lang": pa.array(["en"] * len(lengths), type=pa.string()),
            "source": pa.array(["s"] * len(lengths), type=pa.string()),
            "n_chars": pa.array(lengths, type=pa.int64()),
        }), str(tmp_path / "documents.parquet"))
    write(lens)
    assert q_doc_length_gini(str(tmp_path))["gini_x1e9"][0].as_py() == 0
    lens = [1, 2, 3, 4, 90]
    write(lens)
    got = q_doc_length_gini(str(tmp_path))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.sql(SQL_DOC_LENGTH_GINI).df()
    assert got["gini_x1e9"][0].as_py() == int(want["gini_x1e9"].iloc[0])
    # closed form: n=5, S0=100, S1=1*1+2*2+3*3+4*4+5*90 = 480
    assert got["gini_x1e9"][0].as_py() == (2 * 480 - 6 * 100) * 10**9 // 500


def test_rolling_week_active_users_planted(ray_session, tmp_path):
    """Gap semantics: day 0 and day 7 are two segments whose -1/+1 deltas
    cancel at the boundary (continuous coverage), day 20 is isolated; a
    second user overlaps part of the range."""
    from json_schema_validate_ray.pipelines.queries import (
        SQL_ROLLING_WEEK_ACTIVE_USERS, q_rolling_week_active_users)
    DAY = 86_400_000_000
    base = np.datetime64("2026-03-01T12:00:00", "us").astype(np.int64)
    rows = [(1, 0), (1, 7), (1, 20),      # user 1 on days 0, 7, 20
            (2, 5), (2, 6),               # user 2 on days 5, 6
            (2, 5)]                       # duplicate (user, day)
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), type=pa.int64()),
        "ts": pa.array([base + r[1] * DAY for r in rows],
                       type=pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "event_type": pa.array(["click"] * len(rows), type=pa.string()),
        "value": pa.array([1.0] * len(rows), type=pa.float64()),
        "props": pa.array(["{}"] * len(rows), type=pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = q_rolling_week_active_users(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')")
    want = con.sql(SQL_ROLLING_WEEK_ACTIVE_USERS).df().astype("int64")
    assert got.equals(want)
    m = dict(zip(got["day_idx"] - got["day_idx"].min(), got["n_active"]))
    # windows ending at day 0/5/6/7 see user 1; 5 and 6 also see user 2;
    # day 20 is beyond both users' last activity + 6 except user 1's day 20
    assert m[0] == 1 and m[5] == 2 and m[6] == 2 and m[7] == 2 and m[20] == 1
