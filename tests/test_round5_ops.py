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


# ---------------------------------------------------------------------------
# round-5b operators (TPC-H suite, profiling, robust stats)
# ---------------------------------------------------------------------------

def _events_with_values(path, n=4000, seed=3):
    """Heavy-tailed per-type values so the 3-MAD census actually fires,
    plus deliberately imbalanced daily volume for the anomaly query."""
    rng = np.random.default_rng(seed)
    day_us = 86_400_000_000
    # 20 days; day 3 is a 5x spike, day 17 a drought
    day = rng.integers(0, 20, n)
    day[rng.choice(n, n // 10, replace=False)] = 3
    keep = ~((day == 17) & (rng.random(n) < 0.8))
    day = day[keep]
    m = len(day)
    ts = day * day_us + rng.integers(0, day_us, m)
    vals = rng.random(m) * 10
    out_idx = rng.choice(m, m // 50, replace=False)
    vals[out_idx] += 300.0   # planted outliers
    tbl = pa.table({
        "event_id": pa.array(np.arange(m), type=pa.int64()),
        "ts": pa.array(ts, type=pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 37, m), type=pa.int64()),
        "event_type": pa.array(
            np.array(["click", "view", "error"])[rng.integers(0, 3, m)],
            type=pa.string()),
        "value": pa.array(np.round(vals, 2), type=pa.float64()),
        "props": pa.array(["{}"] * m, type=pa.string()),
    })
    pq.write_table(tbl, str(path))


def _duck(tmp_path, table="events"):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW {table} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{table}.parquet')")
    return con


def test_value_mad_outliers_planted(ray_session, tmp_path):
    from json_schema_validate_ray.pipelines.queries import (
        SQL_VALUE_MAD_OUTLIERS_BY_TYPE, q_value_mad_outliers_by_type)
    _events_with_values(tmp_path / "events.parquet")
    got = q_value_mad_outliers_by_type(str(tmp_path)).to_pandas()
    con = _duck(tmp_path)   # keep the connection alive past .sql()
    want = con.sql(SQL_VALUE_MAD_OUTLIERS_BY_TYPE).df()
    assert got["n_outliers"].sum() > 0      # the planted tail fires
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_event_daily_anomaly_planted(ray_session, tmp_path):
    from json_schema_validate_ray.pipelines.queries import (
        SQL_EVENT_DAILY_ANOMALY, q_event_daily_anomaly)
    _events_with_values(tmp_path / "events.parquet")
    got = q_event_daily_anomaly(str(tmp_path)).to_pandas()
    con = _duck(tmp_path)
    want = con.sql(SQL_EVENT_DAILY_ANOMALY).df()
    assert set(got["direction"]) == {"high", "low"}   # both tails planted
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_top2_event_types_tie_break(ray_session, tmp_path):
    """A user with two types at the SAME count must rank them by type
    name, matching the SQL ORDER BY n DESC, event_type."""
    from json_schema_validate_ray.pipelines.queries import (
        SQL_TOP2_EVENT_TYPES_PER_USER, q_top2_event_types_per_user)
    rows = []
    for u, pairs in {1: [("view", 3), ("click", 3), ("error", 1)],
                     2: [("error", 5)],
                     3: [("click", 2), ("error", 2), ("view", 2)]}.items():
        for ty, k in pairs:
            rows += [(u, ty)] * k
    tbl = pa.table({
        "event_id": pa.array(np.arange(len(rows)), type=pa.int64()),
        "ts": pa.array(np.arange(len(rows)), type=pa.int64()).cast(
            pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[1] for r in rows], type=pa.string()),
        "value": pa.array(np.zeros(len(rows)), type=pa.float64()),
        "props": pa.array(["{}"] * len(rows), type=pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = q_top2_event_types_per_user(str(tmp_path))
    got = pa.Table.from_pylist(got.take_all()).to_pandas() \
        .sort_values(["user_id", "rnk"]).reset_index(drop=True)
    con = _duck(tmp_path)
    want = con.sql(
        SQL_TOP2_EVENT_TYPES_PER_USER + " ORDER BY user_id, rnk").df()
    assert got[got.user_id == 1].event_type.tolist() == ["click", "view"]
    assert len(got[got.user_id == 2]) == 1
    assert got.equals(want.reset_index(drop=True))


def test_user_value_deciles_ntile_fill(ray_session, tmp_path):
    """23 users over 10 tiles: the first 3 tiles take 3 users each (the
    SQL NTILE fill rule), the rest 2."""
    from json_schema_validate_ray.pipelines.queries import (
        SQL_USER_VALUE_DECILES, q_user_value_deciles)
    rng = np.random.default_rng(5)
    n = 900
    tbl = pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "ts": pa.array(np.arange(n), type=pa.int64()).cast(
            pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 23, n), type=pa.int64()),
        "event_type": pa.array(["click"] * n, type=pa.string()),
        "value": pa.array(np.round(rng.random(n) * 9, 2),
                          type=pa.float64()),
        "props": pa.array(["{}"] * n, type=pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = q_user_value_deciles(str(tmp_path)).to_pandas()
    con = _duck(tmp_path)
    want = con.sql(SQL_USER_VALUE_DECILES).df()
    assert got["n_users"].tolist() == [3, 3, 3, 2, 2, 2, 2, 2, 2, 2]
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_quality_filter_empty_and_short_text(ray_session, tmp_path):
    from json_schema_validate_ray.pipelines.queries import (
        SQL_QUALITY_FILTER_BY_LANG, q_quality_filter_by_lang)
    long_good = " ".join(["the", "a", "of"] + ["word"] * 37)  # 40 toks, 3 stops (7.5%)
    long_bad = " ".join(["word"] * 50)                # no stopwords
    tbl = pa.table({
        "doc_id": pa.array(np.arange(6), type=pa.int64()),
        "text": pa.array(["", "   ", "a b", long_good, long_bad,
                          " ".join(["to"] * 30)], type=pa.string()),
        "lang": pa.array(["en"] * 6, type=pa.string()),
        "source": pa.array(["s"] * 6, type=pa.string()),
        "n_chars": pa.array([0, 3, 3, len(long_good), len(long_bad), 89],
                            type=pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = q_quality_filter_by_lang(str(tmp_path)).to_pandas()
    con = _duck(tmp_path, "documents")
    want = con.sql(SQL_QUALITY_FILTER_BY_LANG).df()
    assert got["n_docs"].iloc[0] == 6
    assert got["n_kept"].iloc[0] == 2   # long_good + all-stopword doc
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_large_volume_orders_planted(ray_session, tmp_path):
    from json_schema_validate_ray.pipelines.queries import (
        SQL_LARGE_VOLUME_ORDERS, q_large_volume_orders)
    rng = np.random.default_rng(9)
    n_orders = 200
    lines = []
    for ok in range(n_orders):
        heavy = ok % 17 == 0
        for ln in range(6 if heavy else 3):
            q = 90 if heavy else rng.integers(1, 40)
            lines.append((ok, ln + 1, float(q)))
    li = pa.table({
        "l_orderkey": pa.array([r[0] for r in lines], type=pa.int64()),
        "l_partkey": pa.array(np.ones(len(lines)), type=pa.int64()),
        "l_suppkey": pa.array(np.ones(len(lines)), type=pa.int64()),
        "l_linenumber": pa.array([r[1] for r in lines], type=pa.int32()),
        "l_quantity": pa.array([r[2] for r in lines], type=pa.float64()),
        "l_extendedprice": pa.array(np.ones(len(lines)),
                                    type=pa.float64()),
        "l_discount": pa.array(np.zeros(len(lines)), type=pa.float64()),
        "l_tax": pa.array(np.zeros(len(lines)), type=pa.float64()),
        "l_returnflag": pa.array(["N"] * len(lines), type=pa.string()),
        "l_linestatus": pa.array(["O"] * len(lines), type=pa.string()),
        "l_shipdate": pa.array(np.zeros(len(lines), dtype=np.int64),
                               type=pa.int64()).cast(pa.timestamp("us")),
    })
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(n_orders), type=pa.int64()),
        "o_custkey": pa.array(np.arange(n_orders) % 31, type=pa.int64()),
        "o_orderstatus": pa.array(["O"] * n_orders, type=pa.string()),
        "o_totalprice": pa.array(np.ones(n_orders), type=pa.float64()),
        "o_orderdate": pa.array(np.zeros(n_orders, dtype=np.int64),
                                type=pa.int64()).cast(pa.timestamp("us")),
        "o_orderpriority": pa.array(["5-LOW"] * n_orders,
                                    type=pa.string()),
    })
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    got = q_large_volume_orders(str(tmp_path)).to_pandas() \
        .sort_values("o_orderkey").reset_index(drop=True)
    con = _duck(tmp_path, "lineitem")
    con.sql(f"CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{tmp_path}/orders.parquet')")
    want = con.sql(SQL_LARGE_VOLUME_ORDERS + " ORDER BY o_orderkey").df()
    assert len(got) == len([k for k in range(n_orders) if k % 17 == 0])
    assert got.equals(want.reset_index(drop=True))
