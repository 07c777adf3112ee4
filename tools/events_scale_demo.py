"""10M-row scale demo for the round-5 event-analytics family.

Synthesizes a deterministic events table with PLANTED funnel structure
(no RNG): every user has 10 events cycling the five event types; EVEN
users see view -> click -> purchase in that order (so their first-view <
first-click < first-purchase), ODD users see the reverse, so the exact
expected outputs are known from construction:

  n_view_users          = U        (every user views)
  n_view_click          = U / 2    (even users only)
  n_view_click_purchase = U / 2
  event_type_cooccurrence: all C(5,2)=10 pairs, each with count U

Run:  python tools/events_scale_demo.py [n_rows]
"""

import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TYPES = ["view", "click", "purchase", "signup", "error"]
PER_USER = 10


def synth(out_dir: str, n_rows: int, n_parts: int = 16) -> None:
    os.makedirs(os.path.join(out_dir, "events.parquet"), exist_ok=True)
    users = n_rows // PER_USER
    per_part = users // n_parts
    for p in range(n_parts):
        u0, u1 = p * per_part, (p + 1) * per_part
        u = np.repeat(np.arange(u0, u1, dtype=np.int64), PER_USER)
        j = np.tile(np.arange(PER_USER, dtype=np.int64), u1 - u0)
        # even users: type j%5 in forward order; odd users: reversed
        fwd = j % 5
        rev = (PER_USER - 1 - j) % 5
        code = np.where(u % 2 == 0, fwd, rev)
        ts_us = (u * 1_000 + j * 60) * 1_000_000  # distinct, increasing in j
        t = pa.table({
            "event_id": pa.array(u * PER_USER + j),
            "ts": pa.array(ts_us, type=pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array(u),
            "event_type": pa.array(
                np.array(TYPES, dtype=object)[code], type=pa.string()),
            "value": pa.array(np.zeros(len(u))),
            "props": pa.array(["{}"] * len(u), type=pa.string()),
        })
        pq.write_table(t, os.path.join(out_dir, "events.parquet",
                                       f"part-{p:04d}.parquet"))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    out = f"/tmp/events_scale_{n_rows}"
    if not os.path.exists(os.path.join(out, "events.parquet")):
        t0 = time.time()
        synth(out, n_rows)
        print(f"synth {n_rows} rows: {time.time() - t0:.1f}s")

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from json_schema_validate_ray.pipelines import queries as q

    users = n_rows // PER_USER
    t0 = time.time()
    f3 = q.q_funnel_three_step(out)
    t_f3 = time.time() - t0
    row = f3.to_pylist()[0]
    assert row["n_view_users"] == users, row
    assert row["n_view_click"] == users // 2, row
    assert row["n_view_click_purchase"] == users // 2, row
    print(f"funnel_three_step     {t_f3:7.1f}s  {row} (planted truth OK)")

    t0 = time.time()
    co = q.q_event_type_cooccurrence(out)
    t_co = time.time() - t0
    rows = co.to_pylist()
    assert len(rows) == 10 and all(r["n_users"] == users for r in rows), \
        rows[:3]
    print(f"event_type_cooccurrence {t_co:5.1f}s  10 pairs x {users} users "
          f"(planted truth OK)")

    t0 = time.time()
    fl = q.q_funnel_latency_quantiles(out)
    t_fl = time.time() - t0
    row = fl.to_pylist()[0]
    # even users convert: first click at j=1 (+60 s), first purchase at
    # j=2 (+120 s) -> delta exactly 1 minute for every converting user
    assert row["n_users"] == users // 2, row
    assert row["p50_delta_min"] == 1 and row["p90_delta_min"] == 1, row
    print(f"funnel_latency_quantiles {t_fl:4.1f}s  {row} (planted truth OK)")

    ray.shutdown()


if __name__ == "__main__":
    main()
