"""10M-lineitem scale demo for the coarse-bucket interval reassembly.

Synthesizes deterministic orders + lineitem tables with PLANTED interval
structure: order o is placed on day ``o % 1000`` and its 4 lineitems ship
on days +1..+4, so every order is open exactly 5 consecutive days and the
expected daily backlog is a closed form the demo asserts exactly:

  n_open(t) = (#cohort days d in [max(0, t-4), min(999, t)]) * orders/1000

This exercises q_orders_backlog_daily's union -> coarse-bucket pandas
merge -> difference-array pipeline (the round-5 join replacement) at the
10M-row scale with exact expected output.

Run:  python tools/backlog_scale_demo.py [n_lineitems]
"""

import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

US_PER_DAY = 86_400_000_000
LI_PER_ORDER = 4
COHORT_DAYS = 1000


def synth(out_dir: str, n_li: int, n_parts: int = 16) -> int:
    n_orders = n_li // LI_PER_ORDER
    for name in ("orders.parquet", "lineitem.parquet"):
        os.makedirs(os.path.join(out_dir, name), exist_ok=True)
    per_part = n_orders // n_parts
    for p in range(n_parts):
        o0, o1 = p * per_part, (p + 1) * per_part
        o = np.arange(o0, o1, dtype=np.int64)
        day = o % COHORT_DAYS
        pq.write_table(
            pa.table({
                "o_orderkey": pa.array(o),
                "o_orderdate": pa.array(day * US_PER_DAY,
                                        type=pa.int64())
                .cast(pa.timestamp("us"))}),
            os.path.join(out_dir, "orders.parquet",
                         f"part-{p:04d}.parquet"))
        lo = np.repeat(o, LI_PER_ORDER)
        j = np.tile(np.arange(1, LI_PER_ORDER + 1, dtype=np.int64),
                    o1 - o0)
        pq.write_table(
            pa.table({
                "l_orderkey": pa.array(lo),
                "l_shipdate": pa.array(
                    (lo % COHORT_DAYS + j) * US_PER_DAY,
                    type=pa.int64()).cast(pa.timestamp("us"))}),
            os.path.join(out_dir, "lineitem.parquet",
                         f"part-{p:04d}.parquet"))
    return n_orders


def main() -> None:
    n_li = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    out = f"/tmp/backlog_scale_{n_li}"
    t0 = time.time()
    n_orders = synth(out, n_li)
    print(f"synth {n_li} lineitems / {n_orders} orders: "
          f"{time.time() - t0:.1f}s")

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from json_schema_validate_ray.pipelines import queries as q

    t0 = time.time()
    res = q.q_orders_backlog_daily(out)
    wall = time.time() - t0

    per_day = n_orders // COHORT_DAYS
    days = res["day"].cast(pa.int64()).to_numpy(zero_copy_only=False) \
        // US_PER_DAY
    n_open = res["n_open"].to_numpy(zero_copy_only=False)
    lo_d = np.maximum(0, days - LI_PER_ORDER)
    hi_d = np.minimum(COHORT_DAYS - 1, days)
    expected = (hi_d - lo_d + 1) * per_day
    assert res.num_rows == COHORT_DAYS + LI_PER_ORDER, res.num_rows
    assert np.array_equal(n_open, expected), "backlog mismatch"
    print(f"orders_backlog_daily  {wall:6.1f}s  {res.num_rows} days, "
          f"peak open {int(n_open.max())} (planted truth OK)")
    ray.shutdown()


if __name__ == "__main__":
    main()
