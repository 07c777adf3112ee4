"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) plus the flagship tokens-table validation at matched
scale.  Prints ONE JSON line:

    {"metric": "...", "value": <headline seconds>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N,
     "tokens_rows": R, "tokens_rows_per_sec": ...}

``--scaling`` runs the headline tokens pipeline twice in fresh processes
(num_cpus=8 and num_cpus=32) on the same input and reports throughputs plus
scaling efficiency (BASELINE.json scaling gate: efficiency >= 0.8 from N to 4N).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _sf_of(sf_dir: str) -> float:
    try:
        return float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", ""))
    except ValueError:
        return -1.0


def run_bench() -> dict:
    import logging

    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not os.path.isdir(sf_dir):
        print(json.dumps({"error": f"GRAFT_SF_DIR does not exist: {sf_dir}"}))
        sys.exit(2)
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import ray.data as rd

    from json_schema_validate_ray.pipelines import queries as q
    from json_schema_validate_ray.pipelines.validate import validate_dataset
    from json_schema_validate_ray.sources.tokens import write_tokens_parquet
    from json_schema_validate_ray.stages.checks import column_stats, duplicate_keys

    sf = _sf_of(sf_dir)
    tokens_rows = min(600_000, max(60_000, int(6_000_000 * sf))) if sf > 0 else 600_000
    tokens_dir = f"/tmp/jsv_bench_tokens/sf{sf}"
    write_tokens_parquet(tokens_dir, tokens_rows, n_partitions=32)

    # warm the page cache so we measure compute + shuffle, not first disk read
    rd.read_parquet(tokens_dir).count()

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)

    # headline: flagship tokens validation (the engine metric —
    # sequences validated/sec)
    def tokens_validate():
        ds = rd.read_parquet(tokens_dir)
        verdicts = validate_dataset(ds, batch_size=8192)
        # consume as a stream: count invalid without materializing rows
        import pyarrow as pa
        import pyarrow.compute as pc
        agg = verdicts.map_batches(
            lambda b: pa.table({
                "n": pa.array([b.num_rows]),
                "bad": pa.array([int(pc.sum(pc.invert(b["valid"])).as_py() or 0)])}),
            batch_format="pyarrow").take_all()
        assert sum(r["n"] for r in agg) == tokens_rows

    timed("tokens_validate", tokens_validate)

    timed("tokens_column_stats", lambda: column_stats(
        rd.read_parquet(tokens_dir), ["doc_id", "tokens", "n_tok", "source"],
        ndv_columns=["doc_id", "source"]))

    timed("tokens_duplicate_keys", lambda: duplicate_keys(
        rd.read_parquet(tokens_dir, columns=["doc_id"]), "doc_id").count())

    # representative operator suite over the testdata tables
    suite = ["pricing_summary", "validate_props_events", "exact_dedup_documents",
             "minhash_lsh_candidates", "ann_topk_cosine", "sessions_per_user",
             "token_counts_documents"]
    reg = q.queries()
    for name in suite:
        def run(name=name):
            r = reg[name](sf_dir)
            if hasattr(r, "take_all"):
                r.take_all()
        timed(name, run)

    headline = timings["tokens_validate"]
    result = {
        "metric": "tokens-table validation wall time (headline) + operator suite",
        "value": headline,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "num_cpus": num_cpus,
        "tokens_rows": tokens_rows,
        "tokens_rows_per_sec": round(tokens_rows / headline, 1) if headline else None,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same tokens pipeline at two parallelism levels in fresh processes."""
    out = {}
    for ncpu in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                              env=env, capture_output=True, text=True, check=True)
        line = json.loads(proc.stdout.strip().splitlines()[-1])
        out[ncpu] = line
    t8 = out[8]["value"]
    t32 = out[32]["value"]
    eff = (t8 / t32) / (32 / 8)
    return {
        "metric": "scaling efficiency, num_cpus 8 -> 32, same input",
        "sec_8": t8, "sec_32": t32,
        "rows_per_sec_8": out[8]["tokens_rows_per_sec"],
        "rows_per_sec_32": out[32]["tokens_rows_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "tokens_rows": out[32]["tokens_rows"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
