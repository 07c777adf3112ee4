"""Round-3 verdict #6: 10M-row scale demonstration of the two flagship
round-3 compositions —

* ``curate_run``        (mixture filter -> MinHash/LSH near-dup dedup ->
                         connected components -> survivors -> sequence
                         packing), production ``band="fast"``
* ``decontaminate``     (benchmark shingle broadcast -> one streaming
                         probe pass, no shuffle)

over a deterministic synthetic documents corpus (sources/documents.py:
planted near-dup clusters, ~20% of id-quads at Jaccard ~0.64) written to
partitioned parquet first, so the timed pipelines read from storage like a
production run.  Prints one JSON line with wall times, row accounting and
the peak node memory observed by a /proc/meminfo sampler.

Usage: python tools/curate_scale_demo.py [--rows N] [--parts P]
                                         [--mean-words W]
"""
import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, ".")

import pyarrow as pa  # noqa: E402
import ray  # noqa: E402
import ray.data as rd  # noqa: E402


class MemSampler(threading.Thread):
    """Peak (MemTotal - MemAvailable) in GiB, sampled every 0.5 s."""

    def __init__(self):
        super().__init__(daemon=True)
        self.peak = 0.0
        self._stop = threading.Event()

    @staticmethod
    def _used_gib() -> float:
        info = {}
        with open("/proc/meminfo") as f:
            for line in f:
                k, v = line.split(":", 1)
                info[k] = int(v.strip().split()[0])
        return (info["MemTotal"] - info["MemAvailable"]) / (1024 ** 2)

    def run(self):
        while not self._stop.is_set():
            self.peak = max(self.peak, self._used_gib())
            self._stop.wait(0.5)

    def stop(self) -> float:
        self._stop.set()
        return self.peak


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=10_000_000)
    p.add_argument("--parts", type=int, default=128)
    p.add_argument("--mean-words", type=int, default=60)
    p.add_argument("--out", default="/tmp/curate_scale")
    args = p.parse_args()

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR", log_to_driver=False)
    rd.DataContext.get_current().enable_progress_bars = False

    from json_schema_validate_ray.sources.documents import (
        synth_documents_dataset)
    from json_schema_validate_ray.pipelines.curate import curate_run
    from json_schema_validate_ray.pipelines.decontaminate import decontaminate

    sampler = MemSampler()
    sampler.start()
    corpus_dir = os.path.join(args.out, "corpus")

    t0 = time.perf_counter()
    if not os.path.isdir(corpus_dir) or not os.listdir(corpus_dir):
        os.makedirs(corpus_dir, exist_ok=True)
        synth_documents_dataset(args.rows, args.parts,
                                mean_words=args.mean_words
                                ).write_parquet(corpus_dir)
    t_synth = time.perf_counter() - t0

    ds = rd.read_parquet(corpus_dir)
    n_bytes = sum(os.path.getsize(os.path.join(corpus_dir, f))
                  for f in os.listdir(corpus_dir))

    # --- curate: mix -> near-dup dedup -> pack, production fast band ---
    t0 = time.perf_counter()
    packed, summary = curate_run(ds, mix_rates={"en": 100, "zh": 60},
                                 band="fast")
    t_curate = time.perf_counter() - t0
    summ = summary.to_pylist()[0]

    # --- decontaminate: 1000 corpus docs + 1000 unseen docs as benchmark ---
    from json_schema_validate_ray.sources.documents import (
        synth_documents_partition)
    seen = rd.read_parquet(corpus_dir).limit(1000).take_all()
    unseen = synth_documents_partition(0, 1000, seed=999).to_pylist()
    bench = rd.from_arrow(pa.Table.from_pylist(seen + unseen))

    t0 = time.perf_counter()
    flagged = decontaminate(ds, bench)
    import pyarrow.compute as pc
    n_contam = sum(
        b["n"][0].as_py() for b in flagged.map_batches(
            lambda b: pa.table({"n": pa.array(
                [int(pc.sum(pc.cast(b["contaminated"], pa.int64())).as_py()
                     or 0)], type=pa.int64())}),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"))
    t_decon = time.perf_counter() - t0

    peak = sampler.stop()
    print(json.dumps({
        "rows": args.rows, "corpus_parquet_gib": round(n_bytes / 1024**3, 2),
        "synth_write_sec": round(t_synth, 1),
        "curate_sec": round(t_curate, 1),
        "curate_rows_per_sec": int(args.rows / t_curate),
        "curate_summary": summ,
        "decontaminate_sec": round(t_decon, 1),
        "decon_rows_per_sec": int(args.rows / t_decon),
        "n_contaminated": int(n_contam),
        "peak_node_mem_gib": round(peak, 1),
    }), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
