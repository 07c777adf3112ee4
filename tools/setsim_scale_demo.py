"""Scale demonstration of the EXACT set-similarity joins: prefix-filtered
n-gram Jaccard (and optionally containment) over a synthetic corpus with a
REALISTIC 50k-word vocabulary (selective shingles — the regime prefix
filtering is designed for; the 40-word testdata vocabulary is the
adversarial dense case and is covered by the sf0.1 measurements in
BASELINE.md).

Planted truth: ~20% of id-quads are near-dup clusters at exact Jaccard
~0.59-0.8, so the expected pair count is ~DUP_PCT% * rows/4 * C(4,2); the
demo reports found pairs, wall time and peak node memory.

Usage: python tools/setsim_scale_demo.py [--rows N] [--parts P]
                                         [--with-containment]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import ray  # noqa: E402
import ray.data as rd  # noqa: E402

from curate_scale_demo import MemSampler  # noqa: E402  (same tools dir)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=2_000_000)
    p.add_argument("--parts", type=int, default=64)
    p.add_argument("--vocab", type=int, default=50_000)
    p.add_argument("--with-containment", action="store_true")
    p.add_argument("--containment-threshold", type=float, default=0.7,
                   help="0.7 keeps the planted near-dup quads qualifying "
                        "(their containment ~ 2J/(1+J) ~ 0.72-0.9)")
    p.add_argument("--df-cap", default=None,
                   help="containment stop-shingle cap: an int, 'auto' "
                        "(size-derived production default), or unset for "
                        "the exact oracle mode")
    p.add_argument("--containment-recall-vs-exact", action="store_true",
                   help="also run EXACT containment and report the capped "
                        "run's pair recall against it")
    p.add_argument("--out", default="/tmp/setsim_scale")
    args = p.parse_args()

    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR", log_to_driver=False)
    rd.DataContext.get_current().enable_progress_bars = False

    from json_schema_validate_ray.sources.documents import (
        synth_documents_dataset)
    from json_schema_validate_ray.pipelines.dedup import (
        containment_pairs, ngram_jaccard_pairs)

    sampler = MemSampler()
    sampler.start()
    corpus_dir = os.path.join(args.out, f"corpus_{args.rows}")
    if not os.path.isdir(corpus_dir) or not os.listdir(corpus_dir):
        os.makedirs(corpus_dir, exist_ok=True)
        synth_documents_dataset(args.rows, args.parts,
                                vocab_size=args.vocab
                                ).write_parquet(corpus_dir)

    ds = rd.read_parquet(corpus_dir, columns=["doc_id", "text"])
    out = {"rows": args.rows, "vocab": args.vocab}

    t0 = time.perf_counter()
    pairs = ngram_jaccard_pairs(ds, "text", "doc_id", threshold=0.5)
    n_pairs = pairs.count()
    out["jaccard_sec"] = round(time.perf_counter() - t0, 1)
    out["jaccard_pairs"] = int(n_pairs)
    out["jaccard_rows_per_sec"] = int(args.rows / out["jaccard_sec"])

    if args.with_containment:
        df_cap = args.df_cap
        if df_cap is not None and df_cap != "auto":
            df_cap = int(df_cap)
        t0 = time.perf_counter()
        cp = containment_pairs(ds, "text", "doc_id",
                               threshold=args.containment_threshold,
                               df_cap=df_cap)
        got = {(r["id_a"], r["id_b"]) for r in cp.take_all()}
        out["containment_sec"] = round(time.perf_counter() - t0, 1)
        out["containment_pairs"] = len(got)
        out["containment_df_cap"] = args.df_cap
        if args.containment_recall_vs_exact and df_cap is not None:
            t0 = time.perf_counter()
            exact = containment_pairs(
                ds, "text", "doc_id",
                threshold=args.containment_threshold, df_cap=None)
            truth = {(r["id_a"], r["id_b"]) for r in exact.take_all()}
            out["containment_exact_sec"] = round(time.perf_counter() - t0, 1)
            out["containment_exact_pairs"] = len(truth)
            out["containment_recall"] = (
                round(len(got & truth) / len(truth), 4) if truth else 1.0)
            out["containment_false_pairs"] = len(got - truth)

    out["peak_node_mem_gib"] = round(sampler.stop(), 1)
    print(json.dumps(out), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
