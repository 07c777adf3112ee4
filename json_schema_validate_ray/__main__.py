"""CLI entry points: run the engine without writing a driver script.

    python -m json_schema_validate_ray validate INPUT_DIR OUT_DIR [--schema f.json]
    python -m json_schema_validate_ray report   INPUT_DIR        [--schema f.json]
    python -m json_schema_validate_ray suite    INPUT_DIR
    python -m json_schema_validate_ray synth    OUT_DIR --rows N [--partitions P]
    python -m json_schema_validate_ray query    NAME [--sf-dir D] [--limit N]
    python -m json_schema_validate_ray query --list

Owns its Ray session (guarded init) per the repo convention: only CLI entry
points, bench.py and the test fixture call ray.init().
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray():
    import logging

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR",
                 log_to_driver=False)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def _load_schema(path):
    from .pipelines.schemas import TOKENS_SCHEMA
    if path is None:
        return TOKENS_SCHEMA
    with open(path) as f:
        return json.load(f)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="json_schema_validate_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="resumable partitioned validation run")
    v.add_argument("input_dir"); v.add_argument("out_dir")
    v.add_argument("--schema", default=None)
    v.add_argument("--files-per-partition", type=int, default=4)

    r = sub.add_parser("report", help="one-shot fused report (no checkpoint)")
    r.add_argument("input_dir"); r.add_argument("--schema", default=None)

    s = sub.add_parser("suite", help="run the default ValidationSuite")
    s.add_argument("input_dir")

    g = sub.add_parser("synth", help="synthesize a deterministic tokens table")
    g.add_argument("out_dir"); g.add_argument("--rows", type=int, required=True)
    g.add_argument("--partitions", type=int, default=32)
    g.add_argument("--seed", type=int, default=42)

    c = sub.add_parser("curate", help="mix -> near-dup dedup -> pack; "
                       "writes bin-partitioned parquet")
    c.add_argument("input_dir", help="documents parquet (doc_id, lang, text)")
    c.add_argument("out_dir")
    c.add_argument("--capacity", type=int, default=2048)
    c.add_argument("--threshold", type=float, default=0.5)
    c.add_argument("--bins-per-file", type=int, default=64)
    c.add_argument("--band", choices=["fast", "md5"], default="fast",
                   help="mixture band: 'fast' = vectorized splitmix64 "
                   "(production default), 'md5' = oracle-parity band")
    c.add_argument("--dedup-method", choices=["minhash", "exact"],
                   default="minhash",
                   help="pair generator: 'minhash' (LSH, probabilistic "
                   "recall) or 'exact' (prefix-filtered n-gram Jaccard "
                   "join, deterministic recall)")
    c.add_argument("--checkpoint-dir", default=None,
                   help="persist stage outputs (counts / removed ids / "
                   "packed) behind manifests; a re-run with the same dir "
                   "resumes from the last finished stage")

    sp = sub.add_parser("split", help="content-addressed train/val/test "
                        "split; writes split-partitioned parquet")
    sp.add_argument("input_dir", help="documents parquet")
    sp.add_argument("out_dir")
    sp.add_argument("--band", choices=["fast", "md5"], default="fast",
                    help="split band: 'fast' = vectorized splitmix64 "
                    "(production default), 'md5' = oracle-parity band")

    qp = sub.add_parser("query", help="run a registry pipeline by name")
    qp.add_argument("name", nargs="?", default=None)
    qp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    qp.add_argument("--limit", type=int, default=20,
                    help="rows printed (full result still computed)")
    qp.add_argument("--list", action="store_true", help="list query names")

    args = p.parse_args(argv)

    if args.cmd == "query" and args.list:
        from .pipelines import queries as q
        for name, (_fn, sql) in q.REGISTRY.items():
            print(f"{name}\t{'oracled' if sql else 'rows-only'}")
        return 0

    if args.cmd == "synth":
        from .sources.tokens import write_tokens_parquet
        path = write_tokens_parquet(args.out_dir, args.rows,
                                    n_partitions=args.partitions, seed=args.seed)
        print(json.dumps({"written": path, "rows": args.rows}))
        return 0

    _init_ray()
    import ray

    try:
        if args.cmd == "validate":
            from .pipelines.validate import run_partitioned_validation
            out = run_partitioned_validation(
                args.input_dir, args.out_dir,
                schema=_load_schema(args.schema),
                files_per_partition=args.files_per_partition)
            print(json.dumps(out))
        elif args.cmd == "report":
            from .pipelines.validate import full_report
            print(json.dumps(full_report(args.input_dir,
                                         schema=_load_schema(args.schema))))
        elif args.cmd == "query":
            from .pipelines import queries as q
            reg = q.queries()
            if args.name not in reg:
                print(json.dumps({"error": f"unknown query {args.name!r}; "
                                  "use --list"}))
                return 2
            import pyarrow as _pa
            res = reg[args.name](args.sf_dir)
            if isinstance(res, _pa.Table):
                rows = res.slice(0, args.limit).to_pylist()
                total = res.num_rows
            else:                      # ray.data.Dataset
                rows = res.take(args.limit)
                total = res.count()
            print(json.dumps({"query": args.name, "rows_shown": len(rows),
                              "rows_total": int(total), "rows": rows},
                             default=str))
        elif args.cmd == "curate":
            import os.path

            import pyarrow as _pa
            import pyarrow.compute as _pc
            import ray.data as rd

            from .pipelines.curate import curate_run, curate_run_checkpointed
            from .pipelines.queries import _MIX_RATES
            in_path = args.input_dir
            if (not in_path.endswith(".parquet")
                    and os.path.isfile(os.path.join(in_path, "documents.parquet"))):
                in_path = os.path.join(in_path, "documents.parquet")
            ds = rd.read_parquet(in_path,
                                 columns=["doc_id", "lang", "text"])
            # single execution: curate_run materializes the packed dataset
            # once and derives the summary from it (no pipeline re-run)
            stage_log = None
            if args.checkpoint_dir:
                packed, summary, stage_log = curate_run_checkpointed(
                    ds, args.checkpoint_dir, mix_rates=_MIX_RATES,
                    threshold=args.threshold, capacity=args.capacity,
                    band=args.band, dedup_method=args.dedup_method)
            else:
                packed, summary = curate_run(ds, mix_rates=_MIX_RATES,
                                             threshold=args.threshold,
                                             capacity=args.capacity,
                                             band=args.band,
                                             dedup_method=args.dedup_method)
            bpf = args.bins_per_file
            packed.map_batches(
                lambda b: b.append_column(
                    "bin_group", _pc.cast(_pc.floor(_pc.divide(
                        _pc.cast(b["bin_id"], _pa.float64()), bpf)),
                        _pa.int64())),
                batch_format="pyarrow").write_parquet(
                args.out_dir, partition_cols=["bin_group"])
            summ = summary.to_pylist()[0]
            out = {"out": args.out_dir, "band": args.band,
                   "dedup_method": args.dedup_method, **summ}
            if stage_log is not None:
                out["stages"] = stage_log
            print(json.dumps(out))
        elif args.cmd == "split":
            import os.path

            import numpy as _np
            import pyarrow as _pa
            import ray.data as rd

            from .stages.banding import band_values
            in_path = args.input_dir
            if (not in_path.endswith(".parquet")
                    and os.path.isfile(os.path.join(in_path, "documents.parquet"))):
                in_path = os.path.join(in_path, "documents.parquet")
            band_mode = args.band

            def tag(b: _pa.Table) -> _pa.Table:
                band = band_values(b["doc_id"], mode=band_mode)
                split = _np.where(band < 90, "train",
                                  _np.where(band < 95, "val", "test"))
                return b.append_column("split",
                                       _pa.array(split, type=_pa.string()))

            tagged = rd.read_parquet(in_path).map_batches(
                tag, batch_format="pyarrow")
            tagged.write_parquet(args.out_dir, partition_cols=["split"])
            counts = {r["split"]: r["count()"] for r in
                      rd.read_parquet(args.out_dir).groupby("split")
                        .count().take_all()}
            print(json.dumps({"out": args.out_dir, "band": band_mode,
                              "counts": counts}))
        elif args.cmd == "suite":
            import ray.data as rd

            from .pipelines.suite import tokens_default_suite
            rep = tokens_default_suite().run(
                lambda: rd.read_parquet(args.input_dir))
            print(json.dumps(rep))
            return 0 if rep["passed"] else 1
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
