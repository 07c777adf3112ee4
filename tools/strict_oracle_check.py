"""Driver-style STRICT oracle comparison: for every oracled registry query,
run the Ray pipeline and the DuckDB SQL at sf0.01 and compare (a) row count,
(b) the Arrow schema (column names AND types, columns sorted by name), and
(c) a value hash over the name-sorted, row-sorted table.  This is stricter
than tests/test_queries_oracle.py (which string-casts objects and isclose's
floats) — it is the comparison the correctness driver applies, so any red
cell here would be red in CORRECTNESS_r{N}.json.

Usage: python tools/strict_oracle_check.py [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pyarrow as pa

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_table(result) -> pa.Table:
    import ray.data
    if isinstance(result, ray.data.Dataset):
        return pa.Table.from_pylist(result.take_all())
    if isinstance(result, pa.Table):
        return result
    raise TypeError(type(result))


def canonical(t: pa.Table) -> pa.Table:
    t = t.select(sorted(t.column_names))
    if t.num_rows:
        t = t.sort_by([(c, "ascending") for c in t.column_names])
    return t.combine_chunks()


def value_hash(t: pa.Table) -> str:
    h = hashlib.sha256()
    for c in t.column_names:
        for v in t[c].to_pylist():
            h.update(repr(v).encode())
        h.update(b"|")
    return h.hexdigest()[:16]


def main() -> int:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m
    queries = m.queries()
    oracles = m.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")

    names = sys.argv[1:] or [n for n in queries if n in oracles]
    bad = 0
    for name in names:
        try:
            rt = canonical(to_table(queries[name](SF_DIR)))
            ot = canonical(con.sql(oracles[name]).arrow())
            rows = rt.num_rows == ot.num_rows
            schema = rt.schema == ot.schema
            vh = value_hash(rt) == value_hash(ot) if schema else False
            status = "OK " if (rows and schema and vh) else "RED"
            if status == "RED":
                bad += 1
                print(f"{status} {name}: rows={rows} schema={schema} hash={vh}")
                if not schema:
                    print(f"    ray:    {rt.schema}")
                    print(f"    oracle: {ot.schema}")
            else:
                print(f"{status} {name} ({rt.num_rows} rows)")
        except Exception as e:  # noqa: BLE001 — report, keep scanning
            bad += 1
            print(f"ERR {name}: {type(e).__name__}: {e}")
    print(f"\n{len(names) - bad}/{len(names)} strictly green")
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
