"""Distributed connected-components scale demonstration.

Builds a synthetic near-dup-shaped pair graph (many small blobs + a few long
chains — the worst case for label propagation), runs BOTH paths of
connected_components, times them, and verifies the distributed labeling
equals driver union-find exactly.
"""
import sys, time, json
sys.path.insert(0, ".")
import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

ray.init(address="local", num_cpus=32, include_dashboard=False,
         ignore_reinit_error=True)

from json_schema_validate_ray.pipelines.dedup import (
    connected_components, _union_find_components)

rng = np.random.default_rng(7)

# 400k blobs of size 2-6 (near-dup clusters) + 50 chains of length 16
# (diameter stressor: hash-min spreads one hop per round) -> ~1.6M nodes.
edges_a, edges_b = [], []
node = 0
sizes = rng.integers(2, 7, size=400_000)
for s in sizes:
    members = np.arange(node, node + s)
    # star topology within the blob (LSH candidate pairs against one pivot)
    edges_a.append(np.full(s - 1, members[0]))
    edges_b.append(members[1:])
    node += s
for _ in range(50):
    chain = np.arange(node, node + 16)
    edges_a.append(chain[:-1])
    edges_b.append(chain[1:])
    node += 16
a = np.concatenate(edges_a)
b = np.concatenate(edges_b)
perm = rng.permutation(len(a))
a, b = a[perm], b[perm]
ids_a = pa.array([f"d{x:09d}" for x in a], type=pa.string())
ids_b = pa.array([f"d{x:09d}" for x in b], type=pa.string())
print(f"graph: {node:,} nodes, {len(a):,} edges, "
      f"{len(sizes):,} blobs + 50 chains of 16", flush=True)

pairs_tbl = pa.table({"id_a": ids_a, "id_b": ids_b})
pairs = rd.from_arrow(pairs_tbl).repartition(64).materialize()

t0 = time.perf_counter()
out = connected_components(pairs, force_distributed=True,
                           max_iters=50).materialize()
t_dist = time.perf_counter() - t0
n_out = out.count()

t0 = time.perf_counter()
want = _union_find_components(zip(ids_a.to_pylist(), ids_b.to_pylist()))
t_uf = time.perf_counter() - t0

got = {}
for batch in out.iter_batches(batch_format="pyarrow"):
    for n_, c_ in zip(batch["node"].to_pylist(), batch["component"].to_pylist()):
        got[n_] = c_
assert got == want, "distributed labeling != union-find"
n_comp = len(set(want.values()))
print(json.dumps({
    "nodes": int(node), "edges": int(len(a)), "components": int(n_comp),
    "distributed_sec": round(t_dist, 2),
    "driver_union_find_sec": round(t_uf, 2),
    "labels_match": True}), flush=True)
ray.shutdown()
