"""Sketch accuracy + mergeability (HLL, histogram, t-digest, stats)."""

import numpy as np
import pyarrow as pa
import pytest

from json_schema_validate_ray.state.sketches import (
    ColumnStats,
    Histogram,
    HyperLogLog,
    TDigest,
    chi_square,
    ks_statistic,
)


def test_hll_accuracy_and_merge():
    h1 = HyperLogLog(p=14)
    h1.update(pa.array([f"doc-{i}" for i in range(50_000)]))
    h2 = HyperLogLog(p=14)
    h2.update(pa.array([f"doc-{i}" for i in range(25_000, 75_000)]))
    assert abs(h1.estimate() - 50_000) / 50_000 < 0.03
    merged = HyperLogLog.from_bytes(h1.to_bytes()).merge(h2)
    assert abs(merged.estimate() - 75_000) / 75_000 < 0.03


def test_hll_int_and_float_hashing():
    hi = HyperLogLog(p=12)
    hi.update(pa.array(np.arange(20_000)))
    assert abs(hi.estimate() - 20_000) / 20_000 < 0.05
    hf = HyperLogLog(p=12)
    hf.update(pa.array(np.linspace(0, 1, 20_000)))
    assert abs(hf.estimate() - 20_000) / 20_000 < 0.05


def test_histogram_merge_and_quantile():
    rng = np.random.default_rng(0)
    a = Histogram(0, 100, 128)
    b = Histogram(0, 100, 128)
    a.update(rng.normal(50, 10, 50_000))
    b.update(rng.normal(50, 10, 50_000))
    a.merge(b)
    assert a.total == 100_000
    assert abs(a.quantile(0.5) - 50) < 2


def test_ks_and_chi_square():
    rng = np.random.default_rng(0)
    a = Histogram(0, 100, 64); a.update(rng.normal(50, 10, 50_000))
    b = Histogram(0, 100, 64); b.update(rng.normal(58, 10, 50_000))
    assert ks_statistic(a, a) == 0.0
    assert ks_statistic(a, b) > 0.2
    assert chi_square({"a": 100, "b": 200}, {"a": 1000, "b": 2000}) == 0.0
    assert chi_square({"a": 300, "b": 0}, {"a": 100, "b": 200}) > 100


def test_tdigest_merged_quantiles():
    rng = np.random.default_rng(1)
    vals = rng.lognormal(5.5, 0.6, 100_000)
    parts = np.array_split(vals, 16)
    merged = None
    for p in parts:
        d = TDigest()
        d.update(p)
        d = TDigest.from_bytes(d.to_bytes())       # serialization round-trip
        merged = d if merged is None else merged.merge(d)
    for q in (0.01, 0.5, 0.99):
        exact = float(np.quantile(vals, q))
        assert abs(merged.quantile(q) - exact) / exact < 0.03, q
    assert merged.total_weight == 100_000


def test_column_stats_merge():
    cs1 = ColumnStats(); cs1.update_arrow(pa.array([1.0, 2.0, None]))
    cs2 = ColumnStats(); cs2.update_arrow(pa.array([10.0]))
    cs1.merge(cs2)
    assert (cs1.count, cs1.nulls) == (4, 1)
    assert (cs1.minimum, cs1.maximum) == (1.0, 10.0)
    assert cs1.mean == pytest.approx(13 / 3)


def test_exact_quantiles_distributed_matches_numpy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from json_schema_validate_ray.stages.checks import exact_quantiles_distributed

    rng = np.random.default_rng(5)
    # adversarial mix: heavy ties + outliers + skew
    vals = np.concatenate([
        rng.normal(0, 1, 40_000),
        np.full(20_000, 3.25),             # massive tie block
        rng.exponential(10, 10_000),
        [-1e9, 1e9],
    ])
    rng.shuffle(vals)
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(8)
    qs = [0.01, 0.25, 0.5, 0.75, 0.9, 0.99]
    got, n = exact_quantiles_distributed(ds, "v", qs, bracket_budget_rows=5_000)
    assert n == len(vals)
    s = np.sort(vals)
    for q, g in zip(qs, got):
        expect = s[max(0, int(np.ceil(q * n)) - 1)]   # quantile_disc rank
        assert g == expect, f"q={q}: {g} != {expect}"


def test_exact_quantiles_distributed_tiny_and_empty(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from json_schema_validate_ray.stages.checks import exact_quantiles_distributed
    ds = rd.from_arrow(pa.table({"v": [7.0]}))
    got, n = exact_quantiles_distributed(ds, "v", [0.5, 0.99])
    assert n == 1 and got == [7.0, 7.0]
    ds0 = rd.from_arrow(pa.table({"v": pa.array([], type=pa.float64())}))
    got0, n0 = exact_quantiles_distributed(ds0, "v", [0.5])
    assert n0 == 0 and got0 == [None]


def test_bloom_filter_no_false_negatives_and_fpr():
    from json_schema_validate_ray.state.sketches import BloomFilter
    keys = pa.array([f"key-{i}" for i in range(20_000)])
    bf = BloomFilter.sized(20_000, fpr=0.01)
    # distributed build: 4 block partials OR-merged
    merged = BloomFilter(num_bits=bf.num_bits, num_hashes=bf.num_hashes)
    for i in range(4):
        part = BloomFilter(num_bits=bf.num_bits, num_hashes=bf.num_hashes)
        part.update(keys.slice(i * 5_000, 5_000))
        merged.merge(part)
    assert merged.test(keys).all()                       # no false negatives
    probes = pa.array([f"other-{i}" for i in range(20_000)])
    assert merged.test(probes).mean() < 0.03             # ~1% target fpr
    rt = BloomFilter.from_bytes(merged.to_bytes())
    assert (rt.bits == merged.bits).all() and rt.num_hashes == merged.num_hashes
    # numeric columns hash too
    nf = BloomFilter.sized(1_000, fpr=0.01)
    nf.update(pa.array(np.arange(1_000, dtype=np.int64)))
    assert nf.test(pa.array(np.arange(1_000, dtype=np.int64))).all()
    assert nf.test(pa.array(np.arange(50_000, 51_000, dtype=np.int64))).mean() < 0.05
