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
