"""stages/banding: the deterministic content-addressed percent band shared
by every sampling / mixing / splitting operator.

Pins (per the module docstring's contract):
- determinism across calls and across chunk layouts (value-addressed),
- md5 mode bit-parity with the DuckDB oracle predicate,
- fast mode is per-row-Python-free, same uniform keep-rate statistics,
- per-row rate arrays (the mixture lookup) and scalar rates both work,
- unknown modes rejected.
"""

import numpy as np
import pyarrow as pa
import pytest

from json_schema_validate_ray.stages.banding import (
    BAND_MODES,
    band_mask,
    band_values,
)


def _ids_int(n=5000):
    return pa.array(np.arange(n, dtype=np.int64) * 7 + 3, type=pa.int64())


def _ids_str(n=5000):
    return pa.array([f"doc-{i:06d}" for i in range(n)], type=pa.string())


@pytest.mark.parametrize("mode", BAND_MODES)
@pytest.mark.parametrize("ids_fn", [_ids_int, _ids_str])
def test_band_deterministic_and_layout_invariant(mode, ids_fn):
    ids = ids_fn(2000)
    b1 = band_values(ids, mode=mode)
    b2 = band_values(ids, mode=mode)
    np.testing.assert_array_equal(b1, b2)
    # value-addressed: any slicing/chunking yields the same per-value band
    lo, hi = ids.slice(0, 700), ids.slice(700)
    chunked = pa.chunked_array([lo, hi])
    np.testing.assert_array_equal(band_values(chunked, mode=mode), b1)
    np.testing.assert_array_equal(band_values(hi, mode=mode), b1[700:])
    assert b1.min() >= 0 and b1.max() < 100


@pytest.mark.parametrize("ids_fn", [_ids_int, _ids_str])
def test_md5_band_matches_duckdb_oracle(ids_fn):
    import duckdb
    ids = ids_fn(500)
    got = band_values(ids, mode="md5")
    con = duckdb.connect()
    con.register("t", pa.table({"id": ids}))
    want = con.execute(
        "SELECT CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8)) "
        "AS BIGINT) % 100 AS band FROM t").fetchnumpy()["band"]
    con.close()
    np.testing.assert_array_equal(got, np.asarray(want, dtype=np.int64))


@pytest.mark.parametrize("mode", BAND_MODES)
def test_keep_rate_statistics(mode):
    # each band uniform enough that keep-rate tracks the rate within ~3pts
    ids = _ids_str(20000)
    for rate in (5, 30, 90):
        kept = band_mask(ids, rate, mode=mode).to_numpy(zero_copy_only=False)
        frac = kept.mean() * 100
        assert abs(frac - rate) < 3.0, (mode, rate, frac)
    # rate 0 keeps nothing, rate 100 keeps all
    assert not band_mask(ids, 0, mode=mode).to_numpy(
        zero_copy_only=False).any()
    assert band_mask(ids, 100, mode=mode).to_numpy(
        zero_copy_only=False).all()


def test_per_row_rate_array():
    ids = _ids_int(1000)
    rates = np.where(np.arange(1000) % 2 == 0, 0, 100)
    kept = band_mask(ids, rates, mode="fast").to_numpy(zero_copy_only=False)
    assert not kept[::2].any() and kept[1::2].all()


def test_fast_band_has_no_per_row_python():
    # the fast path must not call hashlib at all (vectorized numpy only)
    import unittest.mock as mock
    with mock.patch("hashlib.md5",
                    side_effect=AssertionError("per-row md5 in fast band")):
        band_values(_ids_str(100), mode="fast")
        band_values(_ids_int(100), mode="fast")


def test_unknown_mode_rejected():
    with pytest.raises(ValueError, match="band mode"):
        band_values(_ids_int(4), mode="xxh")


def test_modes_agree_on_semantics_not_membership():
    # both modes implement the SAME operator contract: deterministic band in
    # [0,100) addressing only the value — but memberships differ (fast is
    # not md5), which is what makes md5 the oracle mode.
    ids = _ids_str(2000)
    md5_b = band_values(ids, mode="md5")
    fast_b = band_values(ids, mode="fast")
    assert not np.array_equal(md5_b, fast_b)
    for b in (md5_b, fast_b):
        # every percent bucket populated at n=2000 (uniformity smoke)
        assert len(np.unique(b)) == 100
