"""SpaceSaving heavy-hitters sketch (state/sketches.SpaceSaving): exactness
within capacity, the overestimation guarantee beyond it, and mergeability."""

from collections import Counter

import numpy as np

from json_schema_validate_ray.state.sketches import SpaceSaving


def _add_counter(sk, counter):
    items = sorted(counter.items())
    sk.add_many([k for k, _ in items], [v for _, v in items])


def test_exact_within_capacity():
    sk = SpaceSaving(capacity=100)
    true = Counter({f"k{i}": i + 1 for i in range(50)})
    _add_counter(sk, true)
    assert sk.is_exact
    top = sk.topk(5)
    assert [(k, c) for k, c, _ in top] == [
        ("k49", 50), ("k48", 49), ("k47", 48), ("k46", 47), ("k45", 46)]
    assert all(e == 0 for _, _, e in top)


def test_overestimation_bound_beyond_capacity():
    rng = np.random.default_rng(3)
    # zipf-ish stream with 400 distinct keys into a 64-counter sketch
    keys = [f"k{int(z):03d}" for z in np.minimum(rng.zipf(1.5, 20000), 400)]
    true = Counter(keys)
    sk = SpaceSaving(capacity=64)
    for i in range(0, len(keys), 1000):     # several bulk updates
        _add_counter(sk, Counter(keys[i:i + 1000]))
    assert not sk.is_exact
    for k, c, e in sk.topk(64):
        t = true.get(k, 0)
        assert t <= c <= t + e, (k, t, c, e)
    # every key more frequent than n/capacity must be retained
    n = len(keys)
    heavy = {k for k, t in true.items() if t > n / 64}
    assert heavy <= set(sk.counts)


def test_merge_matches_single_sketch_within_capacity():
    a, b = SpaceSaving(capacity=100), SpaceSaving(capacity=100)
    ca = Counter({"x": 5, "y": 3, "z": 1})
    cb = Counter({"x": 2, "w": 9})
    _add_counter(a, ca)
    _add_counter(b, cb)
    a.merge(b)
    assert a.is_exact
    assert dict(a.counts) == {"x": 7, "y": 3, "z": 1, "w": 9}


def test_merge_truncates_to_capacity():
    a, b = SpaceSaving(capacity=4), SpaceSaving(capacity=4)
    _add_counter(a, Counter({"a": 10, "b": 8, "c": 2, "d": 1}))
    _add_counter(b, Counter({"e": 9, "f": 7, "g": 3, "h": 1}))
    a.merge(b)
    assert len(a.counts) == 4
    assert [k for k, _, _ in a.topk(4)] == ["a", "e", "b", "f"]


def test_merge_truncation_is_not_exact():
    # each per-block sketch is under capacity (errors all 0), but the union
    # exceeds it — the old code dropped the tail silently and kept is_exact
    # True; now the max dropped count becomes the sketch-wide error floor
    a, b = SpaceSaving(capacity=4), SpaceSaving(capacity=4)
    _add_counter(a, Counter({"a": 10, "b": 8, "c": 2, "d": 1}))
    _add_counter(b, Counter({"e": 9, "f": 7, "g": 3, "h": 1}))
    assert a.is_exact and b.is_exact
    a.merge(b)
    assert not a.is_exact
    assert a.floor == 3                     # max dropped count (g)
    # a dropped key re-inserted afterwards restarts from the floor, so the
    # true <= count <= true + error bound still holds for it
    true = Counter({"a": 10, "b": 8, "c": 2, "d": 1,
                    "e": 9, "f": 7, "g": 3, "h": 1})
    _add_counter(a, Counter({"g": 2}))
    true["g"] += 2
    for k, c, e in a.topk(4):
        assert true[k] <= c <= true[k] + e, (k, true[k], c, e)


def test_floor_survives_roundtrip_and_remerge():
    a, b = SpaceSaving(capacity=2), SpaceSaving(capacity=2)
    _add_counter(a, Counter({"a": 5, "b": 4}))
    _add_counter(b, Counter({"c": 3, "d": 2}))
    a.merge(b)                              # drops c(3), d(2) -> floor 3
    back = SpaceSaving.from_bytes(a.to_bytes())
    assert back.floor == 3 and not back.is_exact
    clean = SpaceSaving(capacity=8)
    clean.merge(back)                       # floor propagates on merge
    assert clean.floor == 3 and not clean.is_exact


def test_roundtrip_bytes():
    sk = SpaceSaving(capacity=8)
    _add_counter(sk, Counter({"a": 3, "b": 1}))
    back = SpaceSaving.from_bytes(sk.to_bytes())
    assert back.counts == sk.counts and back.errors == sk.errors
    assert back.capacity == 8 and back.floor == 0
