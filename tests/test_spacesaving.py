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


def test_merge_reintroduces_dropped_key_with_floor():
    # a key truncated away in an earlier merge() that re-enters via a LATER
    # merge() (not add_many) must inherit the receiving side's floor as
    # count mass and error — otherwise its reported count can understate
    # the true count and break true <= count <= true + error
    a, b = SpaceSaving(capacity=4), SpaceSaving(capacity=4)
    _add_counter(a, Counter({"a": 10, "b": 8, "c": 2, "d": 1}))
    _add_counter(b, Counter({"e": 9, "f": 7, "g": 3, "h": 1}))
    a.merge(b)                              # drops g(3), h(1) -> floor 3
    assert a.floor == 3
    c = SpaceSaving(capacity=4)
    _add_counter(c, Counter({"g": 2}))      # dropped key re-enters via merge
    a.merge(c)
    true = Counter({"a": 10, "b": 8, "c": 2, "d": 1,
                    "e": 9, "f": 7, "g": 5, "h": 1})
    for k, cnt, e in a.topk(4):
        assert true[k] <= cnt <= true[k] + e, (k, true[k], cnt, e)
    # g's count must cover the 3 it may have lost in the first truncation
    if "g" in a.counts:
        assert a.counts["g"] >= true["g"]


def test_merge_symmetric_floor_on_receiving_side():
    # keys present in SELF but absent from OTHER must absorb other.floor:
    # other may have truncated that key's mass away before the merge
    a = SpaceSaving(capacity=4)
    _add_counter(a, Counter({"g": 2}))
    b, c = SpaceSaving(capacity=4), SpaceSaving(capacity=4)
    _add_counter(b, Counter({"a": 10, "b": 8, "c": 2, "d": 1}))
    _add_counter(c, Counter({"e": 9, "f": 7, "g": 3, "h": 1}))
    b.merge(c)                              # drops g(3), h(1) -> floor 3
    a.merge(b)                              # g in self, absent from other
    true = Counter({"a": 10, "b": 8, "c": 2, "d": 1,
                    "e": 9, "f": 7, "g": 5, "h": 1})
    for k, cnt, e in a.topk(4):
        assert true[k] <= cnt <= true[k] + e, (k, true[k], cnt, e)


def test_merged_floor_is_sum_for_doubly_absent_keys():
    # a key dropped by BOTH inputs may have true count up to the SUM of
    # the two floors, so the merged floor must be additive, not max —
    # otherwise a later re-insert of that key understates its true count
    def side(hi1, hi2):
        s0, s1 = SpaceSaving(capacity=2), SpaceSaving(capacity=2)
        _add_counter(s0, Counter({hi1: 9, hi2: 8}))
        _add_counter(s1, Counter({"x": 3}))
        s0.merge(s1)                        # truncation drops x(3) -> floor 3
        assert s0.floor == 3 and "x" not in s0.counts
        return s0

    a = side("a", "b")
    b = side("c", "d")
    a.merge(b)                              # x absent from both; true x = 6
    assert a.floor >= 6                     # sum of the two floors
    # re-insert restarts from the floor, so the bound holds for x again
    _add_counter(a, Counter({"x": 1}))
    true = Counter({"a": 9, "b": 8, "c": 9, "d": 8, "x": 7})
    if "x" in a.counts:
        assert true["x"] <= a.counts["x"] <= true["x"] + a.errors["x"]


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
