"""Mergeable sketches for table-level checks (SURVEY.md §2.4).

All sketches follow the partial+final pattern: update vectorized per batch
inside ``map_batches``, serialize to bytes, merge associatively in a tiny
final stage — never a full shuffle.  Algorithms are the standard published
ones: HyperLogLog (Flajolet et al. 2007) with the Heule et al. small-range
correction, fixed-bin histograms, and two-sample chi-square / KS statistics.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


# Independent polynomial primes for seeded string hashing: two keys that
# collide under one prime are (for natural inputs) independent under the
# other, so the (seed 0, seed 1) hash pair behaves like a 128-bit hash.
_HASH_PRIMES = (0x100000001B3, 0x00000100000001B5)
_SEED_MIX = (0, 0x6C62272E07BB0142)


def _hash64(arr, seed: int = 0) -> np.ndarray:
    """Stable vectorized 64-bit hash of an Arrow array's values.

    Uses xxhash-free splitmix64 finalization over per-value CRC-free byte
    hashes: string/binary values are hashed via numpy from their UTF-8 bytes,
    numeric values from their bit patterns.  Deterministic across workers and
    runs (no PYTHONHASHSEED dependence).  ``seed`` selects an independent
    hash family (different polynomial prime for strings; for 64-bit numerics
    the map is a bijection at every seed, hence collision-FREE)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_floating(arr.type):
        v = arr.fill_null(0).to_numpy(zero_copy_only=False)
        x = v.astype(np.float64, copy=False).view(np.uint64).copy()
        x ^= np.uint64(_SEED_MIX[seed])
    elif pa.types.is_integer(arr.type):
        v = arr.fill_null(0).to_numpy(zero_copy_only=False)
        x = v.astype(np.int64, copy=False).view(np.uint64).copy()
        x ^= np.uint64(_SEED_MIX[seed])
    else:
        arr = arr.cast(pa.string())
        # vectorized FNV-1a over the raw value buffer using offsets
        sarr = arr.fill_null("")
        buf = np.frombuffer(sarr.buffers()[2] or b"", dtype=np.uint8) if sarr.buffers()[2] else np.zeros(0, np.uint8)
        offs = np.frombuffer(sarr.buffers()[1], dtype=np.int32)[sarr.offset:sarr.offset + len(sarr) + 1].astype(np.int64)
        # per-value polynomial hash via segmented evaluation
        x = _segmented_bytes_hash(buf, offs, prime=_HASH_PRIMES[seed])
    # splitmix64 finalizer
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x ^= x >> np.uint64(30); x = x * np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27); x = x * np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _segmented_bytes_hash(buf: np.ndarray, offs: np.ndarray,
                          prime: int = 0x100000001B3) -> np.ndarray:
    """Vectorized per-segment polynomial byte hash: for segment s with bytes
    b_0..b_k, hash = sum(b_i * P^i) mod 2^64, xor'd with a length term.
    O(total_bytes) numpy; position weights looked up from a precomputed
    powers-of-P table (max segment length sized)."""
    n = len(offs) - 1
    total = int(offs[-1] - offs[0])
    if total == 0 or len(buf) == 0:
        return np.zeros(n, dtype=np.uint64)
    base = int(offs[0])
    lengths = np.diff(offs)
    seg_ids = np.repeat(np.arange(n, dtype=np.int64), lengths)
    pos_in_seg = (np.arange(total, dtype=np.int64) + base - offs[seg_ids])
    max_len = int(lengths.max())
    powers = np.empty(max_len, dtype=np.uint64)
    powers[0] = 1
    if max_len > 1:
        np.multiply.accumulate(
            np.full(max_len - 1, prime, dtype=np.uint64),
            out=powers[1:])
    contrib = buf[base:base + total].astype(np.uint64) * powers[pos_in_seg]
    out = np.zeros(n, dtype=np.uint64)
    np.add.at(out, seg_ids, contrib)
    return out ^ (lengths.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))


@dataclass
class HyperLogLog:
    """Dense HLL, p registers bits; merge = elementwise max."""

    p: int = 14
    registers: np.ndarray = field(default=None)  # type: ignore[assignment]

    def __post_init__(self):
        if self.registers is None:
            self.registers = np.zeros(1 << self.p, dtype=np.uint8)

    def update_hashes(self, h: np.ndarray) -> None:
        m = 1 << self.p
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)
        # rank = leading zeros of remaining bits + 1, capped
        lz = np.full(len(h), 64 - self.p + 1, dtype=np.uint8)
        nz = rest != 0
        if nz.any():
            # count leading zeros via float64 exponent trick is lossy; use
            # bit_length: 64 - bit_length(rest)
            r = rest[nz]
            bl = np.zeros(len(r), dtype=np.int64)
            rr = r.copy()
            for shift in (32, 16, 8, 4, 2, 1):
                step = rr >> np.uint64(shift)
                has = step != 0
                bl[has] += shift
                rr[has] = step[has]
            bl += 1  # bit_length
            lz_nz = (64 - bl + 1).astype(np.uint8)
            lz[nz] = lz_nz
        np.maximum.at(self.registers, idx, lz)

    def update(self, arr) -> None:
        self.update_hashes(_hash64(arr))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(len(self.registers))
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        zeros = float((self.registers == 0).sum())
        if e <= 2.5 * m and zeros > 0:
            e = m * np.log(m / zeros)  # linear counting, small range
        return float(e)

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.p, self.registers), protocol=4)

    @classmethod
    def from_bytes(cls, b: bytes) -> "HyperLogLog":
        p, regs = pickle.loads(b)
        return cls(p=p, registers=regs)


@dataclass
class Histogram:
    """Fixed-bin numeric histogram (mergeable by counts-add).  Serves as the
    token-length distribution sketch and the KS-drift input."""

    lo: float
    hi: float
    bins: int = 256
    counts: np.ndarray = field(default=None)  # type: ignore[assignment]
    n_below: int = 0
    n_above: int = 0

    def __post_init__(self):
        if self.counts is None:
            self.counts = np.zeros(self.bins, dtype=np.int64)

    def update(self, values: np.ndarray) -> None:
        values = values[~np.isnan(values)] if values.dtype.kind == "f" else values
        below = values < self.lo
        above = values >= self.hi
        self.n_below += int(below.sum())
        self.n_above += int(above.sum())
        inb = values[~below & ~above]
        if len(inb):
            idx = ((inb - self.lo) / (self.hi - self.lo) * self.bins).astype(np.int64)
            np.clip(idx, 0, self.bins - 1, out=idx)
            self.counts += np.bincount(idx, minlength=self.bins)

    def merge(self, other: "Histogram") -> "Histogram":
        self.counts += other.counts
        self.n_below += other.n_below
        self.n_above += other.n_above
        return self

    @property
    def total(self) -> int:
        return int(self.counts.sum()) + self.n_below + self.n_above

    def cdf(self) -> np.ndarray:
        t = self.total
        if t == 0:
            return np.zeros(self.bins)
        return (self.n_below + np.cumsum(self.counts)) / t

    def quantile(self, q: float) -> float:
        c = self.cdf()
        i = int(np.searchsorted(c, q))
        i = min(i, self.bins - 1)
        return self.lo + (i + 0.5) * (self.hi - self.lo) / self.bins

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.lo, self.hi, self.bins, self.counts,
                             self.n_below, self.n_above), protocol=4)

    @classmethod
    def from_bytes(cls, b: bytes) -> "Histogram":
        lo, hi, bins, counts, nb, na = pickle.loads(b)
        return cls(lo=lo, hi=hi, bins=bins, counts=counts, n_below=nb, n_above=na)


@dataclass
class TDigest:
    """Mergeable t-digest (Dunning & Ertl, 2019) with the scale function
    k1(q) = δ/2π · asin(2q-1): centroid sizes bounded tighter near the tails,
    so extreme quantiles stay accurate under merging.  Used for the
    token-length (n_tok) distribution at scale, where exact order statistics
    would need a full sort."""

    delta: float = 100.0
    means: np.ndarray = field(default_factory=lambda: np.zeros(0))
    weights: np.ndarray = field(default_factory=lambda: np.zeros(0))
    _buf: list = field(default_factory=list)

    def update(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        self._buf.append(np.asarray(values, dtype=np.float64))
        if sum(len(b) for b in self._buf) > 8192:
            self._compress()

    def _k(self, q: np.ndarray) -> np.ndarray:
        return self.delta / (2 * np.pi) * np.arcsin(np.clip(2 * q - 1, -1, 1))

    def _compress(self) -> None:
        if self._buf:
            vals = np.concatenate(self._buf)
            self._buf = []
            means = np.concatenate([self.means, vals])
            weights = np.concatenate([self.weights, np.ones(len(vals))])
        else:
            means, weights = self.means, self.weights
        if len(means) == 0:
            return
        order = np.argsort(means)
        means, weights = means[order], weights[order]
        total = weights.sum()
        # greedy merge: extend the current centroid while k(q_right)-k(q_left) <= 1
        out_m, out_w = [], []
        cur_m, cur_w = means[0], weights[0]
        w_before = 0.0
        for m, w in zip(means[1:], weights[1:]):
            q_left = w_before / total
            q_right = (w_before + cur_w + w) / total
            if self._k(np.array([q_right]))[0] - self._k(np.array([q_left]))[0] <= 1.0:
                cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
                cur_w += w
            else:
                out_m.append(cur_m); out_w.append(cur_w)
                w_before += cur_w
                cur_m, cur_w = m, w
        out_m.append(cur_m); out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    def merge(self, other: "TDigest") -> "TDigest":
        self._compress(); other._compress()
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self._compress()
        return self

    def quantile(self, q: float) -> float:
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        cum = np.cumsum(self.weights) - self.weights / 2
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means))

    @property
    def total_weight(self) -> float:
        self._compress()
        return float(self.weights.sum())

    def to_bytes(self) -> bytes:
        self._compress()
        return pickle.dumps((self.delta, self.means, self.weights), protocol=4)

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        delta, means, weights = pickle.loads(b)
        return cls(delta=delta, means=means, weights=weights)


def ks_statistic(a: Histogram, b: Histogram) -> float:
    """Two-sample KS distance from binned CDFs (same binning required)."""
    assert (a.lo, a.hi, a.bins) == (b.lo, b.hi, b.bins)
    return float(np.abs(a.cdf() - b.cdf()).max())


def chi_square(observed: dict[str, int], expected: dict[str, int]) -> float:
    """Pearson chi-square of an observed categorical distribution against a
    baseline (expected scaled to the observed total)."""
    keys = sorted(set(observed) | set(expected))
    obs = np.array([observed.get(k, 0) for k in keys], dtype=np.float64)
    exp = np.array([expected.get(k, 0) for k in keys], dtype=np.float64)
    if exp.sum() == 0 or obs.sum() == 0:
        return 0.0
    exp = exp * (obs.sum() / exp.sum())
    nz = exp > 0
    stat = float(((obs[nz] - exp[nz]) ** 2 / exp[nz]).sum())
    # categories observed but absent from baseline contribute their full count
    stat += float(obs[~nz].sum())
    return stat


@dataclass
class BloomFilter:
    """Mergeable Bloom filter over column values; merge = bitwise OR.

    The scale path for referential checks when the dimension key set is too
    large to broadcast exactly (checks.py::referential_violations ships the
    full sorted key list; at 10^9 64-byte keys that is ~60 GB, while a 1%-fpr
    Bloom is ~1.2 GB — one object-store copy per node).  Double hashing
    (Kirsch & Mitzenmacher 2006): bit index i = h1 + i*h2 mod m, with h1/h2
    the two independent seeded families of ``_hash64`` — deterministic across
    workers and runs.  Guarantee direction: ``test`` == False means the value
    is DEFINITELY absent, so every flagged orphan is real; a true orphan
    escapes with probability ~fpr.
    """

    num_bits: int = 1 << 20
    num_hashes: int = 7
    bits: np.ndarray = field(default=None)  # type: ignore[assignment]

    def __post_init__(self):
        # round up to a multiple of 64 so the word array is exact
        self.num_bits = (self.num_bits + 63) & ~63
        if self.bits is None:
            self.bits = np.zeros(self.num_bits >> 6, dtype=np.uint64)

    @classmethod
    def sized(cls, expected: int, fpr: float = 0.01) -> "BloomFilter":
        """Optimal m/k for ``expected`` insertions at false-positive rate
        ``fpr``: m = -n ln p / (ln 2)^2, k = (m/n) ln 2."""
        expected = max(1, int(expected))
        m = int(np.ceil(-expected * np.log(fpr) / (np.log(2) ** 2)))
        k = max(1, int(round(m / expected * np.log(2))))
        return cls(num_bits=m, num_hashes=k)

    def _indices(self, arr) -> np.ndarray:
        """(k, n) matrix of bit indices for the values of ``arr``."""
        h1 = _hash64(arr, seed=0)
        h2 = _hash64(arr, seed=1) | np.uint64(1)  # odd => full-period stride
        ks = np.arange(self.num_hashes, dtype=np.uint64)[:, None]
        return (h1[None, :] + ks * h2[None, :]) % np.uint64(self.num_bits)

    def update(self, arr) -> None:
        idx = self._indices(arr).ravel()
        np.bitwise_or.at(self.bits, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))

    def test(self, arr) -> np.ndarray:
        """Boolean mask: True = possibly present, False = definitely absent."""
        idx = self._indices(arr)
        word = self.bits[(idx >> np.uint64(6)).astype(np.int64)]
        hit = (word >> (idx & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.num_bits == other.num_bits and self.num_hashes == other.num_hashes
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    @property
    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.bits.view(np.uint8)).sum()) / self.num_bits

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.num_bits, self.num_hashes, self.bits), protocol=4)

    @classmethod
    def from_bytes(cls, b: bytes) -> "BloomFilter":
        m, k, bits = pickle.loads(b)
        return cls(num_bits=m, num_hashes=k, bits=bits)


@dataclass
class ColumnStats:
    """Mergeable per-column stats partial: count / nulls / min / max / sum /
    sum of squares (for mean+std) — the classic distributed aggregation."""

    count: int = 0
    nulls: int = 0
    minimum: float | str | None = None
    maximum: float | str | None = None
    total: float = 0.0
    total_sq: float = 0.0
    is_numeric: bool = True

    def update_arrow(self, arr) -> None:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(arr)
        nn = arr.null_count
        self.count += n
        self.nulls += nn
        if n == nn:
            return
        if pa.types.is_integer(arr.type) or pa.types.is_floating(arr.type):
            mm = pc.min_max(arr)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            s = pc.sum(arr).as_py() or 0
            sq = pc.sum(pc.multiply(arr, arr)).as_py() or 0
            self.total += float(s)
            self.total_sq += float(sq)
        else:
            self.is_numeric = False
            mm = pc.min_max(arr.cast(pa.string()))
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
        self.minimum = lo if self.minimum is None else min(self.minimum, lo)
        self.maximum = hi if self.maximum is None else max(self.maximum, hi)

    def merge(self, other: "ColumnStats") -> "ColumnStats":
        self.count += other.count
        self.nulls += other.nulls
        self.total += other.total
        self.total_sq += other.total_sq
        self.is_numeric = self.is_numeric and other.is_numeric
        for attr, fn in (("minimum", min), ("maximum", max)):
            a, b = getattr(self, attr), getattr(other, attr)
            setattr(self, attr, b if a is None else (a if b is None else fn(a, b)))
        return self

    @property
    def null_rate(self) -> float:
        return self.nulls / self.count if self.count else 0.0

    @property
    def mean(self) -> float | None:
        nn = self.count - self.nulls
        return self.total / nn if (self.is_numeric and nn) else None

    @property
    def std(self) -> float | None:
        nn = self.count - self.nulls
        if not (self.is_numeric and nn):
            return None
        var = max(0.0, self.total_sq / nn - (self.total / nn) ** 2)
        return float(np.sqrt(var))

    def to_bytes(self) -> bytes:
        return pickle.dumps(self.__dict__, protocol=4)

    @classmethod
    def from_bytes(cls, b: bytes) -> "ColumnStats":
        o = cls()
        o.__dict__.update(pickle.loads(b))
        return o


class SpaceSaving:
    """Heavy-hitters (frequent-items) sketch — the SpaceSaving algorithm
    (Metwally, Agrawal, El Abbadi, "Efficient computation of frequent and
    top-k elements in data streams", ICDT 2005): at most ``capacity``
    counters; an unseen key evicts the minimum counter and inherits its
    count as the new key's overestimation error.  Guarantees: every true
    count is <= reported count <= true count + error; any key with true
    frequency > n/capacity is retained.  EXACT (error 0 everywhere) while
    the distinct-key count never exceeds ``capacity`` — the regime the
    small-scale oracle verifies; at 100 TB the same pipeline degrades
    gracefully to the documented error bound instead of OOMing on an
    unbounded vocabulary.

    Mergeable (per-block partial -> driver/tree reduce): counts and errors
    sum for shared keys, then the merged table is truncated back to
    ``capacity`` by count (ties broken by key for determinism).  Merge
    truncation is LOSSY for the dropped tail: the max dropped count becomes
    the sketch-wide error ``floor`` — an absent key's true count may be up
    to ``floor``, a key (re-)inserted later starts from ``floor`` with that
    much error, and ``is_exact`` is False once any mass was dropped, so the
    documented ``true <= count <= true + error`` bound survives merging."""

    def __init__(self, capacity: int = 4096):
        self.capacity = int(capacity)
        self.counts: dict = {}
        self.errors: dict = {}
        self.floor = 0      # max count ever dropped in a merge truncation

    def add_many(self, keys, weights) -> None:
        """Bulk update: pre-aggregated (key, weight) pairs — callers pass
        np.unique/value_counts output so the per-key Python cost is bounded
        by the batch's DISTINCT keys, not its rows."""
        counts, errors, cap = self.counts, self.errors, self.capacity
        floor = self.floor
        for k, w in zip(keys, weights):
            w = int(w)
            if k in counts:
                counts[k] += w
            elif len(counts) < cap:
                counts[k] = floor + w
                errors[k] = floor
            else:
                mkey = min(counts, key=lambda x: (counts[x], x))
                m = max(counts.pop(mkey), floor)
                errors.pop(mkey)
                counts[k] = m + w
                errors[k] = m

    def merge(self, other: "SpaceSaving") -> None:
        # A key absent from one side may have had true count up to that
        # side's floor truncated away, so it must inherit that floor as
        # count mass AND error (mirroring add_many's floor-initialization);
        # otherwise a dropped key re-entering via merge understates its
        # possible true count and breaks true <= count <= true + error.
        self_floor, other_floor = self.floor, other.floor
        for k, c in other.counts.items():
            if k in self.counts:
                self.counts[k] += c
                self.errors[k] += other.errors[k]
            else:
                self.counts[k] = self_floor + c
                self.errors[k] = self_floor + other.errors[k]
        if other_floor:
            for k in self.counts:
                if k not in other.counts:
                    self.counts[k] += other_floor
                    self.errors[k] += other_floor
        # A key absent from BOTH sides may have been dropped by both, so
        # the merged sketch's truncation floor is the SUM of the inputs'.
        self.floor = self_floor + other_floor
        if len(self.counts) > self.capacity:
            order = sorted(self.counts,
                           key=lambda x: (-self.counts[x], x))
            keep_set = set(order[: self.capacity])
            self.floor = max(self.floor,
                             max(self.counts[k] for k in order[self.capacity:]))
            self.counts = {k: self.counts[k] for k in keep_set}
            self.errors = {k: self.errors[k] for k in keep_set}

    def topk(self, k: int) -> list:
        """[(key, count, error)] — count desc, key asc (deterministic)."""
        order = sorted(self.counts, key=lambda x: (-self.counts[x], x))[:k]
        return [(x, self.counts[x], self.errors[x]) for x in order]

    @property
    def is_exact(self) -> bool:
        return self.floor == 0 and all(e == 0 for e in self.errors.values())

    def to_bytes(self) -> bytes:
        return pickle.dumps(
            (self.capacity, self.counts, self.errors, self.floor), protocol=4)

    @classmethod
    def from_bytes(cls, b: bytes) -> "SpaceSaving":
        cap, counts, errors, floor = pickle.loads(b)
        o = cls(cap)
        o.counts, o.errors, o.floor = counts, errors, floor
        return o
