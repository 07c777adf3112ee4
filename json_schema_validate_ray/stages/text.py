"""Text-analysis stages for training-data pipelines: token counting, quality
scoring, language ID, document fingerprinting, SimHash / MinHash signatures.

All stages are ``map_batches`` callables.  The regex/stopword state is
compiled once per actor in ``__init__`` (actor-pool pattern); per-batch work
is numpy/pandas vectorized where the operation allows, with the per-token
loops bounded by batch token counts (no per-row Python in outer loops).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

_WS = re.compile(r"\s+")

# tiny per-language stopword lists for the n-gram/stopword language heuristic
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "las", "es", "un", "una", "que", "por", "con"},
    "zh": set(),  # han-script detection handles zh
}
_HAN = re.compile(r"[一-鿿]")

DEFAULT_STOPWORDS = frozenset({"the", "a", "and", "of", "to"})


def tokenize(text: str) -> list[str]:
    """Whitespace tokenization matching the SQL oracle
    (``regexp_split_to_array(trim(text), '\\s+')``); empty text -> 0 tokens."""
    t = text.strip()
    return _WS.split(t) if t else []


def token_count_batch(texts: list) -> np.ndarray:
    return np.array([0 if t is None else len(tokenize(t)) for t in texts],
                    dtype=np.int64)


class TextNormalizer:
    """Appends ``text_norm``: lowercase, whitespace runs collapsed to one
    space, stripped — the standard pre-dedup canonicalization.  Fully
    vectorized Arrow kernels (utf8_lower + replace_substring_regex +
    utf8_trim_whitespace); matches the SQL oracle
    ``lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))``."""

    def __init__(self, text_column: str = "text", out_column: str = "text_norm"):
        self.text_column = text_column
        self.out_column = out_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        arr = batch[self.text_column]
        norm = pc.utf8_lower(
            pc.utf8_trim_whitespace(
                pc.replace_substring_regex(arr, r"\s+", " ")))
        return batch.append_column(self.out_column, norm)


class TokenCounter:
    """Appends ``n_tokens`` (whitespace) and ``n_bpe_ish`` (a BPE-ish regex
    token count: word pieces + digits + punctuation runs)."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self.bpe_ish = re.compile(r"[A-Za-z]+|[0-9]|[^\sA-Za-z0-9]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_column].to_pylist()
        n_ws = token_count_batch(texts)
        n_bpe = np.array([0 if t is None else len(self.bpe_ish.findall(t))
                          for t in texts], dtype=np.int64)
        return (batch.append_column("n_tokens", pa.array(n_ws))
                     .append_column("n_bpe_ish", pa.array(n_bpe)))


class QualityScorer:
    """Appends quality features: ``n_tokens``, ``stopword_ratio``,
    ``mean_token_len``, ``punct_ratio``, ``quality_score`` (a simple
    composable heuristic in [0,1])."""

    def __init__(self, text_column: str = "text",
                 stopwords: frozenset = DEFAULT_STOPWORDS):
        self.text_column = text_column
        self.stopwords = set(stopwords)
        self.punct = re.compile(r"[^\w\s]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_column].to_pylist()
        n = len(texts)
        n_tok = np.zeros(n, dtype=np.int64)
        stop_ratio = np.zeros(n, dtype=np.float64)
        mean_len = np.zeros(n, dtype=np.float64)
        punct_ratio = np.zeros(n, dtype=np.float64)
        for i, t in enumerate(texts):
            if not t:
                continue
            toks = tokenize(t)
            if not toks:
                continue
            n_tok[i] = len(toks)
            sw = sum(1 for w in toks if w in self.stopwords)
            stop_ratio[i] = sw / len(toks)
            mean_len[i] = sum(len(w) for w in toks) / len(toks)
            punct_ratio[i] = len(self.punct.findall(t)) / max(1, len(t))
        score = np.clip(
            0.5 * np.clip(stop_ratio / 0.4, 0, 1)
            + 0.3 * np.clip((mean_len - 1.5) / 5.0, 0, 1)
            + 0.2 * (1.0 - np.clip(punct_ratio / 0.2, 0, 1)), 0, 1)
        return (batch.append_column("n_tokens", pa.array(n_tok))
                     .append_column("stopword_ratio", pa.array(np.round(stop_ratio, 4)))
                     .append_column("mean_token_len", pa.array(np.round(mean_len, 4)))
                     .append_column("punct_ratio", pa.array(np.round(punct_ratio, 4)))
                     .append_column("quality_score", pa.array(np.round(score, 4))))


class LanguageId:
    """Appends ``lang_pred``: stopword-marker + Han-script heuristic."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self.markers = {k: v for k, v in _LANG_MARKERS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_column].to_pylist()
        preds = []
        for t in texts:
            if not t:
                preds.append(None)
                continue
            if _HAN.search(t):
                preds.append("zh")
                continue
            toks = set(w.lower() for w in tokenize(t)[:200])
            best, best_hits = "en", -1
            for lang, markers in self.markers.items():
                hits = len(toks & markers)
                if hits > best_hits:
                    best, best_hits = lang, hits
            preds.append(best)
        return batch.append_column("lang_pred", pa.array(preds, type=pa.string()))


class Fingerprinter:
    """Appends ``fingerprint`` (md5 hex of the raw text — matches the SQL
    ``md5(text)`` oracle) and ``rolling_hash`` (64-bit polynomial rolling
    hash of the token stream, an order-sensitive content fingerprint)."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self._token_cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_column].to_pylist()
        md5s, rolls = [], []
        P = 1099511628211
        M = (1 << 64) - 1
        cache = self._token_cache
        for t in texts:
            if t is None:
                md5s.append(None); rolls.append(None)
                continue
            md5s.append(hashlib.md5(t.encode("utf-8")).hexdigest())
            h = 14695981039346656037
            for w in tokenize(t):
                wh = cache.get(w)
                if wh is None:
                    wh = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
                    cache[w] = wh
                h = ((h ^ wh) * P) & M
            rolls.append(h & ((1 << 63) - 1))
        return (batch.append_column("fingerprint", pa.array(md5s, type=pa.string()))
                     .append_column("rolling_hash", pa.array(rolls, type=pa.int64())))


_SHINGLE_MIX = (np.uint64(0x9E3779B97F4A7C15),
                np.uint64(0xC2B2AE3D27D4EB4F),
                np.uint64(0x165667B19E3779F9),
                np.uint64(0x27D4EB2F165667C5),
                np.uint64(0x85EBCA77C2B2AE63))


def _token_hashes(text: str, n_shingle: int = 3,
                  cache: dict | None = None) -> np.ndarray:
    """Stable 64-bit hashes of word shingles.

    Tokens are hashed individually (blake2b, cached per actor — natural
    language reuses tokens heavily so the cache hit rate is high) and
    shingle hashes are combined VECTORIZED from shifted token-hash slices:
    h(s_i) = XOR_j rotl-mix(h(tok_{i+j}), j).  Order-sensitive and stable."""
    toks = tokenize(text.lower())
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    if cache is None:
        cache = {}
    th = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        h = cache.get(t)
        if h is None:
            h = int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(),
                               "little")
            cache[t] = h
        th[i] = h
    if len(toks) < n_shingle:
        out = np.zeros(1, dtype=np.uint64)
        for j in range(len(toks)):
            out ^= (th[j] * _SHINGLE_MIX[j % len(_SHINGLE_MIX)])
        return out
    n_out = len(toks) - n_shingle + 1
    out = np.zeros(n_out, dtype=np.uint64)
    for j in range(n_shingle):
        out ^= th[j:j + n_out] * _SHINGLE_MIX[j % len(_SHINGLE_MIX)]
    return out


class MinHasher:
    """Appends MinHash band keys for LSH near-dup bucketing.

    ``num_perm`` permutations via the standard (a*h + b) mod p universal
    family, grouped into ``bands`` bands of ``rows_per_band``; emits one
    ``band_<j>`` int64 key per band.  Documents sharing any band key are
    near-dup candidates — bucketing is then a plain groupby on the band key
    (shingle -> minhash -> band -> bucket groupby, SURVEY/prompt pattern)."""

    MERSENNE = (1 << 61) - 1

    def __init__(self, text_column: str = "text", num_perm: int = 64,
                 bands: int = 16, n_shingle: int = 3, seed: int = 7):
        assert num_perm % bands == 0
        self.text_column = text_column
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.n_shingle = n_shingle
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, self.MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, self.MERSENNE, size=num_perm, dtype=np.uint64)
        self._token_cache: dict = {}

    def signature(self, text: str) -> np.ndarray:
        h = _token_hashes(text, self.n_shingle, self._token_cache)
        if len(h) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # (a * h + b) mod p for all perms x shingles: use object->uint64 via
        # float-free modular arithmetic in uint128 chunks (numpy uint64 wraps;
        # acceptable for hashing as long as it is deterministic)
        vals = (h[None, :] * self.a[:, None] + self.b[:, None])
        return vals.min(axis=1)

    def signatures(self, texts: list) -> np.ndarray:
        """(n_docs, num_perm) signatures for a whole batch: all documents'
        shingle hashes flattened once, then per-permutation (a*h + b) +
        segmented min via ``np.minimum.reduceat`` — identical arithmetic to
        ``signature`` (uint64 wraparound included) but one numpy pass per
        permutation instead of a Python call per document."""
        hs = [_token_hashes(t or "", self.n_shingle, self._token_cache)
              for t in texts]
        lengths = np.array([len(h) for h in hs], dtype=np.int64)
        sigs = np.zeros((len(hs), self.num_perm), dtype=np.uint64)
        nonempty = lengths > 0
        if not nonempty.any():
            return sigs
        flat = np.concatenate([h for h in hs if len(h)])
        ne_lengths = lengths[nonempty]
        starts = np.zeros(len(ne_lengths), dtype=np.int64)
        np.cumsum(ne_lengths[:-1], out=starts[1:])
        ne_idx = np.nonzero(nonempty)[0]
        for p in range(self.num_perm):
            vals = flat * self.a[p] + self.b[p]
            sigs[ne_idx, p] = np.minimum.reduceat(vals, starts)
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_column].to_pylist()
        sigs = self.signatures(texts) if texts \
            else np.zeros((0, self.num_perm), dtype=np.uint64)
        out = batch
        for j in range(self.bands):
            band = sigs[:, j * self.rows_per_band:(j + 1) * self.rows_per_band]
            # fold the band rows into one 63-bit key
            key = np.zeros(len(texts), dtype=np.uint64)
            for r in range(self.rows_per_band):
                key = key * np.uint64(1099511628211) + band[:, r]
            out = out.append_column(
                f"band_{j}", pa.array((key & np.uint64((1 << 63) - 1)).astype(np.int64)))
        return out


class SimHasher:
    """Appends a 64-bit ``simhash`` of the token stream; near-dups have small
    Hamming distance.  Vectorized bit-vote accumulation per document."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self.bit_masks = np.uint64(1) << np.arange(64, dtype=np.uint64)
        self._token_cache: dict = {}

    def simhash(self, text: str) -> int:
        h = _token_hashes(text, 1, self._token_cache)
        if len(h) == 0:
            return 0
        bits = (h[:, None] & self.bit_masks[None, :]) != 0
        votes = bits.sum(axis=0) * 2 - len(h)
        out = np.uint64(0)
        for i in np.nonzero(votes > 0)[0]:
            out |= self.bit_masks[i]
        return int(out & np.uint64((1 << 63) - 1))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_column].to_pylist()
        return batch.append_column(
            "simhash", pa.array([self.simhash(t or "") for t in texts],
                                type=pa.int64()))
