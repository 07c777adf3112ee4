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


def _as_array(col) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def token_counts_arrow(arr) -> pa.Array:
    """Vectorized whitespace token count: number of ``\\S+`` runs — identical
    to ``len(tokenize(t))`` and to the SQL oracle
    ``len(regexp_split_to_array(trim(text), '\\s+'))`` (0 for empty/blank,
    0 for null).  One RE2 kernel pass instead of a Python loop per row."""
    import pyarrow.compute as pc
    return pc.fill_null(
        pc.cast(pc.count_substring_regex(arr, r"\S+"), pa.int64()), 0)


def split_tokens_arrow(arr, lower: bool = False, limit: int | None = None):
    """Vectorized whitespace tokenization of a string column -> list<string>
    (same tokens as ``tokenize``: trim, split on ``\\s+``; blank text yields
    [''] — callers that need counts use ``token_counts_arrow`` instead).
    Returns the list array plus flat tokens and per-token parent row indices
    for segmented (per-row) reductions."""
    import pyarrow.compute as pc
    a = _as_array(arr)
    if lower:
        a = pc.utf8_lower(a)
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(a), r"\s+")
    if limit is not None:
        toks = pc.list_slice(toks, 0, limit)
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    return toks, flat, parent


def stopword_counts_arrow(arr, stopwords, n_rows: int) -> np.ndarray:
    """Per-row stopword occurrence counts, fully vectorized: split -> flatten
    -> ``is_in`` membership -> segmented sum via ``np.bincount`` on the list
    parent indices.  Matches the per-row ``sum(w in stopwords)`` loop."""
    import pyarrow.compute as pc
    _, flat, parent = split_tokens_arrow(arr)
    member = pc.fill_null(
        pc.is_in(flat, value_set=pa.array(sorted(stopwords))), False) \
        .to_numpy(zero_copy_only=False)
    return np.bincount(parent[member], minlength=n_rows).astype(np.int64)


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

    BPE_ISH = r"[A-Za-z]+|[0-9]|[^\sA-Za-z0-9]"

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        # both counts are non-overlapping RE2 match counts — one vectorized
        # kernel pass each, no Python loop (count parity with re.findall
        # verified incl. non-ASCII)
        import pyarrow.compute as pc
        arr = batch[self.text_column]
        n_ws = token_counts_arrow(arr)
        n_bpe = pc.fill_null(
            pc.cast(pc.count_substring_regex(arr, self.BPE_ISH), pa.int64()), 0)
        return (batch.append_column("n_tokens", n_ws)
                     .append_column("n_bpe_ish", n_bpe))


class QualityScorer:
    """Appends quality features: ``n_tokens``, ``stopword_ratio``,
    ``mean_token_len``, ``punct_ratio``, ``quality_score`` (a simple
    composable heuristic in [0,1])."""

    # RE2 class equivalent to Python re's unicode [^\w\s] (\w = letters +
    # numbers + underscore in both engines)
    PUNCT = r"[^\p{L}\p{N}_\s]"

    def __init__(self, text_column: str = "text",
                 stopwords: frozenset = DEFAULT_STOPWORDS):
        self.text_column = text_column
        self.stopwords = set(stopwords)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # all four features are vectorized RE2-kernel counts + segmented
        # numpy sums — no Python loop over rows:
        #   n_tok        = #(\S+ runs)
        #   sum(len(w))  = #(\S chars)   (tokens partition the non-ws chars)
        #   punct count  = #([^\w\s])    (only rows with tokens score, as
        #                                 in the per-row reference loop)
        import pyarrow.compute as pc
        arr = batch[self.text_column]
        n = batch.num_rows
        n_tok = token_counts_arrow(arr).to_numpy(zero_copy_only=False)
        sw = stopword_counts_arrow(arr, self.stopwords, n)
        nonws_chars = pc.fill_null(pc.cast(
            pc.count_substring_regex(arr, r"\S"), pa.int64()), 0) \
            .to_numpy(zero_copy_only=False)
        n_punct = pc.fill_null(pc.cast(
            pc.count_substring_regex(arr, self.PUNCT), pa.int64()), 0) \
            .to_numpy(zero_copy_only=False)
        text_len = pc.fill_null(pc.cast(pc.utf8_length(arr), pa.int64()), 0) \
            .to_numpy(zero_copy_only=False)
        has = n_tok > 0
        denom = np.where(has, n_tok, 1).astype(np.float64)
        stop_ratio = np.where(has, sw / denom, 0.0)
        mean_len = np.where(has, nonws_chars / denom, 0.0)
        punct_ratio = np.where(has, n_punct / np.maximum(1, text_len), 0.0)
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
    """Appends ``lang_pred``: stopword-marker + Han-script heuristic.

    Vectorized: one split/flatten pass, marker lookup via ``pc.index_in``
    against the combined marker vocabulary, DISTINCT (row, marker) pairs via
    ``np.unique`` on a fused key, per-language hit counts via ``np.add.at``,
    first-max-wins argmax in the declaration order (en > de > fr > es —
    exactly the per-row strict-``>`` loop's tie-break)."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self.markers = {k: v for k, v in _LANG_MARKERS.items()}
        self.langs = [l for l in self.markers if self.markers[l]]
        vocab, lang_of = [], []
        for li, lang in enumerate(self.langs):
            for w in sorted(self.markers[lang]):
                vocab.append(w)
                lang_of.append(li)
        self.vocab = pa.array(vocab, type=pa.string())
        self.lang_of = np.asarray(lang_of, dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        arr = _as_array(batch[self.text_column])
        n = batch.num_rows
        _, flat, parent = split_tokens_arrow(arr, lower=True, limit=200)
        vid = pc.index_in(flat, value_set=self.vocab) \
            .to_numpy(zero_copy_only=False)          # float64 with NaN misses
        hit = ~np.isnan(vid)
        V = len(self.vocab)
        # distinct (row, marker) pairs: the heuristic counts each marker once
        pair = np.unique(parent[hit] * V + vid[hit].astype(np.int64))
        hits = np.zeros((n, len(self.langs)), dtype=np.int64)
        np.add.at(hits, (pair // V, self.lang_of[pair % V]), 1)
        best = np.argmax(hits, axis=1)               # first max wins
        preds = np.asarray(self.langs, dtype=object)[best]
        han = pc.fill_null(
            pc.match_substring_regex(arr, r"[\x{4e00}-\x{9fff}]"), False) \
            .to_numpy(zero_copy_only=False)
        preds[han] = "zh"
        # null / empty text predicts null (per-row path parity)
        empty = pc.fill_null(pc.equal(arr, ""), True).to_numpy(zero_copy_only=False)
        preds = preds.tolist()
        for i in np.nonzero(empty)[0]:
            preds[i] = None
        return batch.append_column("lang_pred", pa.array(preds, type=pa.string()))


class PiiRedactor:
    """Appends ``text_redacted`` plus per-row match counts for the classic
    training-data PII scrub: email addresses and long digit runs (phone-ish).
    Pure RE2 kernel passes (``replace_substring_regex`` +
    ``count_substring_regex``) — no per-row Python.  Patterns are
    DuckDB-compatible (both engines are RE2) so the stage is SQL-oracle-able
    on data that contains PII-shaped strings."""

    EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    PHONEISH = r"\+?[0-9][0-9 ()./-]{6,}[0-9]"

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        arr = batch[self.text_column]
        red = pc.replace_substring_regex(arr, self.EMAIL,
                                         replacement="<EMAIL>")
        red = pc.replace_substring_regex(red, self.PHONEISH,
                                         replacement="<PHONE>")
        n_email = pc.fill_null(pc.cast(
            pc.count_substring_regex(arr, self.EMAIL), pa.int64()), 0)
        n_phone = pc.fill_null(pc.cast(
            pc.count_substring_regex(arr, self.PHONEISH), pa.int64()), 0)
        return (batch.append_column("text_redacted", red)
                     .append_column("n_emails", n_email)
                     .append_column("n_phoneish", n_phone))


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
_SHINGLE_MIX_ARR = np.array(_SHINGLE_MIX, dtype=np.uint64)


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


def batch_shingle_hashes(texts, n_shingle: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized shingle hashes for a WHOLE batch — no Python loop over
    rows or tokens.  One Arrow split/flatten pass, one vectorized
    ``_hash64`` over the flat token stream, then shingle combination
    h(s_i) = XOR_j h(tok_{i+j}) * MIX_j via shifted slices of the flat
    array with a row-boundary mask (a window is valid iff its first and
    last token share a parent row); rows with 0 < len < n_shingle collapse
    to one combined hash via ``np.bitwise_xor.reduceat``.  Blank/null rows
    yield zero shingles (tokenize() parity).

    Returns (flat_shingle_hashes uint64, row_offsets int64[n_rows+1]) —
    row i's shingles are flat[offsets[i]:offsets[i+1]]."""
    import pyarrow.compute as pc

    from ..state.sketches import _hash64

    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array([t if t is not None else None for t in texts],
                         type=pa.string())
    arr = _as_array(texts)
    n_rows = len(arr)
    trimmed = pc.utf8_trim_whitespace(pc.utf8_lower(arr))
    blank = pc.fill_null(pc.equal(trimmed, ""), True) \
        .to_numpy(zero_copy_only=False)
    toks = pc.split_pattern_regex(trimmed, r"\s+")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    th = _hash64(flat)
    keep = ~blank[parent]                 # blank rows split to [''] — drop
    th, parent = th[keep], parent[keep]
    L = np.bincount(parent, minlength=n_rows)
    starts_row = np.concatenate([[0], np.cumsum(L)])

    N = len(th)
    par_parts, sh_parts = [], []
    if N >= n_shingle:
        W = N - n_shingle + 1
        S = np.zeros(W, dtype=np.uint64)
        for j in range(n_shingle):
            S ^= th[j:j + W] * _SHINGLE_MIX[j % len(_SHINGLE_MIX)]
        valid = parent[:W] == parent[n_shingle - 1:]
        sh_parts.append(S[valid])
        par_parts.append(parent[:W][valid])
    small_row = (L > 0) & (L < n_shingle)
    if small_row.any():
        tok_small = small_row[parent]
        pos = np.arange(N, dtype=np.int64) - starts_row[parent]
        c = th * _SHINGLE_MIX_ARR[pos % len(_SHINGLE_MIX)]
        c_small, par_tok = c[tok_small], parent[tok_small]
        seg = np.concatenate([[0], np.nonzero(np.diff(par_tok))[0] + 1])
        sh_parts.append(np.bitwise_xor.reduceat(c_small, seg))
        par_parts.append(par_tok[seg])
    if sh_parts:
        par_all = np.concatenate(par_parts)
        sh_all = np.concatenate(sh_parts)
        order = np.argsort(par_all, kind="stable")
        sh_sorted = sh_all[order]
        counts = np.bincount(par_all, minlength=n_rows)
    else:
        sh_sorted = np.zeros(0, dtype=np.uint64)
        counts = np.zeros(n_rows, dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    return sh_sorted, offsets


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
        return self.signatures([text])[0]

    def signatures(self, texts) -> np.ndarray:
        """(n_docs, num_perm) signatures for a whole batch, end-to-end
        vectorized: ONE Arrow split/flatten + ``_hash64`` pass produces every
        document's shingle hashes (``batch_shingle_hashes`` — no Python loop
        over rows OR tokens), then per-permutation (a*h + b) + segmented min
        via ``np.minimum.reduceat``.  ``texts`` is a pyarrow string column or
        a list of strings."""
        sh_flat, offsets = batch_shingle_hashes(texts, self.n_shingle)
        n_rows = len(offsets) - 1
        sigs = np.zeros((n_rows, self.num_perm), dtype=np.uint64)
        lengths = np.diff(offsets)
        nonempty = lengths > 0
        if not nonempty.any():
            return sigs
        starts = offsets[:-1][nonempty]
        ne_idx = np.nonzero(nonempty)[0]
        for p in range(self.num_perm):
            vals = sh_flat * self.a[p] + self.b[p]
            sigs[ne_idx, p] = np.minimum.reduceat(vals, starts)
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sigs = self.signatures(batch[self.text_column]) if n \
            else np.zeros((0, self.num_perm), dtype=np.uint64)
        out = batch
        for j in range(self.bands):
            band = sigs[:, j * self.rows_per_band:(j + 1) * self.rows_per_band]
            # fold the band rows into one 63-bit key
            key = np.zeros(n, dtype=np.uint64)
            for r in range(self.rows_per_band):
                key = key * np.uint64(1099511628211) + band[:, r]
            out = out.append_column(
                f"band_{j}", pa.array((key & np.uint64((1 << 63) - 1)).astype(np.int64)))
        return out


class SimHasher:
    """Appends a 64-bit ``simhash`` of the token stream; near-dups have small
    Hamming distance.  End-to-end vectorized: one Arrow split/flatten +
    ``_hash64`` pass per batch (``batch_shingle_hashes`` with n_shingle=1),
    bit votes accumulated for ALL documents at once with one segmented
    ``np.add.reduceat`` over the (tokens x 64) bit matrix."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self.bit_masks = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def simhash_batch(self, texts) -> np.ndarray:
        h_flat, offsets = batch_shingle_hashes(texts, n_shingle=1)
        n_rows = len(offsets) - 1
        out = np.zeros(n_rows, dtype=np.uint64)
        lengths = np.diff(offsets)
        nonempty = lengths > 0
        if not nonempty.any():
            return out
        starts = offsets[:-1][nonempty]
        ne_len = lengths[nonempty]
        acc = np.zeros(int(nonempty.sum()), dtype=np.uint64)
        # bit-sliced voting: one 1-D segmented sum per bit (a 2-D reduceat
        # over the (tokens x 64) bit matrix is ~200x slower)
        for b in range(64):
            bitvec = ((h_flat >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
            votes = np.add.reduceat(bitvec, starts)
            acc |= (votes * 2 > ne_len).astype(np.uint64) << np.uint64(b)
        out[nonempty] = acc
        return out & np.uint64((1 << 63) - 1)

    def simhash(self, text: str) -> int:
        return int(self.simhash_batch([text])[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "simhash", pa.array(self.simhash_batch(batch[self.text_column])
                                .astype(np.int64)))
