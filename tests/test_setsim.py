"""Exact set-similarity joins (prefix-filtered n-gram Jaccard + asymmetric
containment) verified against brute-force set arithmetic, plus the
documents-corpus synthesizer's determinism and planted-duplicate structure."""
import numpy as np
import pyarrow as pa
import pytest

from json_schema_validate_ray.pipelines.dedup import (
    containment_pairs, ngram_jaccard_pairs)
from json_schema_validate_ray.sources.documents import (
    CLUSTER, DUP_PCT, synth_documents_partition)
from json_schema_validate_ray.stages.text import _token_hashes


def _brute_pairs(texts, ids, threshold, metric):
    """All-pairs exact metric over distinct 3-shingle hash sets."""
    sets = {i: frozenset(_token_hashes(t or "", 3).tolist())
            for i, t in zip(ids, texts)}
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            if metric == "jaccard":
                m = len(sa & sb) / len(sa | sb)
                if m >= threshold:
                    key = tuple(sorted((str(a), str(b))))
                    out[key] = int(np.floor(m * 1e6 + 0.5))
            else:  # containment, smaller set first (ties by id)
                if (len(sa), str(a)) <= (len(sb), str(b)):
                    sm, bg, ks, kb = sa, sb, str(a), str(b)
                else:
                    sm, bg, ks, kb = sb, sa, str(b), str(a)
                m = len(sm & bg) / len(sm)
                if m >= threshold:
                    out[(ks, kb)] = int(np.floor(m * 1e6 + 0.5))
    return out


def _near_dup_corpus(seed=3, n=400):
    """Texts with planted near-dups, exact dups, containments, uniques."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i:03d}" for i in range(120)]
    texts, ids = [], []
    base_docs = []
    for d in range(n // 4):
        L = int(rng.integers(10, 60))
        base_docs.append(" ".join(rng.choice(vocab, size=L)))
    for d, base in enumerate(base_docs):
        texts.append(base)
        ids.append(4 * d)
        words = base.split()
        kind = d % 4
        if kind == 0:          # near-dup: perturb ~8% of words
            w = list(words)
            for p in rng.choice(len(w), size=max(1, len(w) // 12),
                                replace=False):
                w[p] = str(rng.choice(vocab))
            texts.append(" ".join(w))
        elif kind == 1:        # exact dup
            texts.append(base)
        elif kind == 2:        # contained: a contiguous 60% slice
            lo = int(rng.integers(0, max(1, len(words) // 3)))
            texts.append(" ".join(words[lo:lo + max(4, len(words) * 3 // 5)]))
        else:                  # unrelated
            L = int(rng.integers(10, 60))
            texts.append(" ".join(rng.choice(vocab, size=L)))
        ids.append(4 * d + 1)
    return texts, ids


@pytest.mark.parametrize("threshold", [0.5, 0.8])
def test_ngram_jaccard_exact_vs_brute(ray_session, threshold):
    import ray.data as rd
    texts, ids = _near_dup_corpus()
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                                 "text": pa.array(texts, type=pa.string())}))
    got = {(r["id_a"], r["id_b"]): r["jaccard_1e6"]
           for r in ngram_jaccard_pairs(ds, "text", "doc_id",
                                        threshold=threshold).take_all()}
    want = _brute_pairs(texts, ids, threshold, "jaccard")
    assert got == want and len(want) > 10


def test_containment_exact_vs_brute(ray_session):
    import ray.data as rd
    texts, ids = _near_dup_corpus(seed=5)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                                 "text": pa.array(texts, type=pa.string())}))
    got = {(r["id_a"], r["id_b"]): r["containment_1e6"]
           for r in containment_pairs(ds, "text", "doc_id",
                                      threshold=0.8).take_all()}
    want = _brute_pairs(texts, ids, 0.8, "containment")
    assert got == want and len(want) > 10


def test_containment_finds_jaccard_misses(ray_session):
    """A short doc inside a long one: containment ~1.0, Jaccard << 0.5."""
    import ray.data as rd
    small = "alpha beta gamma delta epsilon zeta"
    big = small + " " + " ".join(f"x{i}" for i in range(200))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                                 "text": pa.array([small, big])}))
    jp = ngram_jaccard_pairs(ds, "text", "doc_id", threshold=0.5).take_all()
    cp = containment_pairs(ds, "text", "doc_id", threshold=0.8).take_all()
    assert jp == []
    assert len(cp) == 1 and cp[0]["id_a"] == "1" and cp[0]["id_b"] == "2"
    assert cp[0]["containment_1e6"] == 1_000_000


def test_containment_df_cap_drops_hot_shingles(ray_session):
    """With a df cap of 1 every index shingle is a stop-shingle, so the
    documented approximation finds nothing; cap=None stays exact."""
    import ray.data as rd
    texts, ids = _near_dup_corpus(seed=7, n=80)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                                 "text": pa.array(texts, type=pa.string())}))
    exact = containment_pairs(ds, "text", "doc_id", threshold=0.8).take_all()
    capped = containment_pairs(ds, "text", "doc_id", threshold=0.8,
                               df_cap=1).take_all()
    assert len(exact) > 0 and capped == []


def test_minhash_chained_join_regression(ray_session):
    """Sparse pair sets once crashed the restructured minhash_dup_pairs:
    map_groups partitions with no groups emit zero-column blocks, and Ray's
    hash-shuffle join broadcasts the first block's schema — a zero-column
    first block poisoned the candidate-fetch joins (ArrowInvalid 'no match
    for key field').  The repartitions in minhash_dup_pairs fix it; this
    pins the whole verified-pairs path on a tiny, mostly-unique corpus."""
    import ray.data as rd
    from json_schema_validate_ray.pipelines.dedup import minhash_dup_pairs
    rng = np.random.default_rng(11)
    vocab = [f"w{i:03d}" for i in range(80)]
    texts = [" ".join(rng.choice(vocab, size=25)) for _ in range(120)]
    texts[100] = texts[0]          # exactly one duplicate pair
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(120)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string())}))
    # text_broadcast_limit=0 forces the join path (the default fast path
    # broadcasts candidate texts and never touches the joins)
    got = minhash_dup_pairs(ds, "text", "doc_id", threshold=0.5,
                            text_broadcast_limit=0).take_all()
    assert [(r["id_a"], r["id_b"], r["jaccard"]) for r in got] == \
        [("0", "100", 1.0)]
    fast = minhash_dup_pairs(ds, "text", "doc_id", threshold=0.5).take_all()
    assert fast == got


def test_synth_documents_deterministic_and_planted():
    t1 = synth_documents_partition(3, 4000)
    t2 = synth_documents_partition(3, 4000)
    assert t1.equals(t2)
    assert t1.column_names == ["doc_id", "text", "lang", "source", "n_chars"]
    texts = t1["text"].to_pylist()
    ids = t1["doc_id"].to_pylist()
    # measure Jaccard within each id-quad cluster
    dup = 0
    for c in range(0, len(ids) - CLUSTER, CLUSTER):
        a = frozenset(_token_hashes(texts[c], 3).tolist())
        b = frozenset(_token_hashes(texts[c + 1], 3).tolist())
        j = len(a & b) / len(a | b)
        if j >= 0.5:
            dup += 1
    frac = dup / (len(ids) // CLUSTER)
    assert abs(frac - DUP_PCT / 100) < 0.05


def test_synth_dataset_exact_rowcount_and_layout_independence():
    """ADVICE r4: synth_documents_dataset must yield exactly n_rows even
    when n_rows % n_partitions != 0, and content must be a pure function of
    the doc id — independent of the partition layout."""
    import pyarrow.compute as pc

    from json_schema_validate_ray.sources.documents import (
        synth_documents_dataset)

    ds = synth_documents_dataset(1001, n_partitions=7, seed=5)
    t = ds.take_all()
    assert len(t) == 1001
    ids = sorted(r["doc_id"] for r in t)
    assert ids == list(range(1001))                 # contiguous, no gaps

    # same rows regardless of how many partitions generated them
    t2 = synth_documents_dataset(1001, n_partitions=3, seed=5).take_all()
    by_id = {r["doc_id"]: r["text"] for r in t}
    by_id2 = {r["doc_id"]: r["text"] for r in t2}
    assert by_id == by_id2

    # degenerate: fewer rows than partitions still yields exactly n_rows
    t3 = synth_documents_dataset(5, n_partitions=64, seed=5).take_all()
    assert sorted(r["doc_id"] for r in t3) == list(range(5))


# ---------------------------------------------------------------------------
# Tiled pair enumeration (verdict r4 #1): equivalence + bounded memory
# ---------------------------------------------------------------------------

def _untiled_triangle(labels, ns, ps, threshold):
    """The pre-tiling reference: one O(k^2) triu_indices materialization."""
    k = len(labels)
    iu, ju = np.triu_indices(k, 1)
    na, nb = ns[iu], ns[ju]
    ok = np.minimum(na, nb) >= threshold * np.maximum(na, nb)
    ub = 1 + np.minimum(na - ps[iu], nb - ps[ju])
    need = np.ceil((threshold / (1.0 + threshold)) * (na + nb))
    ok &= ub >= need
    ok &= labels[iu] != labels[ju]
    return set(zip(labels[iu][ok], labels[ju][ok]))


def _untiled_cross(la, lb, ra, rb, na, nb, pa_, pb_, threshold):
    ii = np.repeat(np.arange(len(la)), len(lb))
    jj = np.tile(np.arange(len(lb)), len(la))
    ok = (na[ii] < nb[jj]) | ((na[ii] == nb[jj]) & (ra[ii] < rb[jj]))
    ub = 1 + np.minimum(na[ii] - pa_[ii], nb[jj] - pb_[jj])
    ok &= ub >= np.ceil(threshold * na[ii])
    return set(zip(la[ii][ok], lb[jj][ok]))


def _rand_group(rng, k):
    labels = np.array(sorted(f"d{int(x):06d}" for x in rng.permutation(k)))
    ns = rng.integers(5, 120, size=k).astype(np.int64)
    # pos must be < prefix length <= ns; keep it small like real emissions
    ps = (rng.random(size=k) * np.minimum(ns, 1 + ns // 2)).astype(np.int64)
    return labels, ns, ps


def test_tiled_triangle_matches_untiled():
    from json_schema_validate_ray.pipelines.dedup import (
        _triangle_candidate_pairs)
    rng = np.random.default_rng(11)
    for k in (1, 2, 3, 50, 257, 1000):
        labels, ns, ps = _rand_group(rng, k)
        for t in (0.3, 0.5, 0.8):
            ref = _untiled_triangle(labels, ns, ps, t)
            for tile in (7, 64, 4096):
                a, b = _triangle_candidate_pairs(labels, ns, ps, t,
                                                 tile=tile)
                got = set(zip(np.concatenate(a) if a else [],
                              np.concatenate(b) if b else []))
                assert got == ref, (k, t, tile)
                # orientation invariant: ascending label order
                assert all(x < y for x, y in got)


def test_tiled_cross_matches_untiled():
    from json_schema_validate_ray.pipelines.dedup import (
        _cross_candidate_pairs)
    rng = np.random.default_rng(13)
    for kp, ki in ((1, 1), (40, 90), (257, 311)):
        ra = np.sort(rng.choice(10_000, size=kp, replace=False))
        rb = np.sort(rng.choice(10_000, size=ki, replace=False))
        la = np.array([str(x) for x in ra])
        lb = np.array([str(x) for x in rb])
        na = rng.integers(5, 120, size=kp).astype(np.int64)
        nb = rng.integers(5, 120, size=ki).astype(np.int64)
        pa_ = (rng.random(size=kp) * np.minimum(na, 20)).astype(np.int64)
        pb_ = (rng.random(size=ki) * nb).astype(np.int64)
        for t in (0.5, 0.8):
            ref = _untiled_cross(la, lb, ra, rb, na, nb, pa_, pb_, t)
            for tile in (16, 4096):
                a, b = _cross_candidate_pairs(la, lb, ra, rb, na, nb,
                                              pa_, pb_, t, tile=tile)
                got = set(zip(np.concatenate(a) if a else [],
                              np.concatenate(b) if b else []))
                assert got == ref, (kp, ki, t, tile)


def test_hot_shingle_group_streams_in_bounded_memory():
    """A shingle shared by 50k docs whose pairs all FAIL the positional
    filter must cost O(tile) memory and near-zero enumeration (block-level
    skips), where the untiled path materialized a 1.25e9-entry triangle."""
    import time
    import tracemalloc

    from json_schema_validate_ray.pipelines.dedup import (
        _cross_candidate_pairs, _triangle_candidate_pairs)

    k = 50_000
    labels = np.array([f"d{i:06d}" for i in range(k)])
    ns = np.full(k, 100, dtype=np.int64)
    # shared shingle sits at the END of every prefix: overlap upper bound
    # 1 + (100 - 50) = 51 < need = ceil((0.5/1.5) * 200) = 67 -> all fail
    ps = np.full(k, 50, dtype=np.int64)
    tracemalloc.start()
    t0 = time.monotonic()
    a, b = _triangle_candidate_pairs(labels, ns, ps, 0.5)
    _, peak = tracemalloc.get_traced_memory()
    dt = time.monotonic() - t0
    tracemalloc.stop()
    assert not a and not b
    assert peak < 300 * 1024 * 1024, f"peak {peak/2**20:.0f} MiB"
    assert dt < 30, f"hot group took {dt:.1f}s"

    # containment: probe side positional slack too small for the need
    ra = np.arange(k, dtype=np.int64)
    tracemalloc.start()
    t0 = time.monotonic()
    a, b = _cross_candidate_pairs(labels, labels, ra, ra, ns, ns,
                                  np.full(k, 90, dtype=np.int64),
                                  np.full(k, 90, dtype=np.int64), 0.5)
    _, peak = tracemalloc.get_traced_memory()
    dt = time.monotonic() - t0
    tracemalloc.stop()
    assert not a and not b
    assert peak < 300 * 1024 * 1024, f"peak {peak/2**20:.0f} MiB"
    assert dt < 30, f"hot group took {dt:.1f}s"


def test_hot_shingle_group_with_survivors_is_tile_bounded():
    """When pairs DO survive, tiling still bounds the transient index
    arrays: survivors equal the untiled reference on a 6k-doc hot group."""
    import tracemalloc

    from json_schema_validate_ray.pipelines.dedup import (
        _triangle_candidate_pairs)

    rng = np.random.default_rng(23)
    k = 6000
    labels = np.array([f"d{i:06d}" for i in range(k)])
    ns = rng.integers(20, 40, size=k).astype(np.int64)
    ps = np.zeros(k, dtype=np.int64)        # early meets: many survive
    ref = _untiled_triangle(labels, ns, ps, 0.9)
    assert ref                              # sanity: survivors exist
    tracemalloc.start()
    a, b = _triangle_candidate_pairs(labels, ns, ps, 0.9, tile=512)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    got = set(zip(np.concatenate(a), np.concatenate(b)))
    assert got == ref
    # transient tile arrays stay small; survivors themselves dominate
    assert peak < 400 * 1024 * 1024, f"peak {peak/2**20:.0f} MiB"


def test_containment_auto_df_cap(ray_session):
    """df_cap='auto' size-derives the stop-shingle cap; on a corpus with no
    boilerplate-hot shingles the derived cap is above every df, so the
    result stays EXACT (identical to df_cap=None)."""
    import ray.data as rd
    texts, ids = _near_dup_corpus(seed=9, n=120)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                                 "text": pa.array(texts, type=pa.string())}))
    exact = sorted((r["id_a"], r["id_b"], r["containment_1e6"])
                   for r in containment_pairs(ds, "text", "doc_id",
                                              threshold=0.8).take_all())
    auto = sorted((r["id_a"], r["id_b"], r["containment_1e6"])
                  for r in containment_pairs(ds, "text", "doc_id",
                                             threshold=0.8,
                                             df_cap="auto").take_all())
    assert len(exact) > 0 and auto == exact


def test_derive_df_cap_targets_hot_tail(ray_session):
    """The derived cap sits at a power-of-two boundary that keeps hot keys
    holding > 0.5% of index rows OUT of the index."""
    import ray.data as rd
    from json_schema_validate_ray.pipelines.dedup import _derive_df_cap

    # 10_000 index rows for one boilerplate key, 1 row each for 990 others:
    # the hot key holds ~91% of rows, far over budget at any cap below it
    pkeys = np.concatenate([np.zeros(10_000, dtype=np.int64),
                            np.arange(1, 991, dtype=np.int64)])
    t = pa.table({"pkey": pa.array(pkeys, type=pa.int64()),
                  "role": pa.array(np.ones(len(pkeys), dtype=np.int8))})
    cap = _derive_df_cap(rd.from_arrow(t))
    assert cap is not None and 64 <= cap < 10_000
    # uniform census: nothing to drop, cap lands above the max df
    t2 = pa.table({"pkey": pa.array(np.arange(500, dtype=np.int64)),
                   "role": pa.array(np.ones(500, dtype=np.int8))})
    cap2 = _derive_df_cap(rd.from_arrow(t2))
    assert cap2 is not None and cap2 >= 64


def test_exact_joins_with_string_ids(ray_session):
    """String id columns drive the object-dtype lexsort path in the
    vectorized bucket emission; results must match the int-id brute
    force (ids compared as strings in both)."""
    import ray.data as rd
    texts, ids = _near_dup_corpus(seed=21, n=80)
    sids = [f"doc-{i:05d}" for i in ids]
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(sids, type=pa.string()),
                                 "text": pa.array(texts, type=pa.string())}))
    got = {(r["id_a"], r["id_b"]): r["jaccard_1e6"]
           for r in ngram_jaccard_pairs(ds, "text", "doc_id",
                                        threshold=0.5).take_all()}
    want = _brute_pairs(texts, sids, 0.5, "jaccard")
    assert got == want and len(want) > 5
    gotc = {(r["id_a"], r["id_b"]): r["containment_1e6"]
            for r in containment_pairs(ds, "text", "doc_id",
                                       threshold=0.8).take_all()}
    wantc = _brute_pairs(texts, sids, 0.8, "containment")
    assert gotc == wantc and len(wantc) > 5
