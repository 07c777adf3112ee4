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
