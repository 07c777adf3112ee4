"""Unit tests for text-analysis, dedup, similarity and multimodal stages."""

import numpy as np
import pyarrow as pa
import pytest

from json_schema_validate_ray.pipelines.dedup import jaccard
from json_schema_validate_ray.stages.multimodal import (
    DecodeUnavailable,
    FrameSampler,
    MediaFeatureExtractor,
    _decode_image_real,
    synth_media_batch,
)
from json_schema_validate_ray.stages.text import (
    Fingerprinter,
    LanguageId,
    MinHasher,
    PiiRedactor,
    QualityScorer,
    SimHasher,
    TokenCounter,
    tokenize,
)


def _docs(texts, ids=None):
    ids = ids or [f"d{i}" for i in range(len(texts))]
    return pa.table({"doc_id": pa.array(ids, type=pa.string()),
                     "text": pa.array(texts, type=pa.string())})


def test_tokenize_matches_sql_semantics():
    assert tokenize("a b  c ") == ["a", "b", "c"]
    assert tokenize("") == []
    assert tokenize("   ") == []
    assert tokenize("one") == ["one"]


def test_token_counter():
    out = TokenCounter()(_docs(["a b c", "", "hello,world 42"]))
    assert out["n_tokens"].to_pylist() == [3, 0, 2]
    assert out["n_bpe_ish"].to_pylist()[2] == 5  # hello , world 4 2


def test_quality_scorer_ranges():
    out = QualityScorer()(_docs(["the cat sat on the mat", "!!!!", ""]))
    scores = out["quality_score"].to_pylist()
    assert all(0 <= s <= 1 for s in scores)
    assert out["stopword_ratio"].to_pylist()[0] == pytest.approx(2 / 6, abs=1e-3)
    assert scores[0] > scores[1]


def test_language_id_heuristic():
    out = LanguageId()(_docs([
        "the cat and the dog of a house",
        "der Hund und die Katze ist nicht da",
        "le chat est dans la maison et les arbres",
        "el gato es un animal que vive con los perros",
        "这是一个中文句子",
    ]))
    assert out["lang_pred"].to_pylist() == ["en", "de", "fr", "es", "zh"]


def test_pii_redactor():
    out = PiiRedactor()(_docs([
        "contact bob.smith+x@example.co.uk today",
        "call +1 (415) 555-0199 or 020-7946-0958 now",
        "no pii here",
        "",
    ]))
    red = out["text_redacted"].to_pylist()
    assert red[0] == "contact <EMAIL> today"
    assert red[1] == "call <PHONE> or <PHONE> now"
    assert red[2] == "no pii here"
    assert out["n_emails"].to_pylist() == [1, 0, 0, 0]
    assert out["n_phoneish"].to_pylist() == [0, 2, 0, 0]


def test_fingerprinter_matches_md5():
    import hashlib
    out = Fingerprinter()(_docs(["hello world"]))
    assert out["fingerprint"][0].as_py() == hashlib.md5(b"hello world").hexdigest()
    assert out["rolling_hash"][0].as_py() >= 0


def test_minhash_near_dups_share_bands():
    base = "the quick brown fox jumps over the lazy dog " * 10
    near = base.replace("lazy", "sleepy", 1)
    far = "completely different content about distributed systems " * 10
    mh = MinHasher()
    out = mh(_docs([base, near, far]))
    shared_near = sum(out[f"band_{j}"][0].as_py() == out[f"band_{j}"][1].as_py()
                      for j in range(mh.bands))
    shared_far = sum(out[f"band_{j}"][0].as_py() == out[f"band_{j}"][2].as_py()
                     for j in range(mh.bands))
    assert shared_near >= 1
    assert shared_far == 0


def test_minhash_deterministic():
    mh1, mh2 = MinHasher(), MinHasher()
    t = "some stable text for hashing determinism checks"
    assert np.array_equal(mh1.signature(t), mh2.signature(t))


def test_simhash_hamming():
    sh = SimHasher()
    base = "the quick brown fox jumps over the lazy dog " * 5
    near = base.replace("dog", "cat")
    far = "unrelated words entirely disjoint vocabulary set " * 5
    h0, h1, h2 = (sh.simhash(t) for t in (base, near, far))
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(h0, h1) < ham(h0, h2)


def test_jaccard():
    assert jaccard("a b c d e", "a b c d e") == 1.0
    assert jaccard("a b c d e", "v w x y z") == 0.0
    assert 0 < jaccard("a b c d e f g", "a b c d e f zzz") < 1


def test_media_feature_extractor_contract():
    media = synth_media_batch(_docs(["hello", "world!"]))
    out = MediaFeatureExtractor()(media)
    assert out["payload_bytes"].to_pylist() == [5, 6]
    feats = out["features"].to_pylist()
    assert len(feats[0]) == 16
    # deterministic fake decode
    out2 = MediaFeatureExtractor()(media)
    assert feats == out2["features"].to_pylist()


def test_real_decode_is_stubbed():
    with pytest.raises(DecodeUnavailable):
        _decode_image_real(b"\x89PNG")


def test_frame_sampler_explodes():
    media = synth_media_batch(_docs(["abc"]))
    out = FrameSampler(n_frames=3)(media)
    assert out.num_rows == 3
    assert out["frame_idx"].to_pylist() == [0, 1, 2]
    assert len(out["frame"][0].as_py()) == 8 * 8 * 3


def test_json_doc_validator_error_parity():
    """The actor stage's errors column must byte-match the per-document API
    (the reference's jsonschema_validate raw-text rendering)."""
    import json
    import pyarrow as pa
    from json_schema_validate_ray import jsonschema_validate_text
    from json_schema_validate_ray.stages.validator import JsonDocValidator

    schema = {"type": "object", "required": ["k"],
              "properties": {"k": {"type": "integer", "minimum": 0, "maximum": 10}}}
    docs = ['{"k": 5}', '{}', '{"k": 99}', '{"k": "x"}', 'not json', None]
    batch = pa.table({"id": list(range(len(docs))),
                      "props": pa.array(docs, type=pa.string())})
    out = JsonDocValidator(schema, "props", id_column="id", emit_errors=True)(batch)
    for doc, valid, errs in zip(docs, out["valid"].to_pylist(),
                                out["errors"].to_pylist()):
        if doc is None:
            assert valid is None and errs is None
            continue
        try:
            json.loads(doc)
        except ValueError:
            assert valid is False
            continue
        assert errs == jsonschema_validate_text(doc, schema)
        assert valid is (errs == "[]")


def test_compiled_schema_roundtrip():
    from json_schema_validate_ray import jsonschema_compile, jsonschema_is_valid
    import pickle
    c = jsonschema_compile('{"type": "object", "properties": {"a": {"pattern": "^x"}}}')
    assert '"pattern"' in c.to_json()
    c2 = pickle.loads(pickle.dumps(c))        # actor-broadcast path
    assert jsonschema_is_valid('{"a": "xy"}', c2) is True
    assert jsonschema_is_valid('{"a": "zz"}', c2) is False


def test_row_parity_validator_matches_table_plan():
    from json_schema_validate_ray.pipelines.schemas import TOKENS_SCHEMA
    from json_schema_validate_ray.sources.tokens import synth_tokens_partition
    from json_schema_validate_ray.stages.validator import RowParityValidator
    from json_schema_validate_ray.stages.vectorized import TablePlan

    batch = synth_tokens_partition(5, 2000, seed=42)
    out = RowParityValidator(TOKENS_SCHEMA, id_column="doc_id")(batch)
    plan_valid, _ = TablePlan(TOKENS_SCHEMA).evaluate_batch(batch)
    assert out["valid"].to_pylist() == plan_valid.tolist()
    assert out.column_names == ["doc_id", "valid"]


def test_minhash_batch_signatures_identical():
    """The vectorized batch path (signatures) must produce byte-identical
    band keys to the per-document path (signature) — pins VERDICT fix #4."""
    import numpy as np
    from json_schema_validate_ray.stages.text import MinHasher
    mh = MinHasher()
    texts = ["the quick brown fox", "", "one", "two words",
             "a much longer document with many repeated words " * 5,
             "the quick brown fox"]
    batch = mh.signatures(texts)
    per_doc = np.stack([MinHasher().signature(t) for t in texts])
    assert np.array_equal(batch, per_doc)


def test_media_resizer_contract():
    import numpy as np
    import pyarrow as pa
    from json_schema_validate_ray.stages.multimodal import (
        MediaResizer, synth_media_batch, _fake_decode)
    src = pa.table({"doc_id": ["1", "2"], "text": ["hello world", "abc"]})
    media = synth_media_batch(src)
    out = MediaResizer(target_h=16, target_w=16)(media)
    assert out["width"].to_pylist() == [16, 16]
    assert out["height"].to_pylist() == [16, 16]
    for p, orig in zip(out["payload_resized"].to_pylist(),
                       media["payload"].to_pylist()):
        px = np.frombuffer(p, dtype=np.uint8).reshape(16, 16, 3)
        # nearest-neighbor of the deterministic fake decode is reproducible
        base = _fake_decode(orig)
        rows = (np.arange(16) * base.shape[0] // 16)
        cols = (np.arange(16) * base.shape[1] // 16)
        assert np.array_equal(px, base[rows[:, None], cols[None, :]])


def test_decontaminate_exact_and_bloom(ray_session):
    import ray.data as rd
    from json_schema_validate_ray.pipelines.decontaminate import decontaminate

    bench = rd.from_arrow(pa.table({
        "doc_id": ["b1", "b2"],
        "text": ["the quick brown fox jumps over", "hello wide world"],
    }))
    train = rd.from_arrow(pa.table({
        "doc_id": ["t1", "t2", "t3", "t4", "t5"],
        "text": [
            "a sentence with the quick brown fox inside it",  # 3-gram overlap
            "totally fresh unrelated content here",            # clean
            "",                                                # blank: 0 shingles
            "hi there",                                        # <3 toks, no match
            "hello wide world",                                # exact short match
        ],
    }))
    rows = {r["doc_id"]: r for r in
            decontaminate(train, bench, "text", n_shingle=3).take_all()}
    assert rows["t1"]["contaminated"] and rows["t1"]["n_contaminated"] >= 1
    assert not rows["t2"]["contaminated"]
    assert rows["t3"]["n_shingles"] == 0 and not rows["t3"]["contaminated"]
    assert not rows["t4"]["contaminated"]
    assert rows["t5"]["contaminated"]          # whole-doc 3-gram matches

    # Bloom path: zero false negatives => flags a superset of the exact set
    brows = {r["doc_id"]: r for r in
             decontaminate(train, bench, "text", n_shingle=3,
                           bloom_fpr=1e-6).take_all()}
    for k, r in rows.items():
        if r["contaminated"]:
            assert brows[k]["contaminated"], k
            assert brows[k]["n_contaminated"] >= r["n_contaminated"]
