"""End-to-end curation pipeline (pipelines/curate): mixture filter ->
near-dup survivors -> sequence packing, plus the one-row summary."""

import pyarrow as pa

from json_schema_validate_ray.pipelines.curate import (
    curate_corpus,
    curate_run,
    curate_summary,
    mixture_filter,
)


def _corpus():
    import ray.data as rd
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",     # near-dup pair
        "completely different content about ray data engines",
        "unique text one with no resemblance to anything else at all",
        "unique second text nothing shared with other documents here",
        "entirely separate third standalone document text body",
    ]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(6)), type=pa.int64()),
        "lang": pa.array(["en", "en", "de", "de", "fr", "fr"]),
        "text": pa.array(texts),
    }))


def test_mixture_filter_rates(ray_session):
    # rate 0 for en drops both en docs; 100 keeps the rest
    out = mixture_filter(_corpus(), rates={"en": 0}).take_all()
    assert sorted(r["doc_id"] for r in out) == [2, 3, 4, 5]
    # rate 100 everywhere keeps everything (band < 100 always)
    assert len(mixture_filter(_corpus(), rates={}).take_all()) == 6


def test_curate_corpus_dedups_and_packs(ray_session):
    packed = curate_corpus(_corpus(), mix_rates={}, threshold=0.5,
                           capacity=16).take_all()
    ids = sorted(r["doc_id"] for r in packed)
    assert ids == [0, 2, 3, 4, 5]          # doc 1 removed as near-dup of 0
    by_id = {r["doc_id"]: r for r in packed}
    assert by_id[0]["bin_id"] == 0
    # bins are contiguous from 0
    bins = {r["bin_id"] for r in packed}
    assert bins == set(range(max(bins) + 1))


def test_curate_summary_consistency(ray_session):
    row = curate_summary(_corpus(), mix_rates={"en": 0}, threshold=0.5,
                         capacity=16).to_pylist()[0]
    assert row["n_input"] == 6
    assert row["n_after_mix"] == 4
    # the near-dup pair was entirely en, so nothing to dedup afterwards
    assert row["n_after_dedup"] == 4
    assert row["n_bins"] >= 1
    # fill can exceed 1.0: a doc that STARTS in the last bin may spill past
    # it (streaming packing), so total_tokens may exceed n_bins * capacity
    assert row["fill_rate_1e6"] > 0
    assert row["total_tokens"] == sum(
        len(t.split()) for t in ["completely different content about ray data engines",
                                 "unique text one with no resemblance to anything else at all",
                                 "unique second text nothing shared with other documents here",
                                 "entirely separate third standalone document text body"])


def test_curate_run_single_execution_matches_summary(ray_session):
    # curate_run returns (packed, summary) from ONE pipeline execution; the
    # summary must equal what curate_summary computes, and the packed rows
    # must be the ones the summary accounts for.
    packed, summary = curate_run(_corpus(), mix_rates={"en": 0},
                                 threshold=0.5, capacity=16)
    row = summary.to_pylist()[0]
    want = curate_summary(_corpus(), mix_rates={"en": 0}, threshold=0.5,
                          capacity=16).to_pylist()[0]
    assert row == want
    rows = packed.take_all()
    assert len(rows) == row["n_after_dedup"]
    assert sum(r["n_tokens"] for r in rows) == row["total_tokens"]


def test_fast_band_mixture(ray_session):
    # the vectorized production band obeys the same operator contract:
    # rate 0 drops the language, rate 100 keeps it, output deterministic
    out1 = mixture_filter(_corpus(), rates={"en": 0},
                          band="fast").take_all()
    out2 = mixture_filter(_corpus(), rates={"en": 0},
                          band="fast").take_all()
    assert sorted(r["doc_id"] for r in out1) == [2, 3, 4, 5]
    assert sorted(r["doc_id"] for r in out1) == sorted(
        r["doc_id"] for r in out2)
    assert len(mixture_filter(_corpus(), rates={},
                              band="fast").take_all()) == 6
    # full curation composes with the fast band
    row = curate_summary(_corpus(), mix_rates={"en": 0}, threshold=0.5,
                         capacity=16, band="fast").to_pylist()[0]
    assert row["n_input"] == 6 and row["n_after_mix"] == 4


def test_curate_checkpointed_kill_and_resume(ray_session, tmp_path):
    """verdict r4 #9: a second run resumes every finished stage; deleting
    one stage's manifest recomputes ONLY that stage; results identical to
    the single-shot curate_run."""
    import ray.data as rd

    from json_schema_validate_ray.pipelines.curate import (
        curate_run, curate_run_checkpointed)

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "lang", "text"])
    ck = str(tmp_path / "ckpt")
    rates = {"en": 30, "zh": 50}

    packed1, sum1, log1 = curate_run_checkpointed(
        ds, ck, mix_rates=rates, threshold=0.5, capacity=2048)
    assert log1 == {"counts": "computed", "removed": "computed",
                    "packed": "computed"}

    # single-shot reference: identical summary
    _, ref = curate_run(ds, mix_rates=rates, threshold=0.5, capacity=2048)
    assert sum1.to_pylist() == ref.to_pylist()

    # full resume: nothing recomputes
    packed2, sum2, log2 = curate_run_checkpointed(
        ds, ck, mix_rates=rates, threshold=0.5, capacity=2048)
    assert log2 == {"counts": "resumed", "removed": "resumed",
                    "packed": "resumed"}
    assert sum2.to_pylist() == sum1.to_pylist()
    assert sorted(packed2.take_all(), key=lambda r: r["doc_id"]) == \
        sorted(packed1.take_all(), key=lambda r: r["doc_id"])

    # kill-after-dedup simulation: drop ONLY the packed manifest; the
    # expensive removed stage must stay resumed
    import os
    os.remove(os.path.join(ck, "manifest", "packed.json"))
    _, sum3, log3 = curate_run_checkpointed(
        ds, ck, mix_rates=rates, threshold=0.5, capacity=2048)
    assert log3 == {"counts": "resumed", "removed": "resumed",
                    "packed": "computed"}
    assert sum3.to_pylist() == sum1.to_pylist()

    # torn-write simulation: a .tmp parquet dir without its manifest is
    # invisible and simply overwritten
    os.remove(os.path.join(ck, "manifest", "removed.json"))
    os.makedirs(os.path.join(ck, "removed_ids.tmp"), exist_ok=True)
    _, sum4, log4 = curate_run_checkpointed(
        ds, ck, mix_rates=rates, threshold=0.5, capacity=2048)
    assert log4["removed"] == "computed"
    assert sum4.to_pylist() == sum1.to_pylist()
