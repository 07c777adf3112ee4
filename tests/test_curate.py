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
