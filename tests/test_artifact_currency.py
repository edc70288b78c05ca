"""Committed correctness artifacts must cover the WHOLE registry at HEAD.

Round-5 verdict: the full-registry artifacts lagged the registry (224/227)
because three Wave-4 queries were added after the last refresh. This test
pins artifact-name-set == registry-name-set so the drift can't be committed
again — adding a query without re-running
``scripts/driver_sim.py --json CORRECTNESS_LOCAL_full.json`` (sf0.01) and
the sf0.1 twin turns the suite red.
"""

from __future__ import annotations

import json
import os

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_FULL_ARTIFACTS = [
    "CORRECTNESS_LOCAL_full.json",   # sf0.01, driver-schema, full registry
    "CORRECTNESS_LOCAL_sf01.json",   # sf0.1, engine session, full registry
]


def _registry_names() -> set[str]:
    import __spark_entry__ as entry

    return set(entry.queries())


@pytest.mark.parametrize("artifact", _FULL_ARTIFACTS)
def test_full_artifact_names_match_registry(artifact):
    path = os.path.join(_REPO, artifact)
    assert os.path.exists(path), (
        f"{artifact} missing — run scripts/driver_sim.py --json {artifact}"
    )
    with open(path) as f:
        rows = json.load(f)
    names = set(rows)
    registry = _registry_names()
    missing = sorted(registry - names)
    extra = sorted(names - registry)
    assert not missing and not extra, (
        f"{artifact} is stale: missing={missing[:5]} extra={extra[:5]} — "
        f"re-run scripts/driver_sim.py --json {artifact} at HEAD"
    )


@pytest.mark.parametrize("artifact", _FULL_ARTIFACTS)
def test_full_artifact_is_green(artifact):
    path = os.path.join(_REPO, artifact)
    if not os.path.exists(path):
        pytest.skip(f"{artifact} missing (covered by the names test)")
    with open(path) as f:
        rows = json.load(f)
    red = sorted(
        n
        for n, v in rows.items()
        if v.get("err") or not (v.get("hash_match") or v.get("rows_match"))
    )
    assert not red, f"{artifact} has red rows: {red[:10]}"


def test_scaling_artifact_has_sf3_spot():
    """Round-9 VERDICT ask #1: the 30x scaling spot (sf3_spot) must never
    again vanish from BENCH_SCALING.json — round 8's full sweep rewrote
    the file without --merge and dropped the round-6 spot data. Pins:
    the section exists, covers the round-8/9 flagship operators, every
    exponent is recorded, and nothing is flagged super-linear."""
    path = os.path.join(_REPO, "BENCH_SCALING.json")
    if not os.path.exists(path):
        pytest.skip("BENCH_SCALING.json not generated yet")
    with open(path) as f:
        doc = json.load(f)
    assert "sf3_spot" in doc, (
        "sf3_spot dropped from BENCH_SCALING.json — scaling_canary.py must "
        "preserve side-car sections; re-run scripts/scaling_spot_sf3.py"
    )
    spot = doc["sf3_spot"]
    must_cover = {
        # round-8 flagships (VERDICT r08 ask #1)
        "agg_bitmap_exact_intersection",
        "similarity_binary_quantization",
        "graph_personalized_pagerank",
        "text_chunk_dedup_rate",
        "similarity_mips_norm_augment",
        # round-9 additions
        "graph_triangle_census_selfcheck",
        "text_bm25_ranked_retrieval",
        # round-10 (VERDICT r09 asks #3/#4/#5): the least-headroom
        # stateful operator, the new incremental-index stream, and the
        # re-planned soft-dedup weighting stay under 30x watch permanently
        "stream_session_timeout_eviction",
        "stream_ann_index_upsert",
        "curation_soft_dedup_weighting",
        # round-11: the standing-index search path + the CDC delete leg
        "similarity_standing_index_topk",
        "stream_ann_index_cdc_deletes",
    }
    missing = sorted(must_cover - set(spot["queries"]))
    assert not missing, f"sf3_spot missing flagship names: {missing}"
    assert spot["n_flagged"] == 0, f"super-linear at 30x: {spot['flagged']}"


def test_drift_sentinel_names_are_valid_headline_queries():
    """Round-10 (VERDICT r09 ask #1): the drift sentinel must reference
    real, benched queries, and its pinned history must cover exactly the
    sentinel names (plus the precomputed total)."""
    import bench

    registry = _registry_names()
    assert set(bench.DRIFT_SENTINEL) <= registry
    assert set(bench.DRIFT_SENTINEL) <= set(bench.HEADLINE)
    assert len(bench.DRIFT_SENTINEL) >= 10
    # round-10 VERDICT ask #5: every driver round since the sentinel was
    # introduced must be pinned, and the factor must chain from the
    # NEWEST one
    assert {"r08_driver", "r09_driver", "r10_driver", "r11_driver"} <= set(
        bench.SENTINEL_HISTORY
    )
    assert bench.DRIFT_BASELINE == sorted(bench.SENTINEL_HISTORY)[-1]
    for rnd, hist in bench.SENTINEL_HISTORY.items():
        names = set(hist) - {"total"}
        if not names:
            # r11_driver: the driver tail truncated the per-name section;
            # only the short-line total survived (see bench.py comment)
            assert hist["total"] > 0, rnd
            continue
        assert names == set(bench.DRIFT_SENTINEL), rnd
        assert abs(sum(hist[n] for n in names) - hist["total"]) < 0.01, rnd
    # the median factor must chain from a FULLY-per-name history entry
    med = bench.SENTINEL_HISTORY[bench.DRIFT_MEDIAN_BASELINE]
    assert set(med) - {"total"} == set(bench.DRIFT_SENTINEL)


def test_bench_summary_carries_drift_sentinel_and_shared_builds():
    """BENCH_SUMMARY.json at HEAD must be post-round-10: it carries the
    drift_sentinel section (same names as bench.DRIFT_SENTINEL, both
    pinned history rounds) and the shared_builds accounting — the two
    sections that make a driver-run bench self-interpreting without the
    builder's notes."""
    import bench

    path = os.path.join(_REPO, "BENCH_SUMMARY.json")
    assert os.path.exists(path), "BENCH_SUMMARY.json missing — run bench.py"
    with open(path) as f:
        doc = json.load(f)
    sent = doc.get("drift_sentinel")
    assert sent, "drift_sentinel section missing — re-run bench.py at HEAD"
    assert sent["names"] == bench.DRIFT_SENTINEL
    assert {"r08_driver", "r09_driver", "r10_driver", "r11_driver"} <= set(
        sent["history"]
    )
    assert sent["baseline"] == bench.DRIFT_BASELINE
    # round-12: the median factor (robust to one spiked slot) must be
    # present alongside the total-ratio
    assert "drift_factor_median" in sent
    assert sent["median_baseline"] == bench.DRIFT_MEDIAN_BASELINE
    # a committed full-run summary at the baseline sf must carry a real
    # factor; a null one must explain itself
    assert (
        sent["drift_factor"] is not None
        or sent["drift_factor_reason"]
    )
    assert "shared_builds" in doc and "shared_builds_total" in doc
