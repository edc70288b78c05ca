"""Bench-staleness gate: every HEADLINE query must have been actually
executed by the last full ``python bench.py`` run (round 3 shipped 4
HEADLINE additions unbenched; one of them crashed the driver bench).

Red whenever a query is appended to HEADLINE without re-running the bench
(or at minimum ``python bench.py --only <new>`` plus a full re-bench before
round end). Also pins that the recorded run was clean (no per-query errors)
and that HEADLINE only names registered queries.
"""

from __future__ import annotations

import json
import os

from akka_streams_kinesis_spark import registry

import bench

registry.load_all()

_SUMMARY = os.path.join(
    os.path.dirname(os.path.abspath(bench.__file__)), "BENCH_SUMMARY.json"
)


def test_headline_names_are_registered():
    unknown = [q for q in bench.HEADLINE if q not in registry.QUERIES]
    assert not unknown, f"HEADLINE names not in registry: {unknown}"


def test_headline_has_no_duplicates():
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_every_registry_query_is_benched_somewhere():
    """The bench-selection rule is an exact partition, not a judgment
    call: HEADLINE ∪ STREAM_SECTION == registry, disjoint, and the
    membership predicate is the stream_ name prefix (streaming-runtime
    drains are throughput-benched; everything else is latency-benched).
    A new registry query lands red here until it is placed."""
    hl, ss = set(bench.HEADLINE), set(bench.STREAM_SECTION)
    assert not hl & ss, f"queries in both sections: {sorted(hl & ss)}"
    missing = set(registry.QUERIES) - hl - ss
    assert not missing, f"registry queries in neither bench section: {sorted(missing)}"
    extra = (hl | ss) - set(registry.QUERIES)
    assert not extra, f"benched names not in registry: {sorted(extra)}"
    assert ss == {q for q in registry.QUERIES if q.startswith("stream_")}
    assert not [q for q in hl if q.startswith("stream_")]


def test_bench_summary_covers_every_stream_query():
    with open(_SUMMARY) as f:
        summary = json.load(f)
    ran = set(summary.get("stream_rates", {})) | set(summary.get("errors", {}))
    missing = [q for q in bench.STREAM_SECTION if q not in ran]
    assert not missing, (
        f"STREAM_SECTION queries never benched (run a full `python bench.py`): {missing}"
    )


def test_bench_summary_covers_every_headline_query():
    with open(_SUMMARY) as f:
        summary = json.load(f)
    ran = set(summary.get("queries", {})) | set(summary.get("errors", {}))
    missing = [q for q in bench.HEADLINE if q not in ran]
    assert not missing, (
        f"HEADLINE queries never benched (run `python bench.py --only "
        f"{','.join(missing)}` then a full `python bench.py`): {missing}"
    )


def test_last_bench_run_was_clean():
    with open(_SUMMARY) as f:
        summary = json.load(f)
    assert not summary.get("errors"), (
        f"last full bench recorded per-query errors: {summary['errors']}"
    )
