"""Property test for the custom as-of join (union+window algorithm).

The operator is OUR algorithm (asof.py) rather than a Spark built-in, so it
gets the strongest check in the suite: on randomized keyed event sets, every
(direction, strict) variant must agree with an obviously-correct brute-force
reference implementation, including tie timestamps, keys with no right rows,
and duplicate timestamps on both sides.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from akka_streams_kinesis_spark.operators.asof import asof_join

T0 = datetime(2024, 1, 1)  # naive: matches Spark's collected timestamps (UTC session)

# (key, minutes-offset) pairs; tiny domains force key collisions and ties
_side = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 5)), min_size=0, max_size=8
)


def _brute_force(lefts, rights, direction, strict):
    out = []
    for i, (k, lt) in enumerate(lefts):
        if direction == "backward":
            cand = [rt for (rk, rt) in rights if rk == k and (rt < lt if strict else rt <= lt)]
            match = max(cand) if cand else None
        else:
            cand = [rt for (rk, rt) in rights if rk == k and (rt > lt if strict else rt >= lt)]
            match = min(cand) if cand else None
        out.append((i, k, lt, match))
    return sorted(out)


@pytest.mark.parametrize("direction,strict", [
    ("backward", False), ("backward", True), ("forward", False), ("forward", True),
])
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(lefts=_side, rights=_side)
def test_asof_matches_brute_force(spark, direction, strict, lefts, rights):
    left_rows = [(i, k, T0 + timedelta(minutes=m)) for i, (k, m) in enumerate(lefts)]
    right_rows = [(k, T0 + timedelta(minutes=m)) for (k, m) in rights]
    left = spark.createDataFrame(left_rows or [(0, 0, T0)], "lid long, k long, lts timestamp")
    right = spark.createDataFrame(right_rows or [(99, T0)], "k long, rts timestamp")
    if not left_rows:
        left = left.limit(0)
    if not right_rows:
        right = right.limit(0)

    got = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_payload=["rts"], strict=strict, direction=direction,
    ).collect()
    got_norm = sorted((r["lid"], r["k"], r["lts"], r["last_rts"]) for r in got)

    want = _brute_force(
        [(k, t) for (_, k, t) in left_rows],
        [(k, t) for (k, t) in right_rows],
        direction, strict,
    ) if left_rows else []
    assert got_norm == want


# ---------------------------------------------------------------------------
# nearest direction (asof_join_nearest_frame)
# ---------------------------------------------------------------------------

from akka_streams_kinesis_spark.operators.asof import asof_join_nearest_frame


def _brute_force_nearest(lefts, rights):
    out = []
    for i, (k, lt) in enumerate(lefts):
        prevs = [rt for (rk, rt) in rights if rk == k and rt <= lt]
        nexts = [rt for (rk, rt) in rights if rk == k and rt >= lt]
        prev_ts = max(prevs) if prevs else None
        next_ts = min(nexts) if nexts else None
        if prev_ts is None and next_ts is None:
            match, direction = None, None
        elif prev_ts is None:
            match, direction = next_ts, "forward"
        elif next_ts is None:
            match, direction = prev_ts, "backward"
        elif (lt - prev_ts) <= (next_ts - lt):   # tie -> backward
            match, direction = prev_ts, "backward"
        else:
            match, direction = next_ts, "forward"
        out.append((i, k, lt, match, direction))
    return sorted(out)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(lefts=_side, rights=_side)
def test_asof_nearest_matches_brute_force(spark, lefts, rights):
    left_rows = [(i, k, T0 + timedelta(minutes=m)) for i, (k, m) in enumerate(lefts)]
    right_rows = [(k, T0 + timedelta(minutes=m)) for (k, m) in rights]
    left = spark.createDataFrame(left_rows or [(0, 0, T0)], "lid long, k long, lts timestamp")
    right = spark.createDataFrame(right_rows or [(99, T0)], "k long, rts timestamp")
    if not left_rows:
        left = left.limit(0)
    if not right_rows:
        right = right.limit(0)

    got = asof_join_nearest_frame(
        left, right, on="k", left_ts="lts", right_ts="rts"
    ).collect()
    got_norm = sorted(
        (r["lid"], r["k"], r["lts"], r["nearest_ts"], r["direction"]) for r in got
    )
    want = _brute_force_nearest(
        [(k, t) for (_, k, t) in left_rows],
        [(k, t) for (k, t) in right_rows],
    ) if left_rows else []
    assert got_norm == want


def test_asof_nearest_null_key_never_matches(spark):
    """SQL/pandas semantics: a NULL join key never matches — including
    NULL-vs-NULL. A NULL-key left row must come back with NULL nearest_ts
    even when NULL-key right rows exist at the exact same timestamp."""
    left = spark.createDataFrame(
        [(0, None, T0), (1, 7, T0)], "lid long, k long, lts timestamp"
    )
    right = spark.createDataFrame(
        [(None, T0), (7, T0 + timedelta(minutes=3))], "k long, rts timestamp"
    )
    got = {
        r["lid"]: (r["nearest_ts"], r["direction"])
        for r in asof_join_nearest_frame(
            left, right, on="k", left_ts="lts", right_ts="rts"
        ).collect()
    }
    assert got[0] == (None, None)  # NULL key: no match despite same-ts NULL right
    assert got[1] == (T0 + timedelta(minutes=3), "forward")
