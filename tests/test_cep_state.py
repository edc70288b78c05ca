"""Unit tests for the streaming CEP state function (_update_cep,
streaming/stateful.py) with a fake GroupState: pins the two properties the
end-to-end oracle gate cannot isolate —

1. cross-batch folding: a session whose events arrive split across two
   micro-batches (in arbitrary arrival order) produces the same final
   totals as single-batch arrival, because the state replays the full
   accumulated history each batch;
2. session semantics: the 30-minute gap splits sessions, the pattern
   counts non-overlapping v[ce]*p runs per session, and counts are
   monotone across batches (the property the drain's max-struct pick
   relies on).
"""

from __future__ import annotations

import pandas as pd

from akka_streams_kinesis_spark.streaming.stateful import _CEP_GAP_US, _update_cep


class FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _batch(rows):
    return pd.DataFrame(
        {
            "ts": pd.to_datetime([r[0] for r in rows], unit="us"),
            "event_id": [r[1] for r in rows],
            "event_type": [r[2] for r in rows],
        }
    )


MIN_US = 60 * 1_000_000

# one user's history: session A = view,click,purchase (one match),
# session B (> 30 min later) = view,error,view,purchase (one match,
# non-overlapping leftmost: v e v p -> 'vevp' matches 'v[ce]*p' once)
EVENTS = [
    (0 * MIN_US, 1, "view"),
    (1 * MIN_US, 2, "click"),
    (2 * MIN_US, 3, "purchase"),
    (2 * MIN_US + _CEP_GAP_US + 1, 4, "view"),
    (2 * MIN_US + _CEP_GAP_US + 1 + MIN_US, 5, "error"),
    (2 * MIN_US + _CEP_GAP_US + 1 + 2 * MIN_US, 6, "view"),
    (2 * MIN_US + _CEP_GAP_US + 1 + 3 * MIN_US, 7, "purchase"),
]


def _run(batches):
    state = FakeState()
    outs = []
    for b in batches:
        outs.append(next(_update_cep((42,), iter([b]), state)))
    return outs


def test_single_batch_totals():
    (out,) = _run([_batch(EVENTS)])
    assert out["user_id"][0] == 42
    assert out["n_events"][0] == 7
    assert out["n_sessions"][0] == 2
    assert out["n_converted_sessions"][0] == 2
    assert out["n_matches"][0] == 2


def test_cross_batch_fold_equals_single_batch_even_out_of_order():
    # session A's purchase and session B's opener arrive in batch 2,
    # BEFORE session A's earlier click (arrival order != event order)
    b1 = _batch([EVENTS[0], EVENTS[4], EVENTS[6]])
    b2 = _batch([EVENTS[2], EVENTS[3], EVENTS[1], EVENTS[5]])
    out1, out2 = _run([b1, b2])
    # monotone growth across batches
    assert out1["n_events"][0] == 3
    assert out2["n_events"][0] == 7
    assert out1["n_matches"][0] <= out2["n_matches"][0]
    # final state identical to single-batch arrival
    (ref,) = _run([_batch(EVENTS)])
    for col in ("n_events", "n_sessions", "n_converted_sessions", "n_matches"):
        assert out2[col][0] == ref[col][0], col


def test_overlap_rule_nonoverlapping_leftmost():
    # 'vpvp' = two matches; 'vvp' = ONE match (leftmost v consumed greedily
    # ... v[ce]*p cannot span the middle v, so the match starts at the
    # second v — still one non-overlapping match)
    rows = [
        (0 * MIN_US, 1, "view"),
        (1 * MIN_US, 2, "purchase"),
        (2 * MIN_US, 3, "view"),
        (3 * MIN_US, 4, "purchase"),
    ]
    (out,) = _run([_batch(rows)])
    assert out["n_sessions"][0] == 1
    assert out["n_matches"][0] == 2


def test_late_event_merges_sessions_and_counts_decrease():
    # batch 1: two events > 30 min apart -> 2 sessions; batch 2 delivers a
    # LATE event between them bridging both gaps -> 1 merged session. The
    # session count legitimately DECREASES (why callers must pick the
    # final row by n_events, not max of a count column).
    a = (0 * MIN_US, 1, "view")
    late = (20 * MIN_US, 2, "click")
    b = (40 * MIN_US, 3, "purchase")
    out1, out2 = _run([_batch([a, b]), _batch([late])])
    assert out1["n_sessions"][0] == 2
    assert out2["n_sessions"][0] == 1
    assert out2["n_matches"][0] == 1  # merged 'vcp' matches once
    # equals single-batch arrival
    (ref,) = _run([_batch([a, late, b])])
    for col in ("n_events", "n_sessions", "n_converted_sessions", "n_matches"):
        assert out2[col][0] == ref[col][0], col


def test_fast_path_incremental_equals_full_replay():
    # strictly in-order arrival, one event per batch: every batch after
    # the first takes the incremental fast path; totals must equal the
    # single-batch replay at every prefix.
    for k in range(1, len(EVENTS) + 1):
        outs = _run([_batch([e]) for e in EVENTS[:k]])
        (ref,) = _run([_batch(EVENTS[:k])])
        for col in ("n_events", "n_sessions", "n_converted_sessions", "n_matches"):
            assert outs[-1][col][0] == ref[col][0], (k, col)


def test_random_batching_equals_single_batch():
    import random

    rng = random.Random(7)
    rows = []
    t = 0
    for i in range(60):
        t += rng.choice([MIN_US, 5 * MIN_US, _CEP_GAP_US + MIN_US])
        rows.append((t, i + 1, rng.choice(["view", "click", "error", "purchase"])))
    (ref,) = _run([_batch(rows)])
    for trial in range(5):
        shuffled = rows[:]
        rng.shuffle(shuffled)
        cuts = sorted(rng.sample(range(1, len(rows)), 4))
        batches = [
            _batch(shuffled[i:j])
            for i, j in zip([0] + cuts, cuts + [len(rows)])
        ]
        outs = _run(batches)
        for col in ("n_events", "n_sessions", "n_converted_sessions", "n_matches"):
            assert outs[-1][col][0] == ref[col][0], (trial, col)


def test_pre_epoch_cursor_is_not_a_sentinel():
    # regression (round-8 ADVICE): the state used -1 as the "no cursor"
    # sentinel, so a legitimate pre-epoch (negative) timestamp cursor was
    # decoded as "no cursor" and the next batch's fold skipped the gap
    # check against prior history. With the explicit has_cursor boolean,
    # pre-epoch histories fold identically to single-batch arrival.
    rows = [
        (-2 * _CEP_GAP_US, 1, "view"),
        (-2 * _CEP_GAP_US + MIN_US, 2, "purchase"),
        # > 30-min gap, still pre-epoch: must open a NEW session
        (-_CEP_GAP_US // 2, 3, "view"),
        (-_CEP_GAP_US // 2 + MIN_US, 4, "purchase"),
    ]
    outs = _run([_batch(rows[:2]), _batch(rows[2:])])
    (ref,) = _run([_batch(rows)])
    for col in ("n_events", "n_sessions", "n_converted_sessions", "n_matches"):
        assert outs[-1][col][0] == ref[col][0], col
    assert outs[-1]["n_sessions"][0] == 2
    assert outs[-1]["n_matches"][0] == 2


def test_nine_field_checkpoint_state_migrates():
    # regression (round-9 ADVICE): round 8 appended a 10th state field
    # (has_cursor); _update_cep read st[9] unconditionally, so a restart
    # from a pre-round-8 checkpoint (9-field state) crashed with an index
    # error instead of migrating. The defensive read decodes old state as
    # has_cursor=False and keeps processing.
    state = FakeState()
    out1 = next(_update_cep((42,), iter([_batch(EVENTS[:3])]), state))
    # rewrite the stored state as the OLD 9-field tuple (drop has_cursor)
    state._v = tuple(state._v)[:9]
    out2 = next(_update_cep((42,), iter([_batch(EVENTS[3:])]), state))
    assert out2["n_events"][0] == len(EVENTS)
    # totals EXACT after migration: the old cursor is discarded and the
    # retained full history is replayed (repair path), so the migrated
    # run equals a single-batch run bit-for-bit
    (ref,) = _run([_batch(EVENTS)])
    for col in ("n_events", "n_sessions", "n_converted_sessions", "n_matches"):
        assert out2[col][0] == ref[col][0], col
    assert out1["n_sessions"][0] == 1
    assert out2["n_sessions"][0] == 2
    assert out2["n_matches"][0] == 2
    # and the updated state is back on the 10-field round-8 schema
    assert len(state._v) == 10 and state._v[9] is True
