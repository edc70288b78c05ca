"""Custom stateful streaming operators via applyInPandasWithState.

The reference's sink keeps hand-rolled mutable state (buffer + in-flight
accounting, KinesisGraphStage.scala:50-51) inside an Akka stage; Spark's
equivalent extension point for arbitrary keyed state is
``applyInPandasWithState`` — Arrow-batched, checkpointed, watermark-aware.
This module ships the canonical example: per-key running aggregates that
survive micro-batch boundaries and query restarts.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUTPUT_SCHEMA = "user_id long, n_events_so_far long, total_so_far double"
_STATE_SCHEMA = "n long, total double"


def _update_running(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events_so_far": [n], "total_so_far": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) state machine: each micro-batch folds
    its rows into checkpointed per-key state and emits the updated running
    totals — one output row per active user per batch.

    State is partitioned by key across executors (the shuffle is on
    user_id), bounded by the live-key count, and recovered from the
    checkpoint on restart — the properties the reference's in-stage
    mutable buffers cannot give you past one process."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming HLL cardinality state machine
# ---------------------------------------------------------------------------

# Plain-Python HyperLogLog with md5-derived 64-bit hashes: deterministic
# across engines/runs (no JVM hash seeding), 2^p one-byte registers per
# key, register merge = max (associative, commutative, order-insensitive
# — the property that makes the stream fold independent of arrival
# order). p=12 → 4096 registers, ~1.6% standard error, well inside the
# 5% tolerance gate.
_HLL_P = 12
_HLL_M = 1 << _HLL_P

_HLL_OUTPUT_SCHEMA = "event_type string, est double"
_HLL_STATE_SCHEMA = "regs binary"


def _hll_fold(regs: bytearray, values) -> None:
    import hashlib as _hl

    shift = 64 - _HLL_P
    for v in values:
        h = int(_hl.md5(str(v).encode()).hexdigest()[:16], 16)
        idx = h >> shift
        w = h & ((1 << shift) - 1)
        # rho = position of the leftmost 1-bit in the remaining bits
        rho = shift - w.bit_length() + 1
        if rho > regs[idx]:
            regs[idx] = rho


def hll_estimate(regs: bytes) -> float:
    """Standard HLL estimator with linear-counting small-range correction."""
    m = _HLL_M
    alpha = 0.7213 / (1 + 1.079 / m)
    s = sum(2.0 ** -r for r in regs)
    est = alpha * m * m / s
    zeros = regs.count(0) if isinstance(regs, (bytes, bytearray)) else sum(
        1 for r in regs if r == 0
    )
    if est <= 2.5 * m and zeros:
        import math as _math

        est = m * _math.log(m / zeros)
    return est


def _update_hll(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    regs = bytearray(state.get[0]) if state.exists else bytearray(_HLL_M)
    for pdf in pdfs:
        _hll_fold(regs, pdf["user_id"].tolist())
    state.update((bytes(regs),))
    yield pd.DataFrame({"event_type": [key[0]], "est": [hll_estimate(regs)]})


def streaming_distinct_hll(events: DataFrame) -> DataFrame:
    """Per-event-type streaming distinct-user cardinality: each key owns a
    4 KiB HLL register array in checkpointed state; every micro-batch
    folds its users in (register max) and emits the refreshed estimate.

    The state is O(1) per live key — the streaming analog of
    agg_hll_sketch_union's "sketch locally, merge kilobytes" batch shape,
    and the reason a distinct-count dashboard over an unbounded stream
    doesn't need unbounded dedup state. Because register merge is
    commutative and idempotent, the fold is insensitive to arrival order
    and at-least-once redelivery — estimates only ratchet upward."""
    return events.groupBy("event_type").applyInPandasWithState(
        _update_hll,
        outputStructType=_HLL_OUTPUT_SCHEMA,
        stateStructType=_HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming Misra-Gries heavy-hitter state machine
# ---------------------------------------------------------------------------

# Per-key candidate capacity. The MG guarantee — every counter
# undercounts its item's true frequency by at most n_key/CAP — holds for
# ANY arrival order and any interleaving of merges, which is what makes
# the bound (not the raw counts) the right thing to gate a stream on.
_MG_STREAM_CAP = 64

_MG_OUTPUT_SCHEMA = "event_type string, state_json string, n_seen long"
_MG_STATE_SCHEMA = "counters string, n long"


def _mg_fold(counters: dict, values) -> None:
    for v in values:
        k = str(v)
        counters[k] = counters.get(k, 0) + 1
        if len(counters) > _MG_STREAM_CAP:
            d = sorted(counters.values(), reverse=True)[_MG_STREAM_CAP]
            for kk in list(counters):
                counters[kk] -= d
                if counters[kk] <= 0:
                    del counters[kk]


def _update_mg(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import json as _json

    if state.exists:
        counters, n = _json.loads(state.get[0]), state.get[1]
    else:
        counters, n = {}, 0
    for pdf in pdfs:
        _mg_fold(counters, pdf["user_id"].tolist())
        n += len(pdf)
    state.update((_json.dumps(counters), n))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "state_json": [_json.dumps(counters, sort_keys=True)],
            "n_seen": [n],
        }
    )


def streaming_heavy_hitters(events: DataFrame) -> DataFrame:
    """Per-event-type streaming heavy-hitter candidates: each key owns a
    ≤{cap}-entry Misra-Gries counter table in checkpointed state — O(1)
    state per live key, the streaming analog of the batch
    agg_heavy_hitters_topk sketch pass. Every micro-batch folds its rows
    in and emits the refreshed (counter table, rows seen) snapshot; the
    caller checks the MG bound (estimate ≤ true ≤ estimate + n/cap)
    against exact batch counts.""".format(cap=_MG_STREAM_CAP)
    return events.groupBy("event_type").applyInPandasWithState(
        _update_mg,
        outputStructType=_MG_OUTPUT_SCHEMA,
        stateStructType=_MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming CEP: per-user session pattern matching (MATCH_RECOGNIZE twin)
# ---------------------------------------------------------------------------

_CEP_OUTPUT_SCHEMA = (
    "user_id long, n_events long, n_sessions long, "
    "n_converted_sessions long, n_matches long"
)
# full per-user history (arrival order; re-sorted only on the repair path)
# plus the memoized fold cursor over the sorted prefix processed so far:
# counts of CLOSED sessions, the OPEN session's symbol string, and the
# (ts, event_id) sort key of the last folded event.
_CEP_STATE_SCHEMA = (
    "ts_us array<long>, event_id array<long>, sym array<string>, "
    "n_closed long, n_closed_conv long, n_closed_matches long, "
    "open_syms string, last_ts long, last_eid long, has_cursor boolean"
)
_CEP_GAP_US = 1800 * 1000 * 1000  # 30-minute session gap, integer µs
_CEP_PATTERN = "v[ce]*p"  # view → (clicks/errors)* → purchase
# compiled ONCE per worker interpreter — the round-6 version recompiled
# (and re-scanned the full history) every micro-batch
import re as _re_mod  # noqa: E402

_CEP_RE = _re_mod.compile(_CEP_PATTERN)


def _cep_fold(ts_sorted, sym_sorted, n_closed, n_conv, n_matches, open_syms, last_ts):
    """Fold events (already in (ts, event_id) order, all at-or-after the
    cursor) into the session state machine. Returns the updated cursor.
    Sessions close on a >30-min gap; the closing findall counts
    non-overlapping leftmost matches over the complete session string —
    identical semantics to the batch events_pattern_match_sequence."""
    parts = [open_syms] if open_syms else []
    for t, s in zip(ts_sorted, sym_sorted):
        if last_ts is not None and t - last_ts > _CEP_GAP_US:
            session = "".join(parts)
            if session:
                m = len(_CEP_RE.findall(session))
                n_closed += 1
                n_matches += m
                n_conv += 1 if m else 0
            parts = []
        parts.append(s)
        last_ts = t
    return n_closed, n_conv, n_matches, "".join(parts), last_ts


def _update_cep(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        st = state.get
        ts_us, eid, sym = list(st[0]), list(st[1]), list(st[2])
        n_closed, n_conv, n_matches = st[3], st[4], st[5]
        open_syms = st[6]
        # explicit has_cursor boolean — a negative-sentinel remap would
        # silently decode any legitimate pre-epoch (negative) timestamp
        # as "no cursor" and skip the gap check against prior history.
        # Defensive length check: pre-round-8 checkpoints carry a 9-field
        # state (no has_cursor). Decode those as "no cursor" AND force the
        # repair path below: the full event history is retained in state,
        # so one re-sort + replay reconstructs exact totals — a restart
        # from an old checkpoint migrates losslessly instead of crashing
        # on st[9] (round-9 ADVICE; checkpoint-format compatibility).
        has_cursor = bool(st[9]) if len(st) > 9 else False
        migrated = len(st) <= 9
        last_ts = int(st[7]) if has_cursor else None
        last_eid = int(st[8]) if has_cursor else None
    else:
        ts_us, eid, sym = [], [], []
        n_closed = n_conv = n_matches = 0
        open_syms, last_ts, last_eid = "", None, None
        migrated = False

    new_ts: list[int] = []
    new_eid: list[int] = []
    new_sym: list[str] = []
    for pdf in pdfs:
        # datetime64[ns] → integer microseconds (exact; matches EPOCH_US)
        new_ts.extend((pdf["ts"].astype("int64") // 1000).tolist())
        new_eid.extend(pdf["event_id"].astype("int64").tolist())
        new_sym.extend(pdf["event_type"].str[:1].tolist())

    batch = sorted(zip(new_ts, new_eid, new_sym))
    ts_us.extend(new_ts)
    eid.extend(new_eid)
    sym.extend(new_sym)

    if ts_us and (
        migrated
        or (
            batch
            and last_ts is not None
            and (batch[0][0], batch[0][1]) <= (last_ts, last_eid)
        )
    ):
        # REPAIR: a late event sorts before the fold cursor (it may merge
        # two already-counted sessions or break a match) — re-sort and
        # replay the full history. Arbitrary lateness is this drain's
        # contract (backfill file order ≠ event-time order), so no prefix
        # is ever permanently safe; the memoized cursor is an optimism
        # that this path repairs.
        order = sorted(range(len(ts_us)), key=lambda i: (ts_us[i], eid[i]))
        n_closed, n_conv, n_matches, open_syms, last_ts = _cep_fold(
            [ts_us[i] for i in order],
            [sym[i] for i in order],
            0, 0, 0, "", None,
        )
        last_eid = max(
            (eid[i] for i in order if ts_us[i] == last_ts), default=None
        )
    elif batch:
        # FAST PATH: every new event sorts after the cursor — fold only
        # the new suffix, O(|batch| log |batch|) + the open-session scan,
        # instead of the round-6 full-history re-sort + re-findall.
        n_closed, n_conv, n_matches, open_syms, last_ts = _cep_fold(
            [b[0] for b in batch], [b[2] for b in batch],
            n_closed, n_conv, n_matches, open_syms, last_ts,
        )
        last_eid = max(b[1] for b in batch if b[0] == last_ts)

    state.update(
        (
            ts_us, eid, sym,
            n_closed, n_conv, n_matches,
            open_syms,
            0 if last_ts is None else last_ts,
            0 if last_eid is None else last_eid,
            last_ts is not None,
        )
    )

    # emission folds the OPEN session in without closing it
    m_open = len(_CEP_RE.findall(open_syms)) if open_syms else 0
    has_open = 1 if open_syms else 0
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [len(ts_us)],
            "n_sessions": [n_closed + has_open],
            "n_converted_sessions": [n_conv + (1 if m_open else 0)],
            "n_matches": [n_matches + m_open],
        }
    )


def streaming_session_cep(events: DataFrame) -> DataFrame:
    """Streaming CEP (complex event processing): per-user session-bounded
    row-pattern matching maintained in checkpointed keyed state — the
    streaming twin of the batch compile-to-regex MATCH_RECOGNIZE
    (events_pattern_match_sequence). Each micro-batch folds new events
    into the user's history and emits refreshed per-user totals
    (sessions, converted sessions, pattern matches). Only ``n_events`` is
    strictly monotone per emit; the session/match counts can DECREASE
    when a late out-of-order event merges two sessions or breaks a match,
    so callers must select the final row per user by max ``n_events``
    (stream_pattern_match_cep uses ``max_by(struct, n_events)``), never
    by max of a count column.

    Per-batch cost: a memoized fold cursor (closed-session counts + the
    open session's symbol string + last (ts, event_id)) makes the common
    in-order batch O(|batch| log |batch|) plus one regex scan of the OPEN
    session only; a batch containing an event that sorts before the
    cursor triggers a full re-sort + replay (the repair path), since a
    late event can restructure already-counted sessions.

    State holds the full per-user event history because this entry drains
    a historical backfill whose FILE order is not event-time order — an
    event-time timeout would close sessions prematurely (the same
    contract note as the 35-day watermark on the stream-stream join). A
    live deployment evicts closed sessions with a GroupStateTimeout at
    gap + arrival skew, making state O(open session), not O(history)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_cep,
        outputStructType=_CEP_OUTPUT_SCHEMA,
        stateStructType=_CEP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Timeout-driven session eviction (GroupStateTimeout.EventTimeTimeout)
# ---------------------------------------------------------------------------

_SEVICT_GAP_US = 1_800_000_000  # 30-min session gap (house sessionization rule)
_SEVICT_OUTPUT_SCHEMA = "user_id long, start_us long, last_us long, n_events long"
_SEVICT_STATE_SCHEMA = "ts_us array<long>, eid array<long>"


def _sevict_sessions(evs_sorted: list) -> list:
    """[(ts_us, eid)] sorted → [(start, last, n, events)] under the 30-min
    gap rule — the same fold the batch oracle's lag+cumsum computes."""
    out = []
    start, last, n, ev = evs_sorted[0][0], evs_sorted[0][0], 1, [evs_sorted[0]]
    for ts, eid in evs_sorted[1:]:
        if ts - last > _SEVICT_GAP_US:
            out.append((start, last, n, ev))
            start, last, n, ev = ts, ts, 1, [(ts, eid)]
        else:
            last, n = ts, n + 1
            ev.append((ts, eid))
    out.append((start, last, n, ev))
    return out


def _update_session_evict(key, pdfs, state):
    """Keyed update for sessions_by_timeout — see its docstring for the
    protocol. Two paths:

    input: buffer the batch's (ts, eid) rows into state (NOTHING is
    emitted here — closure can never be proven by in-hand data alone,
    because a not-yet-arrived event with ts ≥ wm could still bridge two
    buffered sessions whose gap exceeds 30 min), then arm the event-time
    timeout at wm+1 so the key is revisited as soon as the watermark
    moves.

    timeout: sort the buffer, sessionize, emit every session whose
    last + gap < wm — the watermark proves no future event can extend or
    bridge it (arrivals carry ts ≥ wm) — keep the rest, re-arm at wm+1.

    Each session emits exactly once: emitted events leave the buffer, and
    post-emission arrivals have ts ≥ wm > last + gap, starting a new
    session by definition.
    """
    import pandas as pd

    user = int(key[0])
    wm_ms = state.getCurrentWatermarkMs()
    if state.hasTimedOut:
        ts_arr, eid_arr = state.get
        evs = sorted(zip(ts_arr, eid_arr))
        emit, keep = [], []
        for s, l, n, ev in _sevict_sessions(evs):
            if l + _SEVICT_GAP_US < wm_ms * 1000:
                emit.append((user, s, l, n))
            else:
                keep.extend(ev)
        if keep:
            state.update(
                ([int(t) for t, _ in keep], [int(e) for _, e in keep])
            )
            state.setTimeoutTimestamp(wm_ms + 1)
        else:
            state.remove()
        if emit:
            yield pd.DataFrame(
                {
                    "user_id": [e[0] for e in emit],
                    "start_us": [e[1] for e in emit],
                    "last_us": [e[2] for e in emit],
                    "n_events": [e[3] for e in emit],
                }
            )
        return
    ts_new, eid_new = [], []
    for pdf in pdfs:
        # JSON-decoded timestamps arrive as pandas datetime64; normalize to
        # exact integer MICROseconds (datetime64[ns].astype(int64) would
        # silently yield nanos — a 1000× unit bug this line pins away)
        ts_new.extend(
            int(t) for t in pdf["ts"].astype("datetime64[us]").astype("int64")
        )
        eid_new.extend(int(e) for e in pdf["event_id"])
    if state.exists:
        ts_arr, eid_arr = state.get
        ts_new.extend(int(t) for t in ts_arr)
        eid_new.extend(int(e) for e in eid_arr)
    state.update((ts_new, eid_new))
    state.setTimeoutTimestamp(wm_ms + 1)
    return
    yield  # makes the input path a generator too (consistent laziness)


def sessions_by_timeout(events: DataFrame, delay: str) -> DataFrame:
    """Gap-based session windows rebuilt on RAW GroupStateTimeout
    machinery — the timeout/timer demonstration this module's CEP
    docstring defers to ("a live deployment evicts closed sessions with a
    GroupStateTimeout"): rather than F.session_window (which hides
    eviction inside the session-window operator), every closure decision
    here is an explicit watermark proof inside keyed state, which is how
    ANY custom stateful operator with data-dependent lifetimes (auctions,
    order fulfilment, fraud windows) must be built.

    Contract: ``delay`` must be ≥ the stream's arrival skew (for the
    sliced backfill produce: one slice width), so that "future arrivals
    have ts ≥ watermark" holds — the single premise behind the emission
    proof in _update_session_evict. State is O(open + not-yet-provable
    sessions) per user ≈ delay × per-user rate — NOT O(history); that,
    plus exactly-once session emission in append mode, is what the
    timeout buys over the CEP entry's keep-everything strategy.

    Emits (user_id, start_us, last_us, n_events) per CLOSED session, in
    exact integer microseconds (ms-quantized by the JSON wire format —
    same precision note as stream_session_windows).
    """
    return events.select("user_id", "ts", "event_id").withWatermark(
        "ts", delay
    ).groupBy("user_id").applyInPandasWithState(
        _update_session_evict,
        outputStructType=_SEVICT_OUTPUT_SCHEMA,
        stateStructType=_SEVICT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
