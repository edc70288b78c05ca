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
