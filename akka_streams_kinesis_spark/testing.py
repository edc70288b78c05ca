"""Injected fake put clients for writer tests — the Spark rendering of the
reference's fake-client seam (KinesisGraphStage.scala:20 injects putRecords;
KinesisGraphStageTest.scala:27-31 substitutes success/failing/throttled
closures).

These live in the package (not the test tree) so executor Python workers
can import them when the pickled flow deserializes.
"""

from __future__ import annotations

from .streaming.writer import THROUGHPUT_EXCEEDED


def success_client(stream, batch):
    """All records accepted; records the put batch size in error_message so
    driver-side tests can observe chunking."""
    return [{"error_code": None, "error_message": f"batch={len(batch)}"} for _ in batch]


def failing_client(stream, batch):
    """Every record fails with a non-throttle error → Left rows."""
    return [{"error_code": "InternalFailure", "error_message": "boom"} for _ in batch]


def selective_failure_client(stream, batch):
    """Deterministically rejects records whose numeric partition key is
    divisible by 10 with a non-throttle error; accepts the rest — the
    fake behind the driver-gated DLQ split (egress_writer_dlq_split)."""
    return [
        {"error_code": "InternalFailure", "error_message": "unlucky key"}
        if int(pk) % 10 == 0
        else {"error_code": None, "error_message": None}
        for pk, _ in batch
    ]


class ThrottleOnceClient:
    """Throttles every record on the first call, succeeds afterwards —
    KinesisGraphStageTest.scala:51-59."""

    def __init__(self):
        self.calls = 0

    def __call__(self, stream, batch):
        self.calls += 1
        if self.calls == 1:
            return [
                {"error_code": THROUGHPUT_EXCEEDED, "error_message": "slow down"}
                for _ in batch
            ]
        return [
            {"error_code": None, "error_message": f"retry_call={self.calls}"} for _ in batch
        ]


class SimStreamPut:
    """A put_fn that appends to a SimStream — an executor-side 'client' for
    sink→source round-trip tests."""

    def __init__(self, path):
        self.path = path

    def __call__(self, stream_name, batch):
        from .sources.kinesis_sim import SimStream

        SimStream(self.path).put_records(batch)
        return [{"error_code": None, "error_message": None} for _ in batch]


def no_sleep(_seconds):
    return None
