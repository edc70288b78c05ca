"""Same-machine A/B timing of a query subset against an arbitrary repo
tree (e.g. a git worktree of the previous round's HEAD), so round-over-
round comparisons can separate code changes from hardware drift.

Usage:
    python scripts/ab_bench.py /path/to/tree q1,q2,... [sf_dir]

Prints one JSON line {"tree": ..., "queries": {name: sec}, "total": sec}.
Run once per tree in separate processes (fresh JVM each, same warmup
protocol) and diff the outputs.
"""

from __future__ import annotations

import json
import os
import sys
import time

TREE = os.path.abspath(sys.argv[1])
NAMES = sys.argv[2].split(",")
SF_DIR = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

sys.path.insert(0, TREE)

from akka_streams_kinesis_spark import get_session, registry  # noqa: E402

registry.load_all()


def main() -> None:
    spark = get_session("ab-bench")
    spark.sparkContext.setLogLevel("ERROR")
    from akka_streams_kinesis_spark.io import table

    # identical warmup protocol to bench.py's steady-state preamble
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        table(spark, SF_DIR, t).limit(1).count()
    for warm in ("tpch_q1_pricing_summary", "tpch_q3_top_orders"):
        registry.QUERIES[warm](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()

    timings = {}
    for name in NAMES:
        if name not in registry.QUERIES:
            timings[name] = None  # not present in this tree
            continue
        t0 = time.perf_counter()
        try:
            registry.QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:
            timings[name] = f"ERR: {str(e)[:120]}"
        print(f"# {name}: {timings[name]}", file=sys.stderr)
    total = round(sum(t for t in timings.values() if isinstance(t, float)), 3)
    print(json.dumps({"tree": TREE, "queries": timings, "total": total}))
    spark.stop()


if __name__ == "__main__":
    main()
