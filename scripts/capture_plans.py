"""Capture .explain('formatted') for named queries into plans/<round>/.

Usage: python scripts/capture_plans.py before|after q1,q2,... [sf_dir]

Writes plans/$PLANS_ROUND/<query>_<tag>.txt (PLANS_ROUND defaults to r13)
for each query. Uses the bench session (engine confs) so the plan matches
what bench.py executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from akka_streams_kinesis_spark import get_session, registry  # noqa: E402

registry.load_all()

TAG = sys.argv[1]
NAMES = sys.argv[2].split(",")
SF_DIR = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("PLANS_ROUND", "r13"),
)
os.makedirs(OUT, exist_ok=True)


def main() -> None:
    spark = get_session("aks-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in NAMES:
        df = registry.QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{TAG}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"# wrote {path} ({plan.count('Exchange')} Exchange refs)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
