"""Physical-plan inspection helpers.

The engine's performance story rests on Catalyst choosing the right
physical strategy (SURVEY §4: zero custom rules — pushdown, pruning, join
selection, codegen, AQE are all built-in). These helpers make those
choices *assertable*, so tests pin them down and a regression (a filter
that stops reaching the scan, a broadcast that silently becomes a
cartesian product) fails loudly instead of shipping as a 100× slowdown at
cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def has_pushed_filter(df: DataFrame, column: str) -> bool:
    """True when a predicate on ``column`` reached the parquet scan.

    Checks the FileScan node's DataFilters/PushedFilters sections (the plan
    string elides PushedFilters on long lines, but DataFilters lists the
    same scan-level predicates)."""
    plan = physical_plan(df)
    for line in plan.splitlines():
        for marker in ("PushedFilters:", "DataFilters:"):
            if marker in line and column in line.split(marker, 1)[1]:
                return True
    return False


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns the scan actually reads (column-pruning evidence), parsed
    from the FileScan output list (the ReadSchema section gets elided on
    long plan lines)."""
    plan = physical_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        stripped = line.strip().lstrip("+-: *")
        if stripped.startswith("FileScan ") and "[" in stripped:
            inner = stripped.split("[", 1)[1].split("]", 1)[0]
            for field in inner.split(","):
                name = field.strip().split("#")[0]
                if name:
                    cols.append(name)
    return cols


def join_strategies(df: DataFrame) -> dict[str, int]:
    """Counts of join operators in the physical plan."""
    plan = physical_plan(df)
    return {
        "broadcast_hash": plan.count("BroadcastHashJoin"),
        "sort_merge": plan.count("SortMergeJoin"),
        "shuffled_hash": plan.count("ShuffledHashJoin"),
        "broadcast_nested_loop": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
    }


def num_shuffles(df: DataFrame) -> int:
    """Exchange operators in the plan (each is a full shuffle barrier)."""
    return physical_plan(df).count("Exchange ")


def uses_take_ordered(df: DataFrame) -> bool:
    """True when ORDER BY+LIMIT compiled to TakeOrdered (no global sort)."""
    return "TakeOrderedAndProject" in physical_plan(df)


def assert_scales(df: DataFrame, forbid_cartesian: bool = True) -> None:
    """Cheap guardrail for registry queries: no cartesian products."""
    if forbid_cartesian and join_strategies(df)["cartesian"]:
        raise AssertionError(f"cartesian product in plan:\n{physical_plan(df)}")


def _jplan_children(node):
    seq = node.children()
    return [seq.apply(i) for i in range(seq.size())]


def unbounded_bnlj_builds(df: DataFrame) -> list[str]:
    """Broadcast-nested-loop joins whose BUILD side is NOT provably
    constant-bounded — the registry-wide scale pin (round-9 VERDICT ask
    #5 sharpened: 40+ queries legitimately broadcast a ONE-ROW stats
    aggregate via crossJoin(broadcast(agg)), which is a
    BroadcastNestedLoopJoin in name only; the scale-killer variant is a
    BNLJ whose broadcast side can grow with the data, e.g. an equi join
    that silently lost its keys).

    Walks the physical plan tree; for every BroadcastNestedLoopJoin node,
    the child rooted at a BroadcastExchange / ReusedExchange is the build
    side, and it counts as BOUNDED when its subtree contains a
    grouping-key-less aggregate (``HashAggregate(keys=[]`` /
    ``SortAggregate(key=[]`` / ``ObjectHashAggregate(keys=[]`` — exactly
    one output row) or a literal one-row Range/LocalTableScan, or a
    row_number-limited window shortlist (WindowGroupLimit: ≤ k rows per
    key over a bounded key set, the ANN rerank pattern). Returns the
    build-side subtree strings that match NEITHER — the test asserts the
    list is empty for every non-allowlisted query."""
    import re

    out: list[str] = []

    def walk(node):
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            # the AQE wrapper hides its tree from children(); descend into
            # the initial plan (pre-execution static check)
            walk(node.initialPlan())
            return
        if "BroadcastNestedLoopJoin" in name:
            for child in _jplan_children(node):
                sub = child.toString()
                root = sub.lstrip("*() ")
                if not (
                    root.startswith("BroadcastExchange")
                    or root.startswith("ReusedExchange")
                    or root.startswith("BroadcastQueryStage")
                ):
                    continue
                bounded = (
                    "HashAggregate(keys=[]" in sub
                    or "SortAggregate(key=[]" in sub
                    or "ObjectHashAggregate(keys=[]" in sub
                    or "WindowGroupLimit" in sub
                    or re.search(r"Range \(0, 1,", sub) is not None
                    or "LocalTableScan" in sub
                )
                if not bounded:
                    out.append(sub)
        for child in _jplan_children(node):
            walk(child)

    walk(df._jdf.queryExecution().executedPlan())
    return out
