"""Plan lints — machine checks for scale-killing physical shapes.

``unbounded_global_windows`` guards the repo's window policy: a
``WindowExec`` with an EMPTY partition spec moves the whole input to
one task ("WARN WindowExec: No Partition Defined" at runtime), which
is fatal at 100 TB unless the input is already bounded. The repo's
sanctioned global windows are all bounded by construction —
rank-after-limit (functions/frames.py::ranked_topk runs the window
over k rows) or a 1-row global aggregate — and this lint proves that
from the plan itself: a global window is OK only if some descendant
is a limit node or a zero-grouping aggregate. Anything else (e.g. a
bucket-count-bounded grouped aggregate, whose boundedness is semantic
rather than structural) must be explicitly allowlisted by the caller
with a written justification (tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# nodes whose output is structurally bounded: the driver-k limit
# family, a driver-local literal relation (LocalTableScan — what a
# createDataFrame over a pandas frame plans; the engine's sanctioned
# literal-frame builders go through functions/frames.py::
# literal_frame precisely so they plan as this provably-bounded
# node), or an aggregate with no grouping columns (exactly one row).
#
# Deliberately NOT here (advisor findings r10):
# - ``Scan ExistingRDD``: createDataFrame(python_list) plans as this,
#   but so does ``localCheckpoint(eager=True)`` output — and the repo
#   checkpoints corpus-scale frames (CC edges/labels, corpus_increment
#   state). Blessing the node would silently wave a global window or
#   cartesian join over checkpointed DATA-SCALE input through both
#   lints. Driver-sized literal frames must use literal_frame()
#   (→ LocalTableScan) or be allowlisted by the caller.
# - ``LocalLimit``: caps rows PER PARTITION, so its output scales
#   with partition count (k x nPartitions at 100 TB); only the global
#   limit family above it is truly bounded.
_LIMIT_NODES = (
    "TakeOrderedAndProject",
    "GlobalLimit",
    "CollectLimit",
    "LocalTableScan",
    "OneRowRelation",
)


def _is_bounded(node) -> bool:
    name = node.nodeName()
    if any(name.startswith(ln) for ln in _LIMIT_NODES):
        return True
    if "Aggregate" in name:
        try:
            if node.groupingExpressions().size() == 0:
                return True
        except Exception:  # noqa: BLE001 — not a grouped-agg node
            pass
    return False


def _subtree_bounded(node) -> bool:
    """Bounded = a limit / zero-grouping aggregate, or a node ALL of
    whose children are bounded. The all-children rule is what makes a
    JOIN honest: a join with one bounded side is NOT bounded (the
    other side still streams through), whereas project/filter/sort
    over a limit, or a join of two limits, is. A leaf (scan) has no
    children and is unbounded."""
    if _is_bounded(node):
        return True
    kids = node.children()
    if kids.size() == 0:
        return False
    return all(
        _subtree_bounded(kids.apply(i)) for i in range(kids.size())
    )


def unbounded_global_windows(df: DataFrame) -> list[str]:
    """Node names + simple strings of every window in ``df``'s
    physical plan that has an empty partition spec AND no limit /
    1-row-aggregate descendant — i.e. a window that would genuinely
    drag the full input through one task. Empty list = plan is clean.

    Inspects the pre-AQE ``sparkPlan`` (AQE only re-plans exchanges;
    window partition specs are fixed at planning time).
    """
    plan = df._jdf.queryExecution().sparkPlan()
    bad: list[str] = []

    def walk(node) -> None:
        name = node.nodeName()
        if name.startswith("Window"):
            try:
                unpartitioned = node.partitionSpec().size() == 0
            except Exception:  # noqa: BLE001 — WindowGroupLimit etc.
                unpartitioned = False
            if unpartitioned and not any(
                _subtree_bounded(node.children().apply(i))
                for i in range(node.children().size())
            ):
                bad.append(f"{name}: {node.simpleString(120)}")
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(plan)
    return bad


def unbounded_cross_joins(df: DataFrame) -> list[str]:
    """Node strings of every cartesian-shaped join in ``df``'s
    physical plan with NO structurally bounded side — the other
    hidden scale-killer next to global windows: a cross join of two
    data-sized inputs is |A|×|B| work. The repo's sanctioned cross
    joins all broadcast a 1-row aggregate or a driver-k frame onto
    the data side (scalar totals, bucket-offset frames); those prove
    bounded on one side by the same limit/zero-grouping-aggregate
    rule the window lint uses. Anything this returns either needs a
    justification in the caller's allowlist or is a real defect.

    Covers ``CartesianProduct`` and ``BroadcastNestedLoopJoin``
    (the two shapes Spark plans when no equi-key exists).
    """
    plan = df._jdf.queryExecution().sparkPlan()
    bad: list[str] = []

    def walk(node) -> None:
        name = node.nodeName()
        if name.startswith(("CartesianProduct", "BroadcastNestedLoopJoin")):
            kids = node.children()
            if not any(
                _subtree_bounded(kids.apply(i))
                for i in range(kids.size())
            ):
                bad.append(f"{name}: {node.simpleString(120)}")
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(plan)
    return bad
