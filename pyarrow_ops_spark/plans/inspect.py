"""Physical-plan inspection helpers.

The scale contract of every operator ("filter reaches the scan", "dim join
broadcasts", "no extra shuffle") is asserted in tests via these helpers —
plan shape is part of the public behavior, not an implementation detail.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> str:
    """Concatenated PushedFilters contents across the plan's scans (filter
    expressions contain commas, so no per-filter splitting)."""
    plan = formatted_plan(df)
    return "; ".join(
        m.group(1).strip() for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan)
    )


def plan_nodes(df: DataFrame) -> list[tuple[str, str]]:
    """(node_name, block_text) per physical operator in the formatted
    plan's detail section."""
    plan = formatted_plan(df)
    blocks = re.split(r"\n(?=\(\d+\) )", plan)
    out = []
    for b in blocks:
        m = re.match(r"\((\d+)\) (\S+)", b)
        if m:
            out.append((m.group(2), b))
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators (excluding broadcast exchanges and
    AQE-reused ones)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange", plan))


def codegen_stage_count(df: DataFrame) -> int:
    plan = formatted_plan(df)
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)))


def _jplan_children(jplan):
    """Children of a JVM physical node, looking through the adaptive /
    query-stage wrappers (whose Catalyst ``children()`` is empty — the
    real subtree hides behind an accessor).

    For ``AdaptiveSparkPlanExec`` the FINAL plan is preferred whenever the
    query has already executed (``isFinalPlan``) — asserting against
    ``initialPlan`` on an executed AQE query would see the pre-adaptive
    tree (round-8 advice fix). ``finalPhysicalPlan()`` is never called on
    an un-finalized query: it would force execution as a side effect of a
    plan inspection. py4j proxies report ``hasattr`` true for any name,
    so accessor choice is by ordered try/except, not capability probing."""
    ch = jplan.children()
    n = ch.size()
    if n:
        return [ch.apply(i) for i in range(n)]
    try:
        if jplan.isFinalPlan():
            return [jplan.finalPhysicalPlan()]
    except Exception:
        pass
    for acc in ("plan", "initialPlan"):
        try:
            return [getattr(jplan, acc)()]
        except Exception:
            pass
    return []


def node_has_descendant(df: DataFrame, ancestor: str, descendant: str) -> bool:
    """True iff some physical node whose name contains ``ancestor`` has a
    strict descendant whose name contains ``descendant`` — a tree-walk
    replacement for comparing substring indices in the rendered plan
    string, whose node order varies across Spark versions and AQE
    settings.

    Under AQE the walk sees the INITIAL adaptive plan unless ``df`` has
    already been executed (then ``isFinalPlan`` is true and the final
    plan is walked). Execute first (e.g. noop write on the same ``df``
    object) when the assertion targets runtime re-planning."""

    def any_node(p, pred):
        if pred(p.nodeName()):
            return True
        return any(any_node(c, pred) for c in _jplan_children(p))

    def search(p):
        if ancestor in p.nodeName():
            if any(
                any_node(c, lambda n: descendant in n)
                for c in _jplan_children(p)
            ):
                return True
        return any(search(c) for c in _jplan_children(p))

    return search(df._jdf.queryExecution().executedPlan())
