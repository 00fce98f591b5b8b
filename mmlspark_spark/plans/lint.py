"""Plan linter — the scale checks tests/test_plans.py asserts per
query, packaged as a runtime diagnostic any pipeline can call before
launching a 100 TB job. ``lint_plan(df)`` inspects the EXECUTED plan
(post-AQE-planning physical tree) and returns human-readable findings
for the failure modes this engine's own development kept hitting:

- cartesian / broadcast-nested-loop joins (quadratic row
  multiplication — usually a missing equi-key or a non-equi condition
  that defeated hash join selection);
- row-at-a-time Python UDFs on the data path (``BatchEvalPython`` —
  each row round-trips the Python pickler; Arrow-batched
  ``ArrowEvalPython``/``mapInPandas`` are 10-100x faster);
- scans that evaluate filters without pushing any to the parquet
  reader (predicate stuck above the row-group level);
- an exchange (shuffle) count beyond a configurable budget.

Findings are advisory strings, not errors: some plans legitimately
cross-join one-row frames (ClassBalancer's global max) or keep a
Python stage (explainers). The point is that a human reviews the list
before the cluster pays for it.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _iter_scans(jnode):
    """Yield every FileSourceScanExec in the physical tree, descending
    through AQE roots (initialPlan), cached relations
    (InMemoryTableScanExec -> cachedPlan), AQE query stages and reused
    exchanges/subqueries — the places a plain children() walk (and the
    rendered plan STRING, whose metadata is abbreviated at
    materialize-time) loses scans."""
    name = jnode.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        yield from _iter_scans(jnode.initialPlan())
        return
    if name == "InMemoryTableScanExec":
        yield from _iter_scans(jnode.relation().cachedPlan())
        return
    if name.endswith("QueryStageExec"):
        yield from _iter_scans(jnode.plan())
        return
    if "FileSourceScan" in name:
        yield jnode
        return
    ch = jnode.children()
    for i in range(ch.size()):
        yield from _iter_scans(ch.apply(i))
    # scalar/IN-subquery plans hang off EXPRESSIONS (PlanExpression),
    # not children() — without this branch a scan inside a subquery
    # (and any unpushed filter on it) is invisible to the lint
    sq = jnode.subqueries()
    for i in range(sq.size()):
        yield from _iter_scans(sq.apply(i))


def _scan_pushdown_findings(jplan) -> list[str]:
    """Pushdown findings from the JVM tree's own dataFilters()/
    metadata() — NEVER from the rendered plan string, whose metadata
    values are abbreviated to spark.sql.maxMetadataStringLength chars
    at materialize-time (a multi-predicate scan renders as
    "DataFilters: [isnotnull(x#1), (ca..., Format:" and any string
    parse goes blind)."""
    findings: list[str] = []
    for scan in _iter_scans(jplan):
        dfs = scan.dataFilters()
        if dfs.size() == 0:
            continue
        filters = ", ".join(
            dfs.apply(i).toString() for i in range(dfs.size()))
        md = scan.metadata()
        pushed = md.apply("PushedFilters") if md.contains(
            "PushedFilters") else "[]"
        # The FIXABLE shape, flagged regardless of what else pushed:
        # a cast of a BARE column compared to a literal. Comparing in
        # the column's own type makes the predicate pushable, so this
        # is always a one-line fix with real row-group-skip value.
        cast_cmp = re.search(
            r"\(cast\(\w+#\d+\w* as \w+\) (?:=|<|>|<=|>=) [^()]+\)",
            filters)
        if cast_cmp:
            findings.append(
                f"cast-wrapped column comparison ({cast_cmp.group(0)}) "
                "evaluated per row instead of pushed to the parquet "
                "reader — compare in the column's own type and the "
                "predicate pushes")
            break
        if pushed == "[]":
            # Nothing pushed at all. Only flag when a PUSHABLE-LOOKING
            # predicate is present: a filter whose every predicate
            # wraps the column in a computed expression (md5(text),
            # size(split(...)), CASE WHEN ...) is inherently
            # un-pushable — parquet readers evaluate plain
            # column/literal comparisons only — and flagging it tells
            # the reviewer to "fix" something that has no fix.
            pushable = re.search(
                r"(?:isnotnull|isnull)\(\w+#\d+\w*\)"
                r"|\(\w+#\d+\w* (?:=|<|>|<=|>=|<=>) [^()]+\)"
                r"|\w+#\d+\w* IN \(", filters)
            if pushable:
                findings.append(
                    "parquet scan evaluates pushable-looking "
                    f"DataFilters ({pushable.group(0)}) but pushed "
                    "none to the reader (PushedFilters empty): no "
                    "row-group skipping — check for casts/UDFs "
                    "wrapping the filtered column")
                break
    return findings


def _count_tree_shuffles(jnode, seen_relations: set,
                         basis: list | None = None) -> int:
    """Count ShuffleExchangeExec nodes in the physical tree. Recurses
    into the AQE wrapper's FINAL adaptive plan when the query has
    executed (``isFinalPlan`` — runtime SMJ→broadcast conversions and
    stage reuse make the initial plan overstate what actually ran),
    falling back to the initial plan pre-execution (recorded in
    ``basis`` so the finding text can note the pre-AQE estimate;
    ``finalPhysicalPlan`` would FORCE execution — a linter must not
    run the query). Recurses into query stages (leaves in the tree,
    their plan behind ``.plan()``) and into each DISTINCT
    InMemoryRelation's cached plan exactly once (a persisted subtree's
    shuffles execute once at materialization however many times the
    plan references it)."""
    cls = jnode.getClass().getSimpleName()
    n = 1 if cls == "ShuffleExchangeExec" else 0
    if cls == "AdaptiveSparkPlanExec":
        if jnode.isFinalPlan():
            n += _count_tree_shuffles(jnode.executedPlan(),
                                      seen_relations, basis)
        else:
            if basis is not None:
                basis.append("pre-AQE")
            n += _count_tree_shuffles(jnode.initialPlan(),
                                      seen_relations, basis)
    elif cls == "InMemoryTableScanExec":
        rel = jnode.relation()
        key = rel.hashCode()
        if key not in seen_relations:
            seen_relations.add(key)
            n += _count_tree_shuffles(rel.cachedPlan(),
                                      seen_relations, basis)
    elif cls.endswith("QueryStageExec"):
        n += _count_tree_shuffles(jnode.plan(), seen_relations, basis)
    ch = jnode.children()
    for i in range(ch.size()):
        n += _count_tree_shuffles(ch.apply(i), seen_relations, basis)
    return n


def lint_plan(df: DataFrame, maxExchanges: int = 8) -> list[str]:
    """Return advisory findings about ``df``'s physical plan."""
    jplan = df._jdf.queryExecution().executedPlan()
    plan = jplan.toString()
    findings: list[str] = []
    if "CartesianProduct" in plan:
        findings.append(
            "CartesianProduct: quadratic join — add an equi-join key "
            "or broadcast the (verified-small) side explicitly")
    if "BroadcastNestedLoopJoin" in plan:
        findings.append(
            "BroadcastNestedLoopJoin: non-equi join condition — every "
            "probe row scans the broadcast side; restructure to an "
            "equi key + residual filter if possible")
    if "BatchEvalPython" in plan:
        findings.append(
            "BatchEvalPython: row-at-a-time Python UDF on the data "
            "path — convert to a pandas_udf / mapInPandas (Arrow "
            "batches) or a built-in expression")
    # count only SHUFFLE exchanges: BroadcastExchange moves a small
    # frame once (that is the cheap path we recommend), and AQE's
    # ReusedExchange references a shuffle that executes once — a raw
    # substring count would call a shuffle-free 9-dimension star join
    # a shuffle storm. Counted by TRAVERSING the physical tree, not
    # by regex over toString: the string nests every referenced
    # InMemoryRelation's cached plan at every reference, so a plan
    # that consumes one persisted subtree N times would "count" its
    # build-side shuffles N times (measured: 20 by string vs 4 real
    # on the tombstone-masked minhash match). Cached subtrees ARE
    # counted — once per distinct relation (they execute once, at
    # materialization).
    basis: list = []
    n_exchanges = _count_tree_shuffles(jplan, set(), basis)
    if n_exchanges > maxExchanges:
        note = (" (pre-AQE estimate — the plan has not executed; "
                "runtime SMJ→broadcast conversion and stage reuse "
                "may lower the real count)" if basis else "")
        findings.append(
            f"{n_exchanges} shuffle exchanges (> {maxExchanges}){note}: "
            "every one is a full shuffle — look for repeated "
            "re-partitioning, unpersisted multi-consumer subtrees, or "
            "joins that could share a partitioning")
    findings.extend(_scan_pushdown_findings(jplan))
    return findings


def assert_scalable(df: DataFrame, maxExchanges: int = 8) -> DataFrame:
    """Raise if the plan trips any lint rule; returns ``df`` unchanged
    so it chains: ``assert_scalable(build_query(...)).write...``."""
    findings = lint_plan(df, maxExchanges=maxExchanges)
    if findings:
        raise AssertionError(
            "plan failed scale lint:\n- " + "\n- ".join(findings))
    return df
