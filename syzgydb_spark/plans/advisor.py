"""Physical-plan scale advisor: the "would this survive 100×?" checks
the project runs by hand (.explain + SCALE.md discipline), packaged as
a function so pipelines and tests can run them mechanically.

The reference engine has no analog (a single-node Go process has no
plans); this is native Spark territory: every check reads the
*executed* physical plan, so what is audited is exactly what would run
on the cluster, post-Catalyst and post-AQE-initial-plan.

Checks (each → a finding dict with severity / kind / detail):

- ``cartesian``        CartesianProduct or BroadcastNestedLoopJoin: an
                       O(N·M) join. error — at 100 TB this never ends.
                       (Single-row constants joins are the known benign
                       case; pass ``allow={'cartesian'}`` where that
                       shape is intended.)
- ``global_window``    a Window with an ORDER BY but no PARTITION BY:
                       the whole relation sorts into ONE task. error.
- ``global_sort``      rangepartitioning Exchange (global ORDER BY) —
                       legitimate for top-k output (TakeOrdered avoids
                       it) but a full-sort smell in mid-plan. warn.
- ``python_row_eval``  BatchEvalPython: row-at-a-time Python in the
                       executor loop, ~10-100× slower than Arrow. error.
- ``python_arrow``     ArrowEvalPython / mapInPandas stages: Python on
                       the path, batched (acceptable when the logic
                       needs it). info.
- ``unpushed_filter``  a parquet scan with PushedFilters: [] directly
                       under a Filter: predicate evaluated post-scan.
                       warn (some exprs are genuinely un-pushable).
- ``single_partition`` Exchange SinglePartition below other operators:
                       everything funnels to one task. warn (normal as
                       the LAST step of a scalar aggregate; deadly
                       mid-plan).
- ``shuffles``         every Exchange the compiled query executes,
                       with its partitioning — not a defect, a cost
                       inventory (info). Counted by a live-plan tree
                       walk: reused exchanges once, cache subtrees
                       excluded.
- ``cache_fill_shuffles`` the one-time derivation cost of each
                       DISTINCT persisted relation the plan reads
                       (LM models, posting stores, sketch relations) —
                       counted once per cache, not once per consumer
                       reference the way ``toString`` prints it (info).
- ``narrow_scan``      file sources delivering fewer scan splits than
                       half the cores for a non-trivial input (>32 MB):
                       every downstream narrow stage inherits that
                       parallelism. Row-group-aware (a one-row-group
                       file is one task at any split size). warn.

``assert_scalable(df)`` raises AssertionError on any error-severity
finding — drop it at the end of a pipeline builder or in a test to pin
the property; ``allow`` waives named kinds where the shape is intended
(e.g. the brute-force KNN baseline IS a broadcast product).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_TREE_PREFIX = re.compile(r"^[\s:+\-*]*")
_CODEGEN_MARK = re.compile(r"^\(\d+\)\s*")


def _physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _op(line: str) -> str:
    """Strip tree-drawing chars and the whole-stage-codegen marker:
    ':- *(3) Filter ...' → 'Filter ...'."""
    return _CODEGEN_MARK.sub("", _TREE_PREFIX.sub("", line))


def _walk_plan(jnode, seen_exchanges, caches):
    """Yield (cls, node) for the physical-plan nodes a query executes:
    descends through AQE wrappers into the live subplan, stops at
    ``InMemoryTableScanExec`` (recording the cache in ``caches``,
    deduped by its CachedRDDBuilder — ``toString`` re-prints a cache's
    fill lineage once per consumer reference, so textual counting
    inflates the inventory by consumers × fill-lineage; the LM-backed
    scorers read one model relation from three plan branches), and
    yields a reused/stage-shared exchange only once, like the runtime
    does."""
    cls = jnode.getClass().getSimpleName()
    if cls == "ReusedExchangeExec":
        # points at an exchange another branch already executes
        return
    if cls in ("ShuffleExchangeExec", "BroadcastExchangeExec"):
        key = jnode.hashCode()
        if key in seen_exchanges:
            return
        seen_exchanges.add(key)
    yield cls, jnode
    if cls == "InMemoryTableScanExec":
        try:
            cb = jnode.relation().cacheBuilder()
            caches.setdefault(cb.hashCode(), cb)
        except Exception:
            pass
        return
    if cls == "AdaptiveSparkPlanExec":
        yield from _walk_plan(jnode.executedPlan(), seen_exchanges, caches)
        return
    if cls.endswith("QueryStageExec"):
        yield from _walk_plan(jnode.plan(), seen_exchanges, caches)
        return
    kids = jnode.children()
    for i in range(kids.size()):
        yield from _walk_plan(kids.apply(i), seen_exchanges, caches)


def _shuffle_specs(df: DataFrame) -> tuple[list[str], list[str]]:
    """(live, fill) partitioning specs: ``live`` is every shuffle the
    compiled query executes outside cache boundaries; ``fill`` is the
    one-time derivation cost of each DISTINCT cached relation it reads
    (counted once per cache, not once per consumer, nested caches
    included). Tree-walk, not text — immune to the AQE annex blocks
    (`== Initial Plan ==`) that re-print subplans."""
    seen: set = set()
    caches: dict = {}
    live = []
    for cls, node in _walk_plan(
        df._jdf.queryExecution().executedPlan(), seen, caches
    ):
        if cls == "ShuffleExchangeExec":
            live.append(node.outputPartitioning().toString())
    fill = []
    done: set = set()
    while caches:
        key, cb = caches.popitem()
        if key in done:
            continue
        done.add(key)
        nested: dict = {}
        try:
            for cls, node in _walk_plan(cb.cachedPlan(), seen, nested):
                if cls == "ShuffleExchangeExec":
                    fill.append(node.outputPartitioning().toString())
        except Exception:
            pass
        for k, v in nested.items():
            if k not in done:
                caches[k] = v
    return live, fill


def scale_report(df: DataFrame) -> dict:
    """Audit ``df``'s executed physical plan for scale smells; returns
    ``{"findings": [...], "n_shuffles": int, "plan": str}``."""
    plan = _physical_plan(df)
    findings: list[dict] = []
    lines = [_op(l) for l in plan.splitlines()]

    def add(severity: str, kind: str, detail: str) -> None:
        findings.append({"severity": severity, "kind": kind, "detail": detail})

    # the COUNT comes from the live-plan tree walk (cache fills
    # counted separately, once per distinct cache; reuse
    # deduplicated); the textual loop below still classifies
    # suspicious exchange shapes (global sort / mid-plan
    # SinglePartition) wherever they appear
    shuffles, fill_shuffles = _shuffle_specs(df)
    for i, l in enumerate(lines):
        if l.startswith("CartesianProduct"):
            add("error", "cartesian", l[:160])
        elif l.startswith("BroadcastNestedLoopJoin"):
            add("error", "cartesian", l[:160])
        elif l.startswith("Window "):
            # 'Window [fns], [part], [order]' vs 'Window [fns], [order]'
            # — split on top-level '], [' groups. (WindowGroupLimit —
            # the rank-limit pushdown — is skipped: a global window
            # always also shows its own Window line, which is what we
            # flag.)
            groups = re.findall(r"\[[^\[\]]*(?:\[[^\]]*\][^\[\]]*)*\]", l)
            if len(groups) == 2 and (" ASC" in groups[1] or " DESC" in groups[1]):
                add(
                    "error",
                    "global_window",
                    "ORDER BY with no PARTITION BY — whole relation in one "
                    "task: " + l[:140],
                )
        elif l.startswith("BatchEvalPython"):
            add("error", "python_row_eval", l[:160])
        elif l.startswith(("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")):
            add("info", "python_arrow", l[:160])
        elif l.startswith("Exchange"):
            # the spec runs to the trailing shuffle-origin / plan-id
            # markers — a plain ', '-split would cut hashpartitioning's
            # argument list at its first comma
            spec = l[len("Exchange "):]
            for marker in (", ENSURE_REQUIREMENTS", ", REPARTITION", ", [plan_id"):
                cut = spec.find(marker)
                if cut != -1:
                    spec = spec[:cut]
            if spec.startswith("rangepartitioning"):
                add("warn", "global_sort", l[:160])
            elif spec == "SinglePartition":
                # benign when everything ABOVE it is final-collect
                # shape (AQE wrapper, the root aggregate/limit and its
                # projections); deadly when mid-plan work follows
                benign_above = (
                    "AdaptiveSparkPlan", "ResultQueryStage", "HashAggregate",
                    "SortAggregate", "ObjectHashAggregate", "Project",
                    "CollectLimit", "GlobalLimit", "LocalLimit",
                    "TakeOrderedAndProject", "Sort ", "WholeStageCodegen",
                    "InputAdapter", "ColumnarToRow", "CollectMetrics",
                )
                if not all(
                    lines[j].startswith(benign_above) for j in range(i)
                ):
                    add("warn", "single_partition", l[:160])
    # unpushed filters: a Filter whose scan child (skipping the
    # ColumnarToRow / InputAdapter pass-throughs) carries no pushed
    # predicates beyond null checks
    raw_lines = lines
    passthrough = ("ColumnarToRow", "InputAdapter", "WholeStageCodegen")
    for i, l in enumerate(raw_lines):
        if l.split(" ", 1)[0] != "Filter":
            continue
        j = i + 1
        while j < len(raw_lines) and raw_lines[j].startswith(passthrough):
            j += 1
        if j < len(raw_lines) and raw_lines[j].startswith(
            ("FileScan parquet", "Scan parquet")
        ):
            m = re.search(r"PushedFilters: \[([^\]]*)\]", raw_lines[j])
            if m is not None and not re.sub(
                r"IsNotNull\([^)]*\),?\s*", "", m.group(1)
            ).strip():
                add("warn", "unpushed_filter", raw_lines[j][:160])
    if shuffles:
        add("info", "shuffles", "; ".join(shuffles))
    if fill_shuffles:
        add("info", "cache_fill_shuffles", "; ".join(fill_shuffles))
    # scan parallelism: a plan whose file sources deliver fewer splits
    # than half the cores leaves the machine idle through every
    # downstream narrow stage (the compute-bound kernels inherit the
    # scan's partitioning). Row-group-aware estimate — a big
    # single-row-group file IS one task at any maxPartitionBytes.
    # Only meaningful when the input is big enough that more splits
    # exist to be had; tiny tables are one task by nature.
    try:
        from syzgydb_spark.session import scan_splits_estimate

        sc = df.sparkSession.sparkContext
        splits = scan_splits_estimate(df)
        if splits is not None and 0 < splits < sc.defaultParallelism // 2:
            import os as _os

            total = 0
            for f in df.inputFiles():
                try:
                    total += _os.path.getsize(
                        f[7:] if f.startswith("file://") else f
                    )
                except OSError:
                    pass
            if total > 32 * 1024 * 1024:
                add(
                    "warn",
                    "narrow_scan",
                    f"file sources deliver ~{splits} scan splits for "
                    f"{total >> 20} MB of input on {sc.defaultParallelism} "
                    "cores — lower maxPartitionBytes, re-layout the input "
                    "(more files / smaller row groups), or _spread before "
                    "compute-heavy stages",
                )
    except Exception:
        pass  # non-file plans / listing failures: nothing to say
    return {
        "findings": findings,
        "n_shuffles": len(shuffles),
        "n_fill_shuffles": len(fill_shuffles),
        "plan": plan,
    }


def assert_scalable(df: DataFrame, *, allow: set[str] = frozenset()) -> dict:
    """Raise AssertionError if the plan carries any error-severity
    finding whose kind is not in ``allow``; returns the report so
    callers can log the shuffle inventory."""
    report = scale_report(df)
    errors = [
        f for f in report["findings"]
        if f["severity"] == "error" and f["kind"] not in allow
    ]
    if errors:
        msgs = "\n".join(f"  [{f['kind']}] {f['detail']}" for f in errors)
        raise AssertionError(
            f"plan has {len(errors)} scale defect(s):\n{msgs}\n--- plan ---\n"
            + report["plan"]
        )
    return report
