"""Plan auditing: the scale anti-pattern sweep as a library surface.

The repo's own test discipline (tests/test_plan_guards.py) mechanically
sweeps every contract query's physical plan for the failure modes that
kill jobs at 100 TB — cartesian products, equi-conditions silently
dropped to BroadcastNestedLoopJoin, un-partitioned global windows,
filters that never reached the parquet scan.  This module exposes that
sweep on ANY DataFrame so pipelines can gate their own plans the same
way (assert in CI before the query ever runs — planning is free, the
3 a.m. retry storm is not).

``plan_report`` is diagnostics; ``assert_plan`` is the CI gate.
Everything is planning-only: nothing here executes the query.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout
from typing import Optional, Sequence

from pyspark.sql import DataFrame

__all__ = [
    "physical_plan",
    "plan_report",
    "assert_plan",
    "unpartitioned_windows",
    "pushed_filters",
]


def physical_plan(df: DataFrame, *, formatted: bool = True) -> str:
    """The physical plan string (``explain("formatted")`` capture)."""
    if not formatted:
        return df._jdf.queryExecution().executedPlan().toString()
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def unpartitioned_windows(plan: str) -> "list[str]":
    """windowspecdefinition(...) fragments with an ORDER BY but no
    PARTITION BY — each one is a single-task global sort at scale.
    Paren-depth-aware split (sort keys may contain commas)."""
    out = []
    for m in re.finditer(r"windowspecdefinition\(", plan):
        start = m.end()
        depth, i = 1, start
        while i < len(plan) and depth:
            depth += {"(": 1, ")": -1}.get(plan[i], 0)
            i += 1
        body = plan[start:i - 1]
        args, d, cur = [], 0, []
        for ch in body:
            if ch == "," and d == 0:
                args.append("".join(cur).strip())
                cur = []
                continue
            d += {"(": 1, ")": -1}.get(ch, 0)
            cur.append(ch)
        args.append("".join(cur).strip())
        # args = partition cols..., sort cols (ASC/DESC ...), frame spec;
        # un-partitioned = FIRST arg is already a sort key or the frame
        if args and (
            " ASC" in args[0] or " DESC" in args[0]
            or args[0].startswith("specifiedwindowframe")
        ):
            out.append(body[:120])
    return out


def pushed_filters(df: DataFrame) -> "list[str]":
    """PushedFilters entries of every file scan in the plan — empty
    brackets on a selective query mean a filter is NOT reaching the
    reader (casts/UDFs around the column are the usual cause)."""
    plan = physical_plan(df)
    return [
        m.group(1)
        for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan)
    ]


def plan_report(df: DataFrame) -> dict:
    """One-dict plan diagnostics::

        {"cartesian_products": int, "broadcast_nested_loop_joins": int,
         "exchanges": int, "sort_merge_joins": int, "broadcast_joins": int,
         "unpartitioned_windows": [..], "pushed_filters": [..],
         "wholestage_codegen_spans": int}
    """
    plan = physical_plan(df)
    raw = physical_plan(df, formatted=False)
    return {
        "cartesian_products": plan.count("CartesianProduct"),
        "broadcast_nested_loop_joins": plan.count(
            "BroadcastNestedLoopJoin"
        ),
        # shuffle count = Exchange nodes only.  Under AQE an executed
        # plan stacks AQEShuffleRead on top of each Exchange — counting
        # both would double every shuffle and spuriously trip
        # max_exchanges bounds.  (\bExchange\b does not match
        # BroadcastExchange: no word boundary inside the token.)
        "exchanges": len(re.findall(r"\bExchange\b", raw)),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "unpartitioned_windows": unpartitioned_windows(raw),
        "pushed_filters": pushed_filters(df),
        # raw plan marks codegen stages as "*(N)".  Under AQE, codegen
        # is inserted per query stage at EXECUTION, so a pre-execution
        # adaptive plan reports 0 here — the count is meaningful with
        # AQE off or on a final (executed) plan
        "wholestage_codegen_spans": len(
            set(re.findall(r"\*\((\d+)\)", raw))
            | set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
        ),
    }


def assert_plan(
    df: DataFrame,
    *,
    no_cartesian: bool = True,
    max_bnlj: Optional[int] = 0,
    max_exchanges: Optional[int] = None,
    no_unpartitioned_window: bool = False,
    require_pushed_filter: Optional[Sequence[str]] = None,
) -> None:
    """CI gate: raise ``AssertionError`` naming every violated bound.

    Defaults forbid cartesian products and ANY BroadcastNestedLoopJoin
    (pass ``max_bnlj=1`` for a legitimate 1-row bounds cross — and say
    why in the caller).  ``require_pushed_filter`` asserts each named
    column appears in some scan's PushedFilters.
    """
    rep = plan_report(df)
    problems = []
    if no_cartesian and rep["cartesian_products"]:
        problems.append(
            f"{rep['cartesian_products']} CartesianProduct node(s)"
        )
    if max_bnlj is not None and rep["broadcast_nested_loop_joins"] > max_bnlj:
        problems.append(
            f"{rep['broadcast_nested_loop_joins']} BroadcastNestedLoopJoin"
            f" > allowed {max_bnlj}"
        )
    if max_exchanges is not None and rep["exchanges"] > max_exchanges:
        problems.append(
            f"{rep['exchanges']} shuffles > allowed {max_exchanges}"
        )
    if no_unpartitioned_window and rep["unpartitioned_windows"]:
        problems.append(
            "un-partitioned window(s): "
            + "; ".join(rep["unpartitioned_windows"])
        )
    for col in require_pushed_filter or ():
        # IsNotNull alone doesn't count — Spark pushes it even when the
        # real predicate (cast-wrapped, UDF-wrapped) stayed behind
        meaningful = [
            f
            for pf in rep["pushed_filters"]
            for f in pf.split(", ")
            if col in f and not f.startswith("IsNotNull")
        ]
        if not meaningful:
            problems.append(
                f"no pushed filter (beyond IsNotNull) mentions {col!r}"
            )
    if problems:
        raise AssertionError("plan audit failed: " + " | ".join(problems))


def recommended_conf(
    *,
    input_bytes: int,
    total_cores: int,
    executor_memory_gb: float = 16.0,
) -> "dict[str, str]":
    """Starting-point session conf for a given scan size and cluster.

    The arithmetic the DEPLOY.md playbook applies by hand:

    - ``shuffle.partitions``: max(2×cores, input/⟨128 MiB⟩) — every
      shuffle partition fits the per-core memory budget and no core
      sits idle on the tail.
    - ``files.maxPartitionBytes``: 128 MiB (row-group granularity).
    - AQE + skew-join on (runtime re-plan beats any static guess);
      ``advisoryPartitionSizeInBytes`` 64 MiB so coalescing has
      headroom below maxPartitionBytes.
    - ``autoBroadcastJoinThreshold`` scaled to 1% of executor memory
      (cap 256 MiB): dims that fit broadcast, facts never do.
    """
    if input_bytes < 0 or total_cores < 1:
        raise ValueError("need input_bytes >= 0 and total_cores >= 1")
    mib = 1 << 20
    parts = max(2 * total_cores, -(-input_bytes // (128 * mib)))
    bcast = min(256 * mib, int(executor_memory_gb * (1 << 30) * 0.01))
    return {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(64 * mib),
        "spark.sql.shuffle.partitions": str(parts),
        "spark.sql.files.maxPartitionBytes": str(128 * mib),
        "spark.sql.autoBroadcastJoinThreshold": str(bcast),
        "spark.sql.session.timeZone": "UTC",
    }
