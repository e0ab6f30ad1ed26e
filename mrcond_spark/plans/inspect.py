"""Parse ``explain("formatted")`` output into assertable facts."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans (empty -> nothing pushed)."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each parquet scan (pruning check)."""
    text = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
        out.append(cols)
    return out


def broadcast_join_count(df: DataFrame) -> int:
    return explain_str(df).count("BroadcastHashJoin")


def uses_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in explain_str(df)


def shuffle_exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (lower = fewer cluster-wide data moves).

    Counted from the SIMPLE explain mode: formatted mode prints bare
    ``(4) Exchange`` nodes with the partitioning in a detail section, so a
    pattern anchored on ``Exchange hashpartitioning`` silently returned 0
    there (and made shuffle-budget assertions vacuous). Simple mode inlines
    the arguments; BroadcastExchange never matches — broadcasts are not
    shuffles.
    """
    return len(re.findall(
        r"(?<!Broadcast)Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)",
        explain_str(df, mode="simple"),
    ))


def codegen_stage_count(df: DataFrame) -> int:
    """WholeStageCodegen subtree count (AQE hides the markers in the
    formatted pre-execution plan; the codegen explain mode reports them)."""
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", explain_str(df, mode="codegen"))
    return int(m.group(1)) if m else 0


def scale_report(df: DataFrame) -> dict:
    """One-call scale diagnostic for any DataFrame — the properties that
    decide whether a plan survives a 100x scale-up, as a dict:

    shuffles (cluster-wide data moves), broadcasts (dimension joins),
    sort_merge_join (large-side joins present), pushed_filters (predicates
    reaching the scans), scan_columns (pruning per scan), codegen_stages
    (JVM-fused pipeline spans), cartesian (accidental product — almost
    always a bug).
    """
    # one formatted explain, parsed locally (re-running df.explain per helper
    # would re-analyze the plan ~5x); codegen mode is the one extra pass
    text = explain_str(df)
    pushed: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            pushed.extend(s.strip() for s in body.split(","))
    scans = [
        sorted({c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()})
        for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text)
    ]
    return {
        "shuffles": len(
            re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", text)
        ),
        "broadcasts": text.count("BroadcastHashJoin"),
        "sort_merge_join": "SortMergeJoin" in text,
        "pushed_filters": pushed,
        "scan_columns": scans,
        "codegen_stages": codegen_stage_count(df),
        "cartesian": "CartesianProduct" in text or "BroadcastNestedLoopJoin" in text,
    }
