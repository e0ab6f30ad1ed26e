"""Physical-plan inspection utilities.

The engine's 100 TB posture is enforced, not assumed: these helpers read
``df.explain`` output so tests can assert that filters reach the parquet
scan (PushedFilters), projections prune columns (ReadSchema), small dims
broadcast (BroadcastHashJoin), and hot expressions stay inside
WholeStageCodegen. See tests/test_plans.py.
"""

from .inspect import (
    broadcast_join_count,
    codegen_stage_count,
    explain_str,
    pushed_filters,
    read_schema_columns,
    scale_report,
    shuffle_exchange_count,
    uses_sort_merge_join,
)

__all__ = [
    "scale_report",
    "broadcast_join_count",
    "codegen_stage_count",
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "shuffle_exchange_count",
    "uses_sort_merge_join",
]
