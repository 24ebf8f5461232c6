from pyarrow_ops_spark.plans.inspect import (
    formatted_plan,
    pushed_filters,
    plan_nodes,
    has_broadcast_join,
    shuffle_count,
    codegen_stage_count,
)

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "plan_nodes",
    "has_broadcast_join",
    "shuffle_count",
    "codegen_stage_count",
]
