from distributed_computing_spark.plans.inspect import (  # noqa: F401
    SCALING_TABLE_MARKERS,
    count_exchanges,
    executed_plan,
    has_partition_filters,
    has_pushed_filter,
    operator_tree,
    physical_plan,
    ungated_broadcast_tables,
)
