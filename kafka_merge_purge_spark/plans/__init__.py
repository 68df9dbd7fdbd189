from kafka_merge_purge_spark.plans.introspect import (  # noqa: F401
    formatted_plan,
    projection_barrier,
    has_broadcast_join,
    pushed_filters,
    shuffle_count,
    wholestage_codegen_count,
)
