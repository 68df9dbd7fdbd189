from kafka_merge_purge_spark.operators.routing import (  # noqa: F401
    Action,
    action_counts,
    ask,
    compaction,
    filter_tombstones,
    merge_all,
    print_format,
    purge,
    purge_all,
)
