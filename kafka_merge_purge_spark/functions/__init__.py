from kafka_merge_purge_spark.functions.stable import davg, dround, dsum  # noqa: F401
from kafka_merge_purge_spark.functions.vectors import cosine_similarity, dot, l2_norm  # noqa: F401
