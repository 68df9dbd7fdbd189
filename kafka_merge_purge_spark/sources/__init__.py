from kafka_merge_purge_spark.sources.batch import TABLES, load_table, load_tables  # noqa: F401
from kafka_merge_purge_spark.sources.config import assemble_client_config  # noqa: F401
