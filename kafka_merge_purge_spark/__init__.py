"""kafka_merge_purge_spark — a PySpark-native engine with the query and
data-processing capabilities of flyeralarm/kafka-merge-purge, rebuilt
Spark-first (DataFrame/SQL on Catalyst; Structured Streaming for streams).

The reference (read-only at /root/reference) is a Kafka record-routing +
purge CLI: scan a topic, filter tombstones, route each record to a merge
leg (re-topic) and/or a purge leg (tombstone back to the source), with
exactly-once transactional delivery.  Here every verb is a declarative
DataFrame transform so Catalyst/Tungsten pick the physical plan, and the
same transforms run batch (parquet snapshots) or streaming (Kafka /
file sources with checkpointing).

Package map
-----------
- ``model``        canonical record schema + the events->records view
- ``session``      tuned SparkSession builder (AQE, Arrow, shuffle sizing)
- ``sources``      batch/streaming source builders + layered client config
- ``operators``    routing (merge/purge/ask/compaction), relational,
                   dedup (exact/MinHash/SimHash), similarity search,
                   text analysis, multimodal column plumbing
- ``functions``    vector math + hash-stable aggregation helpers
- ``plans``        plan introspection/assertions (broadcast, pushdown)
- ``streaming``    streaming pipeline + exactly-once-style sinks
"""

from kafka_merge_purge_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
