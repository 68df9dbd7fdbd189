"""Streaming deployment tests: AvailableNow drain (poll-until-empty
parity), checkpointed exactly-once-style sink, windowed aggregation,
and the multimodal mapInPandas plumbing."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from kafka_merge_purge_spark.streaming.pipeline import (
    stream_records_from_dir,
    streaming_merge_all,
)
from kafka_merge_purge_spark.streaming.sink import exactly_once_parquet_sink

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_merge_all_drains_and_matches_batch(spark, tmp_path, records):
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # the file stream source wants a directory; stage the fixture via symlink
    stream_dir = tmp_path / "stream_in"
    stream_dir.mkdir()
    (stream_dir / "events.parquet").symlink_to(f"{SF_DIR}/events.parquet")
    stream = stream_records_from_dir(spark, str(stream_dir))
    q = streaming_merge_all(stream, "events-merged", exactly_once_parquet_sink(out_dir), ckpt)
    q.awaitTermination(120)

    written = spark.read.parquet(*glob.glob(f"{out_dir}/batch_id=*"))
    from kafka_merge_purge_spark.operators.routing import merge_all

    expected = merge_all(records, "events-merged")
    assert written.count() == expected.count()
    legs = {r["leg"]: r["n"] for r in written.groupBy("leg").agg(F.count("*").alias("n")).collect()}
    exp_legs = {r["leg"]: r["n"] for r in expected.groupBy("leg").agg(F.count("*").alias("n")).collect()}
    assert legs == exp_legs

    # counters rode along as observed metrics (R11)
    progress = q.lastProgress
    obs = progress["observedMetrics"].get("counters") if progress else None
    if obs:
        assert obs["merged"] == exp_legs["merge"]
        assert obs["purged"] == exp_legs["purge"]


def test_exactly_once_sink_is_idempotent(spark, tmp_path):
    sink = exactly_once_parquet_sink(str(tmp_path / "once"))
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    sink(df, 7)
    first = spark.read.parquet(str(tmp_path / "once/batch_id=7")).count()
    # replay of the same batch id must be a no-op, not a double-write
    sink(df, 7)
    assert spark.read.parquet(str(tmp_path / "once/batch_id=7")).count() == first == 1


def test_windowed_counts_batch_semantics(spark, records):
    # windowed_counts is a streaming transform but runs on batch frames too
    from kafka_merge_purge_spark.streaming.pipeline import windowed_counts

    out = windowed_counts(records, "1 hour", watermark="1 hour")
    rows = out.collect()
    assert sum(r["n"] for r in rows) == records.count()
    assert all(r["win_end"] > r["win_start"] for r in rows)


def test_multimodal_feature_extraction_plumbing(spark):
    from kafka_merge_purge_spark.operators.multimodal import attach_meta, extract_features

    media = spark.createDataFrame(
        [(1, bytearray(b"abc")), (2, bytearray(b"abcabc")), (3, None)],
        "media_id long, payload binary",
    )
    tagged = attach_meta(media, kind="image", fmt="png")
    assert tagged.schema["meta"].dataType.fieldNames() == [
        "kind", "format", "width", "height", "duration_ms",
    ]
    feats = {r["media_id"]: r for r in extract_features(tagged, fake=True).collect()}
    assert feats[1]["n_bytes"] == 3 and feats[2]["n_bytes"] == 6
    assert len(feats[1]["feature"]) == 8
    assert feats[1]["payload_md5"] != feats[2]["payload_md5"]
    assert feats[3]["n_bytes"] == 0
