"""CLI veneer smoke tests (R16: the reference's command tree,
main.kt:9-24).  The commands build their session via get_spark, which
reuses the test session."""

from __future__ import annotations

from kafka_merge_purge_spark.cli import main

SF_DIR = "/root/testdata/sf0.001"


def test_cli_print(spark, capsys):
    assert main(["print", SF_DIR, "--limit", "3"]) == 0
    out = capsys.readouterr().out
    assert "Printed 3 of 1000 records" in out
    assert "<tombstone>" in out or "Value:" in out


def test_cli_merge_all_writes_both_legs(spark, tmp_path, capsys):
    assert main(["merge-all", SF_DIR, "dest-topic", "--out", str(tmp_path)]) == 0
    out = capsys.readouterr().out
    assert "Merged 923 records, purged 923" in out  # 1000 - 77 tombstones
    written = spark.read.parquet(str(tmp_path / "merge_all"))
    legs = {r["leg"] for r in written.select("leg").distinct().collect()}
    assert legs == {"merge", "purge"}


def test_cli_merge_all_merge_tombstones_flag(tmp_path, capsys):
    # -T forwards the 77 tombstones on the merge leg; purge leg unchanged
    assert main(["merge-all", SF_DIR, "dest-topic", "-T", "--out", str(tmp_path)]) == 0
    assert "Merged 1000 records, purged 923" in capsys.readouterr().out


def test_cli_purge_all(spark, tmp_path, capsys):
    assert main(["purge-all", SF_DIR, "--out", str(tmp_path)]) == 0
    assert "Purged 923 records" in capsys.readouterr().out
    written = spark.read.parquet(str(tmp_path / "purge_all"))
    assert written.filter(written["value"].isNotNull()).count() == 0


def test_cli_ask_rule_routes(spark, tmp_path, capsys):
    assert main(["ask", SF_DIR, "dest-topic", "--out", str(tmp_path)]) == 0
    out = capsys.readouterr().out
    assert "Merged" in out and "purged" in out


def test_cli_avro_flags_require_schema(capsys):
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["print", SF_DIR, "--avro"])
    assert "--avro-schema" in capsys.readouterr().err


def test_avro_value_view_decodes_wire_format(spark):
    """-a forces the Avro deserializer for values: Confluent-framed Avro
    longs render as their decoded view (reference CLI.kt:130-138, with
    the registry lookup replaced by an explicit schema)."""
    import argparse

    from kafka_merge_purge_spark.cli import _apply_avro_views
    from kafka_merge_purge_spark.operators import routing

    def zz(n):  # avro zigzag varint
        n = (n << 1) ^ (n >> 63)
        out = bytearray()
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    frame = spark.createDataFrame(
        [("t", 0, i, b"k", b"\x00\x00\x00\x00\x01" + zz(v)) for i, v in enumerate([7, -300])],
        "topic string, partition int, offset long, key binary, value binary",
    )
    args = argparse.Namespace(avro=True, avro_schema='"long"', avro_key=False)
    decoded = _apply_avro_views(spark, frame, args)
    rendered = {r["offset"]: r["rendered"] for r in routing.print_format(decoded).collect()}
    assert rendered[0].endswith("Value:\n7")
    assert rendered[1].endswith("Value:\n-300")


def test_cli_version(capsys):
    import pytest as _pytest

    with _pytest.raises(SystemExit) as e:
        main(["--version"])
    assert e.value.code == 0
    assert "kafka-merge-purge-spark" in capsys.readouterr().out


def test_cli_client_config_precedence(tmp_path, capsys):
    """Mirror of the reference's CLITest/FactoryTest option matrix:
    files < -o shared overrides < per-client file < -c/-p overrides,
    -b beats the file, -g lands on the consumer, -t on the producer,
    and the forced semantics layer always wins."""
    shared = tmp_path / "shared.properties"
    shared.write_text("bootstrap.servers=file:9092\nretries=5\nclient.id=shared\n")
    consumer = tmp_path / "consumer.properties"
    consumer.write_text("client.id=consumer-file\n")

    base = [
        "-b", "cli:9092", "-g", "my-group",
        "-O", str(shared), "-C", str(consumer),
        "-o", "linger.ms=7", "-c", "fetch.min.bytes=2", "-p", "batch.size=9",
        "-t", "txn-1",
    ]
    assert main(base + ["client-config", "consumer"]) == 0
    got = dict(l.split("=", 1) for l in capsys.readouterr().out.splitlines())
    assert got["bootstrap.servers"] == "cli:9092"     # -b beats file
    assert got["group.id"] == "my-group"
    assert got["client.id"] == "consumer-file"        # client file beats shared file
    assert got["fetch.min.bytes"] == "2"              # -c lands on consumer
    assert got["linger.ms"] == "7"                    # -o shared
    assert got["retries"] == "5"                      # file layer survives
    assert got["isolation.level"] == "read_committed" # forced layer
    assert got["enable.auto.commit"] == "false"
    assert "transactional.id" not in got              # -t is producer-only

    assert main(base + ["client-config", "producer"]) == 0
    got = dict(l.split("=", 1) for l in capsys.readouterr().out.splitlines())
    assert got["transactional.id"] == "txn-1"
    assert got["batch.size"] == "9"                   # -p lands on producer
    assert got["acks"] == "all"                       # forced layer
    assert "group.id" not in got


def test_cli_transaction_toggle_uses_default_id(capsys):
    # reference: -t works as a bare toggle (CLITest 'transaction option as
    # toggle'); with argparse the bare form needs another option (or
    # --transaction=id) before the subcommand
    assert main(["-t", "-n", "client-config", "producer"]) == 0
    got = dict(l.split("=", 1) for l in capsys.readouterr().out.splitlines())
    assert got["transactional.id"] == "kafka-merge-purge-spark"


def test_cli_bare_transaction_before_subcommand(capsys):
    # '-t client-config producer' must treat -t as a toggle, not consume
    # the subcommand name as the transactional id
    assert main(["-t", "client-config", "producer"]) == 0
    got = dict(l.split("=", 1) for l in capsys.readouterr().out.splitlines())
    assert got["transactional.id"] == "kafka-merge-purge-spark"


def test_cli_explicit_transaction_id_still_wins(capsys):
    assert main(["-t", "txn-9", "client-config", "producer"]) == 0
    got = dict(l.split("=", 1) for l in capsys.readouterr().out.splitlines())
    assert got["transactional.id"] == "txn-9"
