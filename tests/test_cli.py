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
