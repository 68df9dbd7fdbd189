"""CLI veneer mirroring the reference's command tree (R16, main.kt:9-24,
CLI.kt:8-151): ``ask | merge-all | purge-all | print`` over parquet
record snapshots (batch) — the interactive stdin ActionSource (R9,
ActionSource.kt:9-27) survives as a driver-side prompt over a collected
sample in ``ask --interactive``.

Usage examples:
    python -m kafka_merge_purge_spark.cli print  /root/testdata/sf0.001
    python -m kafka_merge_purge_spark.cli merge-all /root/testdata/sf0.001 dest-topic --out /tmp/out
    python -m kafka_merge_purge_spark.cli purge-all /root/testdata/sf0.001 --out /tmp/out
    python -m kafka_merge_purge_spark.cli ask /root/testdata/sf0.001 dest-topic --rule default
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F

from kafka_merge_purge_spark.model import load_records
from kafka_merge_purge_spark.operators import routing
from kafka_merge_purge_spark.session import get_spark


def _session(name: str, args):
    spark = get_spark(name)
    if getattr(args, "verbose", False):  # reference -v (CLI.kt:141-151)
        spark.sparkContext.setLogLevel("INFO")
    return spark


def _emit(df, out: str | None, label: str) -> None:
    if out:
        df.write.mode("overwrite").parquet(f"{out}/{label}")
        print(f"wrote {label} -> {out}/{label}")
    else:
        df.show(20, truncate=False)


def _apply_avro_views(spark, records, args):
    """Reference -A/--avro-key and -a/--avro (CLI.kt:118-138): force the
    Avro deserializer for keys/values.  The reference resolves writer
    schemas via schema.registry.url; with no registry in this
    environment the schema is supplied explicitly (--avro-schema /
    --avro-key-schema, JSON text or @file).  Decoded views replace the
    rendered column only — raw bytes are never mutated (R2 invariant).
    Uses the JVM from_avro when spark-avro is on the classpath, else the
    dependency-free Python tier (functions/avro_py.py)."""
    from kafka_merge_purge_spark.functions import decode as dc

    def schema_text(s: str) -> str:
        if s.startswith("@"):
            with open(s[1:]) as fh:
                return fh.read()
        return s

    def view(col_name: str, schema_src: str):
        schema = schema_text(schema_src)
        if dc.avro_available(spark):
            return dc.decode_avro(F.col(col_name), schema)
        from kafka_merge_purge_spark.functions.avro_py import avro_to_json_udf

        return avro_to_json_udf(schema)(F.col(col_name))

    if getattr(args, "avro", False):
        records = records.withColumn("value", view("value", args.avro_schema).cast("string"))
    if getattr(args, "avro_key", False):
        records = records.withColumn("key", view("key", args.avro_key_schema).cast("string"))
    return records


def cmd_print(args) -> int:
    spark = _session("cli-print", args)
    records = load_records(spark, args.sf_dir)
    if getattr(args, "avro", False) or getattr(args, "avro_key", False):
        records = _apply_avro_views(spark, records, args)
    rendered = routing.print_format(records)
    # Print.kt:38-41: log each record; driver-side show for parity
    for row in rendered.limit(args.limit).collect():
        print(f"--- {row['topic']}[{row['partition']}]@{row['offset']}")
        print(row["rendered"])
    n = rendered.count()
    print(f"Printed {min(n, args.limit)} of {n} records")  # R11 counter
    return 0


def cmd_merge_all(args) -> int:
    spark = _session("cli-merge-all", args)
    routed = routing.merge_all(
        load_records(spark, args.sf_dir),
        args.dest_topic,
        merge_tombstones=args.merge_tombstones,
    )
    counts = {r["leg"]: r["n"] for r in routed.groupBy("leg").agg(F.count("*").alias("n")).collect()}
    _emit(routed, args.out, "merge_all")
    # MergeAll.kt:54-58 epilogue stats
    print(f"Merged {counts.get('merge', 0)} records, purged {counts.get('purge', 0)}")
    return 0


def cmd_purge_all(args) -> int:
    spark = _session("cli-purge-all", args)
    purged = routing.purge_all(load_records(spark, args.sf_dir))
    n = purged.count()
    _emit(purged, args.out, "purge_all")
    print(f"Purged {n} records")  # PurgeAll.kt:41-45
    return 0


def _interactive_rule(spark, records, limit: int):
    """R9 ActionSource: prompt (m)erge/(p)urge/(s)kip per record over a
    driver-side sample; default merge, re-prompt on garbage
    (ActionSource.kt:9-27, test/ActionSourceTest.kt:59-72)."""
    sample = routing.filter_tombstones(records).limit(limit).collect()
    decisions = []
    for row in sample:
        print(f"Key:\n{row['key']}\nValue:\n{row['value']}")
        while True:
            choice = input("(m)erge, (p)urge or (s)kip? [m] ").strip().lower() or "m"
            if choice in ("m", "p", "s"):
                break
            print("Please answer m, p or s.")
        decisions.append((row["offset"], {"m": "MERGE", "p": "PURGE", "s": "SKIP"}[choice]))
    decided = spark.createDataFrame(decisions, "offset long, action string")
    return F.broadcast(decided)


def cmd_ask(args) -> int:
    spark = _session("cli-ask", args)
    records = load_records(spark, args.sf_dir)
    if args.interactive:
        decided = _interactive_rule(spark, records, args.limit)
        live = routing.filter_tombstones(records).join(decided, "offset")
        routed = routing.ask(live, args.dest_topic, F.col("action"))
    else:
        from kafka_merge_purge_spark.sources.batch import load_table

        events = load_table(spark, args.sf_dir, "events").withColumn("evalue", F.col("value"))
        from kafka_merge_purge_spark.model import records_from_events

        recs = records_from_events(events, extra_cols=("event_type", "evalue"))
        routed = routing.ask(recs, args.dest_topic, routing.default_ask_rule())
    # Ask.kt:38-40 counters: merged = records routed to dest; purged =
    # records explicitly purged (a merge's implicit purge doesn't count twice)
    counts = {
        r["which"]: r["n"]
        for r in routed.groupBy(
            F.when(F.col("leg") == "merge", "merged").otherwise(
                F.when(F.col("action") == "PURGE", "purged")
            ).alias("which")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    _emit(routed.drop("event_type", "evalue"), args.out, "ask")
    # Ask.kt:75-80 epilogue
    print(
        f"Merged {counts.get('merged', 0)} records, purged {counts.get('purged', 0)}"
    )
    return 0


def _kv(pairs: list[str] | None) -> dict[str, str]:
    out: dict[str, str] = {}
    for item in pairs or []:
        if "=" not in item:
            raise SystemExit(f"expected KEY=VALUE, got {item!r}")
        k, v = item.split("=", 1)
        out[k] = v
    return out


def client_configs(args) -> tuple[dict[str, str], dict[str, str]]:
    """Assemble the layered consumer/producer configs from the global CLI
    options (reference CLI.kt:20-116 → Factory.kt:44-107 precedence):
    files < shared overrides < per-client files < per-client overrides,
    with -b/--bootstrap-servers and -g/--group taking precedence over any
    properties file, and the forced semantics layer always winning."""
    from kafka_merge_purge_spark.sources.config import assemble_client_config

    shared_overrides = _kv(args.property)
    if args.bootstrap_servers:
        shared_overrides["bootstrap.servers"] = args.bootstrap_servers
    consumer_overrides = _kv(args.consumer_property)
    if args.group:
        consumer_overrides["group.id"] = args.group
    producer_overrides = _kv(args.producer_property)
    if args.transaction:
        producer_overrides["transactional.id"] = args.transaction
    consumer = assemble_client_config(
        "consumer",
        shared_file=args.properties,
        shared_overrides=shared_overrides,
        client_file=args.consumer_properties,
        client_overrides=consumer_overrides,
    )
    producer = assemble_client_config(
        "producer",
        shared_file=args.properties,
        shared_overrides=shared_overrides,
        client_file=args.producer_properties,
        client_overrides=producer_overrides,
    )
    return consumer, producer


def cmd_client_config(args) -> int:
    """Auditable view of the assembled client configs (R15) — the CLI twin
    of the reference's FactoryTest precedence matrix."""
    from kafka_merge_purge_spark.sources.config import render_properties

    consumer, producer = client_configs(args)
    cfg = consumer if args.kind == "consumer" else producer
    print(render_properties(cfg), end="")
    return 0


_SUBCOMMANDS = ("client-config", "print", "merge-all", "purge-all", "ask")


def _normalize_transaction_flag(argv: list[str]) -> list[str]:
    """The reference's ``-t`` is usable as a bare toggle anywhere on the
    line (CLI.kt:100-105: transactional id optional).  argparse's
    ``nargs='?'`` greedily consumes the NEXT token, so ``-t print dir``
    would parse ``transaction='print'`` and then fail on a missing
    subcommand.  Splice the default id in whenever ``-t`` is followed by
    a subcommand name, another option, or nothing."""
    out: list[str] = []
    for i, tok in enumerate(argv):
        out.append(tok)
        if tok in ("-t", "--transaction"):
            nxt = argv[i + 1] if i + 1 < len(argv) else None
            if nxt is None or nxt.startswith("-") or nxt in _SUBCOMMANDS:
                out.append("kafka-merge-purge-spark")
    return out


def main(argv: list[str] | None = None) -> int:
    from kafka_merge_purge_spark import __version__

    argv = _normalize_transaction_flag(sys.argv[1:] if argv is None else list(argv))

    p = argparse.ArgumentParser(prog="kafka-merge-purge-spark")
    p.add_argument("--version", action="version", version=f"kafka-merge-purge-spark {__version__}")
    # global client options (reference CLI.kt:20-151); our batch commands
    # run on parquet snapshots, so these feed the Kafka reader/sink
    # builders and the client-config subcommand rather than a live broker
    p.add_argument("-b", "--bootstrap-servers", default=None,
                   help="Kafka bootstrap servers; takes precedence over properties files")
    p.add_argument("-g", "--group", default=None, help="consumer group for the source topic")
    p.add_argument("-O", "--properties", default=None, help="shared client properties file")
    p.add_argument("-o", "--property", action="append", metavar="KEY=VALUE",
                   help="additional shared client property (repeatable)")
    p.add_argument("-C", "--consumer-properties", default=None, help="consumer properties file")
    p.add_argument("-c", "--consumer-property", action="append", metavar="KEY=VALUE",
                   help="additional consumer property (repeatable)")
    p.add_argument("-P", "--producer-properties", default=None, help="producer properties file")
    p.add_argument("-p", "--producer-property", action="append", metavar="KEY=VALUE",
                   help="additional producer property (repeatable)")
    p.add_argument("-t", "--transaction", nargs="?", const="kafka-merge-purge-spark",
                   default=None, metavar="TRANSACTIONAL_ID",
                   help="produce within transactions (optional transactional id)")
    p.add_argument("-n", "--no-commit", action="store_true",
                   help="do not commit consumer offsets")
    p.add_argument("-v", "--verbose", action="store_true", help="enable verbose logging")
    sub = p.add_subparsers(dest="cmd", required=True)

    cc = sub.add_parser("client-config", help="show the assembled client config (R15)")
    cc.add_argument("kind", choices=["consumer", "producer"])
    cc.set_defaults(fn=cmd_client_config)

    pr = sub.add_parser("print", help="pretty-print records (R10)")
    pr.add_argument("sf_dir")
    pr.add_argument("--limit", type=int, default=20)
    pr.add_argument(
        "-a", "--avro", action="store_true",
        help="force Avro deserializer for record values (CLI.kt:130-138); "
        "supply the writer schema via --avro-schema (no registry here)",
    )
    pr.add_argument("--avro-schema", default=None, help="Avro schema JSON, or @file")
    pr.add_argument(
        "-A", "--avro-key", action="store_true",
        help="force Avro deserializer for record keys (CLI.kt:119-127)",
    )
    pr.add_argument("--avro-key-schema", default=None, help="Avro schema JSON, or @file")
    pr.set_defaults(fn=cmd_print)

    ma = sub.add_parser("merge-all", help="merge every record to dest, purge source (R6)")
    ma.add_argument("sf_dir")
    ma.add_argument("dest_topic")
    ma.add_argument("--out", default=None)
    ma.add_argument(
        "-T",
        "--merge-tombstones",
        action="store_true",
        help="forward tombstones to dest as delete markers (MergeAll.kt:15-19)",
    )
    ma.set_defaults(fn=cmd_merge_all)

    pa = sub.add_parser("purge-all", help="tombstone every live record (R7)")
    pa.add_argument("sf_dir")
    pa.add_argument("--out", default=None)
    pa.set_defaults(fn=cmd_purge_all)

    ak = sub.add_parser("ask", help="3-way route per record (R8)")
    ak.add_argument("sf_dir")
    ak.add_argument("dest_topic")
    ak.add_argument("--out", default=None)
    ak.add_argument("--interactive", action="store_true")
    ak.add_argument("--limit", type=int, default=10)
    ak.set_defaults(fn=cmd_ask)

    args = p.parse_args(argv)
    if getattr(args, "avro", False) and not args.avro_schema:
        p.error("--avro requires --avro-schema (no schema registry in this environment)")
    if getattr(args, "avro_key", False) and not args.avro_key_schema:
        p.error("--avro-key requires --avro-key-schema")
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
