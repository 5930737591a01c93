"""CLI — mirrors the reference binary's command surface
(``main/main.go:557-763``):

    python -m pg_bifrost_spark replicate <stdout|s3|kinesis|rabbitmq|kafka>
    python -m pg_bifrost_spark create   # replication slot (stdlib wire client)
    python -m pg_bifrost_spark drop

Pipeline config comes from the environment (config.from_env — the
reference's env-var names); source/sink specifics from flags.
"""

from __future__ import annotations

import argparse
import sys

from .config import resolve
from .session import get_spark
from .streaming.core import start_cdc_query


def _sink(args):
    from pyspark.sql import functions as F

    if args.sink == "stdout":
        from .sinks.writers import stdout_writer

        return stdout_writer()
    if args.sink == "s3":
        from .sinks.writers import s3_time_partitioned

        if not args.out:
            raise SystemExit("--out <path> required for the s3/file sink")
        return lambda df, epoch: s3_time_partitioned(df, args.out)
    if args.sink == "file-exactly-once":
        from .sinks.writers import exactly_once_ndjson

        if not args.out:
            raise SystemExit("--out <path> required for the exactly-once file sink")
        return lambda df, epoch: exactly_once_ndjson(df, epoch, args.out)
    if args.sink == "kinesis":
        from .sinks.writers import kinesis_writer

        if not args.stream_name:
            raise SystemExit("--stream-name required for kinesis")
        return kinesis_writer(args.stream_name)
    if args.sink == "rabbitmq":
        from .sinks.writers import rabbitmq_writer

        return rabbitmq_writer(args.exchange or "pg_bifrost")
    if args.sink == "kafka":
        from .sinks.writers import kafka_frame

        if not args.brokers or not args.topic:
            raise SystemExit("--brokers and --topic required for kafka")

        from .sinks.kafka_config import apply_kafka_options, kafka_producer_options

        producer_opts = kafka_producer_options()  # reference-tuned defaults

        def kafka_sink(df, epoch):
            w = (
                kafka_frame(df)
                .write.format("kafka")
                .option("kafka.bootstrap.servers", args.brokers)
                .option("topic", args.topic)
            )
            apply_kafka_options(w, producer_opts).save()

        return kafka_sink
    raise SystemExit(f"unknown sink {args.sink!r}")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pg_bifrost_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    rep = sub.add_parser("replicate", help="run the CDC pipeline into a sink")
    rep.add_argument(
        "sink",
        choices=["stdout", "s3", "file-exactly-once", "kinesis", "rabbitmq", "kafka"],
    )
    rep.add_argument("--wal-dir", help="replay-transport WAL directory")
    rep.add_argument("--dsn", help="postgres DSN for the live transport")
    rep.add_argument("--slot", default="pg_bifrost_spark")
    rep.add_argument(
        "--plugin",
        choices=["test_decoding", "pgoutput"],
        default="test_decoding",
        help="logical-decoding plugin (pgoutput = in-core native replication)",
    )
    rep.add_argument(
        "--publication-names",
        default="pgbifrost",
        help="pgoutput publication list (ignored for test_decoding)",
    )
    rep.add_argument(
        "--pgoutput-proto-version",
        type=int,
        choices=[1, 2, 3],
        default=1,
        help="pgoutput protocol version (2 = streamed in-progress "
        "txns, 3 = two-phase commit)",
    )
    rep.add_argument(
        "--two-phase",
        action="store_true",
        help="decode PREPARE TRANSACTION flows (requires --plugin "
        "pgoutput, --pgoutput-proto-version 3, and a TWO_PHASE slot)",
    )
    rep.add_argument(
        "--skip-origins",
        default="",
        help="comma-separated replication-origin names to drop "
        "(bidirectional loop prevention; pgoutput only)",
    )
    rep.add_argument("--checkpoint", required=True, help="checkpointLocation")
    rep.add_argument("--out", help="s3/file sink output path")
    rep.add_argument("--stream-name", help="kinesis stream name")
    rep.add_argument("--exchange", help="rabbitmq exchange")
    rep.add_argument("--brokers", help="kafka bootstrap servers")
    rep.add_argument("--topic", help="kafka topic")
    rep.add_argument("--trigger-seconds", type=float, default=None)
    rep.add_argument("--once", action="store_true", help="drain available data and exit")
    # pipeline config flags (reference main.go:557-763); precedence
    # CLI > env > --config YAML > default (main.go:561-567)
    rep.add_argument("--config", help="YAML config file (lowest-precedence layer)")
    rep.add_argument("--whitelist", help="comma-separated table whitelist")
    rep.add_argument("--blacklist", help="comma-separated table blacklist")
    rep.add_argument("--whitelist-regex", action="store_const", const="true", default=None)
    rep.add_argument("--blacklist-regex", action="store_const", const="true", default=None)
    rep.add_argument(
        "--partition-method",
        choices=["none", "tablename", "transaction", "transaction-bucket"],
    )
    rep.add_argument("--partition-count", type=int, default=None)
    rep.add_argument("--no-marshal-old-value", action="store_const", const="true", default=None)
    rep.add_argument("--workers", type=int, default=None)
    rep.add_argument("--batcher-routing-method", choices=["round-robin", "partition"])
    rep.add_argument("--client-buffer-size", type=int, default=None)

    for name in ("create", "drop"):
        c = sub.add_parser(name, help=f"{name} the replication slot")
        c.add_argument("--dsn", required=True)
        c.add_argument("--slot", default="pg_bifrost_spark")
        c.add_argument(
            "--plugin",
            choices=["test_decoding", "pgoutput"],
            default="test_decoding",
            help="plugin the slot decodes with (create only)",
        )
        c.add_argument(
            "--two-phase",
            action="store_true",
            help="create the slot with TWO_PHASE (PG 15+; create only)",
        )

    args = p.parse_args(argv)

    if args.cmd in ("create", "drop"):
        from .sources.pgcdc import LiveTransport

        if args.cmd == "create":
            LiveTransport.create_slot_ddl(
                args.dsn, args.slot, plugin=args.plugin, two_phase=args.two_phase
            )
        else:
            LiveTransport.drop_slot_ddl(args.dsn, args.slot)
        return 0

    cli_layer = {
        "WHITELIST": args.whitelist,
        "BLACKLIST": args.blacklist,
        "WHITELIST_REGEX": args.whitelist_regex,
        "BLACKLIST_REGEX": args.blacklist_regex,
        "PARTITION_METHOD": args.partition_method,
        "PARTITION_COUNT": args.partition_count,
        "NO_MARSHAL_OLD_VALUE": args.no_marshal_old_value,
        "WORKERS": args.workers,
        "BATCHER_ROUTING_METHOD": args.batcher_routing_method,
        "CLIENT_BUFFER_SIZE": args.client_buffer_size,
    }
    cfg = resolve(cli=cli_layer, config_file=args.config)
    spark = get_spark(app_name=f"pg_bifrost_spark_{args.sink}")
    source_options = {}
    if args.wal_dir:
        source_options["wal_dir"] = args.wal_dir
    if args.dsn:
        source_options["dsn"] = args.dsn
        source_options["slot"] = args.slot
        source_options["plugin"] = args.plugin
        source_options["publication_names"] = args.publication_names
        source_options["pgoutput_proto_version"] = str(args.pgoutput_proto_version)
        if args.skip_origins:
            source_options["skip_origins"] = args.skip_origins
        if args.two_phase:
            source_options["two_phase"] = "on"
    source_options["max_msgs_per_batch"] = str(cfg.client_buffer_size)

    workers = cfg.workers if cfg.routing_method == "partition" else None
    if args.once:
        from .streaming.core import drain_cdc_query

        drain_cdc_query(
            spark,
            _sink(args),
            checkpoint_dir=args.checkpoint,
            cfg=cfg.pipeline,
            workers=workers,
            source_options=source_options,
        )
        return 0
    q = start_cdc_query(
        spark,
        _sink(args),
        checkpoint_dir=args.checkpoint,
        cfg=cfg.pipeline,
        trigger_seconds=args.trigger_seconds,
        workers=workers,
        source_options=source_options,
    )
    q.awaitTermination()
    return 0


if __name__ == "__main__":
    sys.exit(main())
