"""Service entry point: ``python -m quacfka_service_spark``.

The Spark-native twin of the reference's flag-configured service main
(/root/reference/main.go:40-58).  Reference flags map as:

    reference (main.go)        here
    ------------------------   ---------------------------------------
    -t  topic                  --topic
    -g  consumer group         --group
    -kr kafka client count     --min-partitions (hint; tasks = topic partitions)
    -kc msg chan capacity x8   --max-offsets-per-trigger
    -gr decode goroutines      (executor task parallelism; no flag needed)
    -acr duck connections      (sink task parallelism; no flag needed)
    -q  arrow queue size       (micro-batch pipelining; no flag needed)
    -bs batch multiplier       --trigger-secs (pacing)
    -s  rotate threshold MB    (micro-batch = the bounded unit)
    -mp GOMAXPROCS             --cpus (local[N])
    env KSEEDS/KUSER/KPASS     --seeds / --user / --password (same envs honored)

Dev mode replays Kafka-shaped parquet records: --source-files DIR.
"""

from __future__ import annotations

import argparse
import os
import signal
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="quacfka_service_spark")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--source-files", help="dir of Kafka-shaped parquet (dev replay)")
    src.add_argument("--topic", help="Kafka topic (prod)")
    p.add_argument("--seeds", default=os.environ.get("KSEEDS", ""), help="broker seeds, comma-separated")
    p.add_argument("--user", default=os.environ.get("KUSER", ""))
    p.add_argument("--password", default=os.environ.get("KPASS", ""))
    p.add_argument("--group", default="quacfka")
    p.add_argument("--min-partitions", type=int, default=5)
    p.add_argument("--max-offsets-per-trigger", type=int, default=122_880 * 8)
    p.add_argument("--lake", required=True, help="output lake root")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--metrics-jsonl", default="metrics.jsonl")
    p.add_argument("--trigger-secs", type=float, default=None)
    p.add_argument("--available-now", action="store_true", help="drain and exit")
    p.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    p.add_argument("--no-confluent-prefix", action="store_true")
    p.add_argument("--ts-suffix", action="store_true",
                   help="payloads carry the reference's 8-byte LE timestamp suffix")
    p.add_argument("--descriptor", default=None,
                   help="protobuf descriptor set for the JVM decode path")
    args = p.parse_args(argv)

    from . import KafkaConfig, Pipeline, get_spark

    spark = get_spark("quacfka-service-spark", cpus=args.cpus)
    pipe = Pipeline(spark)
    if args.source_files:
        pipe = pipe.source_files(args.source_files)
        if not args.no_confluent_prefix:
            pipe = pipe.decode(confluent_prefix=True)
    else:
        conf = KafkaConfig(
            seeds=args.seeds.split(",") if args.seeds else [],
            topic=args.topic,
            consumer_group=args.group,
            user=args.user,
            password=args.password,
            client_count=args.min_partitions,
            max_offsets_per_trigger=args.max_offsets_per_trigger,
            confluent_prefix=not args.no_confluent_prefix,
        )
        pipe = pipe.source_kafka(conf)
    pipe = pipe.decode(ts_suffix=args.ts_suffix, desc_path=args.descriptor)
    pipe = pipe.sink_lake(args.lake, args.checkpoint, metrics_jsonl=args.metrics_jsonl)
    pipe = pipe.trigger(available_now=args.available_now,
                        processing_time_secs=args.trigger_secs)

    handle = pipe.run()

    # T7 graceful shutdown (reference: SIGINT/SIGTERM -> cancel + report,
    # main.go:409-429)
    def _stop(signum, frame):
        handle.stop()

    signal.signal(signal.SIGINT, _stop)
    signal.signal(signal.SIGTERM, _stop)
    handle.await_termination()
    err = handle.error()
    if err is not None:
        print(err, file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
