"""S1 kafka_source: Structured Streaming Kafka reader configuration.

Mirrors the reference's Kafka config surface
(/root/reference/main.go:221-232, README.md:27-38) onto the Spark Kafka
source.  Differences are capability-for-capability, not knob-for-knob:

- ``ClientCount=5`` concurrent franz-go clients (main.go:222): Spark
  maps one task per topic partition; read parallelism is
  partitions x executor cores, no manual client count.  Kept in the
  config for API parity, used only for ``minPartitions`` hinting.
- ``MsgChanCap`` (main.go:223): admission is pull-based per
  micro-batch; the analogous ceiling is ``maxOffsetsPerTrigger``
  (S11 backpressure_gate, main.go:302-316, collapses into this too).
- SASL user/password (README.md:30-33): jaas config string.

This module only *builds* the reader; the dev container has no Kafka
broker or spark-sql-kafka jar, so it is exercised by unit tests on the
option dict and by the file-source stand-in (files.py) end-to-end.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class KafkaConfig:
    """Reference fields at main.go:221-232."""

    seeds: list[str] = field(default_factory=list)   # k.Seeds
    topic: str = ""                                  # k.Topic
    consumer_group: str = "quacfka"                  # k.ConsumerGroup
    user: str = ""                                   # k.User
    password: str = ""                               # k.Password
    client_count: int = 5                            # k.ClientCount (flag kr)
    max_offsets_per_trigger: int | None = 122_880 * 8  # ≈ MsgChanCap (flag kc)
    starting_offsets: str = "latest"
    confluent_prefix: bool = True                    # k.Munger (main.go:231)

    def reader_options(self) -> dict[str, str]:
        opts = {
            "kafka.bootstrap.servers": ",".join(self.seeds),
            "subscribe": self.topic,
            "kafka.group.id": self.consumer_group,
            "startingOffsets": self.starting_offsets,
            "minPartitions": str(self.client_count),
        }
        if self.max_offsets_per_trigger:
            opts["maxOffsetsPerTrigger"] = str(self.max_offsets_per_trigger)
        if self.user:
            opts["kafka.sasl.mechanism"] = "SCRAM-SHA-256"
            opts["kafka.security.protocol"] = "SASL_SSL"
            opts["kafka.sasl.jaas.config"] = (
                "org.apache.kafka.common.security.scram.ScramLoginModule required "
                f'username="{self.user}" password="{self.password}";'
            )
        return opts


def kafka_stream(spark: SparkSession, conf: KafkaConfig) -> DataFrame:
    """readStream over the topic; returns Kafka record shape
    (key, value, topic, partition, offset, timestamp, ...)."""
    reader = spark.readStream.format("kafka")
    for k, v in conf.reader_options().items():
        reader = reader.option(k, v)
    return reader.load()


def le_uint64_suffix(col: str = "value") -> F.Column:
    """F11 le_uint64_decode (main.go:332-333): trailing 8 little-endian
    bytes as a long, pure JVM expression (no UDF) — needed only when
    replaying reference-framed payloads whose Kafka timestamp was
    smuggled into the payload (S3)."""
    terms = None
    for i in range(8):
        byte = F.expr(f"cast(conv(hex(substring({col}, length({col}) - {7 - i}, 1)), 16, 10) as bigint)")
        term = byte * F.lit(1 << (8 * i)).cast("long")
        terms = term if terms is None else terms + term
    return terms
