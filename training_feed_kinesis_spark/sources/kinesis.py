"""Kinesis stream source — the reference-class ingest (SURVEY §1.1, §1.4).

The reference system consumes an AWS Kinesis training-feed stream (sharded,
ordered-per-shard, at-least-once). In Spark terms that is a streaming
DataFrame from a Kinesis connector; everything downstream (§2 operators)
is source-agnostic, which is the point of the mapping table in SURVEY §1.4:
swap this source for the file-replay source and every operator still runs.

No Kinesis endpoint (or connector jar) exists in CI, so:
  * :func:`kinesis_stream` builds the readStream descriptor for a real
    deployment (connector formats tried in order);
  * :func:`feed_stream` is the entry operators use — real Kinesis when
    configured via env, deterministic file replay otherwise.

At-least-once → exactly-once posture (SURVEY §1.1): dedup on the payload's
unique key within a watermark (`stream_dedup`) + idempotent foreachBatch
sinks keyed by batchId (`stream_exactly_once`).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# payload schema: schema-on-read lives in consumer code (SURVEY §1.1) —
# streaming sources never infer
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

# connector formats, in preference order (public Structured Streaming
# Kinesis connectors register under these names)
_KINESIS_FORMATS = ("aws-kinesis", "kinesis")


@dataclass(frozen=True)
class KinesisSourceConfig:
    stream_name: str
    region: str = "us-east-1"
    endpoint_url: str | None = None
    # TRIM_HORIZON replays the retained window; LATEST tails
    initial_position: str = "TRIM_HORIZON"
    format_name: str = _KINESIS_FORMATS[0]
    options: dict = field(default_factory=dict)

    @classmethod
    def from_env(cls) -> "KinesisSourceConfig | None":
        name = os.environ.get("TFK_KINESIS_STREAM")
        if not name:
            return None
        return cls(
            stream_name=name,
            region=os.environ.get("AWS_REGION", "us-east-1"),
            endpoint_url=os.environ.get("TFK_KINESIS_ENDPOINT"),
        )


def kinesis_stream(spark: SparkSession, cfg: KinesisSourceConfig) -> DataFrame:
    """Raw Kinesis record stream → typed event DataFrame.

    Kinesis records arrive as {data: binary, partitionKey, sequenceNumber,
    approximateArrivalTimestamp}; the JSON payload is parsed with the
    explicit EVENT_SCHEMA (arrival time kept for event-time-vs-arrival
    skew analysis). Scale: one input partition per shard; repartition by
    a payload key only when downstream keyed state needs locality.
    """
    reader = (
        spark.readStream.format(cfg.format_name)
        .option("streamName", cfg.stream_name)
        .option("region", cfg.region)
        .option("initialPosition", cfg.initial_position)
    )
    if cfg.endpoint_url:
        reader = reader.option("endpointUrl", cfg.endpoint_url)
    for k, v in cfg.options.items():
        reader = reader.option(k, v)
    raw = reader.load()
    return raw.select(
        F.from_json(F.col("data").cast("string"), EVENT_SCHEMA).alias("ev"),
        F.col("approximateArrivalTimestamp").alias("arrival_ts"),
    ).select("ev.*", "arrival_ts")


def feed_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-feed stream: Kinesis when configured, file replay in CI."""
    cfg = KinesisSourceConfig.from_env()
    if cfg is not None:  # pragma: no cover — needs a live endpoint
        return kinesis_stream(spark, cfg)
    from ..streaming.replay import replay_stream

    return replay_stream(spark, sf_dir)


def event_to_kinesis_record(df: DataFrame) -> DataFrame:
    """Inverse mapping for producers: typed events → (partitionKey, data)
    records ready for a Kinesis sink (partition key = user_id so per-user
    ordering survives sharding, exactly like the reference feed)."""
    return df.select(
        F.col("user_id").cast("string").alias("partitionKey"),
        F.to_json(F.struct(*df.columns)).cast("binary").alias("data"),
    )
