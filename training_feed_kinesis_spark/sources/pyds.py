"""Kinesis-style sharded replay via the Python Data Source API (Spark 4).

The reference class ingests a sharded Kinesis stream: records carry a
partition key, land on a shard by key hash, and are ordered per shard by
sequence number. This module re-creates that contract as a first-class
Spark SOURCE — ``spark.read.format("kinesis_replay")`` — using the Python
Data Source API (SPARK-44076, Spark 4.0): one InputPartition per shard,
each task yielding its shard's records in sequence order with the Kinesis
envelope columns (shard_id, partition_key, sequence_number).

Shard routing is md5-hex based — the same assignment is computable in
ANSI SQL, so unlike a real network source this one is DuckDB-oracle-able
end-to-end (the oracle recomputes shard ids from the raw parquet).

At scale: a real connector implements ``partitions()`` as the stream's
shard list (resharding-aware) and ``read()`` as a GetRecords iterator
pull; the envelope schema, per-shard ordering, and partition-per-shard
parallelism here are exactly that topology. Arrow note: ``read()`` may
yield tuples or pyarrow RecordBatches; we yield per-shard RecordBatch
slices, the zero-copy path into the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..operators.exact import CENTS_SUM_SQL, cents_sum

N_SHARDS = 4

# exact integer-cents SUM, unrounded (r11 magnitude lint, SURVEY 5.3.9a)
_VAL_CENTS_SUM = CENTS_SUM_SQL.format(col="value")

_SCHEMA = (
    "shard_id int, sequence_number bigint, partition_key string, "
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def _shard_of_hex(first_hex_char: str) -> int:
    return "0123456789abcdef".index(first_hex_char) % N_SHARDS


try:  # Python Data Source API requires pyspark >= 4.0
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _ShardPartition(InputPartition):
        def __init__(self, shard_id: int, path: str):
            self.shard_id = shard_id
            self.path = path

    class KinesisReplayReader(DataSourceReader):
        def __init__(self, options):
            self.path = options["path"]

        def partitions(self):
            return [_ShardPartition(i, self.path) for i in range(N_SHARDS)]

        def read(self, partition):
            # Executor-side: read only this shard's records, in sequence
            # order. A real Kinesis reader replaces this with a
            # GetShardIterator/GetRecords pull loop; the parquet replay
            # keeps the same envelope + ordering contract testable.
            import hashlib

            import pyarrow as pa
            import pyarrow.compute as pc
            import pyarrow.parquet as pq

            t = pq.read_table(partition.path)
            # µs precision to match the engine's nanos→micros convention
            t = t.set_column(
                t.schema.get_field_index("ts"),
                "ts",
                # safe=False truncates sub-µs (same as the engine's
                # integer-div nanos→micros convention)
                pc.cast(t.column("ts"), pa.timestamp("us"), safe=False),
            )
            uid = t.column("user_id").to_pylist()
            # a record with no user id gets the EMPTY partition key (a
            # real Kinesis put requires an explicit key; '' is the
            # deterministic sentinel) — str(None) would smuggle the text
            # 'None' into the hash while the SQL oracle's md5(NULL) NULLs
            # the shard (NULL-attribute corruption replay)
            keys = [str(u) if u is not None else "" for u in uid]
            shard = [
                _shard_of_hex(hashlib.md5(k.encode()).hexdigest()[0])
                for k in keys
            ]
            # explicit bool type: an EMPTY python list infers pa.null()
            # and Table.filter rejects a null-typed mask (r9 empty-table
            # sweep — zero-row events file)
            mask = pa.array(
                [s == partition.shard_id for s in shard], pa.bool_()
            )
            t = t.append_column("partition_key", pa.array(keys, pa.string()))
            t = t.filter(mask)
            # per-shard sequence order = event_id (arrival order in replay)
            t = t.sort_by("event_id")
            n = t.num_rows
            out = pa.table(
                {
                    "shard_id": pa.array([partition.shard_id] * n, pa.int32()),
                    "sequence_number": pa.array(range(n), pa.int64()),
                    "partition_key": t.column("partition_key"),
                    "event_id": t.column("event_id"),
                    "ts": t.column("ts"),
                    "user_id": t.column("user_id"),
                    "event_type": t.column("event_type"),
                    "value": t.column("value"),
                    "props": t.column("props"),
                }
            )
            yield from out.to_batches()

    class KinesisReplayDataSource(DataSource):
        @classmethod
        def name(cls):
            return "kinesis_replay"

        def schema(self):
            return _SCHEMA

        def reader(self, schema):
            return KinesisReplayReader(self.options)

    _PYDS_AVAILABLE = True
except ImportError:  # pragma: no cover - pyspark < 4.0
    _PYDS_AVAILABLE = False


def read_kinesis_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Register (idempotent) and read the kinesis_replay source."""
    spark.dataSource.register(KinesisReplayDataSource)
    return (
        spark.read.format("kinesis_replay")
        .option("path", f"{sf_dir}/events.parquet")
        .load()
    )


@register(
    "source_kinesis_pyds",
    "2.A scans/sources/sinks",
    f"""
    WITH sharded AS (
      SELECT (strpos('0123456789abcdef',
                     substr(md5(COALESCE(user_id::VARCHAR, '')), 1, 1)) - 1) % {N_SHARDS}
               AS shard_id,
             event_type, value
      FROM events)
    SELECT shard_id, event_type, COUNT(*) AS n,
           {_VAL_CENTS_SUM} AS total_value
    FROM sharded
    GROUP BY shard_id, event_type
    """,
)
def source_kinesis_pyds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard traffic profile read THROUGH the custom Python data
    source — proves the source yields exactly the stream's records with
    correct shard routing (the DuckDB oracle recomputes the md5 shard
    assignment directly from the raw parquet).
    """
    df = read_kinesis_replay(spark, sf_dir)
    return df.groupBy("shard_id", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        cents_sum("value").alias("total_value"),
    )


# --- streaming variant: offset-managed replay (SimpleDataSourceStreamReader)

if _PYDS_AVAILABLE:
    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    def _envelope_rows(path: str):
        """All events as Kinesis-envelope tuples, shard-routed and ordered
        by (shard, event_id) with per-shard sequence numbers."""
        import hashlib

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        t = pq.read_table(path)
        t = t.set_column(
            t.schema.get_field_index("ts"),
            "ts",
            pc.cast(t.column("ts"), pa.timestamp("us"), safe=False),
        )
        # temporal admission (tables.SANE_TS_*, r12): an out-of-window
        # event time (e.g. a 9999-12-31 sentinel) breaks the datasource
        # runner's Arrow ns conversion and would wedge any downstream
        # watermark — a real Kinesis consumer validates event time at
        # the envelope boundary. NULL ts rows still flow.
        import datetime as _dt

        _lo, _hi = _dt.datetime(1970, 1, 1), _dt.datetime(2200, 1, 1)
        rows = [
            r
            for r in t.to_pylist()
            if r["ts"] is None or (_lo <= r["ts"] < _hi)
        ]
        seq: dict[int, int] = {}
        out = []
        # NULL event_ids sort LAST (matching the batch reader's Arrow
        # sort_by default) in stable original order — sorted() on a
        # raw None key is a TypeError (NULL-PK r9); a Kinesis envelope
        # does not require a payload id, so the record still flows
        for r in sorted(
            rows,
            key=lambda r: (
                r["event_id"] is None,
                r["event_id"] if r["event_id"] is not None else 0,
            ),
        ):
            # same empty-partition-key convention as the batch reader
            key = str(r["user_id"]) if r["user_id"] is not None else ""
            sh = _shard_of_hex(hashlib.md5(key.encode()).hexdigest()[0])
            s = seq.get(sh, 0)
            seq[sh] = s + 1
            out.append(
                (
                    sh,
                    s,
                    key,
                    r["event_id"],
                    r["ts"],
                    r["user_id"],
                    r["event_type"],
                    r["value"],
                    r["props"],
                )
            )
        return out

    class KinesisReplayStreamReader(SimpleDataSourceStreamReader):
        """Offset-managed replay: the offset is the count of records already
        emitted; each poll emits everything newly available (here: the whole
        remaining replay — one micro-batch per drain). A restarted query
        resumes from the checkpointed offset and reads zero duplicates —
        the sequence-number checkpoint contract of a Kinesis consumer."""

        def __init__(self, options):
            self.path = options["path"]

        def initialOffset(self):
            return {"emitted": 0}

        def read(self, start):
            rows = _envelope_rows(self.path)
            i = start["emitted"]
            if i >= len(rows):
                return (iter([]), start)
            return (iter(rows[i:]), {"emitted": len(rows)})

        def readBetweenOffsets(self, start, end):
            rows = _envelope_rows(self.path)
            return iter(rows[start["emitted"] : end["emitted"]])

    class KinesisReplayStreamDataSource(DataSource):
        @classmethod
        def name(cls):
            return "kinesis_replay_stream"

        def schema(self):
            return _SCHEMA

        def simpleStreamReader(self, schema):
            return KinesisReplayStreamReader(self.options)


@register(
    "source_kinesis_pyds_stream",
    "2.I streaming",
    f"""
    WITH sharded AS (
      SELECT (strpos('0123456789abcdef',
                     substr(md5(COALESCE(user_id::VARCHAR, '')), 1, 1)) - 1) % {N_SHARDS}
               AS shard_id,
             event_type, value
      FROM events
      WHERE (ts IS NULL OR (ts >= TIMESTAMP '1970-01-01' AND ts < TIMESTAMP '2200-01-01')))
    SELECT shard_id, event_type, COUNT(*) AS n,
           {_VAL_CENTS_SUM} AS total_value
    FROM sharded
    GROUP BY shard_id, event_type
    """,
)
def source_kinesis_pyds_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING read through the custom Python data source: readStream →
    per-shard aggregate → AvailableNow drain. The drained result must equal
    the batch profile (exactly-once: offset checkpointing yields no loss and
    no replay duplicates), which is precisely what the oracle asserts.
    """
    from ..streaming.replay import drain

    spark.dataSource.register(KinesisReplayStreamDataSource)
    stream = (
        spark.readStream.format("kinesis_replay_stream")
        .option("path", f"{sf_dir}/events.parquet")
        .load()
    )
    return drain(
        stream.groupBy("shard_id", "event_type").agg(
            F.count(F.lit(1)).alias("n"),
            cents_sum("value").alias("total_value"),
        ),
        "complete",
    )
