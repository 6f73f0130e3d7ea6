"""training_feed_kinesis_spark — a PySpark-native analytics engine.

A from-scratch, idiomatic PySpark re-conception of the capability surface of
``datapao/training-feed-kinesis`` (a Kinesis training-feed stream processor;
see SURVEY.md §0 — the reference checkout is an empty directory, so the
contract is SURVEY.md §2, reconstructed from the driver's characterization
plus public Spark/Kinesis knowledge).

Design stance (SURVEY.md §4): declare logical plans with the DataFrame/SQL
API, let Catalyst + Tungsten + AQE pick physical strategies; Python UDFs only
where built-ins genuinely cannot express the semantics, and then always
Arrow-batched (pandas_udf / applyInPandas / mapInPandas).

Layout:
    session.py     SparkSession builder + defensive per-session configuration
    tables.py      parquet table loading (incl. the nanos-timestamp fix)
    registry.py    the operator registry backing __spark_entry__.py
    operators/     batch operators, one module per SURVEY §2 category
    sources/       source/sink connectors (kinesis config, json, parquet)
    streaming/     Structured Streaming operators (file-replay harness)
    functions/     scalar-function family queries
"""

__version__ = "0.1.0"
