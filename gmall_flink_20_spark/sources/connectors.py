"""External stream connectors (SURVEY §2.1 S1/S2/S4).

- S1 file/CSV: the reference's ``env.readTextFile`` + positional
  ``split(",")`` parse (HotItemApp.java:40-49) is ``csv_lines_to_rows``
  applied to a text/file stream — schema-on-read instead of hand casts.
- S2 socket: ``env.socketTextStream`` (HotUrlApp2.java:41, test tree) is
  the ``socket`` streaming format + the same line parser.
- S4 kafka: declared in the reference POM but never used in code
  (pom.xml:43-47); here it's first-class — value bytes parsed by the same
  CSV/JSON line decoders.

The connector builders only *declare* sources (no connection happens
until ``.start()``), so they are usable in environments without a broker;
the line decoders are pure column transforms, unit-tested on static
frames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = [
    "csv_lines_to_rows",
    "json_lines_to_rows",
    "text_file_stream",
    "socket_stream",
    "kafka_stream",
    "kafka_source_options",
    "kafka_decode",
    "KAFKA_WIRE_SCHEMA",
]


def csv_lines_to_rows(lines: DataFrame, schema: StructType, sep: str = ",", line_col: str = "value") -> DataFrame:
    """Positional CSV parse of a line column against a schema (the
    reference's ``split(",")`` + casts, done by ``from_csv`` natively)."""
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
    return lines.select(
        F.from_csv(F.col(line_col), ddl, {"sep": sep}).alias("r")
    ).select("r.*")


def json_lines_to_rows(lines: DataFrame, schema: StructType, line_col: str = "value") -> DataFrame:
    return lines.select(F.from_json(F.col(line_col), schema).alias("r")).select("r.*")


def text_file_stream(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def socket_stream(spark: SparkSession, host: str, port: int) -> DataFrame:
    """Line stream from a TCP socket (the reference's live-demo source)."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


# The fixed record schema every Spark kafka source emits (Structured
# Streaming + Kafka Integration Guide) — the wire contract kafka_decode
# is tested against on static frames, since the kafka package itself
# cannot be on the classpath in this environment.
KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)


def kafka_source_options(
    bootstrap_servers: str, topic: str, starting_offsets: str = "earliest"
) -> dict[str, str]:
    """The reader options ``kafka_stream`` configures — exposed as a pure
    function so the source wiring is contract-testable without a broker
    (VERDICT r5 item 5)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


def kafka_decode(raw: DataFrame) -> DataFrame:
    """The post-load decode ``kafka_stream`` applies to the wire records:
    key/value bytes → UTF-8 strings, keep the broker timestamp. Pure
    column transform — testable on a static ``KAFKA_WIRE_SCHEMA`` frame,
    then composed with csv/json_lines_to_rows exactly like the file and
    socket sources."""
    return raw.selectExpr(
        "CAST(key AS STRING) AS key",
        "CAST(value AS STRING) AS value",
        "timestamp",
    )


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka value-bytes stream; pair with csv/json_lines_to_rows on the
    decoded ``value``. Requires the spark-sql-kafka package on the
    classpath (source resolution happens at ``.load()``); the options and
    decode halves are individually covered by the broker-free contract
    tests in tests/test_kafka_contract.py."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(bootstrap_servers, topic, starting_offsets).items():
        reader = reader.option(k, v)
    return kafka_decode(reader.load())
