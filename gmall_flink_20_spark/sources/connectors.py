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


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka value-bytes stream; pair with csv/json_lines_to_rows on
    ``CAST(value AS STRING)``. Requires the spark-sql-kafka package on the
    classpath at ``.start()`` time (not needed to declare the plan)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value", "timestamp")
    )
