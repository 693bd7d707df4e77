"""S4 Kafka contract tests (VERDICT r5 item 5) — pin the source wiring
without a broker.

The kafka DataSource cannot resolve in this environment (no
spark-sql-kafka package; installs disallowed), so ``kafka_stream`` itself
is unexecutable here — exactly like the reference, whose Kafka dependency
(pom.xml:43-47) is declared and never exercised. What CAN be pinned:

1. the reader options ``kafka_stream`` configures (golden dict),
2. the decode transform applied to the documented wire schema
   (key/value binary → string, broker timestamp kept), run on a static
   frame that mimics what the kafka source emits,
3. the end-to-end decode composition ``kafka wire record → kafka_decode
   → csv_lines_to_rows`` producing typed rows — the same composition the
   file and socket sources use, so a real broker deployment only swaps
   the source node.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from gmall_flink_20_spark.sources import connectors as C


def test_kafka_source_options_golden():
    got = C.kafka_source_options("broker1:9092,broker2:9092", "user_behavior")
    assert got == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "user_behavior",
        "startingOffsets": "earliest",
    }
    assert C.kafka_source_options("b:9092", "t", "latest")["startingOffsets"] == "latest"


def _wire_frame(spark, values: list[bytes], keys: list[bytes | None] | None = None):
    ts = datetime(2024, 1, 1, 0, 0, 0)
    keys = keys or [None] * len(values)
    rows = [
        (k, v, "user_behavior", 0, i, ts, 0)
        for i, (k, v) in enumerate(zip(keys, values))
    ]
    return spark.createDataFrame(rows, C.KAFKA_WIRE_SCHEMA)


def test_kafka_decode_wire_schema(spark):
    raw = _wire_frame(
        spark, [b"543462,1715,1464116,pv,1511658000"], keys=[b"543462"]
    )
    out = C.kafka_decode(raw)
    assert [f.name for f in out.schema.fields] == ["key", "value", "timestamp"]
    assert out.schema["key"].dataType.simpleString() == "string"
    assert out.schema["value"].dataType.simpleString() == "string"
    assert out.schema["timestamp"].dataType.simpleString() == "timestamp"
    row = out.collect()[0]
    assert row.key == "543462"
    assert row.value == "543462,1715,1464116,pv,1511658000"


def test_kafka_decode_null_key_passthrough(spark):
    # keyless produce (the common case) must not drop records
    out = C.kafka_decode(_wire_frame(spark, [b"1,2,3"], keys=[None])).collect()
    assert len(out) == 1 and out[0].key is None and out[0].value == "1,2,3"


def test_kafka_csv_composition(spark):
    # the reference's UserBehavior CSV shape through the kafka decode path
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("item_id", LongType()),
            StructField("category_id", LongType()),
            StructField("behavior", StringType()),
            StructField("ts", LongType()),
        ]
    )
    raw = _wire_frame(
        spark,
        [b"543462,1715,1464116,pv,1511658000", b"662867,2244074,1575622,buy,1511658060"],
    )
    parsed = C.csv_lines_to_rows(C.kafka_decode(raw), schema)
    rows = sorted(parsed.collect(), key=lambda r: r.user_id)
    assert [f.name for f in parsed.schema.fields] == [
        "user_id", "item_id", "category_id", "behavior", "ts",
    ]
    assert rows[0].user_id == 543462 and rows[0].behavior == "pv"
    assert rows[1].item_id == 2244074 and rows[1].ts == 1511658060


def test_kafka_stream_builds_reader_up_to_source_resolution(spark):
    # .load() is the FIRST point that needs the kafka package; everything
    # before it (format, options) must construct cleanly. The failure we
    # get proves the options made it to DataSource resolution.
    import pytest

    with pytest.raises(Exception) as ei:
        C.kafka_stream(spark, "localhost:9092", "t")
    assert "kafka" in str(ei.value).lower()
