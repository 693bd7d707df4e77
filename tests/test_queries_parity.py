"""The correctness gate, locally: every registry query vs its DuckDB
oracle at sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from gmall_flink_20_spark.oracles import ORACLES
from gmall_flink_20_spark.queries import NO_ORACLE, QUERIES
from gmall_flink_20_spark.testing import assert_frames_match


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, oracle, sf_dir):
    got = QUERIES[name](spark, sf_dir).toPandas()
    if name in NO_ORACLE:
        assert len(got) >= 0  # rows-only check, mirrors the driver
        return
    exp = oracle.execute(ORACLES[name]).fetchdf()
    assert_frames_match(got, exp, name)


def test_every_query_has_oracle_or_waiver():
    missing = set(QUERIES) - set(ORACLES) - NO_ORACLE
    assert not missing, f"queries without oracle or waiver: {missing}"


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
