"""Shared test/verification helpers (used by tests/ and scripts/)."""

from __future__ import annotations

import duckdb
import pandas as pd

from .io import TABLES

__all__ = ["canon", "duckdb_con", "assert_frames_match"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form for order-insensitive comparison: columns sorted by
    name, object columns stringified, floats rounded to 9 dp, rows sorted."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def assert_frames_match(got: pd.DataFrame, exp: pd.DataFrame, name: str = "") -> None:
    g, e = canon(got), canon(exp)
    assert list(g.columns) == list(e.columns), f"{name}: columns {list(g.columns)} != {list(e.columns)}"
    assert len(g) == len(e), f"{name}: rows {len(g)} != {len(e)}"
    if not g.equals(e):
        neq = (g != e) & ~(g.isna() & e.isna())
        bad = neq.any(axis=1)
        raise AssertionError(
            f"{name}: {int(bad.sum())}/{len(g)} rows differ\n"
            f"spark:\n{g[bad].head(5)}\noracle:\n{e[bad].head(5)}"
        )
