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


def _canon_with_raw(df: pd.DataFrame) -> tuple[pd.DataFrame, dict[str, "object"]]:
    """Rounded canonical frame PLUS the pre-round float columns reindexed
    by the same row order. The sort key is the rounded frame with each
    float column's raw uint64 bit pattern as tiebreaker, so rows that tie
    under round(9) (or differ only as -0.0 vs 0.0) still pair up
    positionally whenever the two frames hold the same raw multiset."""
    import numpy as np

    cols = sorted(df.columns)
    disp = df[cols].copy()
    raw: dict[str, np.ndarray] = {}
    for c in cols:
        if disp[c].dtype == object:
            disp[c] = disp[c].astype(str)
        elif str(disp[c].dtype).startswith("float"):
            raw[c] = disp[c].to_numpy(dtype="float64").copy()
            disp[c] = disp[c].round(9)
    key = disp.copy()
    bit_cols = []
    for c, arr in raw.items():
        bc = c + "\x00bits"
        key[bc] = arr.view("uint64")
        bit_cols.append(bc)
    order = key.sort_values(by=cols + bit_cols).index.to_numpy()
    disp = disp.loc[order].reset_index(drop=True)
    raw = {c: arr[order] for c, arr in raw.items()}
    return disp, raw


def assert_frames_match(got: pd.DataFrame, exp: pd.DataFrame, name: str = "") -> None:
    g, graw = _canon_with_raw(got)
    e, eraw = _canon_with_raw(exp)
    assert list(g.columns) == list(e.columns), f"{name}: columns {list(g.columns)} != {list(e.columns)}"
    assert len(g) == len(e), f"{name}: rows {len(g)} != {len(e)}"
    if not g.equals(e):
        neq = (g != e) & ~(g.isna() & e.isna())
        bad = neq.any(axis=1)
        raise AssertionError(
            f"{name}: {int(bad.sum())}/{len(g)} rows differ\n"
            f"spark:\n{g[bad].head(5)}\noracle:\n{e[bad].head(5)}"
        )
    # Bitwise float check ON THE PRE-ROUND VALUES: the driver hashes raw
    # byte representations, so -0.0 vs 0.0 AND last-ulp drift (which the
    # rounded tolerant pass above erases) must fail here too — this is
    # the faithful replica of the driver's value-hash gate.
    import numpy as np

    for c in g.columns:
        if c in graw:
            ga, ea = graw[c], eraw[c]
            diff = (ga.view("uint64") != ea.view("uint64")) & ~(
                np.isnan(ga) & np.isnan(ea)
            )
            if diff.any():
                k = int(np.argmax(diff))
                raise AssertionError(
                    f"{name}: column {c!r} differs bitwise at canon row {k}: "
                    f"spark={ga[k]!r} ({ga.view('uint64')[k]:#x}) vs "
                    f"oracle={ea[k]!r} ({ea.view('uint64')[k]:#x}) — "
                    "likely signed zero or last-ulp drift"
                )
