"""Signed-zero regression tests (VERDICT r3 item 1).

The driver's correctness gate hashes raw byte representations, so a
Spark ``0.0`` vs DuckDB ``-0.0`` — numerically equal, pandas-equal —
fails the gate. Round 3's one red row (`emb_covariance`) was exactly
this. These tests pin both halves of the fix:

1. ``assert_frames_match`` must DETECT a signed-zero divergence (the
   local gate is only a faithful replica of the driver if it compares
   bitwise, not with pandas equality where ``-0.0 == 0.0``).
2. The covariance/correlation/PCA outputs must never EMIT ``-0.0``
   (the ``+ 0.0`` normalization in operator and oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gmall_flink_20_spark.operators import similarity
from gmall_flink_20_spark.testing import assert_frames_match

NEG_ZERO_BITS = np.float64(-0.0).view(np.uint64)


def test_gate_catches_signed_zero():
    g = pd.DataFrame({"k": [1, 2], "v": [0.0, 1.5]})
    e = pd.DataFrame({"k": [1, 2], "v": [-0.0, 1.5]})
    with pytest.raises(AssertionError, match="bitwise"):
        assert_frames_match(g, e, "signed-zero-probe")


def test_gate_passes_identical_and_nan():
    g = pd.DataFrame({"k": [1, 2], "v": [float("nan"), -1.5]})
    e = pd.DataFrame({"k": [1, 2], "v": [float("nan"), -1.5]})
    assert_frames_match(g, e, "nan-ok")


def _neg_zero_count(pdf: pd.DataFrame) -> int:
    n = 0
    for c in pdf.columns:
        if str(pdf[c].dtype).startswith("float"):
            a = pdf[c].to_numpy(dtype="float64")
            n += int(((a.view("uint64") == NEG_ZERO_BITS) & ~np.isnan(a)).sum())
    return n


def test_covariance_never_emits_negative_zero(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cov = similarity.covariance_matrix(emb).toPandas()
    assert _neg_zero_count(cov) == 0
    corr = similarity.correlation_matrix(emb).toPandas()
    assert _neg_zero_count(corr) == 0


def test_pca_projections_never_emit_negative_zero(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert _neg_zero_count(similarity.pca_project(emb).toPandas()) == 0
    assert _neg_zero_count(similarity.pca_project2(emb).toPandas()) == 0


def test_normalization_is_ieee_sound():
    # the fix relies on IEEE 754 round-to-nearest: -0.0 + 0.0 = +0.0
    assert np.float64(np.float64(-0.0) + 0.0).view(np.uint64) == 0
