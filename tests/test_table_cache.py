"""Resolved-plan cache invalidation (ADVICE r8, io.load_table).

The cache exists to skip the ~0.1 s Py4J file-listing + footer-schema
read per call; it must NOT survive an in-place regeneration of the
table directory, or a doubled-corpus script reusing a path would read
dropped files. The key therefore includes a one-stat() directory
fingerprint (mtime_ns + size).
"""

from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gmall_flink_20_spark import io as gio


def test_load_table_hits_cache_for_static_dir(spark, sf_dir):
    a = gio.load_table(spark, sf_dir, "region")
    b = gio.load_table(spark, sf_dir, "region")
    assert a is b  # same resolved plan object — the metadata skip


def test_load_table_invalidates_on_regeneration(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="tblcache_")
    tbl = f"{base}/region.parquet"
    src = gio.load_table(spark, sf_dir, "region")

    src.limit(2).write.mode("overwrite").parquet(tbl)
    first = gio.load_table(spark, base, "region")
    assert first.count() == 2

    # regenerate AT THE SAME PATH within the same session
    shutil.rmtree(tbl)
    src.limit(4).write.mode("overwrite").parquet(tbl)
    second = gio.load_table(spark, base, "region")
    assert second is not first  # stale FileIndex must not be served
    assert second.count() == 4
    shutil.rmtree(base)


def test_clear_table_cache_drops_plans(spark, sf_dir):
    a = gio.load_table(spark, sf_dir, "region")
    gio.clear_table_cache()
    b = gio.load_table(spark, sf_dir, "region")
    assert a is not b
