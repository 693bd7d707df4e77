"""Round-9 operator tests: persisted IVF index (write/reload/query)."""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gmall_flink_20_spark.io import load_table
from gmall_flink_20_spark.operators import ann


def _index(spark, sf_dir, tmp=None):
    emb = load_table(spark, sf_dir, "embeddings")
    path = (tmp or tempfile.mkdtemp(prefix="ivf_idx_t_")) + "/index"
    ann.ivf_index_write(emb, path, nlist=16, train_iters=3)
    return emb, path


def test_ivf_index_reload_equals_retrain(spark, sf_dir):
    """Determinism makes this exact: querying the reloaded on-disk
    index returns the identical row set as retraining in-session."""
    emb, path = _index(spark, sf_dir)
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ann.ann_ivf_persisted_topk(
            spark, path, emb, list(range(10)), 5, nprobe=4
        ).collect()
    }
    exp = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ann.ann_ivf_topk(
            emb, list(range(10)), 5, nlist=16, nprobe=4, train_iters=3
        ).collect()
    }
    assert got == exp and len(got) > 0


def test_ivf_index_layout_and_meta(spark, sf_dir):
    emb, path = _index(spark, sf_dir)
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    assert (meta.nlist, meta.train_iters, meta.dim) == (16, 3, 64)
    cents = ann.ivf_index_load_centroids(spark, path)
    assert len(cents) == 16 and all(len(v) == 64 for _, v in cents)
    # postings are hive-partitioned by list_id and cover the corpus
    post = spark.read.parquet(f"{path}/postings")
    assert post.count() == emb.count()
    dirs = {p.name for p in Path(f"{path}/postings").iterdir() if p.is_dir()}
    assert dirs and all(d.startswith("list_id=") for d in dirs)


def test_ivf_persisted_scan_prunes_partitions(spark, sf_dir):
    """The probe-time postings read must touch ONLY the probed cells'
    files — directory pruning, the reason the index is partitioned."""
    emb, path = _index(spark, sf_dir)
    cents = ann.ivf_index_load_centroids(spark, path)
    qbase = ann.with_unit(
        emb.filter(F.col("vec_id").isin(list(range(10)))).select(
            "vec_id", "embedding"
        ),
        "embedding",
        64,
    )
    probed = sorted(
        {
            int(r.list_id)
            for r in qbase.select(
                F.explode(ann._probe_udf(cents, 4)(F.col("_av"))).alias("list_id")
            ).collect()
        }
    )
    all_lists = {
        int(p.name.split("=")[1])
        for p in Path(f"{path}/postings").iterdir()
        if p.is_dir()
    }
    assert set(probed) < all_lists, "probe must not touch every cell"
    pruned = spark.read.parquet(f"{path}/postings").filter(
        F.col("list_id").isin(probed)
    )
    # static partition pruning: the scan node carries the isin() as a
    # PartitionFilter, so directory listing drops the unprobed cells
    # before any data file is opened (inputFiles() reports the
    # pre-filter FileIndex, so gate on the plan instead)
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    pf = plan.split("PartitionFilters:")[1].split("\n")[0]
    assert "list_id" in pf and "IN" in pf  # rendered as IN or INSET
    # and the executed scan only produces rows from probed directories
    touched = {
        int(r.f.split("list_id=")[1].split("/")[0])
        for r in pruned.select(
            F.input_file_name().alias("f")
        ).distinct().collect()
    }
    assert touched == set(probed)
