"""Deduplication operators for training-data pipelines.

Beyond-reference scope: exact dedup (hash-groupBy), MinHash+LSH near-dup
(shingle → minhash signature → band → bucket-join), and n-gram Jaccard
verification. Designed shuffle-light for 100 TB:

- exact: one groupBy on a 128-bit content hash — partial aggregation
  collapses duplicates map-side before the shuffle.
- minhash-lsh: the only shuffles are (a) the signature groupBy keyed by
  (doc, seed) and (b) the band-bucket self-join; candidate pairs (tiny) are
  verified by an equi-join on shingles instead of an all-pairs cross join.

Determinism contract: hashes are md5 hex strings (DuckDB computes the same
md5, so min() over signatures agrees bit-for-bit). At production scale
you'd swap md5 for xxhash64 — identical plan shape, cheaper hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "dedup_exact",
    "shingles",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "jaccard_verify",
]


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content hash: (fp, keeper id, group size)."""
    return (
        df.groupBy(F.md5(F.col(text_col).cast("binary")).alias("fp"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def shingles(df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct n-word shingles per doc: (id_col, shingle).

    Built from a whitespace token array with a transform over indices —
    stays in codegen, no UDF. Docs shorter than n words yield no shingles.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # shingle i = tokens[i .. i+n-1] joined by single spaces
    sh = F.expr(
        f"transform(sequence(0, size(split(trim({text_col}), '\\\\s+')) - {n}), "
        f"i -> array_join(slice(split(trim({text_col}), '\\\\s+'), i + 1, {n}), ' '))"
    )
    return (
        df.filter(F.size(toks) >= n)
        .select(F.col(id_col), F.explode(sh).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    shingle_df: DataFrame, num_hashes: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """MinHash: for seed s, sig_s(doc) = min over shingles of
    md5(s || ':' || shingle). Output (id_col, seed, minhash)."""
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed")
    hashed = shingle_df.select(F.col(id_col), F.col("shingle"), seeds).select(
        F.col(id_col),
        F.col("seed"),
        F.md5(F.concat_ws(":", F.col("seed").cast("string"), F.col("shingle")).cast("binary")).alias("h"),
    )
    return hashed.groupBy(id_col, "seed").agg(F.min("h").alias("minhash"))


def lsh_candidate_pairs(
    sig_df: DataFrame, bands: int = 4, rows_per_band: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Band the signature and self-join on (band_id, band_key) buckets.

    Docs sharing ≥1 band bucket become a candidate pair (doc_a < doc_b).
    The join key is the md5 of the band's concatenated minhashes, so bucket
    cardinality stays bounded and the shuffle is on a uniform hash key.
    """
    banded = (
        sig_df.withColumn("band_id", F.expr(f"CAST(seed DIV {rows_per_band} AS INT)"))
        .groupBy(id_col, "band_id")
        .agg(F.md5(F.concat_ws("|", F.array_sort(F.collect_list(
            F.concat_ws(":", F.col("seed").cast("string"), F.col("minhash"))
        ))).cast("binary")).alias("band_key"))
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, shingle_df: DataFrame, threshold: float, id_col: str = "doc_id"
) -> DataFrame:
    """Exact Jaccard on candidate pairs via shingle equi-joins (never an
    all-pairs cross join): |A∩B| from a 3-way join, |A∪B| = |A|+|B|−|A∩B|.

    Jaccard is emitted as the exact integer pair (inter, union) plus their
    double ratio — bit-identical across engines.
    """
    sizes = shingle_df.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    sa = shingle_df.select(F.col(id_col).alias("doc_a"), "shingle")
    sb = shingle_df.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter_sz"))
    )
    za = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("sz_b"))
    out = (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .withColumn("union_sz", F.col("sz_a") + F.col("sz_b") - F.col("inter_sz"))
        .withColumn("jaccard", F.col("inter_sz").cast("double") / F.col("union_sz").cast("double"))
    )
    return out.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "inter_sz", "union_sz", "jaccard"
    )
